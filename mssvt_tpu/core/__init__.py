from .index import INVALID_KEY, VoxelIndex, build_index, linearize_coords, lookup
from .sparse import SparseVoxels

__all__ = [
    "INVALID_KEY",
    "VoxelIndex",
    "build_index",
    "linearize_coords",
    "lookup",
    "SparseVoxels",
]
