"""Static-shape sparse voxel tensor (TPU-native SparseTensor equivalent).

The reference keeps a dynamic ``(N, C)`` feature tensor with per-batch counts
and a GPU hash table (ref: pcdet/models/model_utils/mssvt_utils.py:21-62).
On TPU every shape must be static under jit, so we pad to a fixed
``max_voxels`` capacity with a validity mask, and replace the hash table with
the sorted-key :class:`~mssvt_tpu.core.index.VoxelIndex`.

Geometry metadata (spatial_shape, voxel_size, point_cloud_range) is static
pytree metadata so that blocks can specialize on it at trace time.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

from .index import VoxelIndex, build_index


@struct.dataclass
class SparseVoxels:
    """Batched sparse voxel tensor with static capacity.

    Attributes:
        features: (max_voxels, C) float features, rows beyond `valid` are zeros.
        coords: (max_voxels, 4) int32 (batch, z, y, x); padding rows are -1.
        valid: (max_voxels,) bool mask.
        index: sorted-key lookup index over `coords`.
        batch_size: static int.
        spatial_shape: static (x, y, z) grid extents.
        voxel_size: static (vx, vy, vz) metric voxel size.
        point_cloud_range: static (x0, y0, z0, x1, y1, z1).
    """

    features: jnp.ndarray
    coords: jnp.ndarray
    valid: jnp.ndarray
    index: VoxelIndex | None
    batch_size: int = struct.field(pytree_node=False)
    spatial_shape: Tuple[int, int, int] = struct.field(pytree_node=False)
    voxel_size: Tuple[float, float, float] = struct.field(pytree_node=False)
    point_cloud_range: Tuple[float, ...] = struct.field(pytree_node=False)

    @classmethod
    def create(cls, features, coords, valid, batch_size, spatial_shape,
               voxel_size, point_cloud_range,
               with_index: bool = True) -> "SparseVoxels":
        """``with_index=False`` skips the sorted-key index build (one argsort
        over max_voxels) for consumers that only use dense window tables —
        the MsSVT path; the sparse-conv engine needs the index."""
        spatial_shape = tuple(int(s) for s in spatial_shape)
        index = build_index(coords, valid, spatial_shape) if with_index \
            else None
        return cls(
            features=features,
            coords=coords,
            valid=valid,
            index=index,
            batch_size=int(batch_size),
            spatial_shape=spatial_shape,
            voxel_size=tuple(float(v) for v in voxel_size),
            point_cloud_range=tuple(float(v) for v in point_cloud_range),
        )

    @property
    def max_voxels(self) -> int:
        return self.features.shape[0]

    @property
    def num_features(self) -> int:
        return self.features.shape[1]

    def with_features(self, features) -> "SparseVoxels":
        return self.replace(features=features)

    def metric_centers(self) -> jnp.ndarray:
        """Voxel center coordinates in metric space, (max_voxels, 3) xyz.

        Equivalent of ``with_coords`` (ref: mssvt_backbone.py:132-137):
        ``(index_xyz + 0.5) * voxel_size + pc_range_min``.
        """
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        mins = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
        xyz_idx = self.coords[:, [3, 2, 1]].astype(jnp.float32)
        return (xyz_idx + 0.5) * vs + mins

    def per_sample(self, max_per_sample: int | None = None):
        """Re-layout flat global rows as (B, M, ...) per-sample tensors.

        Returns (xyz (B, M, 3) metric centers, features (B, M, C),
        valid (B, M)). Correctly handles globally-compacted site sets (e.g.
        strided sparse-conv outputs) where per-sample counts vary — a plain
        ``reshape(B, -1, ...)`` would mix samples.
        """
        m = max_per_sample or self.max_voxels
        b = self.batch_size
        v = self.max_voxels
        bidx = jnp.where(self.valid, self.coords[:, 0], b)
        # in-sample rank: exclusive per-batch-column prefix sum (works for
        # any row order — collated per-sample slots or globally compacted)
        onehot = (bidx[:, None] == jnp.arange(b)[None, :]) & self.valid[:, None]
        excl = jnp.cumsum(onehot.astype(jnp.int32), axis=0) - onehot
        rank = jnp.take_along_axis(
            excl, jnp.clip(bidx, 0, b - 1)[:, None], axis=1)[:, 0]
        ok = self.valid & (rank < m)
        dest = jnp.where(ok, bidx * m + rank,
                         b * m + jnp.arange(v, dtype=jnp.int32))
        xyz = jnp.zeros((b * m, 3), jnp.float32).at[dest].set(
            self.metric_centers(), mode="drop").reshape(b, m, 3)
        feats = jnp.zeros((b * m, self.num_features), self.features.dtype).at[
            dest].set(self.features, mode="drop").reshape(b, m, -1)
        valid = jnp.zeros((b * m,), bool).at[dest].set(
            ok, mode="drop").reshape(b, m)
        return xyz, feats, valid

    def dense(self, channels_last: bool = True) -> jnp.ndarray:
        """Scatter to a dense (B, D, H, W, C) grid (zeros where empty).

        Equivalent of ``SparseTensor.dense()`` (ref: mssvt_utils.py:50-62),
        but channels-last by default — the natural TPU conv layout (NHWC).
        """
        x_max, y_max, z_max = self.spatial_shape
        c = self.features.shape[1]
        out = jnp.zeros((self.batch_size, z_max, y_max, x_max, c), self.features.dtype)
        b, z, y, x = (self.coords[:, i] for i in range(4))
        # Route padded rows out of bounds so scatter 'drop' ignores them.
        b = jnp.where(self.valid, b, self.batch_size)
        out = out.at[b, z, y, x].set(self.features, mode="drop")
        if channels_last:
            return out  # (B, D, H, W, C)
        return jnp.transpose(out, (0, 4, 1, 2, 3))  # (B, C, D, H, W)

    def bev(self) -> jnp.ndarray:
        """Direct (B, H, W, D*C) BEV scatter, skipping the 5D intermediate.

        HeightCompression in the reference densifies to (B, C, D, H, W) then
        reshapes to (B, C*D, H, W) (ref: height_compression.py:41-45). On TPU
        we scatter straight into the collapsed layout: one scatter, no big 5D
        temporary in HBM, channels-last for the conv stack that follows.

        Channel layout is z-major (channel block d*C:(d+1)*C holds depth slice
        z=d), whereas the reference reshape is channel-major (c*D+d). The two
        are a fixed permutation of each other; we keep z-major because it falls
        out of a single scatter with no transpose. Internally consistent — the
        following conv stack is trained against this layout.
        """
        x_max, y_max, z_max = self.spatial_shape
        c = self.features.shape[1]
        out = jnp.zeros((self.batch_size, y_max, x_max, z_max, c), self.features.dtype)
        b, z, y, x = (self.coords[:, i] for i in range(4))
        b = jnp.where(self.valid, b, self.batch_size)
        out = out.at[b, y, x, z].set(self.features, mode="drop")
        return out.reshape(self.batch_size, y_max, x_max, z_max * c)
