"""Voxel neighborhood query (TPU-native pointnet2_stack ``voxel_query``).

Rebuild of ref pcdet/ops/pointnet2/pointnet2_stack/src/voxel_query_gpu.cu:10-90
(+ voxel_query_utils.py:10-51): for every query point, walk the dense
z-y-x neighborhood (±max_range per axis, z-major traversal exactly like the
CUDA triple loop), look each cell up in the sparse voxel set, keep hits whose
voxel center lies within ``radius`` of the query, and emit the first
``nsample`` voxel rows (slot 0 repeated as padding — the CUDA kernel's
convention, consumed by grouping which masks repeats).

TPU formulation: the neighborhood is a static offset table; lookups go
through a dense cell→row table (the stage grids VoxelRCNN queries are small);
"first n hits in traversal order" is a cumsum rank — no sort, no atomics.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.index import build_dense_row_table, linearize_coords, lookup_dense


def _neighborhood_offsets(max_range: Sequence[int]) -> np.ndarray:
    """(K, 3) zyx offsets in the CUDA kernel's z-major traversal order."""
    rz, ry, rx = (int(r) for r in max_range)
    offs = [
        (dz, dy, dx)
        for dz in range(-rz, rz + 1)
        for dy in range(-ry, ry + 1)
        for dx in range(-rx, rx + 1)
    ]
    return np.asarray(offs, np.int32)


def voxel_query(
    queries_xyz: jnp.ndarray,   # (B, Q, 3) metric points
    coords: jnp.ndarray,        # (V, 4) int32 (b, z, y, x) of the voxel stage
    valid: jnp.ndarray,         # (V,) bool
    spatial_shape: Tuple[int, int, int],  # stage grid (x, y, z)
    voxel_size: Sequence[float],          # stage metric voxel size
    point_cloud_range: Sequence[float],
    max_range: Sequence[int],   # (z, y, x) neighborhood radii in cells
    radius: float,
    nsample: int,
    batch_size: int,
):
    """Returns (idx (B, Q, nsample) int32 global rows, empty (B, Q) bool).

    Padding slots repeat the first hit (ref convention); ``empty`` is True
    where no voxel matched (callers zero those outputs, ref
    voxel_query_utils.py:40-47).
    """
    b, q, _ = queries_xyz.shape
    vs = jnp.asarray([float(v) for v in voxel_size], jnp.float32)
    mins = jnp.asarray([float(v) for v in point_cloud_range[:3]], jnp.float32)

    # query point → voxel cell (x, y, z)
    cell_xyz = jnp.floor((queries_xyz - mins) / vs).astype(jnp.int32)

    offs = jnp.asarray(_neighborhood_offsets(max_range))  # (K, 3) zyx
    k = offs.shape[0]
    # neighbor cells (B, Q, K, 3) in xyz
    nb_xyz = cell_xyz[:, :, None, :] + offs[None, None, :, ::-1]
    bidx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None, None, None], (b, q, k, 1))
    nb_bzyx = jnp.concatenate([bidx, nb_xyz[..., ::-1]], axis=-1)

    table = build_dense_row_table(coords, valid, spatial_shape, batch_size)
    keys = linearize_coords(nb_bzyx, spatial_shape)
    rows = lookup_dense(table, keys)  # (B, Q, K)

    # radius gate on voxel centers (ref voxel_query_gpu.cu computes the
    # center distance before accepting a neighbor)
    ctr = (coords[:, [3, 2, 1]].astype(jnp.float32) + 0.5) * vs + mins  # (V,3)
    safe_rows = jnp.clip(rows, 0)
    nb_ctr = ctr[safe_rows]  # (B, Q, K, 3)
    d2 = jnp.sum((nb_ctr - queries_xyz[:, :, None, :]) ** 2, axis=-1)
    hit = (rows >= 0) & (d2 < float(radius) ** 2)

    rank = jnp.cumsum(hit, axis=-1) - hit  # exclusive, traversal order
    keep = hit & (rank < nsample)
    # scatter hits into their slots; empty slots inherit the FIRST hit
    dest = jnp.where(keep, rank, nsample)
    flat_dest = (
        (jnp.arange(b)[:, None, None] * q + jnp.arange(q)[None, :, None])
        * (nsample + 1) + dest
    ).reshape(-1)
    out = jnp.full((b * q * (nsample + 1),), -1, jnp.int32).at[flat_dest].set(
        jnp.broadcast_to(safe_rows, (b, q, k)).reshape(-1)
        * keep.reshape(-1) + (-1) * (~keep.reshape(-1)),
        mode="drop",
    )
    idx = out.reshape(b, q, nsample + 1)[..., :nsample]
    first = idx[..., 0:1]
    empty = first[..., 0] < 0
    idx = jnp.where(idx >= 0, idx, jnp.maximum(first, 0))
    return idx, empty
