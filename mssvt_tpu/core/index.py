"""Sorted-key voxel index — the TPU-native replacement for the CUDA hash table.

The reference builds a per-batch open-addressing hash table with atomicCAS
(ref: pcdet/ops/mssvt/src/ms_sparse_attention_gpu.cu:22-97) that maps the
linearized voxel coordinate key ``x*y_max*z_max + y*z_max + z`` to the row of
that voxel in the flat feature tensor. TPUs have no global atomics and XLA
wants static shapes, so we replace the hash table with a *sorted key array*:

- build: linearize (batch, x, y, z) into a single int key, sort once
  (O(N log N), fully vectorized, deterministic)
- lookup: ``searchsorted`` binary search (O(log N) per query, vectorized
  across all queries)

Unlike the reference we fold the batch index into the key, so lookups return
*global* rows into the padded ``(max_voxels, C)`` feature array; the per-batch
bookkeeping loops of the reference (``with_bs_cnt``,
ref: pcdet/models/backbones_3d/mssvt_backbone.py:124-130) disappear entirely.

Determinism note: the reference hash insert order depends on CUDA scheduling
(later duplicate inserts win races); sorted keys are unique here by
construction of the voxelizer, and lookups are exactly reproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

# Sentinel for "no voxel". Using int32 max keeps padded keys at the end after
# sorting. Valid keys must be < INVALID_KEY.
INVALID_KEY = jnp.iinfo(jnp.int32).max


def _check_key_capacity(batch_size: int, spatial_shape) -> None:
    x, y, z = int(spatial_shape[0]), int(spatial_shape[1]), int(spatial_shape[2])
    total = batch_size * x * y * z
    if total >= int(INVALID_KEY):
        raise ValueError(
            f"linearized key space {total} overflows int32 "
            f"(batch_size={batch_size}, spatial_shape={spatial_shape}); "
            "reduce grid size or batch, or shard the batch across devices"
        )


def linearize_coords(coords: jnp.ndarray, spatial_shape, valid: jnp.ndarray | None = None):
    """Linearize (b, z, y, x) int coords into sortable int32 keys.

    Key layout matches the reference (x-major within a sample:
    ``x*y_max*z_max + y*z_max + z``, ref: ms_sparse_attention_gpu.cu:93) with
    the batch index folded in as the highest-order digit.

    Args:
        coords: (..., 4) int32 array of (batch, z, y, x) indices.
        spatial_shape: static (x_max, y_max, z_max).
        valid: optional (...,) bool mask; invalid entries get INVALID_KEY.

    Returns:
        (...,) int32 keys; out-of-bound coords map to INVALID_KEY.
    """
    x_max, y_max, z_max = (int(s) for s in spatial_shape)
    b = coords[..., 0]
    z = coords[..., 1]
    y = coords[..., 2]
    x = coords[..., 3]
    in_bounds = (
        (b >= 0)
        & (x >= 0) & (x < x_max)
        & (y >= 0) & (y < y_max)
        & (z >= 0) & (z < z_max)
    )
    if valid is not None:
        in_bounds = in_bounds & valid
    key = ((b * x_max + x) * y_max + y) * z_max + z
    return jnp.where(in_bounds, key, INVALID_KEY).astype(jnp.int32)


def delinearize_key(keys: jnp.ndarray, spatial_shape):
    """Inverse of :func:`linearize_coords`. Returns (..., 4) (b, z, y, x) coords.

    Invalid keys map to all -1 coords.
    """
    x_max, y_max, z_max = (int(s) for s in spatial_shape)
    valid = keys != INVALID_KEY
    k = jnp.where(valid, keys, 0)
    z = k % z_max
    k = k // z_max
    y = k % y_max
    k = k // y_max
    x = k % x_max
    b = k // x_max
    coords = jnp.stack([b, z, y, x], axis=-1).astype(jnp.int32)
    return jnp.where(valid[..., None], coords, -1)


@struct.dataclass
class VoxelIndex:
    """Sorted (key, row) pairs over the padded voxel set of a whole batch."""

    sorted_keys: jnp.ndarray  # (max_voxels,) int32, INVALID_KEY-padded tail
    sorted_rows: jnp.ndarray  # (max_voxels,) int32 rows into the flat feature array


def build_index(coords: jnp.ndarray, valid: jnp.ndarray, spatial_shape) -> VoxelIndex:
    """Build the sorted-key index (hash-table equivalent, one sort).

    Args:
        coords: (max_voxels, 4) int32 (b, z, y, x), padding rows arbitrary.
        valid: (max_voxels,) bool validity mask.
        spatial_shape: static (x_max, y_max, z_max).
    """
    keys = linearize_coords(coords, spatial_shape, valid)
    order = jnp.argsort(keys)
    return VoxelIndex(sorted_keys=keys[order], sorted_rows=order.astype(jnp.int32))


def lookup(index: VoxelIndex, query_keys: jnp.ndarray) -> jnp.ndarray:
    """Vectorized exact-match lookup. Returns row index or -1 (not found).

    Equivalent of ``hash_table_find`` (ref: ms_sparse_attention_gpu.cu:43-64),
    but a binary search over the sorted key array.
    """
    n = index.sorted_keys.shape[0]
    pos = jnp.searchsorted(index.sorted_keys, query_keys, side="left")
    pos = jnp.clip(pos, 0, n - 1)
    found = (index.sorted_keys[pos] == query_keys) & (query_keys != INVALID_KEY)
    return jnp.where(found, index.sorted_rows[pos], -1).astype(jnp.int32)


def unique_compact_dense(keys: jnp.ndarray, capacity: int, n_cells: int,
                         return_ranks: bool = False):
    """Sort-free :func:`unique_compact` for small, bounded key spaces.

    When every valid key lies in [0, n_cells) and n_cells is modest (window
    grids: grid volume / window volume), dedup is a dense occupancy scatter
    + cumsum compaction — no sort. XLA's TPU sort is a bitonic network and
    was the dominant cost of the round-1 backbone; this path is pure
    VPU scans + unique-index scatters. Output semantics identical to
    ``unique_compact`` (ascending unique keys, INVALID_KEY padding).
    """
    n = keys.shape[0]
    valid = keys != INVALID_KEY
    safe = jnp.where(valid, keys, n_cells + jnp.arange(n, dtype=keys.dtype))
    occ = jnp.zeros((n_cells,), bool).at[safe].set(True, mode="drop")
    slot = jnp.cumsum(occ) - 1  # ascending-key rank among occupied cells
    num_unique = jnp.sum(occ).astype(jnp.int32)
    # Compaction scatters from the INPUT keys, not the cell table: each key
    # writes ITSELF at its cell's ascending-unique rank. Duplicates write
    # identical values, so a max-combine is exact and deterministic; the
    # descriptor count is N (the input size) instead of n_cells.
    # NOTE(perf): measured on chip at the first compress block
    # (n_cells=1.84M, N=360k): the previous dense dest scatter (one
    # descriptor per CELL) was 8.5 ms/step; a searchsorted rank-select was
    # 60.7 ms/step (jnp.searchsorted's scan lowering is NOT a cheap batched
    # binary search on TPU). The input-side scatter rides the ~2.4 ms
    # scatter floor.
    krank = slot[jnp.minimum(safe, n_cells - 1)]  # (N,) rank of own cell
    dest = jnp.where(valid & (krank < capacity), krank, capacity)
    out_keys = jnp.full((capacity + 1,), -1, jnp.int32).at[dest].max(
        jnp.where(valid, keys, -1)
    )[:capacity]
    out_valid = out_keys >= 0
    out_keys = jnp.where(out_valid, out_keys, INVALID_KEY)
    if return_ranks:
        # per-INPUT-key row in the compacted output (ascending-key order),
        # -1 for invalid keys and capacity overflow — the voxel→window-row
        # map, a free byproduct of the dedup (window.py compact box tables)
        ranks = jnp.where(valid & (krank < capacity), krank, -1)
        return out_keys, out_valid, num_unique, ranks
    return out_keys, out_valid, num_unique


def build_dense_row_table(coords: jnp.ndarray, valid: jnp.ndarray,
                          spatial_shape, batch_size: int) -> jnp.ndarray:
    """Dense cell→row lookup table for small key spaces (O(1) lookup).

    Replaces the sorted-key binary search when the grid is small enough to
    materialize (window grids). Returns (batch_size * prod(grid) + 1,) int32
    of row indices, -1 for empty cells.
    """
    x_max, y_max, z_max = (int(s) for s in spatial_shape)
    n_cells = batch_size * x_max * y_max * z_max
    keys = linearize_coords(coords, spatial_shape, valid)
    n = keys.shape[0]
    safe = jnp.where(keys != INVALID_KEY, keys,
                     n_cells + jnp.arange(n, dtype=keys.dtype))
    rows = jnp.arange(n, dtype=jnp.int32)
    return jnp.full((n_cells,), -1, jnp.int32).at[safe].set(
        rows, mode="drop", unique_indices=True
    )


def lookup_dense(table: jnp.ndarray, query_keys: jnp.ndarray) -> jnp.ndarray:
    """O(1) lookup against :func:`build_dense_row_table` (-1 = miss)."""
    n_cells = table.shape[0]
    oob = (query_keys < 0) | (query_keys >= n_cells) | (query_keys == INVALID_KEY)
    got = table[jnp.clip(query_keys, 0, n_cells - 1)]
    return jnp.where(oob, -1, got)


def unique_compact(keys: jnp.ndarray, capacity: int):
    """Deduplicate keys into a fixed-capacity sorted buffer.

    TPU-native replacement for the atomicCAS window dedup
    (ref: ms_sparse_attention_gpu.cu:117-168): sort, flag first occurrences,
    compact by prefix-sum. Output order is ascending key order — deterministic,
    unlike the reference's atomic arrival order.

    Args:
        keys: (n,) int32 keys, INVALID_KEY for padding.
        capacity: static output size.

    Returns:
        out_keys: (capacity,) int32 unique keys (sorted), INVALID_KEY padded.
        out_valid: (capacity,) bool.
        num_unique: () int32 count of unique valid keys (before truncation).
    """
    sorted_keys = jnp.sort(keys)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    ) & (sorted_keys != INVALID_KEY)
    slot = jnp.cumsum(first) - 1  # position among unique keys
    num_unique = jnp.sum(first).astype(jnp.int32)
    # scatter unique keys to their slot; overflow slots dropped
    dest = jnp.where(first & (slot < capacity), slot, capacity)
    out_keys = jnp.full((capacity,), INVALID_KEY, jnp.int32).at[dest].set(
        sorted_keys, mode="drop"
    )
    out_valid = out_keys != INVALID_KEY
    return out_keys, out_valid, num_unique
