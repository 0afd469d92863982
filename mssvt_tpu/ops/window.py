"""Window partitioning and mixed-scale voxel gathering (TPU-native).

Replaces the three MsSVT CUDA kernels
(ref: pcdet/ops/mssvt/src/ms_sparse_attention_gpu.cu):

- ``window_with_hash_kernel`` (:117-168): non-empty-window dedup via
  atomicCAS/atomicAdd → here a sort + prefix-sum compaction
  (:func:`window_partition`), deterministic ascending-key order.
- ``gather_two_window_voxels_with_hash_kernel`` (:193-350) and the
  one-window variant (:383-433): per-window serial probe over precomputed
  Chebyshev-sorted offset tables filling fixed-capacity ``-1``-padded
  buffers → here one vectorized lookup of (num_windows, num_offsets) keys
  against the sorted index plus a masked cumulative-sum fill
  (:func:`gather_window_voxels`). The cumsum over hits in table order
  reproduces the reference's nearest-first fill exactly.

Query tables are built host-side in numpy (:func:`build_query_tables`),
mirroring ``get_vox_query_table``
(ref: pcdet/models/backbones_3d/mssvt_backbone.py:73-122).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.index import (
    INVALID_KEY,
    VoxelIndex,
    delinearize_key,
    linearize_coords,
    lookup,
    unique_compact,
)

# Buffer ids for the two-window gather
ODD, EVEN, WIN1, WIN2 = 0, 1, 2, 3


@dataclass(frozen=True)
class QueryTables:
    """Precomputed, Chebyshev-sorted gather offset tables (host-side constants).

    ``offsets`` concatenates the per-table offsets in the reference's traversal
    order (odd, even, rest-of-win1, win2-only); ``eligibility[k, j]`` says
    whether offset k feeds output buffer j. The reference walks the four
    tables sequentially with shared win1/win2 fill counters
    (ref: ms_sparse_attention_gpu.cu:227-347); a per-buffer cumsum over
    eligible hits in this concatenated order reproduces that fill exactly.
    """

    offsets: np.ndarray  # (K, 3) int32 xyz offsets from the window center voxel
    eligibility: np.ndarray  # (K, 4) bool for buffers (odd, even, win1, win2)
    num_odd: int
    num_even: int
    single_scale: bool  # True when only win1 exists (one buffer: WIN1)


def _chebyshev_sorted_offsets(size) -> np.ndarray:
    """All cell offsets of a window, centered, sorted nearest-first.

    Mirrors ref: mssvt_backbone.py:76-86 (meshgrid, minus center, stable sort
    by Chebyshev distance).
    """
    xs, ys, zs = (np.arange(s) for s in size)
    grid = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1).reshape(-1, 3)
    center = np.asarray(size, np.int64) // 2
    offsets = grid - center
    cheb = np.abs(offsets).max(axis=-1)
    order = np.argsort(cheb, kind="stable")
    return offsets[order].astype(np.int32)


def build_query_tables(win1_size, win2_size=None, cbs_mode: str = "odd_even") -> QueryTables:
    """Build the gather tables for one block (ref: mssvt_backbone.py:73-122)."""
    win1_size = tuple(int(s) for s in win1_size)
    if win2_size is None:
        offsets = _chebyshev_sorted_offsets(win1_size)
        elig = np.zeros((offsets.shape[0], 4), bool)
        elig[:, WIN1] = True
        return QueryTables(offsets, elig, 0, 0, True)

    win2_size = tuple(int(s) for s in win2_size)
    if any((win2_size[i] - win1_size[i]) % 2 for i in range(3)):
        raise ValueError(f"win2-win1 must be even per dim, got {win1_size}, {win2_size}")

    offsets = _chebyshev_sorted_offsets(win2_size)
    bound_lo = np.array([-(win1_size[i] // 2) for i in range(3)])
    bound_hi = np.array([win1_size[i] // 2 + (1 - win1_size[i] % 2) for i in range(3)])
    in_win1 = np.all((offsets >= bound_lo) & (offsets <= bound_hi), axis=-1)

    if cbs_mode != "odd_even":
        raise NotImplementedError(cbs_mode)
    # Python/torch semantics: (-1) % 2 == 1, so parity is well-defined on
    # negative offsets (ref: mssvt_backbone.py:102-103).
    odd = in_win1 & (offsets[:, 0] % 2 == 1) & (offsets[:, 1] % 2 == 1)
    even = in_win1 & (offsets[:, 0] % 2 == 0) & (offsets[:, 1] % 2 == 0)
    rest1 = in_win1 & ~(odd | even)
    out2 = ~in_win1

    # Concatenate in reference traversal order; keep Chebyshev order within
    # each table (each sub-selection of a sorted list stays sorted).
    parts = [offsets[odd], offsets[even], offsets[rest1], offsets[out2]]
    sizes = [p.shape[0] for p in parts]
    cat = np.concatenate(parts, axis=0)

    elig = np.zeros((cat.shape[0], 4), bool)
    s0, s1, s2, s3 = np.cumsum([0] + sizes[:3]), None, None, None  # noqa: F841
    o_end = sizes[0]
    e_end = o_end + sizes[1]
    r_end = e_end + sizes[2]
    elig[:o_end, ODD] = True
    elig[o_end:e_end, EVEN] = True
    elig[:r_end, WIN1] = True  # odd + even + rest feed the win1 buffer
    elig[:, WIN2] = True  # every table feeds the win2 buffer
    return QueryTables(cat, elig, int(sizes[0]), int(sizes[1]), False)


def window_partition(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    spatial_shape,
    win_size,
    max_windows: int,
):
    """Deduplicate non-empty windows into a fixed-capacity buffer.

    Equivalent of ``get_non_empty_window_center``
    (ref: mssvt_ops.py:29-60 + window_with_hash_kernel), but deterministic:
    windows come out sorted by (batch, x, y, z) key instead of atomic arrival
    order. Returns (win_coords (max_windows, 4) int32 (b,z,y,x) in *window*
    grid units, win_valid mask, new window grid shape, num_windows).
    """
    wx, wy, wz = (int(s) for s in win_size)
    x_max, y_max, z_max = (int(s) for s in spatial_shape)
    win_grid = (x_max // wx, y_max // wy, z_max // wz)

    div = jnp.asarray([1, wz, wy, wx], jnp.int32)
    wcoords = coords // div  # batch col divided by 1
    wkeys = linearize_coords(wcoords, win_grid, valid)
    out_keys, out_valid, num_windows = unique_compact(wkeys, max_windows)
    win_coords = delinearize_key(out_keys, win_grid)
    return win_coords, out_valid, win_grid, num_windows


def _fill_buffer(rows, offsets_b, hit, elig_col, capacity, num_windows):
    """Compact eligible hits (in table order) into a (NW, capacity) buffer.

    Reproduces the serial fixed-capacity fill of the CUDA gather
    (ref: ms_sparse_attention_gpu.cu:238-245): per window, the first
    ``capacity`` eligible hits in offset-table order land in consecutive
    slots; indices pad with -1, coords pad with 0 (matching the reference's
    zero-initialized coord buffers, ref: mssvt_ops.py:82-85).
    """
    nw, k = rows.shape
    elig = hit & elig_col[None, :]
    slot = jnp.cumsum(elig, axis=1) - 1
    keep = elig & (slot < capacity)
    w_ids = jnp.arange(nw, dtype=jnp.int32)[:, None]
    dest = jnp.where(keep, w_ids * capacity + slot, nw * capacity)

    ind = jnp.full((nw * capacity,), -1, jnp.int32)
    ind = ind.at[dest.reshape(-1)].set(rows.reshape(-1), mode="drop")
    coord = jnp.zeros((nw * capacity, 3), jnp.int32)
    coord = coord.at[dest.reshape(-1)].set(offsets_b.reshape(-1, 3), mode="drop")
    return ind.reshape(nw, capacity), coord.reshape(nw, capacity, 3)


def gather_window_voxels(
    win_coords: jnp.ndarray,
    win_valid: jnp.ndarray,
    index: VoxelIndex,
    spatial_shape,
    win1_size,
    tables: QueryTables,
    max_num_win1: int,
    max_num_win2: Optional[int] = None,
    max_num_odd: Optional[int] = None,
    max_num_even: Optional[int] = None,
):
    """Gather voxel rows + relative grid coords for every window, all scales.

    Returns a dict with per-buffer ``(ind, coord, mask)`` where ``ind`` is
    (NW, cap) int32 *global* rows (-1 = empty), ``coord`` is (NW, cap, 3)
    int32 offsets from the window center voxel, ``mask`` is True where the
    slot is EMPTY (matching the reference's ``vox_ind < 0`` convention,
    ref: mssvt_backbone.py:160,180-183).
    """
    offsets = jnp.asarray(tables.offsets)  # (K, 3)
    elig = jnp.asarray(tables.eligibility)  # (K, 4)
    nw = win_coords.shape[0]

    # Window center voxel (ref: ms_sparse_attention_gpu.cu:223-225):
    # center = win_idx * win_size + win_size // 2, per xyz dim.
    ws = jnp.asarray([int(s) for s in win1_size], jnp.int32)
    center_xyz = win_coords[:, [3, 2, 1]] * ws + ws // 2  # (NW, 3) xyz
    cand_xyz = center_xyz[:, None, :] + offsets[None, :, :]  # (NW, K, 3)
    b = jnp.broadcast_to(win_coords[:, :1, None], (nw, offsets.shape[0], 1))
    cand = jnp.concatenate([b[..., 0:1], cand_xyz[..., ::-1]], axis=-1)  # (b,z,y,x)
    keys = linearize_coords(cand, spatial_shape, valid=win_valid[:, None])
    rows = lookup(index, keys)  # (NW, K)
    hit = rows >= 0
    offsets_b = jnp.broadcast_to(offsets[None], (nw, offsets.shape[0], 3))

    def pack(ind, coord):
        return {"ind": ind, "coord": coord, "mask": ind < 0}

    if tables.single_scale:
        ind, coord = _fill_buffer(rows, offsets_b, hit, elig[:, WIN1], max_num_win1, nw)
        return {"win1": pack(ind, coord)}

    assert max_num_win2 is not None
    caps = {
        "odd": tables.num_odd if max_num_odd is None else max_num_odd,
        "even": tables.num_even if max_num_even is None else max_num_even,
        "win1": max_num_win1,
        "win2": max_num_win2,
    }
    cols = {"odd": ODD, "even": EVEN, "win1": WIN1, "win2": WIN2}
    out = {}
    for name, col in cols.items():
        ind, coord = _fill_buffer(rows, offsets_b, hit, elig[:, col], caps[name], nw)
        out[name] = pack(ind, coord)
    return out
