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

import jax
import jax.numpy as jnp
import numpy as np

from ..core.index import (
    INVALID_KEY,
    VoxelIndex,
    build_dense_row_table,
    build_index,
    delinearize_key,
    linearize_coords,
    lookup,
    lookup_dense,
    unique_compact,
    unique_compact_dense,
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
    (ref: ms_sparse_attention_gpu.cu:227-347); a per-buffer rank over
    eligible hits in this concatenated order reproduces that fill exactly.

    ``pos_lut`` is the dense inverse map offset→table-position over the
    bounding box [off_min, off_max] (for the voxel-side gather), -1 where the
    box cell is not in the table.
    """

    offsets: np.ndarray  # (K, 3) int32 xyz offsets from the window center voxel
    eligibility: np.ndarray  # (K, 4) bool for buffers (odd, even, win1, win2)
    num_odd: int
    num_even: int
    single_scale: bool  # True when only win1 exists (one buffer: WIN1)
    off_min: np.ndarray = None  # (3,) int32
    off_max: np.ndarray = None  # (3,) int32
    pos_lut: np.ndarray = None  # (Ox, Oy, Oz) int32


def _with_lut(offsets, elig, num_odd, num_even, single):
    off_min = offsets.min(axis=0)
    off_max = offsets.max(axis=0)
    dims = off_max - off_min + 1
    lut = np.full(tuple(dims), -1, np.int32)
    rel = offsets - off_min
    lut[rel[:, 0], rel[:, 1], rel[:, 2]] = np.arange(len(offsets), dtype=np.int32)
    return QueryTables(offsets, elig, num_odd, num_even, single,
                       off_min.astype(np.int32), off_max.astype(np.int32), lut)


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
        return _with_lut(offsets, elig, 0, 0, True)

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
    o_end = sizes[0]
    e_end = o_end + sizes[1]
    r_end = e_end + sizes[2]
    elig[:o_end, ODD] = True
    elig[o_end:e_end, EVEN] = True
    elig[:r_end, WIN1] = True  # odd + even + rest feed the win1 buffer
    elig[:, WIN2] = True  # every table feeds the win2 buffer
    return _with_lut(cat, elig, int(sizes[0]), int(sizes[1]), False)


def window_partition(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    spatial_shape,
    win_size,
    max_windows: int,
    batch_size: Optional[int] = None,
):
    """Deduplicate non-empty windows into a fixed-capacity buffer.

    Equivalent of ``get_non_empty_window_center``
    (ref: mssvt_ops.py:29-60 + window_with_hash_kernel), but deterministic:
    windows come out sorted by (batch, x, y, z) key instead of atomic arrival
    order. Returns (win_coords (max_windows, 4) int32 (b,z,y,x) in *window*
    grid units, win_valid mask, new window grid shape, num_windows).

    Sort-free: the window key space is small (grid/window volume), so dedup
    is a dense occupancy scatter + cumsum compaction instead of the generic
    sort-based ``unique_compact`` (XLA sorts are the slowest primitive on
    TPU; this path was a top-3 cost in the round-1 profile).
    """
    wx, wy, wz = (int(s) for s in win_size)
    x_max, y_max, z_max = (int(s) for s in spatial_shape)
    win_grid = (x_max // wx, y_max // wy, z_max // wz)
    div = jnp.asarray([1, wz, wy, wx], jnp.int32)
    wcoords = coords // div  # batch col divided by 1
    wkeys = linearize_coords(wcoords, win_grid, valid)
    if batch_size is not None:
        n_cells = batch_size * win_grid[0] * win_grid[1] * win_grid[2]
        out_keys, out_valid, num_windows = unique_compact_dense(
            wkeys, max_windows, n_cells)
    else:  # unknown batch bound → generic sort-based dedup
        out_keys, out_valid, num_windows = unique_compact(wkeys, max_windows)
    win_coords = delinearize_key(out_keys, win_grid)
    return win_coords, out_valid, win_grid, num_windows


def _candidate_window_deltas(win1_size, tables: QueryTables) -> np.ndarray:
    """Static per-dim window-delta ranges covering the gather offset box.

    A voxel with in-window local coordinate ``l`` lies at offset
    ``l - ws*d - ws//2`` from the center of window ``w0 + d``; enumerating all
    integer d with some l mapping into [off_min, off_max] bounds the candidate
    window set (e.g. 3x3x1 = 9 candidates for win1=(3,3,8), win2=(9,9,8)).
    """
    rngs = []
    for dim in range(3):
        w = int(win1_size[dim])
        d_lo = int(np.ceil((0 - w // 2 - int(tables.off_max[dim])) / w))
        d_hi = int(np.floor(((w - 1) - w // 2 - int(tables.off_min[dim])) / w))
        rngs.append(range(d_lo, d_hi + 1))
    return np.asarray(
        [(dx, dy, dz) for dx in rngs[0] for dy in rngs[1] for dz in rngs[2]],
        np.int32,
    )


def gather_window_voxels(
    win_coords: jnp.ndarray,
    win_valid: jnp.ndarray,
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    spatial_shape,
    win1_size,
    tables: QueryTables,
    max_num_win1: int,
    max_num_win2: Optional[int] = None,
    max_num_odd: Optional[int] = None,
    max_num_even: Optional[int] = None,
    batch_size: Optional[int] = None,
    buffers: Optional[Tuple[str, ...]] = None,
):
    """Gather voxel rows + relative grid coords for every window, all scales.

    Voxel-side ("inverse") formulation: instead of probing all |win2| offsets
    of every window against a voxel index (the CUDA kernel's strategy,
    O(num_windows x num_offsets) random lookups), each VOXEL enumerates the
    handful of windows whose gather box contains it (static candidate deltas),
    looks itself up in the much smaller *window* index, and fill slots are
    assigned by one sort + segmented rank over the (voxel, window) candidate
    pairs. Identical fill semantics — per window, hits land in table order —
    measured 5.8s → 0.34s on a 90k-voxel Waymo-scale frame (a dense
    scatter+cumsum fill variant measured 3.4s — see git history).

    Returns a dict with per-buffer ``(ind, coord, mask)`` where ``ind`` is
    (NW, cap) int32 *global* rows (-1 = empty), ``coord`` is (NW, cap, 3)
    int32 offsets from the window center voxel, ``mask`` is True where the
    slot is EMPTY (ref: mssvt_backbone.py:160,180-183).
    """
    ws_np = np.asarray([int(w) for w in win1_size], np.int32)
    deltas = _candidate_window_deltas(win1_size, tables)  # (D, 3) xyz
    d = deltas.shape[0]
    k_total = tables.offsets.shape[0]
    nw = win_coords.shape[0]
    v = coords.shape[0]

    wx, wy, wz = (int(s) for s in win1_size)
    x_max, y_max, z_max = (int(s) for s in spatial_shape)
    win_grid = (x_max // wx, y_max // wy, z_max // wz)

    ws = jnp.asarray(ws_np)
    vox_xyz = coords[:, [3, 2, 1]]
    base_w = jnp.where(valid[:, None], vox_xyz, 0) // ws  # (V, 3)
    cand_w = base_w[:, None, :] + jnp.asarray(deltas)[None]  # (V, D, 3)
    b = jnp.broadcast_to(coords[:, 0:1, None], (v, d, 1))
    cand = jnp.concatenate([b[..., 0:1], cand_w[..., ::-1]], axis=-1)  # bzyx
    wkeys = linearize_coords(cand, win_grid, valid=valid[:, None])
    if batch_size is not None:
        # small window-grid key space → dense O(1) table beats binary search
        win_table = build_dense_row_table(
            win_coords, win_valid, win_grid, batch_size)
        win_row = lookup_dense(win_table, wkeys)  # (V, D)
    else:
        win_index = build_index(win_coords, win_valid, win_grid)
        win_row = lookup(win_index, wkeys)  # (V, D)

    offset = vox_xyz[:, None, :] - (cand_w * ws + ws // 2)  # (V, D, 3) xyz
    rel = offset - jnp.asarray(tables.off_min)
    dims = tables.pos_lut.shape
    in_box = jnp.all((rel >= 0) & (rel < jnp.asarray(dims)), axis=-1)
    rel_c = jnp.clip(rel, 0)
    k = jnp.asarray(tables.pos_lut)[rel_c[..., 0], rel_c[..., 1], rel_c[..., 2]]
    ok = (win_row >= 0) & in_box & (k >= 0) & valid[:, None]

    # Fill-slot assignment WITHOUT a sort. Per window the reference walks the
    # offset table in order k = 0..K-1, appending hits to each buffer until
    # capacity (ms_sparse_attention_gpu.cu:227-347). Equivalent dense form:
    # scatter the candidate hits into a (NW, K) occupancy table ((window,
    # table-position) pairs are unique — one grid cell holds one voxel), take
    # an exclusive cumsum along k per eligibility column (= each hit's rank
    # in its window's traversal), and scatter each candidate straight to its
    # capacity slot. All unique-index scatters + VPU scans; this replaced an
    # 810k-element argsort that dominated the whole backbone (~450ms of a
    # 489ms block at Waymo scale — XLA sort on TPU is a bitonic network).
    big = jnp.iinfo(jnp.int32).max
    # static capacity check (mirrors _check_key_capacity for voxel keys):
    # nw and k_total are trace-time constants, so this is free at runtime
    if nw * k_total >= big:
        raise ValueError(
            f"window entry keys overflow int32: max_windows={nw} x "
            f"k_total={k_total} = {nw * k_total} >= 2**31-1; reduce "
            "max_num_wins or the win2 table size"
        )
    flat_ok = ok.reshape(-1)
    flat_win = win_row.reshape(-1)
    flat_k = jnp.clip(k, 0).reshape(-1)
    n_cand = flat_ok.shape[0]
    cand_ar = jnp.arange(n_cand, dtype=jnp.int32)
    # rejected candidates get DISTINCT out-of-bounds cells so the whole index
    # vector is honestly unique (mode="drop" discards them)
    cell = jnp.where(flat_ok, flat_win * k_total + flat_k,
                     nw * k_total + cand_ar)
    vox_rows = jnp.broadcast_to(
        jnp.arange(v, dtype=jnp.int32)[:, None], (v, d)
    ).reshape(-1)

    occ = jnp.zeros((nw * k_total,), bool).at[cell].set(
        True, mode="drop", unique_indices=True
    ).reshape(nw, k_total)

    elig_tab = jnp.asarray(tables.eligibility)  # (K, 4)
    offs_tab = jnp.asarray(tables.offsets)  # (K, 3)
    # offsets packed into ONE int32 channel (5-bit biased per axis): the
    # (nw*cap, 3) small-table gather was 3x the traffic of a single-channel
    # one; unpacking is free arithmetic
    offs_np = np.asarray(tables.offsets, np.int64)
    assert np.abs(offs_np).max() < 16, "offset exceeds 5-bit packing"
    offs_packed = jnp.asarray(
        (((offs_np[:, 0] + 16) << 10) | ((offs_np[:, 1] + 16) << 5)
         | (offs_np[:, 2] + 16)).astype(np.int32))

    def _unpack_off(p):
        return jnp.stack([
            ((p >> 10) & 31) - 16, ((p >> 5) & 31) - 16, (p & 31) - 16,
        ], axis=-1).astype(jnp.int32)

    cand_elig = elig_tab[flat_k]  # (n_cand, 4)
    cand_off = offs_tab[flat_k]  # (n_cand, 3)

    def _exclusive_scan(x):
        """Exclusive prefix sum along axis 1 by log-step doubling.

        jnp.cumsum lowers to an O(n*window) reduce-window on the TPU lane
        axis; ten shifted adds are cheap VPU passes.
        """
        n = x.shape[1]
        # shift right by 1 → exclusive
        x = jnp.pad(x, ((0, 0), (1, 0)))[:, :n]
        shift = 1
        while shift < n:
            x = x + jnp.pad(x, ((0, 0), (shift, 0)))[:, :n]
            shift *= 2
        return x

    # Scatter/gather ops on TPU are descriptor-rate bound, so minimize the
    # number of scattered/gathered ELEMENTS: (a) build only the buffers the
    # caller consumes (a block needs one chessboard side + win1 + win2, not
    # all four); (b) the per-column ranks ride ONE packed-int gather;
    # (c) each buffer is ONE packed (vox_row, table_k) scatter, with the
    # slot offsets recovered from the tiny (K, 3) table afterwards.
    if tables.single_scale:
        caps = {"win1": max_num_win1}
        cols = {"win1": WIN1}
        names = ("win1",)
    else:
        assert max_num_win2 is not None
        caps = {
            "odd": tables.num_odd if max_num_odd is None else max_num_odd,
            "even": tables.num_even if max_num_even is None else max_num_even,
            "win1": max_num_win1,
            "win2": max_num_win2,
        }
        cols = {"odd": ODD, "even": EVEN, "win1": WIN1, "win2": WIN2}
        names = tuple(buffers) if buffers is not None else (
            "odd", "even", "win1", "win2")

    rank_bits = max(int(np.ceil(np.log2(k_total + 1))), 1)
    k_bits = rank_bits  # same bound: table position < k_total
    pack_vals = (v << k_bits) < jnp.iinfo(jnp.int32).max

    # Derived-buffer fast path: the win2 buffer fills in global table order
    # (odd ks, then even, then rest-of-win1, then out-of-win1), so every
    # other buffer is a CONTIGUOUS RUN of it — odd/win1 are prefixes, even
    # starts at the window's odd count. One scatter + cheap per-window
    # counts replace one scatter + one scan column PER buffer.
    derivable = (
        not tables.single_scale and pack_vals
        and all(int(caps[n]) <= int(caps["win2"]) for n in names)
        and (("even" not in names)
             or int(caps["even"]) + tables.num_odd <= int(caps["win2"]))
    )
    if derivable:
        cap2 = int(caps["win2"])
        rank = _exclusive_scan(occ.astype(jnp.int32)).reshape(-1)[
            jnp.clip(cell, 0, nw * k_total - 1)]
        keep = flat_ok & (rank < cap2)
        dest = jnp.where(keep, flat_win * cap2 + rank, nw * cap2 + cand_ar)
        packed_val = (vox_rows << k_bits) | flat_k
        buf = jnp.full((nw * cap2,), -1, jnp.int32).at[dest].set(
            packed_val, mode="drop", unique_indices=True
        ).reshape(nw, cap2)
        ind2 = jnp.where(buf >= 0, buf >> k_bits, -1)
        slot_k2 = jnp.where(buf >= 0, buf & ((1 << k_bits) - 1), 0)
        coord2 = _unpack_off(offs_packed[slot_k2]) * (buf >= 0)[..., None]

        n_odd, n_even = tables.num_odd, tables.num_even
        odd_cnt = (occ & elig_tab[None, :, ODD]).sum(axis=1)  # (NW,)
        even_cnt = (occ & elig_tab[None, :, EVEN]).sum(axis=1)
        win1_cnt = (occ & elig_tab[None, :, WIN1]).sum(axis=1)

        out = {}
        for name in names:
            cap = int(caps[name])
            j = jnp.arange(cap)
            if name == "win2":
                out[name] = {"ind": ind2, "coord": coord2, "mask": ind2 < 0}
            elif name in ("odd", "win1"):
                cnt = odd_cnt if name == "odd" else win1_cnt
                live = j[None, :] < cnt[:, None]
                ind = jnp.where(live, ind2[:, :cap], -1)
                coord = coord2[:, :cap] * live[..., None]
                out[name] = {"ind": ind, "coord": coord, "mask": ind < 0}
            else:  # even: run starting at the window's odd count
                pos = jnp.clip(odd_cnt[:, None] + j[None, :], 0, cap2 - 1)
                live = j[None, :] < even_cnt[:, None]
                ind = jnp.where(
                    live, jnp.take_along_axis(ind2, pos, axis=1), -1)
                coord = jnp.take_along_axis(
                    coord2, pos[..., None], axis=1) * live[..., None]
                out[name] = {"ind": ind, "coord": coord, "mask": ind < 0}
        return out

    pack_ranks = len(names) * rank_bits <= 31
    if pack_ranks:
        packed = jnp.zeros((nw, k_total), jnp.int32)
        for j, name in enumerate(names):
            hits = occ & elig_tab[None, :, cols[name]]
            packed = packed | (
                _exclusive_scan(hits.astype(jnp.int32)) << (rank_bits * j))
        prank = packed.reshape(-1)[jnp.clip(cell, 0, nw * k_total - 1)]
    else:
        rank_list = []
        for name in names:
            hits = occ & elig_tab[None, :, cols[name]]
            rank_list.append(_exclusive_scan(hits.astype(jnp.int32)).reshape(
                -1)[jnp.clip(cell, 0, nw * k_total - 1)])

    out = {}
    for j, name in enumerate(names):
        capacity = int(caps[name])
        if pack_ranks:
            rank = (prank >> (rank_bits * j)) & ((1 << rank_bits) - 1)
        else:
            rank = rank_list[j]
        keep = flat_ok & cand_elig[:, cols[name]] & (rank < capacity)
        dest = jnp.where(keep, flat_win * capacity + rank,
                         nw * capacity + cand_ar)
        if pack_vals:
            packed_val = (vox_rows << k_bits) | flat_k
            buf = jnp.full((nw * capacity,), -1, jnp.int32).at[dest].set(
                packed_val, mode="drop", unique_indices=True
            ).reshape(nw, capacity)
            ind = jnp.where(buf >= 0, buf >> k_bits, -1)
            slot_k = jnp.where(buf >= 0, buf & ((1 << k_bits) - 1), 0)
            coord = _unpack_off(offs_packed[slot_k]) * (buf >= 0)[..., None]
        else:
            ind = jnp.full((nw * capacity,), -1, jnp.int32).at[dest].set(
                vox_rows, mode="drop", unique_indices=True
            ).reshape(nw, capacity)
            coord = jnp.zeros((nw * capacity, 3), jnp.int32).at[dest].set(
                cand_off, mode="drop", unique_indices=True
            ).reshape(nw, capacity, 3)
        out[name] = {"ind": ind, "coord": coord, "mask": ind < 0}
    return out
