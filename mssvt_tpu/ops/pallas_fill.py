"""Capacity-compaction kernel for window gather buffers (Pallas/TPU).

Input: the *box table* ``box`` of shape (num_windows, K) — for each window,
the voxel row occupying each of its K gather-table cells (-1 = empty), laid
out in the reference's traversal order (Chebyshev-sorted offset tables,
ref: pcdet/ops/mssvt/src/ms_sparse_attention_gpu.cu:227-347). Outputs: the
fixed-capacity fill buffers (num_windows, cap) holding the voxel row and the
5-bit-packed grid offset of each hit in nearest-first order — hit #r of a
window lands in slot r, hits beyond ``cap`` are dropped, exactly the CUDA
kernel's semantics.

Why a kernel: the fill is a per-window stream compaction. The XLA formulation
needs candidate-sized scatters + rank gathers (~4 x 810k descriptor-bound ops,
~47 ms/frame at Waymo scale), and recovering per-slot offsets afterwards costs
another (num_windows x cap)-element gather (~15 ms). Here ranks come from one
MXU dot against a static strictly-upper-triangular matrix, the compaction runs
as a predicated select/max loop over VMEM-resident tiles, and the offset
buffer rides the same predicate against a static per-column offset vector.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 5-bit-biased pack of offset (0, 0, 0) — the padding value for offset
# buffers, so empty slots unpack to zero coordinates (reference zero-padding)
PACK5_ZERO = (16 << 10) | (16 << 5) | 16


def _fill_kernel(*refs, cap, own_slab=None, algo="logshift", perm=False,
                 has_nv=False, row_block=0):
    if has_nv:
        # data-dependent tail skip: window rows are a sorted live PREFIX of
        # the static capacity; blocks past ceil(nv / row_block) emit the
        # empty-fill constants without running the rank dot / fill loop
        nv_ref, *refs = refs
        n_out = 4 if own_slab is not None else 2
        live = pl.program_id(0) * row_block < nv_ref[0]

        @pl.when(live)
        def _run():
            _fill_kernel_body(refs, cap=cap, own_slab=own_slab, algo=algo,
                              perm=perm)

        @pl.when(jnp.logical_not(live))
        def _skip():
            outs = refs[len(refs) - n_out - (2 if algo == "logshift" else 0):]
            vox_ref, offo_ref = outs[0], outs[1]
            vox_ref[:] = jnp.full_like(vox_ref, -1)
            offo_ref[:] = jnp.full_like(offo_ref, PACK5_ZERO)
            if own_slab is not None:
                outs[2][:] = jnp.zeros_like(outs[2])
                outs[3][:] = jnp.zeros_like(outs[3])
        return
    _fill_kernel_body(refs, cap=cap, own_slab=own_slab, algo=algo, perm=perm)


def _fill_kernel_body(refs, *, cap, own_slab=None, algo="logshift",
                      perm=False):
    idx = 3
    box_ref, lt_ref, off_ref = refs[:3]
    if perm:
        pmat_ref, tri_ref = refs[idx:idx + 2]
        idx += 2
    if own_slab is not None:
        elig_ref = refs[idx]
        idx += 1
    if own_slab is None:
        vox_ref, offo_ref = refs[idx:idx + 2]
        idx += 2
    else:
        vox_ref, offo_ref, rank_ref, cnt_ref = refs[idx:idx + 4]
        idx += 4
    scratch = refs[idx:]

    box = box_ref[:]                      # (R, Kp) int32, -1 = empty
    occ = box >= 0
    # exclusive rank of each hit within its row, in table order: one MXU dot
    # with the static strictly-upper-triangular ones matrix
    # (dot(occ, M)[r, k] = sum_{k'} occ[r, k'] M[k', k], M[k', k]=1 iff k'<k).
    # Operands are exact in bf16 (0/1), so the dot runs in the MXU's native
    # bf16 x bf16 -> f32 mode instead of the multi-pass f32 mode.
    occb = occ.astype(jnp.bfloat16)
    if own_slab is not None or algo != "logshift" or not perm:
        rank = jax.lax.dot(
            occb, lt_ref[:],
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

    if own_slab is not None:
        # emit the rank slab at the own-cell columns + the per-buffer counts
        # dot — the XLA inverse-map / counts consumers reuse these instead of
        # re-running the same (R, Kp) x (Kp, Kp) contraction outside
        s0, cv = own_slab
        rank_ref[:] = rank[:, s0:s0 + cv]
        cnt_ref[:] = jax.lax.dot(
            occb, elig_ref[:], preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

    offvec = off_ref[0:1, :]  # (1, Kp) packed offset per table column
    # (TABLE-ordered for logshift, source-ordered for the slots loop)

    if algo == "logshift":
        if perm:
            # ``box`` columns arrive in SOURCE layout (the permutation
            # fold): transport the payload into TABLE layout with three
            # exact bf16-plane MXU dots against the 0/1 permutation matrix
            # (8-bit planes of box+1; voxel rows < 2^24, asserted by the
            # caller), then rank/dist become plain triu quantities in the
            # table frame where the left-pack invariant (dist >= 0,
            # monotone) holds.
            box1 = jnp.where(occ, box + 1, 0)  # 0 = empty
            planes = []
            pmat = pmat_ref[:]
            for b in range(3):
                pl_b = ((box1 >> (8 * b)) & 0xFF).astype(jnp.bfloat16)
                planes.append(jax.lax.dot(
                    pl_b, pmat, preferred_element_type=jnp.float32))
            box_t = (planes[0] + planes[1] * 256.0
                     + planes[2] * 65536.0).astype(jnp.int32) - 1
            occ_t = box_t >= 0
            rank_t = jax.lax.dot(
                occ_t.astype(jnp.bfloat16), tri_ref[:],
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            _fill_logshift(box_t, occ_t, rank_t, offvec, cap,
                           vox_ref, offo_ref, scratch)
        else:
            _fill_logshift(box, occ, rank, offvec, cap, vox_ref, offo_ref,
                           scratch)
        return

    # slot-loop fill: slot j takes the (unique) entry with rank == j;
    # rows are VMEM-resident so each step is a select + lane reduction.
    # Early-exit on the tile's densest window. O(cap) full-width sweeps,
    # each with two cross-lane reductions — superseded by the log-shift
    # pack below (kept for A/B via MSSVT_FILL_ALGO=slots).
    tile_max = jnp.max(jnp.sum(occ.astype(jnp.int32), axis=1))
    vox_ref[:] = jnp.full(vox_ref.shape, -1, jnp.int32)
    offo_ref[:] = jnp.full(offo_ref.shape, PACK5_ZERO, jnp.int32)
    for j in range(cap):
        @pl.when(j < tile_max)
        def _():
            sel = occ & (rank == j)
            vox_ref[:, j] = jnp.max(jnp.where(sel, box, -1), axis=1)
            oc = jnp.max(jnp.where(sel, offvec, -1), axis=1)
            offo_ref[:, j] = jnp.where(oc >= 0, oc, PACK5_ZERO)


def _fill_logshift(box, occ, rank, offvec, cap, vox_ref, offo_ref, scratch):
    """Left-pack occupied columns to their rank position in log2(Kp) steps.

    Bit-plane compaction: every occupied element must move LEFT by
    ``dist = col - rank`` lanes. Process bit s = 0..ceil(log2(Kp))-1; at
    step s the elements whose remaining distance has bit s set hop 2^s
    lanes left (one static lane-roll + selects — no cross-lane reductions).

    Correctness (no collisions, no overtaking): over occupied columns the
    exclusive rank increases by exactly 1 per element, so ``dist`` is
    NON-DECREASING in column order. Inductively every element's remaining
    distance is ≡ 0 (mod 2^s) at step s. Suppose mover B (bit s set) lands
    on stayer A (bit s clear) at column k_A = k_B - 2^s. Monotonicity gives
    dist_B >= dist_A, while B's final slot lying right of A's final slot
    forces dist_B < dist_A + 2^s; with both distances ≡ {2^s, 0} (mod
    2^{s+1}) respectively, dist_B <= dist_A - 2^s — contradiction. Movers
    landing on movers keep their relative order (same hop), and lane
    wrap-around is inert: a column c < 2^s has dist <= c < 2^s, so its bit
    s is clear and the wrapped copy never asserts move-in.

    The payloads travel as TWO planes: the voxel row, and
    ``comb = (packed_offset << 10) | dist`` — the hop subtracts 2^s from
    comb directly (dist occupies the low 10 bits and never borrows into
    the offset field because a mover's dist has bit s set).
    """
    kp = box.shape[1]
    nbits = max((kp - 1).bit_length(), 1)
    assert kp <= (1 << 10), "dist field holds 10 bits"
    col = jax.lax.broadcasted_iota(jnp.int32, box.shape, 1)
    dist = jnp.where(occ, col - rank, 0)
    vox_s, comb_s = scratch
    vox_s[:] = jnp.where(occ, box, -1)
    offr = jnp.broadcast_to(offvec, box.shape)
    comb_s[:] = jnp.where(occ, (offr << 10) | dist, PACK5_ZERO << 10)
    maxd = jnp.max(dist)
    for s in range(nbits):
        @pl.when((1 << s) <= maxd)
        def _():
            v = vox_s[:]
            c = comb_s[:]
            sh = kp - (1 << s)
            sv = pltpu.roll(v, sh, 1)
            sc = pltpu.roll(c, sh, 1)
            move_in = (sv >= 0) & (((sc >> s) & 1) == 1)
            stay = (v >= 0) & (((c >> s) & 1) == 0)
            vox_s[:] = jnp.where(move_in, sv, jnp.where(stay, v, -1))
            comb_s[:] = jnp.where(move_in, sc - (1 << s), c)
    v = vox_s[:, :cap]
    vox_ref[:] = v
    offo_ref[:] = jnp.where(v >= 0, comb_s[:, :cap] >> 10, PACK5_ZERO)


def fill_capacity_buffer(  # call under jit; offs_packed is host-static data
    box: jnp.ndarray,   # (NW, K) int32 voxel rows in table order, -1 empty
    offs_packed: np.ndarray,  # (K,) int32 packed offset per table column
    cap: int,
    row_block: int = 128,
    interpret: bool = False,
    order: np.ndarray = None,  # (K,) table position per box column, or None
    own_slab=None,   # (start_col, cell_vol) to also emit the own-cell ranks
    elig: np.ndarray = None,  # (K, <=8) f32 per-SOURCE-column eligibility
    num_valid: jnp.ndarray = None,  # () int32 live-window prefix count
):
    """Nearest-first capacity fill. Returns ((NW, cap) int32 voxel rows with
    -1 padding, (NW, cap) int32 packed offsets with 0 padding).

    With ``order`` (static), ``box`` columns arrive in an arbitrary source
    layout whose column s holds table position ``order[s]``; the rank matrix
    becomes the order comparison ``order[s'] < order[s]`` instead of triu and
    the offset vector is permuted host-side — the caller's (NW, K) column
    permutation gather disappears (rank/select are column-order agnostic
    because the selected entry per (row, slot) is unique).

    With ``own_slab=(s0, cv)`` the kernel additionally returns the rank slab
    at columns [s0, s0+cv) as (NW, cv) int32 (the voxel->win1-slot inverse
    map reads exactly these — the own-cell columns) and, with ``elig``, the
    per-buffer occupancy counts as (NW, 8) int32 (columns past elig's width
    are zero) — replacing the equivalent XLA contractions that would
    otherwise re-read ``box`` and redo the same (NW, K) x (K, K) dot."""
    nw, k = box.shape
    kp = (-(-k // 128)) * 128  # pad table axis to the lane width
    if kp != k:
        box = jnp.pad(box, ((0, 0), (0, kp - k)), constant_values=-1)
    pad_rows = (-nw) % row_block
    if pad_rows:
        box = jnp.pad(box, ((0, pad_rows), (0, 0)), constant_values=-1)
    nwp = nw + pad_rows

    algo = _os.environ.get("MSSVT_FILL_ALGO", "logshift")
    perm = order is not None and algo == "logshift"
    offv = np.zeros((8, kp), np.int32)
    if order is None:
        lt = jnp.asarray(np.triu(np.ones((kp, kp), np.float32), k=1),
                         jnp.bfloat16)
        offv[0, :k] = np.asarray(offs_packed, np.int32)
    else:
        o = kp + np.arange(kp, dtype=np.int64)  # pad columns rank last
        o[:k] = np.asarray(order, np.int64)
        lt = jnp.asarray((o[:, None] < o[None, :]).astype(np.float32),
                         jnp.bfloat16)
        if perm:  # logshift packs in the TABLE frame: table-ordered offsets
            offv[0, :k] = np.asarray(offs_packed, np.int32)
        else:     # slots loop selects in the source frame
            offv[0, :k] = np.asarray(offs_packed, np.int32)[
                np.asarray(order, np.int64)]
    has_nv = num_valid is not None
    kernel = functools.partial(_fill_kernel, cap=cap, own_slab=own_slab,
                               algo=algo, perm=perm, has_nv=has_nv,
                               row_block=row_block)
    if has_nv:
        def _row(i, nv):
            return (jnp.minimum(
                i, jnp.maximum((nv[0] + row_block - 1) // row_block - 1, 0)),
                0)
        row_spec = pl.BlockSpec((row_block, kp), _row,
                                memory_space=pltpu.VMEM)
        cst = lambda a, b_: pl.BlockSpec((a, b_), lambda i, nv: (0, 0),
                                         memory_space=pltpu.VMEM)
        out = lambda c: pl.BlockSpec((row_block, c), lambda i, nv: (i, 0),
                                     memory_space=pltpu.VMEM)
    else:
        row_spec = pl.BlockSpec((row_block, kp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        cst = lambda a, b_: pl.BlockSpec((a, b_), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM)
        out = lambda c: pl.BlockSpec((row_block, c), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    in_specs = [row_spec, cst(kp, kp), cst(8, kp)]
    out_specs = [out(cap), out(cap)]
    out_shape = [
        jax.ShapeDtypeStruct((nwp, cap), jnp.int32),
        jax.ShapeDtypeStruct((nwp, cap), jnp.int32),
    ]
    operands = [box, lt, jnp.asarray(offv)]
    if perm:
        # 0/1 source->table permutation + table-frame strict upper triangle
        # (both exact in bf16)
        pmat = np.zeros((kp, kp), np.float32)
        pmat[np.arange(k), np.asarray(order, np.int64)] = 1
        operands += [jnp.asarray(pmat, jnp.bfloat16),
                     jnp.asarray(np.triu(np.ones((kp, kp), np.float32),
                                         k=1), jnp.bfloat16)]
        in_specs += [cst(kp, kp)] * 2
    if own_slab is not None:
        cv = int(own_slab[1])
        elig8 = np.zeros((kp, 8), np.float32)
        if elig is not None:
            e = np.asarray(elig, np.float32)
            elig8[:k, :e.shape[1]] = e
        in_specs.append(cst(kp, 8))
        operands.append(jnp.asarray(elig8, jnp.bfloat16))
        out_specs += [out(cv), out(8)]
        out_shape += [
            jax.ShapeDtypeStruct((nwp, cv), jnp.int32),
            jax.ShapeDtypeStruct((nwp, 8), jnp.int32),
        ]
    scratch_shapes = (
        [pltpu.VMEM((row_block, kp), jnp.int32)] * 2
        if algo == "logshift" else []
    )
    if has_nv:
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nwp // row_block,),
                in_specs=in_specs,
                out_specs=tuple(out_specs),
                scratch_shapes=tuple(scratch_shapes),
            ),
            out_shape=tuple(out_shape),
            interpret=interpret,
        )(jnp.asarray(num_valid, jnp.int32).reshape(1), *operands)
    else:
        outs = pl.pallas_call(
            kernel,
            grid=(nwp // row_block,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(*operands)
    return tuple(o[:nw] for o in outs)


def fill_capacity_buffer_xla(box: jnp.ndarray, offs_packed, cap: int,
                             order: np.ndarray = None, own_slab=None,
                             elig: np.ndarray = None):
    """XLA fallback with identical semantics (CPU tests / non-TPU)."""
    extras = ()
    if own_slab is not None:
        s0, cv = (int(v) for v in own_slab)
    if order is not None:
        # source layout -> table order via the static inverse permutation
        # (explicit gather — this path is CPU-only, cost is irrelevant)
        src = np.argsort(np.asarray(order, np.int64))
        box_src = box
        box = box[:, jnp.asarray(src)]
    nw, k = box.shape
    occ = box >= 0
    rank = jnp.cumsum(occ.astype(jnp.int32), axis=1) - occ.astype(jnp.int32)
    if own_slab is not None:
        # rank per SOURCE column = table-order rank taken at order[s]
        rank_src = rank[:, jnp.asarray(np.asarray(order, np.int64))] \
            if order is not None else rank
        rank_own = rank_src[:, s0:s0 + cv]
        cnt = jnp.zeros((nw, 8), jnp.int32)
        if elig is not None:
            e = np.zeros((k, 8), np.float32)
            e[:, :np.asarray(elig).shape[1]] = np.asarray(elig, np.float32)
            occ_f = ((box_src if order is not None else box) >= 0
                     ).astype(jnp.float32)
            cnt = jnp.dot(occ_f, jnp.asarray(e),
                          preferred_element_type=jnp.float32
                          ).astype(jnp.int32)
        extras = (rank_own, cnt)
    offv = jnp.broadcast_to(
        jnp.asarray(np.asarray(offs_packed, np.int32)), box.shape)
    keep = occ & (rank < cap)
    ar = jnp.arange(nw * k, dtype=jnp.int32)
    dest = jnp.where(keep.reshape(-1),
                     (jnp.arange(nw, dtype=jnp.int32)[:, None] * cap
                      + rank).reshape(-1),
                     nw * cap + ar)
    vox = jnp.full((nw * cap,), -1, jnp.int32).at[dest].set(
        box.reshape(-1), mode="drop", unique_indices=True
    ).reshape(nw, cap)
    off = jnp.full((nw * cap,), PACK5_ZERO, jnp.int32).at[dest].set(
        offv.reshape(-1), mode="drop", unique_indices=True
    ).reshape(nw, cap)
    return (vox, off) + extras
