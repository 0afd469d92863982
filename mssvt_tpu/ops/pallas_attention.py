"""Fused per-window multi-head attention kernel (Pallas/TPU).

Replaces the XLA einsum chain inside ``MixedScaleAttention``
(models/model_utils/attention.py) for inference. The reference computes this
attention as per-head batched matmuls (ref: pcdet/models/model_utils/
mssvt_utils.py:88-157); with ~24k windows of nq=32 queries x nk=32 keys x
32-dim heads those lower to MXU-hostile tiny batched GEMMs with ~8 HBM
round-trips of ~100 MB intermediates (~24 ms/frame measured at Waymo scale),
and the per-group projection slicing around them measured another ~70 ms of
pure data movement.

Kernel strategy — everything from the q/k/v projections to the output
projection fuses into one pass per window supertile; every step is a
full-width 2D MXU op (Mosaic punishes both per-window unrolls, which explode
compile time, and per-window ``fori_loop`` bodies, which serialize at ~20 us
per iteration):

- WB windows form one supertile. Raw queries/keys are flat 2D ``(WB*n, D)``
  slabs (pure reshapes outside the kernel); q/k/v/out projections are
  BLOCK-DIAGONAL (D, D) weight matrices (assembled from the per-group Dense
  params) applied in VMEM — keys are read from HBM once for both K and V.
- Per head t (static python unroll): score its channel slice of Q against
  the same slice of K over ALL supertile keys, ``S_t = Q[:, sl] K[:, sl]^T``
  — an iota mask confines each row to its own window's group-g(t) key
  stripe (-1e9 elsewhere), so softmax is plain ROW-WISE (each row has
  exactly one valid stripe). ``O_t = A_t V[:, sl]``; per-head outputs
  concatenate along lanes in head order, which IS the output channel
  layout. Then ``out = O Wp + bp``.

An earlier formulation expanded K/V per head through a static replication
matrix (``Kexp = (P K) * M``) with block-sum-matmul softmax; the expansion
dots were >50% of kernel MACs — the per-head slicing removes them and the
BS2 denominators entirely (same results, kernel-measured ~2x fewer MACs).

Head layout contract (matches MixedScaleAttention): channels are
[group0 head0 | group0 head1 | group1 head0 | ...] with a uniform per-head
width; keys are [group0 nk | group1 nk | ...] with uniform nk per group.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KEY_PAD_NEG = -100.0


def _head_layout(num_heads: Sequence[int], embed_dim: int, nk_tot: int):
    groups = len(num_heads)
    tot_heads = sum(num_heads)
    per_head = embed_dim // tot_heads
    nk = nk_tot // groups
    key_block = []  # group index per global head
    for g, h in enumerate(num_heads):
        key_block += [g] * h
    return tot_heads, per_head, nk, tuple(key_block)


import os as _os

# Kernel variant for the per-head attention core (see _per_head_attn):
#   slice — per-head LANE-SLICED q/k/v dots (fewest MACs on paper, but
#           32-wide lane slices force Mosaic relayouts and K=32 MXU passes)
#   mask  — per-head channel-MASKED full-width dots (full-width operands,
#           K=128 contraction, mask is free VPU)
#   b3d   — BATCHED per-window dots: the window axis stays a dot_general
#           batch dim, so scores are exactly (WB, nq, nk_tot) instead of the
#           flat-slab (WB*nq, WB*nk_tot) whose off-diagonal 1-1/WB fraction
#           is pure masked waste in both MXU MACs and VPU softmax area
#           (the waste is why wb=16 regressed in the flat form)
# (A head-stacked variant — all heads' group-sliced channel-masked keys
#  stacked along the key axis, 3 batched dots total, ~25% fewer MACs at
#  H=4 — was pruned after TYING its e2e A/B: sync 54.68 vs 54.55,
#  pipelined 46.31 vs 46.49 ms/frame. The kernel is HBM-bound, so MAC
#  cuts don't move e2e time. See git history for the core.)
# Selected once at import; override with MSSVT_ATTN_VARIANT for A/B runs.
# qstk default since r5: the non-assembled kernel now runs only on the
# training forward, where qstk@32 measured 451.7 -> 446.2 ms/step.
ATTN_VARIANT = _os.environ.get("MSSVT_ATTN_VARIANT", "qstk")
# Supertile width override for A/B runs (0 = use the call-site default).
ATTN_WB = int(_os.environ.get("MSSVT_ATTN_WB", "0"))
# The ASSEMBLED (inference-only) kernel picks its own point: qstk@64 beat
# b3d@32 17.85 -> 14.91 ms/kernel at block-0 Waymo shapes
# (tools/bench_attn_kernel.py, 2026-08-21; those microbench absolutes are
# ~2x optimistic — an XLA-CSE rep bug halved them, since fixed — but both
# variants were halved equally and the full-model A/B confirmed the
# direction: pipelined 38.2 -> 37.7 ms/frame). The head-stacked M=H*nq
# score dot fills all 128 sublanes where b3d's per-head M=nq=32 uses a
# quarter; wb=128 exceeds the 16 MB scoped-VMEM limit.
# MSSVT_ATTN_VARIANT/_WB still override for A/B; a b3d override keeps the
# historical @32 point so old numbers stay comparable.
ATTN_ASM_VARIANT = _os.environ.get(
    "MSSVT_ATTN_VARIANT", _os.environ.get("MSSVT_ATTN_VARIANT_ASM", "qstk"))
ATTN_ASM_WB = (int(_os.environ.get("MSSVT_ATTN_WB", "0"))
               or (64 if ATTN_ASM_VARIANT == "qstk" else 32))
# The assembled BACKWARD holds the forward's working set plus the cotangent
# slabs; wb=64 overflows the 16 MB scoped VMEM by ~0.7 MB, wb=32 fits.
ATTN_ASM_BWD_WB = int(_os.environ.get("MSSVT_ATTN_ASM_BWD_WB", "32"))
# The backward kernel picks its own (variant, supertile) point. History:
# b3d@32 regressed the r2-era train step 2557 -> 3076 ms (VMEM crowding at
# WB=32), so rounds 2-4 ran flat mask@8 — whose (WB*nq, WB*nk) score dots
# waste 7/8 of their MACs off the block diagonal. Re-measured 2026-08-21
# after the batch-transfer fix exposed device time: b3d@16 takes the full
# train step 526.1 -> 476.8 ms (block-0 bwd kernel was 79 ms/step of the
# 494 ms device total at mask@8), and the query-stacked backward
# (_bwd_qstk: the whole per-head chain as five batched dots at M=H*nq)
# takes it to 451.7 ms — qstk@16 is the default.
ATTN_BWD_VARIANT = _os.environ.get("MSSVT_ATTN_BWD_VARIANT", "qstk")
ATTN_BWD_WB = int(_os.environ.get("MSSVT_ATTN_BWD_WB", "16"))


def _per_head_attn_qstk(q, k, v, bias3, num_heads, wb, nq, nk_tot, scale,
                        bf):
    """Query-stacked fwd core: ONE score dot and ONE value dot at M = H*nq.

    The b3d core runs one (nq, nk_tot) x (nk_tot, D) dot PER HEAD with
    M = nq rows — at nq=32 each batched MXU instance uses a quarter of the
    sublanes (in-kernel utilization ~21%, xplane 2026-08-19). Here the H
    heads' channel-masked queries stack along the ROW axis (VPU masks +
    sublane concat, no relayout), so scores and values each run as ONE
    batched dot with M = H*nq = 128 full-height MXU instances — identical
    MAC count, 4x the sublane occupancy. Per-head validity/softmax become
    static row-block masks. Inference fwd only (returns no bwd cache).
    """
    d = q.shape[1]
    tot_heads = sum(num_heads)
    ph = d // tot_heads
    nk = nk_tot // len(num_heads)
    key_block = []
    for g, h in enumerate(num_heads):
        key_block += [g] * h
    rows = tot_heads * nq
    q3 = q.reshape(wb, nq, d)
    k3 = k.reshape(wb, nk_tot, d)
    v3 = v.reshape(wb, nk_tot, d)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2)
    mhs = [(lane >= t * ph) & (lane < (t + 1) * ph)
           for t in range(tot_heads)]
    # stacked channel-masked queries: rows [t*nq, (t+1)*nq) hold head t
    q_stk = jnp.concatenate([q3 * m.astype(bf) for m in mhs], axis=1)
    s = jax.lax.dot_general(
        q_stk, k3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (wb, rows, nk_tot)
    rr = jax.lax.broadcasted_iota(jnp.int32, (1, rows, nk_tot), 1) // nq
    kg = jax.lax.broadcasted_iota(jnp.int32, (1, rows, nk_tot), 2) // nk
    valid = None
    for t, g in enumerate(key_block):
        vt = (rr == t) & (kg == g)
        valid = vt if valid is None else (valid | vt)
    s = jnp.where(valid, s * scale + bias3, -1e9)
    e = jnp.exp(s - jnp.max(s, axis=2, keepdims=True))
    a = e / (jnp.sum(e, axis=2, keepdims=True) + 1e-30)
    o_stk = jax.lax.dot_general(
        a.astype(bf), v3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (wb, rows, D)
    o_sum = None
    for t, m in enumerate(mhs):
        ot = jnp.where(m, o_stk[:, t * nq:(t + 1) * nq, :], 0.0)
        o_sum = ot if o_sum is None else o_sum + ot
    # cache: the stacked attention map + the operands _bwd_qstk reuses —
    # ONE implementation of the stacking/mask/softmax scheme (the backward
    # previously duplicated these ~25 lines)
    return o_sum.reshape(wb * nq, d), [(a, q_stk, mhs)]


def _per_head_attn_b3d(q, k, v, bias3, num_heads, wb, nq, nk_tot, scale, bf):
    """Batched-window fwd core: scores via batch-dim dot_general.

    q/k/v arrive as flat (WB*n, D) slabs; reshaped (sublane-split only, no
    relayout) to (WB, n, D). Per head t the full-width channel-masked dot
    runs with the window axis as the MXU batch dim — per-window (nq, nk_tot)
    scores, softmax over the 64-lane key axis, no cross-window columns.

    Returns (o (WB*nq, D) f32, per-head cache [(a3, None)] for bwd reuse).
    """
    d = q.shape[1]
    tot_heads = sum(num_heads)
    ph = d // tot_heads
    nk = nk_tot // len(num_heads)
    key_block = []
    for g, h in enumerate(num_heads):
        key_block += [g] * h
    q3 = q.reshape(wb, nq, d)
    k3 = k.reshape(wb, nk_tot, d)
    v3 = v.reshape(wb, nk_tot, d)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2)
    kg = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nk_tot), 2) // nk
    o_sum = None
    cache = []
    for t, g in enumerate(key_block):
        mh = ((lane >= t * ph) & (lane < (t + 1) * ph)).astype(bf)
        s = jax.lax.dot_general(
            q3 * mh, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (WB, nq, nk_tot)
        valid = kg == g
        s = jnp.where(valid, s * scale + bias3, -1e9)
        e = jnp.exp(s - jnp.max(s, axis=2, keepdims=True))
        a = e / (jnp.sum(e, axis=2, keepdims=True) + 1e-30)
        ot = jax.lax.dot_general(
            a.astype(bf), v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (WB, nq, D)
        ot = jnp.where((lane >= t * ph) & (lane < (t + 1) * ph), ot, 0.0)
        o_sum = ot if o_sum is None else o_sum + ot
        cache.append((a, valid))
    return o_sum.reshape(wb * nq, d), cache


def _per_head_attn(q, k, v, bias_row, num_heads, nq, nk_tot, scale, bf):
    """Shared fwd core: per-head attention over the supertile key slab.

    Replaces the earlier P-matrix key replication (Kexp/Vexp dots were >50%
    of kernel MACs and the block-sum softmax needed two more): head t scores
    its channel slice of q against the same slice of k over all supertile
    keys, an iota mask confines each row to its own window's group stripe,
    softmax is plain row-wise, and per-head outputs land in their channel
    slice of the output.

    Returns (o (M, D) f32, per-head list of (a, mask) for reuse by bwd).
    """
    tot_heads = sum(num_heads)
    ph = q.shape[1] // tot_heads
    nk = nk_tot // len(num_heads)
    key_block = []
    for g, h in enumerate(num_heads):
        key_block += [g] * h
    m, n = q.shape[0] // 1, k.shape[0]
    rw = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0) // nq
    ci = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    cw = ci // nk_tot
    cg = (ci % nk_tot) // nk
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, q.shape[1]), 1)
    outs, cache = [], []
    o_sum = None
    for t, g in enumerate(key_block):
        sl = slice(t * ph, (t + 1) * ph)
        if ATTN_VARIANT == "slice":
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (M, N)
        else:
            mh = ((lane >= t * ph) & (lane < (t + 1) * ph)).astype(bf)
            s = jax.lax.dot_general(
                q * mh, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (M, N), full-width
        valid = (rw == cw) & (cg == g)
        s = jnp.where(valid, s * scale + bias_row, -1e9)
        e = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
        a = e / (jnp.sum(e, axis=1, keepdims=True) + 1e-30)
        if ATTN_VARIANT == "slice":
            outs.append(jax.lax.dot(a.astype(bf), v[:, sl],
                                    preferred_element_type=jnp.float32))
        else:
            mh = ((lane >= t * ph) & (lane < (t + 1) * ph))
            ot = jax.lax.dot(a.astype(bf), v,
                             preferred_element_type=jnp.float32)
            ot = jnp.where(mh, ot, 0.0)
            o_sum = ot if o_sum is None else o_sum + ot
        cache.append((a, valid))
    o = jnp.concatenate(outs, axis=1) if ATTN_VARIANT == "slice" else o_sum
    return o, cache


def _attn_kernel(q_ref, k_ref, bias_ref, w_ref, b_ref, o_ref,
                 num_heads, wb, nq, nk_tot, scale, out_dtype, compute_dtype,
                 variant):
    bf = compute_dtype
    wq, wk, wv, wp = (w_ref[i] for i in range(4))  # (D, D) each
    bq, bk, bv, bp = (b_ref[i:i + 1, :] for i in range(4))  # (1, D)

    kraw = k_ref[:]
    q = (jax.lax.dot(q_ref[:], wq, preferred_element_type=jnp.float32)
         + bq).astype(bf)  # (WB*nq, D)
    k = (jax.lax.dot(kraw, wk, preferred_element_type=jnp.float32)
         + bk).astype(bf)  # (WB*nkt, D)
    v = (jax.lax.dot(kraw, wv, preferred_element_type=jnp.float32)
         + bv).astype(bf)

    if variant in ("b3d", "qstk"):
        bias3 = bias_ref[:][:, None, :].astype(jnp.float32)  # (WB, 1, nk_tot)
        core = (_per_head_attn_qstk if variant == "qstk"
                else _per_head_attn_b3d)
        o, _ = core(q, k, v, bias3, num_heads, wb, nq, nk_tot,
                    float(scale), bf)
    else:
        bias_row = bias_ref[0, 0:1].astype(jnp.float32)  # (1, WB*nk_tot)
        o, _ = _per_head_attn(q, k, v, bias_row, num_heads, nq, nk_tot,
                              float(scale), bf)
    o = jax.lax.dot(o.astype(bf), wp, preferred_element_type=jnp.float32) + bp
    o_ref[:] = o.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "scale", "window_block", "interpret", "compute_dtype"
    ),
)
def fused_window_attention(
    query: jnp.ndarray,   # (NW, nq, D) RAW (pre-projection)
    keys: jnp.ndarray,    # (NW, nk_tot, D) RAW
    proj: Tuple[jnp.ndarray, ...],  # (wq, bq, wk, bk, wv, bv, wp, bp)
    key_bias: jnp.ndarray,  # (NW, nk_tot) additive (e.g. -100 where padded)
    num_heads: Tuple[int, ...],
    scale: float,
    window_block: int = 32,  # b3d@32: 3.6ms vs flat-mask@8: 8.9ms (same-
                             # session A/B; flat form regressed beyond wb=8)
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fully-fused window attention:
    ``out = softmax(q@Wq (kexp@Wk)^T * scale + bias) @ (v@Wv) @ Wp`` with the
    block-diagonal head structure of MixedScaleAttention.

    ``compute_dtype`` is the in-kernel matmul dtype; callers thread the
    module dtype so an fp32-configured model keeps fp32 accuracy (softmax
    statistics are always fp32).

    Differentiable: a custom VJP recomputes the attention in VMEM in a
    mirrored Pallas backward kernel (see ``_attn_bwd_kernel``), so training
    runs the same fused fast path as inference — the reference likewise
    trains through its CUDA kernels (ref: ms_sparse_attention_gpu.cu
    backward kernels, group_features_gpu.cu:46-106). ``key_bias`` gets a
    zero cotangent (it is a mask, produced from boolean inputs)."""
    return _fused_attention(query, keys, tuple(proj), key_bias,
                            tuple(num_heads), float(scale),
                            int(ATTN_WB or window_block), bool(interpret),
                            compute_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused_attention(query, keys, proj, key_bias, num_heads, scale,
                     window_block, interpret, compute_dtype):
    return _fused_attention_fwd_impl(
        query, keys, proj, key_bias, num_heads, scale, window_block,
        interpret, compute_dtype)


def _fused_attention_fwd(query, keys, proj, key_bias, num_heads, scale,
                         window_block, interpret, compute_dtype):
    out = _fused_attention_fwd_impl(
        query, keys, proj, key_bias, num_heads, scale, window_block,
        interpret, compute_dtype)
    return out, (query, keys, proj, key_bias)


def _fused_attention_bwd(num_heads, scale, window_block, interpret,
                         compute_dtype, res, g):
    query, keys, proj, key_bias = res
    dq, dk, dproj = _fused_attention_bwd_impl(
        query, keys, proj, key_bias, g, num_heads, scale, window_block,
        interpret, compute_dtype)
    return dq, dk, dproj, jnp.zeros_like(key_bias)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def _prep_inputs(query, keys, key_bias, proj, num_heads, wb, compute_dtype,
                 variant):
    """Shared fwd/bwd preprocessing: pad to the supertile, flatten to 2D
    slabs, expand bias to per-head columns, stack projection weights."""
    nw, nq, d = query.shape
    nk_tot = keys.shape[1]
    tot_heads, per_head, nk, _ = _head_layout(num_heads, d, nk_tot)
    nt = tot_heads * nk
    assert per_head * tot_heads == d and nk * len(num_heads) == nk_tot

    pad = (-nw) % wb
    if pad:
        query = jnp.pad(query, ((0, pad), (0, 0), (0, 0)))
        keys = jnp.pad(keys, ((0, pad), (0, 0), (0, 0)))
        key_bias = jnp.pad(key_bias, ((0, pad), (0, 0)))
    nwp = nw + pad

    bf = compute_dtype
    q2 = query.astype(bf).reshape(nwp * nq, d)
    k2 = keys.astype(bf).reshape(nwp * nk_tot, d)
    wq, bq, wk, bk, wv, bv, wp, bp = proj
    wmats = jnp.stack([wq, wk, wv, wp]).astype(bf)  # (4, D, D)
    bvec = jnp.stack([bq, bk, bv, bp]).astype(bf)   # (4, D)
    bvec = jnp.pad(bvec, ((0, 4), (0, 0)))          # (8, D) sublane tile

    if variant in ("b3d", "qstk"):
        # batched form reads the bias as (wb, nk_tot) sublane-tiled rows
        bias2 = key_bias.astype(jnp.float32).reshape(nwp, nk_tot)
    else:
        # (G, 8, wb*nk_tot) with the real per-key bias in sublane row 0: a
        # (1, 1, N) block spec is legal but made Mosaic compile time explode
        # with the grid size (~6.5 min at 6000 steps); an (8, N)-tiled
        # trailing block compiles in seconds. Rows 1..7 are never read.
        bias2 = jnp.zeros((nwp // wb, 8, wb * nk_tot), jnp.float32).at[
            :, 0, :].set(
            key_bias.astype(jnp.float32).reshape(nwp // wb, wb * nk_tot))

    dims = dict(nw=nw, nwp=nwp, nq=nq, d=d, nk_tot=nk_tot, nt=nt,
                tot_heads=tot_heads)
    return q2, k2, bias2, wmats, bvec, dims


def _common_specs(wb, nq, nk_tot, d, variant):
    if variant in ("b3d", "qstk"):
        bias_spec = pl.BlockSpec((wb, nk_tot), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    else:
        bias_spec = pl.BlockSpec((1, 8, wb * nk_tot), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    return [
        pl.BlockSpec((wb * nq, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wb * nk_tot, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        bias_spec,
        pl.BlockSpec((4, d, d), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, d), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _fused_attention_fwd_impl(query, keys, proj, key_bias, num_heads, scale,
                              window_block, interpret, compute_dtype):
    wb = window_block
    variant = ATTN_VARIANT
    q2, k2, bias2, wmats, bvec, dm = _prep_inputs(
        query, keys, key_bias, proj, num_heads, wb, compute_dtype, variant)
    nwp, nq, d = dm["nwp"], dm["nq"], dm["d"]

    kernel = functools.partial(
        _attn_kernel, num_heads=tuple(num_heads), wb=wb, nq=nq,
        nk_tot=dm["nk_tot"], scale=float(scale),
        out_dtype=query.dtype, compute_dtype=compute_dtype,
        variant=variant,
    )
    in_specs = _common_specs(wb, nq, dm["nk_tot"], d, variant)
    args = [q2, k2, bias2, wmats, bvec]
    out_rows = nq
    out = pl.pallas_call(
        kernel,
        grid=(nwp // wb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wb * out_rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nwp * out_rows, d), query.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(nwp, out_rows, d)[:dm["nw"]]


def _attn_bwd_kernel(q_ref, k_ref, bias_ref, w_ref, b_ref, *rest,
                     num_heads, wb, nq, nk_tot, scale, compute_dtype,
                     variant):
    """Mirror of ``_attn_kernel``: recompute the attention in VMEM, then run
    the chain rule backwards (per head, channel-sliced like the forward).
    Weight/bias grads accumulate across the sequential TPU grid into a
    single (4, D, D)/(8, D) output block."""
    bf = compute_dtype
    wq, wk, wv, wp = (w_ref[i] for i in range(4))
    bq, bk, bv, bp = (b_ref[i:i + 1, :] for i in range(4))

    qraw = q_ref[:]
    kraw = k_ref[:]
    q = (jax.lax.dot(qraw, wq, preferred_element_type=jnp.float32)
         + bq).astype(bf)
    k = (jax.lax.dot(kraw, wk, preferred_element_type=jnp.float32)
         + bk).astype(bf)
    v = (jax.lax.dot(kraw, wv, preferred_element_type=jnp.float32)
         + bv).astype(bf)
    g_ref, dq_ref, dk_ref, dw_ref, db_ref = rest

    if variant == "qstk":
        # query-stacked backward: the whole per-head chain runs as FIVE
        # batched dots at M = H*nq (full sublane occupancy), mirroring the
        # qstk forward — vs 6 small dots PER HEAD in the b3d form
        bias3 = bias_ref[:][:, None, :].astype(jnp.float32)
        _bwd_qstk(q, k, v, bias3, g_ref[:].astype(bf), num_heads, wb, nq,
                  nk_tot, float(scale), bf, qraw, kraw,
                  (wq, wk, wv, wp), dq_ref, dk_ref, dw_ref, db_ref)
        return
    if variant == "b3d":
        bias3 = bias_ref[:][:, None, :].astype(jnp.float32)
        o1, cache = _per_head_attn_b3d(q, k, v, bias3, num_heads, wb, nq,
                                       nk_tot, float(scale), bf)
    else:
        bias_row = bias_ref[0, 0:1].astype(jnp.float32)
        o1, cache = _per_head_attn(q, k, v, bias_row, num_heads, nq, nk_tot,
                                   float(scale), bf)

    g = g_ref[:].astype(bf)  # (M, D)
    # output projection
    do1 = jax.lax.dot_general(  # g @ wp^T
        g, wp, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(bf)
    dwp = jax.lax.dot_general(  # o1^T @ g
        o1.astype(bf), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbp = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    # per-head attention backward (same variant dichotomy as the forward)
    tot_heads = sum(num_heads)
    ph = q.shape[1] // tot_heads
    d_ = q.shape[1]
    if variant == "b3d":
        # batched chain: cache holds (wb, nq, nk_tot) attention maps
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d_), 2)
        q3 = q.reshape(wb, nq, d_)
        k3 = k.reshape(wb, nk_tot, d_)
        v3 = v.reshape(wb, nk_tot, d_)
        do3 = do1.reshape(wb, nq, d_)
        dq_sum = dk_sum = dv_sum = None
        for t, (a3, _valid) in enumerate(cache):
            mh = (lane3 >= t * ph) & (lane3 < (t + 1) * ph)
            do_t = jnp.where(mh, do3, 0).astype(bf)  # (wb, nq, D)
            da = jax.lax.dot_general(  # do_t @ v^T per window
                do_t, v3, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (wb, nq, nk_tot)
            dv_t = jax.lax.dot_general(  # a^T @ do_t per window
                a3.astype(bf), do_t, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (wb, nk_tot, D)
            rs = jnp.sum(da * a3, axis=2, keepdims=True)
            ds = (a3 * (da - rs) * scale).astype(bf)  # (wb, nq, nk_tot)
            dq_t = jnp.where(mh, jax.lax.dot_general(
                ds, k3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32), 0.0)  # (wb, nq, D)
            dk_t = jax.lax.dot_general(  # ds^T @ (q masked) per window
                ds, jnp.where(mh, q3, 0).astype(bf),
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (wb, nk_tot, D)
            dq_sum = dq_t if dq_sum is None else dq_sum + dq_t
            dk_sum = dk_t if dk_sum is None else dk_sum + dk_t
            dv_sum = dv_t if dv_sum is None else dv_sum + dv_t
        dq_p = dq_sum.reshape(wb * nq, d_)
        dk_p = dk_sum.reshape(wb * nk_tot, d_)
        dv_p = dv_sum.reshape(wb * nk_tot, d_)
        _finish_bwd(qraw, kraw, q, wq, wk, wv, dq_p, dk_p, dv_p, dwp, dbp,
                    dq_ref, dk_ref, dw_ref, db_ref, bf)
        return
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, q.shape[1]), 1)
    dq_parts, dk_parts, dv_parts = [], [], []
    dq_sum = dk_sum = dv_sum = None
    for t, (a, _valid) in enumerate(cache):
        sl = slice(t * ph, (t + 1) * ph)
        if ATTN_VARIANT == "slice":
            do_t = do1[:, sl]  # (M, ph)
            da = jax.lax.dot_general(  # do_t @ v_sl^T
                do_t, v[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (M, N)
            dv_parts.append(jax.lax.dot_general(  # a^T @ do_t
                a.astype(bf), do_t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))  # (N, ph)
            rs = jnp.sum(da * a, axis=1, keepdims=True)
            ds = (a * (da - rs) * scale).astype(bf)  # (M, N); 0 off-stripe
            dq_parts.append(jax.lax.dot(
                ds, k[:, sl], preferred_element_type=jnp.float32))  # (M, ph)
            dk_parts.append(jax.lax.dot_general(  # ds^T @ q_sl
                ds, q[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))  # (N, ph)
            continue
        mh = ((lane >= t * ph) & (lane < (t + 1) * ph))
        do_t = jnp.where(mh, do1, 0).astype(bf)  # (M, D) masked full-width
        da = jax.lax.dot_general(  # do_t @ v^T (zeros off-slice make it v_sl)
            do_t, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (M, N)
        dv_t = jax.lax.dot_general(  # a^T @ do_t — cols masked already
            a.astype(bf), do_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (N, D)
        rs = jnp.sum(da * a, axis=1, keepdims=True)
        ds = (a * (da - rs) * scale).astype(bf)  # (M, N)
        dq_t = jnp.where(mh, jax.lax.dot(
            ds, k, preferred_element_type=jnp.float32), 0.0)  # (M, D)
        dk_t = jax.lax.dot_general(  # ds^T @ (q masked)
            ds, jnp.where(mh, q, 0).astype(bf), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (N, D)
        dq_sum = dq_t if dq_sum is None else dq_sum + dq_t
        dk_sum = dk_t if dk_sum is None else dk_sum + dk_t
        dv_sum = dv_t if dv_sum is None else dv_sum + dv_t
    if ATTN_VARIANT == "slice":
        dq_p = jnp.concatenate(dq_parts, axis=1)  # (M, D)
        dk_p = jnp.concatenate(dk_parts, axis=1)  # (N, D)
        dv_p = jnp.concatenate(dv_parts, axis=1)  # (N, D)
    else:
        dq_p, dk_p, dv_p = dq_sum, dk_sum, dv_sum
    _finish_bwd(qraw, kraw, q, wq, wk, wv, dq_p, dk_p, dv_p, dwp, dbp,
                dq_ref, dk_ref, dw_ref, db_ref, bf)


def _bwd_qstk_core(q, k, v, bias3, g, num_heads, wb, nq, nk_tot, scale, bf,
                   wp):
    """Query-stacked attention-core backward (see _per_head_attn_qstk for
    the stacking scheme). Recomputes the stacked attention map through the
    SHARED qstk forward, then runs the chain rule entirely in the stacked
    frame:

      dv = a_stk^T @ do_stk   (contraction over rows sums the per-head
                               a_t^T do_t terms exactly — rows of head t
                               only pair with rows of head t)
      ds = a * (da - rowsum(da * a)) * scale
      dq = unstack-mask-sum(ds @ k);  dk = ds^T @ q_stk  (q_stk pre-masked)

    Returns (dq_p, dk_p, dv_p, dwp, dbp) — the cotangents of the PROJECTED
    q/k/v plus the output-projection grads. Shared by the plain and the
    assembled backward kernels."""
    d = q.shape[1]
    o1, ((a, q_stk, mhs),) = _per_head_attn_qstk(
        q, k, v, bias3, num_heads, wb, nq, nk_tot, scale, bf)
    k3 = k.reshape(wb, nk_tot, d)
    v3 = v.reshape(wb, nk_tot, d)
    ab = a.astype(bf)

    # backprop through the output projection first: do1 = g @ wp^T
    do1 = jax.lax.dot_general(
        g, wp, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(bf)  # (wb*nq, d)
    do3 = do1.reshape(wb, nq, d)
    do_stk = jnp.concatenate([jnp.where(m, do3, 0).astype(bf) for m in mhs],
                             axis=1)  # (wb, rows, d)
    dwp = jax.lax.dot_general(  # o1^T @ g (o1 from the shared core)
        o1.astype(bf), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbp = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    da = jax.lax.dot_general(
        do_stk, v3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (wb, rows, nk_tot)
    dv3 = jax.lax.dot_general(
        ab, do_stk, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (wb, nk_tot, d)
    rs = jnp.sum(da * a, axis=2, keepdims=True)
    ds = (a * (da - rs) * scale).astype(bf)  # (wb, rows, nk_tot)
    dq_stk = jax.lax.dot_general(
        ds, k3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (wb, rows, d)
    dq_sum = None
    for t, m in enumerate(mhs):
        dt = jnp.where(m, dq_stk[:, t * nq:(t + 1) * nq, :], 0.0)
        dq_sum = dt if dq_sum is None else dq_sum + dt
    dk3 = jax.lax.dot_general(
        ds, q_stk, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (wb, nk_tot, d)
    dq_p = dq_sum.reshape(wb * nq, d)
    dk_p = dk3.reshape(wb * nk_tot, d)
    dv_p = dv3.reshape(wb * nk_tot, d)
    return dq_p, dk_p, dv_p, dwp, dbp


def _bwd_qstk(q, k, v, bias3, g, num_heads, wb, nq, nk_tot, scale, bf,
              qraw, kraw, wmats, dq_ref, dk_ref, dw_ref, db_ref):
    wq, wk, wv, wp = wmats
    dq_p, dk_p, dv_p, dwp, dbp = _bwd_qstk_core(
        q, k, v, bias3, g, num_heads, wb, nq, nk_tot, scale, bf, wp)
    _finish_bwd(qraw, kraw, q, wq, wk, wv, dq_p, dk_p, dv_p, dwp, dbp,
                dq_ref, dk_ref, dw_ref, db_ref, bf)


def _finish_bwd(qraw, kraw, q, wq, wk, wv, dq_p, dk_p, dv_p, dwp, dbp,
                dq_ref, dk_ref, dw_ref, db_ref, bf):
    """Shared bwd tail: projection grads + grid-accumulated weight grads."""
    dq_pb = dq_p.astype(bf)
    dk_pb = dk_p.astype(bf)
    dv_pb = dv_p.astype(bf)
    dq_raw = jax.lax.dot_general(  # dq' @ wq^T
        dq_pb, wq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_raw = (jax.lax.dot_general(
        dk_pb, wk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
        + jax.lax.dot_general(
            dv_pb, wv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    dwq = jax.lax.dot_general(  # qraw^T @ dq'
        qraw, dq_pb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwk = jax.lax.dot_general(
        kraw, dk_pb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwv = jax.lax.dot_general(
        kraw, dv_pb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbq = jnp.sum(dq_p, axis=0, keepdims=True)
    dbk = jnp.sum(dk_p, axis=0, keepdims=True)
    dbv = jnp.sum(dv_p, axis=0, keepdims=True)

    dq_ref[:] = dq_raw.astype(dq_ref.dtype)
    dk_ref[:] = dk_raw.astype(dk_ref.dtype)

    dw_step = jnp.stack([dwq, dwk, dwv, dwp])  # (4, D, D)
    zero = jnp.zeros_like(dbq)
    db_step = jnp.concatenate(
        [dbq, dbk, dbv, dbp, zero, zero, zero, zero], axis=0)  # (8, D)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dw_ref[:] += dw_step
    db_ref[:] += db_step


def _fused_attention_bwd_impl(query, keys, proj, key_bias, g, num_heads,
                              scale, window_block, interpret, compute_dtype):
    # the backward picks its own supertile/variant point (see ATTN_BWD_*);
    # it re-preps all inputs from the VJP residuals so this is independent
    # of the forward's window_block
    wb = ATTN_BWD_WB or window_block
    variant = ATTN_BWD_VARIANT
    q2, k2, bias2, wmats, bvec, dm = _prep_inputs(
        query, keys, key_bias, proj, num_heads, wb, compute_dtype, variant)
    nw, nwp, nq, d = dm["nw"], dm["nwp"], dm["nq"], dm["d"]
    nk_tot = dm["nk_tot"]
    pad = nwp - nw
    if pad:
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))
    g_rows = nq
    g2 = g.reshape(nwp * g_rows, d)

    kernel = functools.partial(
        _attn_bwd_kernel, num_heads=tuple(num_heads), wb=wb, nq=nq,
        nk_tot=nk_tot, scale=float(scale), compute_dtype=compute_dtype,
        variant=variant,
    )
    extra_specs = []
    extra_args = []
    dq2, dk2, dw, db = pl.pallas_call(
        kernel,
        grid=(nwp // wb,),
        in_specs=_common_specs(wb, nq, nk_tot, d, variant) + extra_specs + [
            pl.BlockSpec((wb * g_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((wb * nq, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb * nk_tot, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, d, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nwp * nq, d), query.dtype),
            jax.ShapeDtypeStruct((nwp * nk_tot, d), keys.dtype),
            jax.ShapeDtypeStruct((4, d, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ],
        interpret=interpret,
    )(q2, k2, bias2, wmats, bvec, *extra_args, g2)

    dq = dq2.reshape(nwp, nq, d)[:nw]
    dk = dk2.reshape(nwp, nk_tot, d)[:nw]
    wq, bq, wk, bk, wv, bv, wp, bp = proj
    dproj = (
        dw[0].astype(wq.dtype), db[0].astype(bq.dtype),
        dw[1].astype(wk.dtype), db[1].astype(bk.dtype),
        dw[2].astype(wv.dtype), db[2].astype(bv.dtype),
        dw[3].astype(wp.dtype), db[3].astype(bp.dtype),
    )
    return dq, dk, dproj


# (A fused 3-NN interpolation epilogue variant of the kernel was pruned
#  after losing its e2e A/B by 5-15 ms/frame; the standalone pallas_interp
#  kernel variant lost its own A/B harder — sync 77.1 vs 54.6 ms/frame,
#  2026-08-19 — and was pruned with its planes/n1 plumbing. The dense-W3
#  XLA chain is the winner; see git history for both kernels.)


# ---------------------------------------------------------------------------
# Assembled-inputs forward kernel: K/Q assembly moves into VMEM.
#
# xplane profiling (2026-08-18, gather-mode graph at 225 ms/step) showed the
# HBM materialization of the attention inputs — win1-key local take_along,
# k1/k2 concat, pos-MLP add, mask sweeps — costing ~25 ms/step for block 1
# alone (maximum_add 9.2, pad_maximum 4.8, select_select 3.6, local one-hot
# 3.4, q chain 2.9, pos conv 1.2), all full passes over multi-GB slabs that
# exist only to be read once by the attention kernel. This variant takes the
# RAW gather products instead and assembles in VMEM per supertile:
#
#   k1  = one-hot(fps picks) @ win1_slab        (batched MXU dot, ~3% MACs)
#   pos = relu(rx*w0 + ry*w1 + rz*w2 + base)    (VPU, plane inputs)
#   k   = concat(k1, k2) + pos_k;  q = win1[:, :nq]*keep + pos_q
#
# Inference-only (no custom VJP): training keeps the assembled-outside path
# through ``fused_window_attention`` whose backward is already fused.
# ---------------------------------------------------------------------------


def _attn_assembled_kernel(*allrefs,
                           num_heads, wb, nq, n1cap, nk1, nk_tot, scale,
                           q_prefix, has_pad_row, has_nv, out_dtype,
                           compute_dtype):
    if has_nv:
        nv_ref, *allrefs = allrefs
    (win1_ref, k2_ref, fps_ref, km1_ref, qext_ref,
     qmask_ref, krx_ref, kry_ref, krz_ref,
     qrx_ref, qry_ref, qrz_ref, base_ref, posw_ref,
     bias_ref, w_ref, b_ref, *rest) = allrefs
    if has_pad_row:
        padrow_ref, o_ref = rest
    else:
        (o_ref,) = rest
    if has_nv:
        # data-dependent tail skip: valid windows are a sorted PREFIX of the
        # static capacity (window_partition compaction), so supertiles past
        # ceil(num_valid / wb) hold only empty windows — skip their compute
        # (their input DMAs are already elided by the constant tail index
        # map, see _assembled_specs) and emit zeros.
        live = pl.program_id(0) * wb < nv_ref[0]

        @pl.when(live)
        def _run():
            _attn_assembled_body(
                win1_ref, k2_ref, fps_ref, km1_ref, qext_ref, qmask_ref,
                krx_ref, kry_ref, krz_ref, qrx_ref, qry_ref, qrz_ref,
                base_ref, posw_ref, bias_ref, w_ref, b_ref,
                padrow_ref if has_pad_row else None, o_ref,
                num_heads=num_heads, wb=wb, nq=nq, n1cap=n1cap, nk1=nk1,
                nk_tot=nk_tot, scale=scale, q_prefix=q_prefix,
                out_dtype=out_dtype, compute_dtype=compute_dtype)

        @pl.when(jnp.logical_not(live))
        def _skip():
            o_ref[:] = jnp.zeros_like(o_ref)
        return
    _attn_assembled_body(
        win1_ref, k2_ref, fps_ref, km1_ref, qext_ref, qmask_ref,
        krx_ref, kry_ref, krz_ref, qrx_ref, qry_ref, qrz_ref,
        base_ref, posw_ref, bias_ref, w_ref, b_ref,
        padrow_ref if has_pad_row else None, o_ref,
        num_heads=num_heads, wb=wb, nq=nq, n1cap=n1cap, nk1=nk1,
        nk_tot=nk_tot, scale=scale, q_prefix=q_prefix,
        out_dtype=out_dtype, compute_dtype=compute_dtype)


def _assemble_tokens(win1_ref, k2_ref, fps_ref, km1_ref, qext_ref,
                     qmask_ref, krx_ref, kry_ref, krz_ref,
                     qrx_ref, qry_ref, qrz_ref, base_ref, posw_ref,
                     padrow_ref, *, wb, nq, n1cap, nk1, nk_tot, q_prefix,
                     bf, d):
    """Shared K/Q assembly for the assembled forward AND backward kernels.

    Returns (win1, q3, k3, oh, padm, zq, zk, keep): the assembled token
    slabs plus everything the backward needs to re-split cotangents —
    the one-hot pick matrix, the pad-pick mask, the PRE-relu pos
    activations (relu backward masks), and the query keep mask.
    """
    has_pad_row = padrow_ref is not None
    win1 = win1_ref[:].reshape(wb, n1cap, d)          # (wb, n1cap, D) bf16
    k2 = k2_ref[:].reshape(wb, nk_tot - nk1, d)

    # k1: local FPS picks from the win1 slab as a batched one-hot MXU dot
    # (masked picks produce a zero row, matching the outside
    # ``gather_along_batch(win1_fea, fps1) * ~k_mask1``). With ref-compat
    # pad keys (has_pad_row), km1 carries the pad-pick mask and those rows
    # get the per-window first-voxel feature instead of zero.
    fps = fps_ref[:]                                   # (wb, nk1) int32
    slot = jax.lax.broadcasted_iota(jnp.int32, (wb, nk1, n1cap), 2)
    # minor-dim insertions must stay 32-bit for Mosaic: compare in int32
    km1 = km1_ref[:]
    oh = ((fps[:, :, None] == slot)
          & (km1[:, :, None] == 0)).astype(bf)
    k1 = jax.lax.dot_general(
        oh, win1, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(bf)  # (wb, nk1, D)
    padm = None
    if has_pad_row:
        # minor-dim insert on the int32 mask (Mosaic: bf16 minor inserts
        # are unsupported), cast after
        padm = (km1[:, :, None] != 0).astype(bf)
        k1 = k1 + padm * padrow_ref[:].astype(bf)[:, None, :]

    # position embedding: relu(rx*w0 + ry*w1 + rz*w2 + base) — the exact
    # PosProjection.from_planes computation (layers.py:129-154) with the
    # per-window center half precomputed outside as ``base``
    w0 = posw_ref[0:1, :].astype(bf)                  # (1, D)
    w1 = posw_ref[1:2, :].astype(bf)
    w2 = posw_ref[2:3, :].astype(bf)
    base = base_ref[:].astype(bf)[:, None, :]          # (wb, 1, D)

    def pre(rx, ry, rz):
        return (rx[:, :, None].astype(bf) * w0[None]
                + ry[:, :, None].astype(bf) * w1[None]
                + rz[:, :, None].astype(bf) * w2[None]
                + base)

    zk = pre(krx_ref[:], kry_ref[:], krz_ref[:])       # (wb, nk_tot, D)
    zq = pre(qrx_ref[:], qry_ref[:], qrz_ref[:])       # (wb, nq, D)

    k3 = jnp.concatenate([k1, k2], axis=1) + jnp.maximum(zk, 0.0).astype(bf)
    if q_prefix:
        q_raw = win1[:, :nq]
    else:
        q_raw = qext_ref[:].reshape(wb, nq, d)
    keep = qmask_ref[:][:, :, None].astype(bf)
    q3 = q_raw * keep + jnp.maximum(zq, 0.0).astype(bf)
    return win1, q3, k3, oh, padm, zq, zk, keep


def _attn_assembled_body(win1_ref, k2_ref, fps_ref, km1_ref, qext_ref,
                         qmask_ref, krx_ref, kry_ref, krz_ref,
                         qrx_ref, qry_ref, qrz_ref, base_ref, posw_ref,
                         bias_ref, w_ref, b_ref, padrow_ref, o_ref, *,
                         num_heads, wb, nq, n1cap, nk1, nk_tot, scale,
                         q_prefix, out_dtype, compute_dtype):
    bf = compute_dtype
    d = w_ref.shape[-1]
    _, q3, k3, _, _, _, _, _ = _assemble_tokens(
        win1_ref, k2_ref, fps_ref, km1_ref, qext_ref, qmask_ref,
        krx_ref, kry_ref, krz_ref, qrx_ref, qry_ref, qrz_ref,
        base_ref, posw_ref, padrow_ref,
        wb=wb, nq=nq, n1cap=n1cap, nk1=nk1, nk_tot=nk_tot,
        q_prefix=q_prefix, bf=bf, d=d)

    q2 = q3.reshape(wb * nq, d)
    k2f = k3.reshape(wb * nk_tot, d)

    wq, wk, wv, wp = (w_ref[i] for i in range(4))
    bq, bk, bv, bp = (b_ref[i:i + 1, :] for i in range(4))
    q = (jax.lax.dot(q2, wq, preferred_element_type=jnp.float32)
         + bq).astype(bf)
    k = (jax.lax.dot(k2f, wk, preferred_element_type=jnp.float32)
         + bk).astype(bf)
    v = (jax.lax.dot(k2f, wv, preferred_element_type=jnp.float32)
         + bv).astype(bf)

    bias3 = bias_ref[:][:, None, :].astype(jnp.float32)  # (wb, 1, nk_tot)
    core = (_per_head_attn_qstk if ATTN_ASM_VARIANT == "qstk"
            else _per_head_attn_b3d)
    o, _ = core(q, k, v, bias3, num_heads, wb, nq, nk_tot,
                float(scale), bf)
    o = jax.lax.dot(o.astype(bf), wp, preferred_element_type=jnp.float32) + bp
    o_ref[:] = o.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "q_prefix", "nq", "window_block",
                     "interpret", "compute_dtype"),
)
def fused_window_attention_assembled(
    win1_fea: jnp.ndarray,   # (NW, n1cap, D) RAW win1-buffer features
    k2_fea: jnp.ndarray,     # (NW, nk2, D) RAW win2-key features (masked 0)
    fps1: jnp.ndarray,       # (NW, nk1) int32 local win1-buffer picks
    k_mask1: jnp.ndarray,    # (NW, nk1) bool True = masked pick
    q_ext: jnp.ndarray,      # (NW, nq, D) RAW queries, or (NW, 1, D) dummy
                             # when q_prefix (queries = win1_fea[:, :nq])
    q_keep: jnp.ndarray,     # (NW, nq) f32 1.0 = live query
    k_rel: Tuple[jnp.ndarray, ...],   # 3 x (NW, nk_tot) f32 rel-coord planes
    q_rel: Tuple[jnp.ndarray, ...],   # 3 x (NW, nq) f32
    pos_base: jnp.ndarray,   # (NW, D) pre-relu center half of the pos MLP
    pos_w: jnp.ndarray,      # (3, D) rel-coord rows of the pos MLP kernel
    proj: Tuple[jnp.ndarray, ...],    # (wq, bq, wk, bk, wv, bv, wp, bp)
    key_bias: jnp.ndarray,   # (NW, nk_tot) additive (-100 where padded)
    num_heads: Tuple[int, ...],
    scale: float,
    q_prefix: bool,
    nq: int = 0,             # rows of the q output when q_prefix
    pad_row: jnp.ndarray = None,  # (NW, D): ref-compat pad-key feature row;
                             # k_mask1 then carries the PAD-pick mask
    num_valid: jnp.ndarray = None,  # () int32: count of live (prefix)
                             # windows; tail supertiles skip compute
    window_block: int = 0,   # 0 = ATTN_ASM_WB default (see its A/B note)
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Window attention with in-VMEM K/Q assembly. Returns (NW, nq, D).

    Numerically equivalent to assembling
    ``q = win1_fea[:, :nq] * keep + relu(pos)``,
    ``k = concat(take(win1_fea, fps1) * ~mask, k2_fea) + relu(pos)`` outside
    and calling ``fused_window_attention`` — the assembly sweeps just never
    touch HBM. Inference-only: no custom VJP (training uses the
    assembled-outside path).
    """
    nw, n1cap, d = win1_fea.shape
    nk1 = fps1.shape[1]
    nk2 = k2_fea.shape[1]
    nk_tot = nk1 + nk2
    nq = int(nq) if q_prefix else q_ext.shape[1]
    assert nq > 0
    wb = int(ATTN_WB or window_block or ATTN_ASM_WB)
    bf = compute_dtype

    pad = (-nw) % wb
    def prow(x, val=0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=val) if pad else x
    win1p = prow(win1_fea.astype(bf))
    k2p = prow(k2_fea.astype(bf))
    fpsp = prow(fps1)
    km1p = prow(k_mask1.astype(jnp.int32), val=1)
    qxp = prow(q_ext.astype(bf))
    qkp = prow(q_keep.astype(jnp.float32))
    krel = tuple(prow(p.astype(jnp.float32)) for p in k_rel)
    qrel = tuple(prow(p.astype(jnp.float32)) for p in q_rel)
    basep = prow(pos_base.astype(bf))
    biasp = prow(key_bias.astype(jnp.float32))
    nwp = nw + pad

    wq, bq, wk, bk, wv, bv, wp, bp = proj
    wmats = jnp.stack([wq, wk, wv, wp]).astype(bf)   # (4, D, D)
    bvec = jnp.pad(jnp.stack([bq, bk, bv, bp]).astype(bf),
                   ((0, 4), (0, 0)))                 # (8, D)
    posw = jnp.pad(pos_w.astype(bf), ((0, 5), (0, 0)))  # (8, D) sublane tile

    nqx = qxp.shape[1]
    has_pad_row = pad_row is not None
    has_nv = num_valid is not None
    kernel = functools.partial(
        _attn_assembled_kernel, num_heads=tuple(num_heads), wb=wb, nq=nq,
        n1cap=n1cap, nk1=nk1, nk_tot=nk_tot, scale=float(scale),
        q_prefix=bool(q_prefix), has_pad_row=has_pad_row, has_nv=has_nv,
        out_dtype=win1_fea.dtype, compute_dtype=bf)
    if has_nv:
        # tail supertiles (only empty windows) fetch the LAST LIVE block
        # instead of their own — consecutive identical block indices elide
        # the DMA, so skipped iterations cost neither compute nor HBM
        def _blk(i, nv):
            return jnp.minimum(i, jnp.maximum((nv[0] + wb - 1) // wb - 1, 0))
        row = lambda r: pl.BlockSpec((wb * r, d),
                                     lambda i, nv: (_blk(i, nv), 0),
                                     memory_space=pltpu.VMEM)
        pln = lambda c: pl.BlockSpec((wb, c),
                                     lambda i, nv: (_blk(i, nv), 0),
                                     memory_space=pltpu.VMEM)
        const2 = lambda a, b_: pl.BlockSpec((a, b_), lambda i, nv: (0, 0),
                                            memory_space=pltpu.VMEM)
        const3 = pl.BlockSpec((4, d, d), lambda i, nv: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((wb * nq, d), lambda i, nv: (i, 0),
                                memory_space=pltpu.VMEM)
    else:
        row = lambda r: pl.BlockSpec((wb * r, d), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
        pln = lambda c: pl.BlockSpec((wb, c), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
        const2 = lambda a, b_: pl.BlockSpec((a, b_), lambda i: (0, 0),
                                            memory_space=pltpu.VMEM)
        const3 = pl.BlockSpec((4, d, d), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((wb * nq, d), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    in_specs = [
        row(n1cap), row(nk2),
        pln(nk1), pln(nk1),
        row(nqx), pln(nq),
        pln(nk_tot), pln(nk_tot), pln(nk_tot),
        pln(nq), pln(nq), pln(nq),
        row(1),
        const2(8, d),
        pln(nk_tot),
        const3,
        const2(8, d),
    ]
    args = [win1p.reshape(nwp * n1cap, d), k2p.reshape(nwp * nk2, d),
            fpsp, km1p, qxp.reshape(nwp * nqx, d), qkp,
            krel[0], krel[1], krel[2], qrel[0], qrel[1], qrel[2],
            basep, posw, biasp, wmats, bvec]
    if has_pad_row:
        in_specs.append(row(1))
        args.append(prow(pad_row.astype(bf)))
    out_shape = jax.ShapeDtypeStruct((nwp * nq, d), win1_fea.dtype)
    if has_nv:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nwp // wb,),
                in_specs=in_specs,
                out_specs=out_spec,
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(jnp.asarray(num_valid, jnp.int32).reshape(1), *args)
    else:
        out = pl.pallas_call(
            kernel,
            grid=(nwp // wb,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
    return out.reshape(nwp, nq, d)[:nw]


# ---------------------------------------------------------------------------
# Assembled-inputs TRAINABLE variant: custom VJP with a mirrored Pallas
# backward that recomputes the in-VMEM assembly (via _assemble_tokens) and
# the qstk core, then re-splits the cotangents through the assembly —
# training stops paying the ~30 ms/step of XLA-side K/Q concat/pos/mask
# sweeps the inference kernel already fused away (train xplane 2026-08-21).
#
# Cotangent contract: rel-coordinate planes, masks, fps picks, key_bias and
# q_keep get ZERO cotangents. In the MsSVT block every one of these derives
# from integer voxel coordinates (grads die at the int cast anyway), so the
# zeros are exact for the model; do NOT reuse this wrapper somewhere rel
# planes are themselves learned.
# ---------------------------------------------------------------------------


def _zero_ct(x):
    """Zero cotangent with the tangent dtype JAX expects (float0 for
    integer/bool primals)."""
    if (jnp.issubdtype(x.dtype, jnp.integer)
            or jnp.issubdtype(x.dtype, jnp.bool_)):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(x)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(14, 15, 16, 17, 18, 19, 20))
def _asm_attn_train(win1_fea, k2_fea, q_ext, pos_base, pos_w, proj, pad_row,
                    fps1, k_mask1, q_keep, k_rel, q_rel, key_bias, num_valid,
                    num_heads, scale, q_prefix, nq, window_block,
                    compute_dtype, interpret):
    return fused_window_attention_assembled(
        win1_fea, k2_fea, fps1, k_mask1, q_ext, q_keep, k_rel, q_rel,
        pos_base, pos_w, proj, key_bias, num_heads=num_heads, scale=scale,
        q_prefix=q_prefix, nq=nq, pad_row=pad_row, num_valid=num_valid,
        window_block=window_block, compute_dtype=compute_dtype,
        interpret=interpret)


def _asm_attn_train_fwd(win1_fea, k2_fea, q_ext, pos_base, pos_w, proj,
                        pad_row, fps1, k_mask1, q_keep, k_rel, q_rel,
                        key_bias, num_valid, num_heads, scale, q_prefix, nq,
                        window_block, compute_dtype, interpret):
    out = _asm_attn_train(
        win1_fea, k2_fea, q_ext, pos_base, pos_w, proj, pad_row, fps1,
        k_mask1, q_keep, k_rel, q_rel, key_bias, num_valid,
        num_heads, scale, q_prefix, nq, window_block, compute_dtype,
        interpret)
    res = (win1_fea, k2_fea, q_ext, pos_base, pos_w, proj, pad_row, fps1,
           k_mask1, q_keep, k_rel, q_rel, key_bias, num_valid)
    return out, res


def _asm_attn_train_bwd(num_heads, scale, q_prefix, nq, window_block,
                        compute_dtype, interpret, res, g):
    (win1_fea, k2_fea, q_ext, pos_base, pos_w, proj, pad_row, fps1,
     k_mask1, q_keep, k_rel, q_rel, key_bias, num_valid) = res
    dwin1, dk2, dqext, dpad, dbase, dposw, dproj = \
        _asm_attn_bwd_impl(
            win1_fea, k2_fea, q_ext, pos_base, pos_w, proj, pad_row, fps1,
            k_mask1, q_keep, k_rel, q_rel, key_bias, num_valid, g,
            num_heads=num_heads, scale=scale, q_prefix=q_prefix, nq=nq,
            window_block=window_block, compute_dtype=compute_dtype,
            interpret=interpret)
    zeros = jax.tree_util.tree_map(_zero_ct,
                                   (fps1, k_mask1, q_keep, k_rel, q_rel,
                                    key_bias, num_valid))
    return (dwin1, dk2, dqext, dbase, dposw, dproj, dpad) + zeros


_asm_attn_train.defvjp(_asm_attn_train_fwd, _asm_attn_train_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "q_prefix", "nq", "window_block",
                     "interpret", "compute_dtype"),
)
def fused_window_attention_assembled_train(
    win1_fea, k2_fea, fps1, k_mask1, q_ext, q_keep, k_rel, q_rel,
    pos_base, pos_w, proj, key_bias, num_heads, scale, q_prefix,
    nq: int = 0, pad_row=None, num_valid=None, window_block: int = 0,
    interpret: bool = False, compute_dtype=jnp.bfloat16,
):
    """Differentiable assembled window attention (same contract as
    :func:`fused_window_attention_assembled`) with a mirrored Pallas
    backward. Requires ``pad_row`` and ``num_valid`` (the MsSVT block's
    ref-compat training configuration always has both). See the cotangent
    contract note above — masks/rels/picks get zeros."""
    assert pad_row is not None and num_valid is not None
    return _asm_attn_train(
        win1_fea, k2_fea, q_ext, pos_base, pos_w, tuple(proj), pad_row,
        fps1, k_mask1, q_keep, tuple(k_rel), tuple(q_rel), key_bias,
        jnp.asarray(num_valid, jnp.int32),
        tuple(num_heads), float(scale), bool(q_prefix), int(nq),
        int(window_block), compute_dtype, bool(interpret))


def _asm_attn_bwd_impl(win1_fea, k2_fea, q_ext, pos_base, pos_w, proj,
                       pad_row, fps1, k_mask1, q_keep, k_rel, q_rel,
                       key_bias, num_valid, g, *, num_heads, scale,
                       q_prefix, nq, window_block, compute_dtype,
                       interpret=False):
    nw, n1cap, d = win1_fea.shape
    nk1 = fps1.shape[1]
    nk2 = k2_fea.shape[1]
    nk_tot = nk1 + nk2
    nq = int(nq) if q_prefix else q_ext.shape[1]
    wb = ATTN_ASM_BWD_WB  # own supertile: the bwd working set is ~2x the fwd
    bf = compute_dtype

    pad = (-nw) % wb

    def prow(x, val=0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=val) if pad else x

    win1p = prow(win1_fea.astype(bf))
    k2p = prow(k2_fea.astype(bf))
    fpsp = prow(fps1)
    km1p = prow(k_mask1.astype(jnp.int32), val=1)
    qxp = prow(q_ext.astype(bf))
    qkp = prow(q_keep.astype(jnp.float32))
    krel = tuple(prow(p.astype(jnp.float32)) for p in k_rel)
    qrel = tuple(prow(p.astype(jnp.float32)) for p in q_rel)
    basep = prow(pos_base.astype(bf))
    biasp = prow(key_bias.astype(jnp.float32))
    padp = prow(pad_row.astype(bf))
    gp = prow(g.astype(bf)).reshape((nw + pad) * nq, d)
    nwp = nw + pad

    wq, bq, wk, bk, wv, bv, wp, bp = proj
    wmats = jnp.stack([wq, wk, wv, wp]).astype(bf)
    bvec = jnp.pad(jnp.stack([bq, bk, bv, bp]).astype(bf), ((0, 4), (0, 0)))
    posw = jnp.pad(pos_w.astype(bf), ((0, 5), (0, 0)))
    nqx = qxp.shape[1]

    kernel = functools.partial(
        _attn_assembled_bwd_kernel, num_heads=tuple(num_heads), wb=wb,
        nq=nq, n1cap=n1cap, nk1=nk1, nk_tot=nk_tot, scale=float(scale),
        q_prefix=bool(q_prefix), has_nv=True, compute_dtype=bf)

    def _blk(i, nv):
        return jnp.minimum(i, jnp.maximum((nv[0] + wb - 1) // wb - 1, 0))
    row = lambda r: pl.BlockSpec((wb * r, d), lambda i, nv: (_blk(i, nv), 0),
                                 memory_space=pltpu.VMEM)
    pln = lambda c: pl.BlockSpec((wb, c), lambda i, nv: (_blk(i, nv), 0),
                                 memory_space=pltpu.VMEM)
    const2 = lambda a, b_: pl.BlockSpec((a, b_), lambda i, nv: (0, 0),
                                        memory_space=pltpu.VMEM)
    const3 = pl.BlockSpec((4, d, d), lambda i, nv: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    orow = lambda r: pl.BlockSpec((wb * r, d), lambda i, nv: (i, 0),
                                  memory_space=pltpu.VMEM)
    in_specs = [
        row(n1cap), row(nk2), pln(nk1), pln(nk1), row(nqx), pln(nq),
        pln(nk_tot), pln(nk_tot), pln(nk_tot),
        pln(nq), pln(nq), pln(nq),
        row(1), const2(8, d), pln(nk_tot), const3, const2(8, d),
        row(1),  # pad_row
        orow(nq),  # g: OWN block index (cotangents are per-tile outputs)
    ]
    out_specs = [
        orow(n1cap), orow(nk2), orow(nqx), orow(1), orow(1),
        const2(8, d), const3, const2(8, d),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nwp * n1cap, d), win1_fea.dtype),
        jax.ShapeDtypeStruct((nwp * nk2, d), k2_fea.dtype),
        jax.ShapeDtypeStruct((nwp * nqx, d), q_ext.dtype),
        jax.ShapeDtypeStruct((nwp, d), pad_row.dtype),
        jax.ShapeDtypeStruct((nwp, d), pos_base.dtype),
        jax.ShapeDtypeStruct((8, d), jnp.float32),
        jax.ShapeDtypeStruct((4, d, d), jnp.float32),
        jax.ShapeDtypeStruct((8, d), jnp.float32),
    ]
    args = [win1p.reshape(nwp * n1cap, d), k2p.reshape(nwp * nk2, d),
            fpsp, km1p, qxp.reshape(nwp * nqx, d), qkp,
            krel[0], krel[1], krel[2], qrel[0], qrel[1], qrel[2],
            basep, posw, biasp, wmats, bvec, padp, gp]
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nwp // wb,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
        ),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(jnp.asarray(num_valid, jnp.int32).reshape(1), *args)
    dwin1, dk2, dqext, dpad, dbase, dposw, dw, db = outs
    dwin1 = dwin1.reshape(nwp, n1cap, d)[:nw]
    dk2 = dk2.reshape(nwp, nk2, d)[:nw]
    dqext = dqext.reshape(nwp, nqx, d)[:nw]
    dpad = dpad[:nw]
    dbase = dbase[:nw]
    dproj = (
        dw[0].astype(wq.dtype), db[0].astype(bq.dtype),
        dw[1].astype(wk.dtype), db[1].astype(bk.dtype),
        dw[2].astype(wv.dtype), db[2].astype(bv.dtype),
        dw[3].astype(wp.dtype), db[3].astype(bp.dtype),
    )
    return (dwin1, dk2, dqext, dpad, dbase,
            dposw[:3].astype(pos_w.dtype), dproj)


def _attn_assembled_bwd_kernel(*allrefs, num_heads, wb, nq, n1cap, nk1,
                               nk_tot, scale, q_prefix, has_nv,
                               compute_dtype):
    if has_nv:
        nv_ref, *allrefs = allrefs
    (win1_ref, k2_ref, fps_ref, km1_ref, qext_ref,
     qmask_ref, krx_ref, kry_ref, krz_ref,
     qrx_ref, qry_ref, qrz_ref, base_ref, posw_ref,
     bias_ref, w_ref, b_ref, padrow_ref, g_ref,
     dwin1_ref, dk2_ref, dqext_ref, dpad_ref, dbase_ref,
     dposw_ref, dw_ref, db_ref) = allrefs

    @pl.when(pl.program_id(0) == 0)
    def _init_acc():
        dposw_ref[:] = jnp.zeros_like(dposw_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    live = (pl.program_id(0) * wb < nv_ref[0]) if has_nv else True

    @pl.when(live)
    def _run():
        _attn_assembled_bwd_body(
            win1_ref, k2_ref, fps_ref, km1_ref, qext_ref, qmask_ref,
            krx_ref, kry_ref, krz_ref, qrx_ref, qry_ref, qrz_ref,
            base_ref, posw_ref, bias_ref, w_ref, b_ref, padrow_ref, g_ref,
            dwin1_ref, dk2_ref, dqext_ref, dpad_ref, dbase_ref,
            dposw_ref, dw_ref, db_ref,
            num_heads=num_heads, wb=wb, nq=nq, n1cap=n1cap, nk1=nk1,
            nk_tot=nk_tot, scale=scale, q_prefix=q_prefix,
            compute_dtype=compute_dtype)

    if has_nv:
        @pl.when(jnp.logical_not(live))
        def _skip():
            dwin1_ref[:] = jnp.zeros_like(dwin1_ref)
            dk2_ref[:] = jnp.zeros_like(dk2_ref)
            dqext_ref[:] = jnp.zeros_like(dqext_ref)
            dpad_ref[:] = jnp.zeros_like(dpad_ref)
            dbase_ref[:] = jnp.zeros_like(dbase_ref)


def _attn_assembled_bwd_body(win1_ref, k2_ref, fps_ref, km1_ref, qext_ref,
                             qmask_ref, krx_ref, kry_ref, krz_ref,
                             qrx_ref, qry_ref, qrz_ref, base_ref, posw_ref,
                             bias_ref, w_ref, b_ref, padrow_ref, g_ref,
                             dwin1_ref, dk2_ref, dqext_ref, dpad_ref,
                             dbase_ref, dposw_ref, dw_ref, db_ref, *,
                             num_heads, wb, nq, n1cap, nk1, nk_tot, scale,
                             q_prefix, compute_dtype):
    bf = compute_dtype
    d = w_ref.shape[-1]
    win1, q3, k3, oh, padm, zq, zk, keep = _assemble_tokens(
        win1_ref, k2_ref, fps_ref, km1_ref, qext_ref, qmask_ref,
        krx_ref, kry_ref, krz_ref, qrx_ref, qry_ref, qrz_ref,
        base_ref, posw_ref, padrow_ref,
        wb=wb, nq=nq, n1cap=n1cap, nk1=nk1, nk_tot=nk_tot,
        q_prefix=q_prefix, bf=bf, d=d)

    q2 = q3.reshape(wb * nq, d)
    k2f = k3.reshape(wb * nk_tot, d)
    wq, wk, wv, wp = (w_ref[i] for i in range(4))
    bq, bk, bv, bp = (b_ref[i:i + 1, :] for i in range(4))
    q = (jax.lax.dot(q2, wq, preferred_element_type=jnp.float32)
         + bq).astype(bf)
    k = (jax.lax.dot(k2f, wk, preferred_element_type=jnp.float32)
         + bk).astype(bf)
    v = (jax.lax.dot(k2f, wv, preferred_element_type=jnp.float32)
         + bv).astype(bf)
    bias3 = bias_ref[:][:, None, :].astype(jnp.float32)
    g = g_ref[:].astype(bf)  # (wb*nq, d)

    dq_p, dk_p, dv_p, dwp, dbp = _bwd_qstk_core(
        q, k, v, bias3, g, num_heads, wb, nq, nk_tot, float(scale), bf, wp)

    # projection backward (mirrors _finish_bwd, but the raw-token
    # cotangents continue through the assembly instead of being written out)
    dq_pb = dq_p.astype(bf)
    dk_pb = dk_p.astype(bf)
    dv_pb = dv_p.astype(bf)
    dq3 = jax.lax.dot_general(
        dq_pb, wq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(wb, nq, d)
    dk3 = (jax.lax.dot_general(
        dk_pb, wk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
        + jax.lax.dot_general(
            dv_pb, wv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)).reshape(wb, nk_tot, d)
    dwq = jax.lax.dot_general(
        q2, dq_pb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwk = jax.lax.dot_general(
        k2f, dk_pb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwv = jax.lax.dot_general(
        k2f, dv_pb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbq = jnp.sum(dq_p, axis=0, keepdims=True)
    dbk = jnp.sum(dk_p, axis=0, keepdims=True)
    dbv = jnp.sum(dv_p, axis=0, keepdims=True)

    dq3 = dq3.astype(bf)
    dk3 = dk3.astype(bf)
    dk1 = dk3[:, :nk1]
    # pos backward: pos = relu(z); dz = dpos * (z > 0). Compare in f32 —
    # Mosaic has no bf16 vector compare on this target.
    dzk = jnp.where(zk.astype(jnp.float32) > 0, dk3, 0.0).astype(bf)
    dzq = jnp.where(zq.astype(jnp.float32) > 0, dq3, 0.0).astype(bf)
    dbase_ref[:] = (jnp.sum(dzk.astype(jnp.float32), axis=1)
                    + jnp.sum(dzq.astype(jnp.float32), axis=1)
                    ).astype(dbase_ref.dtype)

    def _plane_row(rk, rq):
        # Σ_{b,n} r[b,n] * dz[b,n,:] over keys + queries → (1, d).
        # Per-window batched contraction over n, then a sublane reduce over
        # the window axis (a (wb, n) -> (1, wb*n) flatten is a sublane->lane
        # shape cast Mosaic cannot lower).
        a = jax.lax.dot_general(
            rk[:, None, :].astype(bf), dzk,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (wb, 1, d)
        b_ = jax.lax.dot_general(
            rq[:, None, :].astype(bf), dzq,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.sum(a[:, 0, :] + b_[:, 0, :], axis=0, keepdims=True)

    r0 = _plane_row(krx_ref[:], qrx_ref[:])
    r1 = _plane_row(kry_ref[:], qry_ref[:])
    r2 = _plane_row(krz_ref[:], qrz_ref[:])
    zero_row = jnp.zeros_like(r0)
    dposw_step = jnp.concatenate(
        [r0, r1, r2, zero_row, zero_row, zero_row, zero_row, zero_row],
        axis=0)  # (8, d)

    # k1 backward through the one-hot pick + pad row
    dwin1 = jax.lax.dot_general(  # oh^T @ dk1 per window
        oh, dk1, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (wb, n1cap, d)
    if padm is not None:
        dpad_ref[:] = jnp.sum(
            (padm * dk1).astype(jnp.float32), axis=1).astype(dpad_ref.dtype)
    else:
        dpad_ref[:] = jnp.zeros_like(dpad_ref)

    # q_raw backward: q3 = q_raw * keep + pos
    dq_raw = (dq3 * keep).astype(jnp.float32)          # (wb, nq, d)
    if q_prefix:
        dwin1 = dwin1 + jnp.pad(
            dq_raw, ((0, 0), (0, n1cap - nq), (0, 0)))
        dqext_ref[:] = jnp.zeros_like(dqext_ref)
    else:
        dqext_ref[:] = dq_raw.reshape(
            wb * nq, d).astype(dqext_ref.dtype)
    dwin1_ref[:] = dwin1.reshape(wb * n1cap, d).astype(dwin1_ref.dtype)
    dk2_ref[:] = dk3[:, nk1:].reshape(
        wb * (nk_tot - nk1), d).astype(dk2_ref.dtype)

    dw_ref[:] += jnp.stack([dwq, dwk, dwv, dwp])
    zero = jnp.zeros_like(dbq)
    db_ref[:] += jnp.concatenate(
        [dbq, dbk, dbv, dbp, zero, zero, zero, zero], axis=0)
    dposw_ref[:] += dposw_step
