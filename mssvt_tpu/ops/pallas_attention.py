"""Fused per-window multi-head attention kernel (Pallas/TPU).

Replaces the XLA einsum chain inside ``MixedScaleAttention``
(models/model_utils/attention.py) for inference. The reference computes this
attention as per-head batched matmuls (ref: pcdet/models/model_utils/
mssvt_utils.py:88-157); with ~24k windows of nq=32 queries x nk=32 keys x
32-dim heads those lower to MXU-hostile tiny batched GEMMs with ~8 HBM
round-trips of ~100 MB intermediates (~24 ms/frame measured at Waymo scale).

Kernel strategy — every step is a full-width 2D MXU op (Mosaic punishes both
per-window unrolls, which explode compile time, and per-window ``fori_loop``
bodies, which serialize at ~20 us/iteration):

- WB windows form one supertile. Queries/keys/values are flat 2D
  ``(WB*n, D)`` slabs (pure reshapes outside the kernel).
- The per-head block-diagonal K/V expansion is a dot against a static 0/1
  replication matrix P, masked by a static channel mask:
  ``Kexp = (P @ K) * M`` — rows of Kexp are [win0: head0 keys | head1 keys
  | ...][win1: ...], zeroed outside each head's channel slice.
- Scores ``S = Q @ Kexp^T`` cover all window pairs; a computed iota mask
  kills cross-window entries (-1e9).
- Blockwise softmax without per-block slicing: subtract the ROW max (softmax
  is shift-invariant per block), exponentiate, and obtain per-(window, head)
  denominators with a thin block-sum matmul ``(e @ BS2) @ BS2^T``.
- ``O = A @ Vexp`` lands each head's output back in its channel slice
  (Vexp rows are channel-masked, so cross-head contributions are zero).

~16x redundant MACs at WB=4, but every dot is lane-aligned and q/k/v are
read from HBM exactly once.

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


def _static_mats(num_heads, embed_dim, nk_tot, wb):
    """P (WB*nt, WB*nkt), Mv (WB*nt, D), BS2 (WB*nt, WB*H) as numpy."""
    tot_heads, per_head, nk, key_block = _head_layout(
        num_heads, embed_dim, nk_tot)
    nt = tot_heads * nk
    p = np.zeros((wb * nt, wb * nk_tot), np.float32)
    mv = np.zeros((wb * nt, embed_dim), np.float32)
    bs2 = np.zeros((wb * nt, wb * tot_heads), np.float32)
    for w in range(wb):
        for t in range(tot_heads):
            for j in range(nk):
                r = w * nt + t * nk + j
                p[r, w * nk_tot + key_block[t] * nk + j] = 1.0
                mv[r, t * per_head:(t + 1) * per_head] = 1.0
                bs2[r, w * tot_heads + t] = 1.0
    return p, mv, bs2


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, p_ref, mv_ref, bs2_ref,
                 o_ref, *, nq, nt, scale, out_dtype):
    bf = jnp.bfloat16
    kexp = (jax.lax.dot(p_ref[:], k_ref[:],
                        preferred_element_type=jnp.float32).astype(bf)
            * mv_ref[:])  # (WB*nt, D)
    vexp = (jax.lax.dot(p_ref[:], v_ref[:],
                        preferred_element_type=jnp.float32).astype(bf)
            * mv_ref[:])

    s = jax.lax.dot_general(
        q_ref[:], kexp, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (WB*nq, WB*nt)
    s = s * scale + bias_ref[0, 0:1].astype(jnp.float32)  # bias (1, WB*nt)

    m, n = s.shape
    rw = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0) // nq
    cw = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1) // nt
    s = jnp.where(rw == cw, s, -1e9)

    # blockwise softmax: per-block shift-invariance lets one ROW max serve
    # all of the row's head blocks; denominators via thin block-sum matmuls
    e = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
    d1 = jax.lax.dot(e.astype(bf), bs2_ref[:],
                     preferred_element_type=jnp.float32)  # (M, WB*H)
    denom = jax.lax.dot_general(
        d1.astype(bf), bs2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (M, WB*nt)
    a = e / (denom + 1e-30)

    o = jax.lax.dot(a.astype(bf), vexp, preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "window_block", "interpret"),
)
def fused_window_attention(
    q: jnp.ndarray,       # (NW, nq, D) — post to_q projection, NOT scaled
    k: jnp.ndarray,       # (NW, nk_tot, D) — post to_kv projection
    v: jnp.ndarray,       # (NW, nk_tot, D)
    key_bias: jnp.ndarray,  # (NW, nk_tot) additive (e.g. -100 where padded)
    num_heads: Tuple[int, ...],
    scale: float,
    window_block: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """All-heads window attention, softmax(q@kT*scale + bias)@v per head."""
    nw, nq, d = q.shape
    nk_tot = k.shape[1]
    tot_heads, per_head, nk, key_block = _head_layout(num_heads, d, nk_tot)
    nt = tot_heads * nk
    assert per_head * tot_heads == d and nk * len(num_heads) == nk_tot

    wb = window_block
    pad = (-nw) % wb
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        key_bias = jnp.pad(key_bias, ((0, pad), (0, 0)))
    nwp = nw + pad

    bf = jnp.bfloat16
    q2 = q.astype(bf).reshape(nwp * nq, d)
    k2 = k.astype(bf).reshape(nwp * nk_tot, d)
    v2 = v.astype(bf).reshape(nwp * nk_tot, d)
    # bias expanded to per-head columns [head0 keys | head1 keys | ...]
    bias_exp = jnp.concatenate(
        [key_bias[:, key_block[t] * nk:(key_block[t] + 1) * nk]
         for t in range(tot_heads)], axis=1)  # (nwp, nt)
    # (G, 8, wb*nt) with the real bias in sublane row 0: a (1, 1, N) block
    # spec is legal but made Mosaic compile time explode with the grid size
    # (~6.5 min at 6000 steps); an (8, N)-tiled trailing block compiles in
    # seconds. Rows 1..7 are never read.
    bias2 = jnp.zeros((nwp // wb, 8, wb * nt), jnp.float32).at[:, 0, :].set(
        bias_exp.astype(jnp.float32).reshape(nwp // wb, wb * nt))

    p_np, mv_np, bs2_np = _static_mats(num_heads, d, nk_tot, wb)

    kernel = functools.partial(
        _attn_kernel, nq=nq, nt=nt, scale=float(scale), out_dtype=q.dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nwp // wb,),
        in_specs=[
            pl.BlockSpec((wb * nq, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb * nk_tot, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb * nk_tot, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, wb * nt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb * nt, wb * nk_tot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb * nt, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb * nt, wb * tot_heads), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wb * nq, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nwp * nq, d), q.dtype),
        interpret=interpret,
    )(q2, k2, v2, bias2,
      jnp.asarray(p_np, bf), jnp.asarray(mv_np, bf), jnp.asarray(bs2_np, bf))
    return out.reshape(nwp, nq, d)[:nw]
