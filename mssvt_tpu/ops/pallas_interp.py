"""Standalone 3-NN inverse-distance interpolation kernel (Pallas/TPU).

Computes the MsSVT block's post-attention feature propagation
(ref: pcdet/models/backbones_3d/mssvt_backbone.py:300-310 — three_nn +
three_interpolate from the attended chessboard queries back to every win1
buffer slot) in ONE pass per window supertile: the (wb, n1, nq) distance
matrix, the 3 argmin sweeps, and the row-stochastic interpolation matrix all
live in VMEM and are applied as a single batched MXU matmul against the
attention output. The XLA chain materializes the (NW, n1, nq) distance and
weight matrices in HBM several times; here only the (NW, nq, C) input and
(NW, n1, C) output move.

This runs OUTSIDE the attention kernel: an earlier experiment fusing the
same epilogue into the attention kernel's critical path measured 5-15 ms
SLOWER e2e (the W3 build serialized against the attention pipeline); as its
own kernel the build overlaps nothing but also blocks nothing.

The matrix mirrors ``three_interp_weights_planes`` (ops/sampling.py) exactly:
same u2+k2-2*cross distances, first-min tie-break, 1/clip(d,1e-10) weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import _interp_w3


def _fwd_kernel(wmx, wmy, wmz, qmx, qmy, qmz, qkeep, a_ref, o_ref, *,
                wb, nq, n1, compute_dtype):
    w3 = _interp_w3((wmx, wmy, wmz, qmx, qmy, qmz, qkeep), wb, nq, n1)
    a3 = a_ref[:].astype(compute_dtype)  # (wb, nq, C)
    o = jax.lax.dot_general(
        w3.astype(compute_dtype), a3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (wb, n1, C)
    o_ref[:] = o.astype(o_ref.dtype)


def _bwd_kernel(wmx, wmy, wmz, qmx, qmy, qmz, qkeep, g_ref, o_ref, *,
                wb, nq, n1, compute_dtype):
    # d_attn[w, q, c] = sum_s W3[w, s, q] * g[w, s, c]
    w3 = _interp_w3((wmx, wmy, wmz, qmx, qmy, qmz, qkeep), wb, nq, n1)
    g3 = g_ref[:].astype(compute_dtype)  # (wb, n1, C)
    d = jax.lax.dot_general(
        w3.astype(compute_dtype), g3, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (wb, nq, C)
    o_ref[:] = d.astype(o_ref.dtype)


def _run(kernel, planes, fea, n_out, wb, interpret):
    nw, n_in, c = fea.shape
    nwp = -(-nw // wb) * wb
    if nwp != nw:
        planes = tuple(jnp.pad(p, ((0, nwp - nw), (0, 0))) for p in planes)
        fea = jnp.pad(fea, ((0, nwp - nw), (0, 0), (0, 0)))
    pspecs = [
        pl.BlockSpec((wb, p.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
        for p in planes
    ]
    out = pl.pallas_call(
        kernel,
        grid=(nwp // wb,),
        in_specs=pspecs + [
            pl.BlockSpec((wb, n_in, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wb, n_out, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nwp, n_out, c), fea.dtype),
        interpret=interpret,
    )(*planes, fea)
    return out[:nw]


def interp_win1_pallas(attn_fea, planes, n1, window_block=16,
                       interpret=False, compute_dtype=jnp.bfloat16):
    """3-NN inverse-distance interpolation: (NW, nq, C) → (NW, n1, C).

    ``planes`` = (wmx, wmy, wmz (NW, n1), qmx, qmy, qmz, q_keep (NW, nq)),
    all f32 and nondifferentiable (coordinate-derived).
    """
    # positional call: custom_vjp nondiff_argnums resolve positionally
    return _interp_p(attn_fea, tuple(planes), int(n1), int(window_block),
                     bool(interpret), compute_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _interp_p(attn_fea, planes, n1, window_block, interpret, compute_dtype):
    return _interp_fwd_impl(attn_fea, planes, n1, window_block, interpret,
                            compute_dtype)


def _interp_fwd_impl(attn_fea, planes, n1, window_block, interpret,
                     compute_dtype):
    nw, nq, c = attn_fea.shape
    kern = functools.partial(_fwd_kernel, wb=window_block, nq=nq, n1=n1,
                             compute_dtype=compute_dtype)
    return _run(kern, tuple(planes), attn_fea, n1, window_block, interpret)


def _interp_vjp_fwd(attn_fea, planes, n1, window_block, interpret,
                    compute_dtype):
    out = _interp_fwd_impl(attn_fea, planes, n1, window_block, interpret,
                           compute_dtype)
    # residuals must be JAX-typed: a 0-row slice carries (nq, c, dtype)
    return out, (planes, attn_fea[:0])


def _interp_vjp_bwd(n1, window_block, interpret, compute_dtype, res, g):
    planes, a_proto = res
    nq = a_proto.shape[1]
    kern = functools.partial(_bwd_kernel, wb=window_block, nq=nq, n1=n1,
                             compute_dtype=compute_dtype)
    d_attn = _run(kern, tuple(planes), g.astype(a_proto.dtype), nq,
                  window_block, interpret)
    return d_attn, tuple(jnp.zeros_like(p) for p in planes)


_interp_p.defvjp(_interp_vjp_fwd, _interp_vjp_bwd)
