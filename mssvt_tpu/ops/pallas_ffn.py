"""Fused residual + LayerNorm + FFN tail of an MsSVT block (Pallas/TPU).

Computes ``out = x + W2 @ relu(W1 @ LayerNorm(x))`` (the deterministic form
of MsSVTBlock's tail, ref: pcdet/models/backbones_3d/mssvt_backbone.py
:338-343) in one pass over row tiles: XLA runs this as several full-tensor
passes (stats, normalize, two GEMM intermediates, adds) over (V, C) arrays.
All ops are full-width 2D; weights stay VMEM-resident across the grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ffn_kernel(x_ref, w1_ref, w2_ref, sb_ref, o_ref, *, eps, out_dtype):
    bf = jnp.bfloat16
    x = x_ref[:].astype(jnp.float32)  # (R, C)
    c = x.shape[1]
    scale = sb_ref[0:1, 0:c]  # (1, C) LayerNorm scale
    bias = sb_ref[1:2, 0:c]   # (1, C) LayerNorm bias
    b1 = sb_ref[2:3, :]       # (1, F)
    b2 = sb_ref[3:4, 0:c]     # (1, C)

    mean = jnp.mean(x, axis=1, keepdims=True)
    c = x - mean
    var = jnp.mean(c * c, axis=1, keepdims=True)
    ln = (c * jax.lax.rsqrt(var + eps) * scale + bias).astype(bf)

    h = jnp.maximum(
        jax.lax.dot(ln, w1_ref[:], preferred_element_type=jnp.float32)
        + b1, 0.0).astype(bf)
    y = (jax.lax.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
         + b2)
    o_ref[:] = (x + y).astype(out_dtype)


def fused_residual_ffn(
    x: jnp.ndarray,        # (V, C)
    ln_scale: jnp.ndarray,  # (C,)
    ln_bias: jnp.ndarray,   # (C,)
    w1: jnp.ndarray,        # (C, F)
    b1: jnp.ndarray,        # (F,)
    w2: jnp.ndarray,        # (F, C)
    b2: jnp.ndarray,        # (C,)
    eps: float = 1e-6,
    row_block: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + Dense2(relu(Dense1(LayerNorm(x)))) — call under jit."""
    v, c = x.shape
    f = w1.shape[1]
    assert f >= c, "bias packing assumes F >= C"
    pad = (-v) % row_block
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    vp = v + pad

    bf = jnp.bfloat16
    # LayerNorm scale/bias + both Dense biases ride one (8, F) slab
    sb = jnp.zeros((8, f), jnp.float32)
    sb = sb.at[0, :c].set(ln_scale.astype(jnp.float32))
    sb = sb.at[1, :c].set(ln_bias.astype(jnp.float32))
    sb = sb.at[2, :].set(b1.astype(jnp.float32))
    sb = sb.at[3, :c].set(b2.astype(jnp.float32))

    kernel = functools.partial(_ffn_kernel, eps=float(eps), out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(vp // row_block,),
        in_specs=[
            pl.BlockSpec((row_block, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vp, c), x.dtype),
        interpret=interpret,
    )(x, w1.astype(bf), w2.astype(bf), sb)
    return out[:v]
