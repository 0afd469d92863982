"""Parity: Pallas fused window attention vs the einsum reference path.

Runs the kernel through the Pallas interpreter on the CPU test platform
(MSSVT_PALLAS=interpret) and compares against the einsum implementation with
shared parameters.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mssvt_tpu.models.model_utils.attention import MixedScaleAttention
from mssvt_tpu.ops.pallas_attention import fused_window_attention


def _ref_core(q, k, v, bias, num_heads, scale):
    """Plain numpy-style reference of the fused kernel contract."""
    nw, nq, d = q.shape
    groups = len(num_heads)
    tot_heads = sum(num_heads)
    ph = d // tot_heads
    nk = k.shape[1] // groups
    out = np.zeros((nw, nq, d), np.float32)
    t = 0
    for g, h in enumerate(num_heads):
        for _ in range(h):
            ch = slice(t * ph, (t + 1) * ph)
            kr = slice(g * nk, (g + 1) * nk)
            s = q[:, :, ch] @ np.swapaxes(k[:, kr, ch], 1, 2) * scale
            s = s + bias[:, None, kr]
            s = s - s.max(-1, keepdims=True)
            e = np.exp(s)
            a = e / e.sum(-1, keepdims=True)
            out[:, :, ch] = a @ v[:, kr, ch]
            t += 1
    return out


def test_fused_kernel_matches_reference_core():
    rng = np.random.default_rng(0)
    nw, nq, nk_tot, d = 12, 32, 64, 128
    num_heads = (2, 2)
    q = rng.normal(size=(nw, nq, d)).astype(np.float32)
    k = rng.normal(size=(nw, nk_tot, d)).astype(np.float32)
    v = rng.normal(size=(nw, nk_tot, d)).astype(np.float32)
    km = rng.random((nw, nk_tot)) < 0.3
    bias = np.where(km, -100.0, 0.0).astype(np.float32)
    scale = (d // sum(num_heads)) ** -0.5

    got = np.asarray(fused_window_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        num_heads=num_heads, scale=scale, interpret=True,
    )).astype(np.float32)
    want = _ref_core(q, k, v, bias, num_heads, scale)
    # bf16 inputs inside the kernel -> loose tolerance
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.1)


def test_module_fused_path_matches_einsum_path():
    rng = np.random.default_rng(1)
    nw, nq, nk_tot, d = 10, 16, 32, 64
    num_heads = (2, 2)
    q = jnp.asarray(rng.normal(size=(nw, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(nw, nk_tot, d)).astype(np.float32))
    qm = jnp.asarray(rng.random((nw, nq)) < 0.2)
    km = jnp.asarray(rng.random((nw, nk_tot)) < 0.2)

    m = MixedScaleAttention(embed_dim=d, num_heads=num_heads)
    params = m.init(jax.random.PRNGKey(0), q, k, qm, km)

    os.environ["MSSVT_PALLAS"] = "off"
    try:
        want = np.asarray(m.apply(params, q, k, qm, km))
        os.environ["MSSVT_PALLAS"] = "interpret"
        got = np.asarray(m.apply(params, q, k, qm, km))
    finally:
        os.environ["MSSVT_PALLAS"] = "off"
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)
    # padded queries stay zero
    assert np.all(got[np.asarray(qm)] == 0)


def test_fused_kernel_uneven_groups():
    """Groups with different head counts (e.g. [1, 3]) follow the same
    channel layout contract."""
    rng = np.random.default_rng(2)
    nw, nq, nk_tot, d = 8, 8, 32, 128
    num_heads = (1, 3)
    q = rng.normal(size=(nw, nq, d)).astype(np.float32)
    k = rng.normal(size=(nw, nk_tot, d)).astype(np.float32)
    v = rng.normal(size=(nw, nk_tot, d)).astype(np.float32)
    bias = np.zeros((nw, nk_tot), np.float32)
    scale = (d // 4) ** -0.5
    got = np.asarray(fused_window_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        num_heads=num_heads, scale=scale, interpret=True,
    )).astype(np.float32)
    want = _ref_core(q, k, v, bias, num_heads, scale)
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.1)
