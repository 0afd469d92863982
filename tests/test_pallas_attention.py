"""Parity: Pallas fused window attention vs the einsum reference path.

Runs the kernel through the Pallas interpreter on the CPU test platform
(MSSVT_PALLAS=interpret) and compares against the einsum implementation with
shared parameters.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mssvt_tpu.models.model_utils.attention import MixedScaleAttention
from mssvt_tpu.ops.pallas_attention import fused_window_attention


def _blockdiag(per_group_ws, d):
    w = np.zeros((d, d), np.float32)
    start = 0
    for wg in per_group_ws:
        sd = wg.shape[0]
        w[start:start + sd, start:start + sd] = wg
        start += sd
    return w


def _ref_full(query, keys, proj, bias, num_heads, scale):
    """Numpy reference of the fully-fused kernel contract (projections +
    per-head attention + out projection)."""
    wq, bq, wk, bk, wv, bv, wp, bp = proj
    nw, nq, d = query.shape
    groups = len(num_heads)
    tot_heads = sum(num_heads)
    ph = d // tot_heads
    nk = keys.shape[1] // groups
    q = query @ wq + bq
    k = keys @ wk + bk
    v = keys @ wv + bv
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
    return out @ wp + bp


def _rand_proj(rng, num_heads, d):
    tot_heads = sum(num_heads)
    ph = d // tot_heads
    sds = [ph * h for h in num_heads]
    mk = lambda sd: rng.normal(size=(sd, sd)).astype(np.float32) * 0.3
    wq = _blockdiag([mk(sd) for sd in sds], d)
    wk = _blockdiag([mk(sd) for sd in sds], d)
    wv = _blockdiag([mk(sd) for sd in sds], d)
    wp = _blockdiag([mk(sd) for sd in sds], d)
    bq, bk, bv, bp = (rng.normal(size=(d,)).astype(np.float32) * 0.1
                      for _ in range(4))
    return wq, bq, wk, bk, wv, bv, wp, bp


@pytest.mark.parametrize("num_heads", [(2, 2), (1, 3)])
@pytest.mark.parametrize("compute_dtype,atol,rtol", [
    (jnp.bfloat16, 0.5, 0.1),     # production TPU path (bf16 matmuls)
    (jnp.float32, 2e-4, 2e-4),    # fp32 shadow: catches real kernel bugs
])
def test_fused_kernel_matches_reference_core(num_heads, compute_dtype,
                                             atol, rtol):
    rng = np.random.default_rng(0)
    nw, nq, nk_tot, d = 12, 32, 64, 128
    query = rng.normal(size=(nw, nq, d)).astype(np.float32)
    keys = rng.normal(size=(nw, nk_tot, d)).astype(np.float32)
    km = rng.random((nw, nk_tot)) < 0.3
    bias = np.where(km, -100.0, 0.0).astype(np.float32)
    proj = _rand_proj(rng, num_heads, d)
    scale = (d // sum(num_heads)) ** -0.5

    got = np.asarray(fused_window_attention(
        jnp.asarray(query), jnp.asarray(keys),
        tuple(jnp.asarray(p) for p in proj), jnp.asarray(bias),
        num_heads=num_heads, scale=scale, interpret=True,
        compute_dtype=compute_dtype,
    )).astype(np.float32)
    want = _ref_full(query, keys, proj, bias, num_heads, scale)
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)


def _ref_full_jax(query, keys, proj, bias, num_heads, scale):
    """jax mirror of _ref_full (differentiable reference for grad parity)."""
    wq, bq, wk, bk, wv, bv, wp, bp = proj
    nw, nq, d = query.shape
    groups = len(num_heads)
    tot_heads = sum(num_heads)
    ph = d // tot_heads
    nk = keys.shape[1] // groups
    q = query @ wq + bq
    k = keys @ wk + bk
    v = keys @ wv + bv
    outs = []
    t = 0
    for g, h in enumerate(num_heads):
        for _ in range(h):
            ch = slice(t * ph, (t + 1) * ph)
            kr = slice(g * nk, (g + 1) * nk)
            s = q[:, :, ch] @ jnp.swapaxes(k[:, kr, ch], 1, 2) * scale
            s = s + bias[:, None, kr]
            a = jax.nn.softmax(s, axis=-1)
            outs.append(a @ v[:, kr, ch])
            t += 1
    return jnp.concatenate(outs, axis=-1) @ wp + bp


@pytest.mark.parametrize("num_heads", [(2, 2), (1, 3)])
def test_fused_kernel_grad_parity(num_heads):
    """Custom VJP (Pallas backward, interpret mode, fp32) vs autodiff of the
    einsum reference — tight tolerance on every cotangent."""
    rng = np.random.default_rng(7)
    nw, nq, nk_tot, d = 6, 16, 32, 64
    query = jnp.asarray(rng.normal(size=(nw, nq, d)).astype(np.float32))
    keys = jnp.asarray(rng.normal(size=(nw, nk_tot, d)).astype(np.float32))
    km = rng.random((nw, nk_tot)) < 0.3
    bias = jnp.asarray(np.where(km, -100.0, 0.0).astype(np.float32))
    proj = tuple(jnp.asarray(p)
                 for p in _rand_proj(rng, num_heads, d))
    scale = (d // sum(num_heads)) ** -0.5
    gout = jnp.asarray(rng.normal(size=(nw, nq, d)).astype(np.float32))

    def loss_fused(q, k, pr):
        out = fused_window_attention(
            q, k, pr, bias, num_heads=num_heads, scale=scale,
            interpret=True, compute_dtype=jnp.float32)
        return jnp.sum(out * gout)

    def loss_ref(q, k, pr):
        return jnp.sum(_ref_full_jax(q, k, pr, bias, num_heads, scale) * gout)

    with jax.default_matmul_precision("float32"):
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(query, keys, proj)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(query, keys, proj)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               atol=2e-3, rtol=2e-3)
    labels = ["wq", "bq", "wk", "bk", "wv", "bv", "wp", "bp"]
    for name, a, b in zip(labels, gf[2], gr[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=2e-3, err_msg=name)


def test_module_fused_path_matches_einsum_path(monkeypatch):
    rng = np.random.default_rng(1)
    nw, nq, nk_tot, d = 10, 16, 32, 64
    num_heads = (2, 2)
    q = jnp.asarray(rng.normal(size=(nw, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(nw, nk_tot, d)).astype(np.float32))
    qm = jnp.asarray(rng.random((nw, nq)) < 0.2)
    km = jnp.asarray(rng.random((nw, nk_tot)) < 0.2)

    m = MixedScaleAttention(embed_dim=d, num_heads=num_heads)
    params = m.init(jax.random.PRNGKey(0), q, k, qm, km)

    monkeypatch.setenv("MSSVT_PALLAS", "off")
    want = np.asarray(m.apply(params, q, k, qm, km))
    monkeypatch.setenv("MSSVT_PALLAS", "interpret")
    got = np.asarray(m.apply(params, q, k, qm, km))
    # fp32 module dtype -> fp32 in-kernel compute -> tight tolerance
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    # padded queries stay zero
    assert np.all(got[np.asarray(qm)] == 0)


def test_module_training_grads_fused_vs_einsum(monkeypatch):
    """deterministic=False with dropout=0 routes through the fused kernel;
    parameter grads must match the einsum path (checks the custom VJP through
    the block-diagonal weight assembly)."""
    rng = np.random.default_rng(5)
    nw, nq, nk_tot, d = 4, 16, 32, 64
    q = jnp.asarray(rng.normal(size=(nw, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(nw, nk_tot, d)).astype(np.float32))
    km = jnp.asarray(rng.random((nw, nk_tot)) < 0.2)
    gout = jnp.asarray(rng.normal(size=(nw, nq, d)).astype(np.float32))

    m = MixedScaleAttention(embed_dim=d, num_heads=(2, 2), dropout=0.0)
    params = m.init(jax.random.PRNGKey(0), q, k, None, km)

    def loss(p):
        out = m.apply(p, q, k, None, km, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(out * gout)

    with jax.default_matmul_precision("float32"):
        monkeypatch.setenv("MSSVT_PALLAS", "off")
        g_einsum = jax.grad(loss)(params)
        monkeypatch.setenv("MSSVT_PALLAS", "interpret")
        g_fused = jax.grad(loss)(params)
    flat_e = jax.tree_util.tree_flatten_with_path(g_einsum)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_fused)[0]
    for (pe, ae), (pf, af) in zip(flat_e, flat_f):
        assert pe == pf
        np.testing.assert_allclose(
            np.asarray(af), np.asarray(ae), atol=2e-3, rtol=2e-3,
            err_msg=str(pe))


def test_module_param_tree_identical_between_paths(monkeypatch):
    """Both paths must create the exact same parameter tree (checkpoints
    trained with either path load in the other)."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(4, 16, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(4, 32, 64)).astype(np.float32))
    m = MixedScaleAttention(embed_dim=64, num_heads=(2, 2))
    monkeypatch.setenv("MSSVT_PALLAS", "off")
    p_einsum = m.init(jax.random.PRNGKey(0), q, k)
    monkeypatch.setenv("MSSVT_PALLAS", "interpret")
    p_fused = m.init(jax.random.PRNGKey(0), q, k)
    t1 = jax.tree_util.tree_map(lambda a: a.shape, p_einsum)
    t2 = jax.tree_util.tree_map(lambda a: a.shape, p_fused)
    assert t1 == t2
    for a, b in zip(jax.tree_util.tree_leaves(p_einsum),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # full-model CPU compile >15s
@pytest.mark.parametrize("variant,wb", [("b3d", 2), ("b3d", 16), ("slice", 2), ("qstk", 2), ("qstk", 16)])
def test_fused_kernel_grad_parity_bwd_variants(variant, wb, monkeypatch):
    """Grad parity for the env-selectable backward (variant, supertile)
    points — protects MSSVT_ATTN_BWD_VARIANT/WB A/B runs from silently
    shipping a broken backward."""
    import mssvt_tpu.ops.pallas_attention as pa

    monkeypatch.setattr(pa, "ATTN_BWD_VARIANT", variant)
    monkeypatch.setattr(pa, "ATTN_BWD_WB", wb)
    # the variant globals are read at TRACE time inside jitted wrappers with
    # identical signatures across params — drop cached traces or every case
    # after the first would silently re-test the first variant
    jax.clear_caches()
    rng = np.random.default_rng(11)
    num_heads = (2, 2)
    nw, nq, nk_tot, d = 6, 16, 32, 64
    query = jnp.asarray(rng.normal(size=(nw, nq, d)).astype(np.float32))
    keys = jnp.asarray(rng.normal(size=(nw, nk_tot, d)).astype(np.float32))
    km = rng.random((nw, nk_tot)) < 0.3
    bias = jnp.asarray(np.where(km, -100.0, 0.0).astype(np.float32))
    proj = tuple(jnp.asarray(p) for p in _rand_proj(rng, num_heads, d))
    scale = (d // sum(num_heads)) ** -0.5
    gout = jnp.asarray(rng.normal(size=(nw, nq, d)).astype(np.float32))

    def loss_fused(q, k, pr):
        out = fused_window_attention(
            q, k, pr, bias, num_heads=num_heads, scale=scale,
            interpret=True, compute_dtype=jnp.float32)
        return jnp.sum(out * gout)

    def loss_ref(q, k, pr):
        return jnp.sum(_ref_full_jax(q, k, pr, bias, num_heads, scale) * gout)

    with jax.default_matmul_precision("float32"):
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(query, keys, proj)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(query, keys, proj)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               atol=2e-3, rtol=2e-3)
    for name, a, b in zip(["wq", "bq", "wk", "bk", "wv", "bv", "wp", "bp"],
                          gf[2], gr[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=2e-3, err_msg=name)


@pytest.mark.parametrize("q_prefix,pad_keys", [(True, False), (False, False),
                                               (True, True), (False, True)])
def test_module_assembled_kernel_matches_fallback(monkeypatch, q_prefix,
                                                  pad_keys):
    """The assembled-inputs kernel (in-VMEM K/Q assembly) must match the
    module's XLA fallback assembly + einsum path on identical params.
    ``pad_keys``: ref-compat FPS pad keys (pad1 picks re-routed to the
    per-window pad_row feature instead of zeroed)."""
    rng = np.random.default_rng(11)
    nw, n1cap, nk1, nk2, nq, d = 10, 24, 8, 8, 12, 64
    num_heads = (2, 2)
    win1 = jnp.asarray(rng.normal(size=(nw, n1cap, d)).astype(np.float32))
    k2 = jnp.asarray(rng.normal(size=(nw, nk2, d)).astype(np.float32))
    fps1 = jnp.asarray(rng.integers(0, n1cap, (nw, nk1)).astype(np.int32))
    km1 = jnp.asarray(rng.random((nw, nk1)) < 0.3)
    km2 = jnp.asarray(rng.random((nw, nk2)) < 0.2)
    km = jnp.concatenate([km1, km2], axis=1)
    qm = jnp.asarray(rng.random((nw, nq)) < 0.2)
    q_ext = (None if q_prefix
             else jnp.asarray(rng.normal(size=(nw, nq, d))
                              .astype(np.float32))
             )
    if q_ext is not None:  # ext rows arrive zeroed for masked queries
        q_ext = q_ext * (~qm)[..., None]
    asm = dict(
        win1_fea=win1, k2_fea=k2, fps1=fps1, k_mask1=km1, q_ext=q_ext,
        q_keep=(~qm).astype(jnp.float32),
        q_rel=tuple(jnp.asarray(rng.normal(size=(nw, nq))
                                .astype(np.float32)) for _ in range(3)),
        k_rel=tuple(jnp.asarray(rng.normal(size=(nw, nk1 + nk2))
                                .astype(np.float32)) for _ in range(3)),
        pos_base=jnp.asarray(rng.normal(size=(nw, d)).astype(np.float32)),
        pos_w=jnp.asarray(rng.normal(size=(3, d)).astype(np.float32)),
        nq=nq,
    )
    if pad_keys:
        asm["pad1"] = jnp.asarray(rng.random((nw, nk1)) < 0.3)
        asm["pad_row"] = jnp.asarray(
            rng.normal(size=(nw, d)).astype(np.float32))
    m = MixedScaleAttention(embed_dim=d, num_heads=num_heads)
    params = m.init(jax.random.PRNGKey(0), query_mask=qm, key_masks=km,
                    assembled=asm)

    monkeypatch.setenv("MSSVT_PALLAS", "off")   # fallback assembly + einsum
    want = np.asarray(m.apply(params, query_mask=qm, key_masks=km,
                              assembled=asm))
    monkeypatch.setenv("MSSVT_PALLAS", "interpret")  # assembled kernel
    got = np.asarray(m.apply(params, query_mask=qm, key_masks=km,
                             assembled=asm))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    assert np.all(got[np.asarray(qm)] == 0)


@pytest.mark.parametrize("q_prefix", [True, False])
def test_assembled_train_kernel_grad_parity(q_prefix):
    """The trainable assembled kernel's custom VJP (in-VMEM assembly
    recompute + qstk-core backward + cotangent re-split through the
    assembly) must match autodiff through the pure-jnp assembly +
    reference attention on every differentiable input."""
    from mssvt_tpu.ops.pallas_attention import (
        fused_window_attention_assembled_train)

    rng = np.random.default_rng(3)
    num_heads = (2, 2)
    nw, n1cap, nk1, nk2, nq, d = 6, 12, 8, 8, 4, 64
    nk_tot = nk1 + nk2
    scale = (d // sum(num_heads)) ** -0.5

    win1 = jnp.asarray(rng.normal(size=(nw, n1cap, d)).astype(np.float32))
    k2f = jnp.asarray(rng.normal(size=(nw, nk2, d)).astype(np.float32))
    fps1 = jnp.asarray(rng.integers(0, n1cap, (nw, nk1)), jnp.int32)
    km1 = jnp.asarray(rng.random((nw, nk1)) < 0.25)
    q_ext = (jnp.zeros((nw, 1, d), jnp.float32) if q_prefix
             else jnp.asarray(rng.normal(size=(nw, nq, d)).astype(np.float32)))
    q_keep = jnp.asarray((rng.random((nw, nq)) < 0.9).astype(np.float32))
    k_rel = tuple(jnp.asarray(rng.normal(size=(nw, nk_tot)).astype(np.float32))
                  for _ in range(3))
    q_rel = tuple(jnp.asarray(rng.normal(size=(nw, nq)).astype(np.float32))
                  for _ in range(3))
    base = jnp.asarray(rng.normal(size=(nw, d)).astype(np.float32))
    posw = jnp.asarray(rng.normal(size=(3, d)).astype(np.float32))
    proj = tuple(jnp.asarray(p) for p in _rand_proj(rng, num_heads, d))
    km = rng.random((nw, nk_tot)) < 0.2
    bias = jnp.asarray(np.where(km, -100.0, 0.0).astype(np.float32))
    pad_row = jnp.asarray(rng.normal(size=(nw, d)).astype(np.float32))
    gout = jnp.asarray(rng.normal(size=(nw, nq, d)).astype(np.float32))
    nv = jnp.asarray(nw, jnp.int32)

    def loss_kernel(win1, k2f, q_ext, base, posw, proj, pad_row):
        out = fused_window_attention_assembled_train(
            win1, k2f, fps1, km1, q_ext, q_keep, k_rel, q_rel, base, posw,
            proj, bias, num_heads=num_heads, scale=scale, q_prefix=q_prefix,
            nq=nq, pad_row=pad_row, num_valid=nv, window_block=2,
            interpret=True, compute_dtype=jnp.float32)
        return jnp.sum(out * gout)

    def loss_ref(win1, k2f, q_ext, base, posw, proj, pad_row):
        # pure-jnp mirror of the in-kernel assembly (see _assemble_tokens)
        take = jnp.take_along_axis(win1, fps1[..., None], axis=1)
        k1 = (take * (~km1)[..., None]
              + km1[..., None] * pad_row[:, None, :])

        def pos(rel):
            rx, ry, rz = rel
            return jax.nn.relu(rx[..., None] * posw[0] + ry[..., None] * posw[1]
                               + rz[..., None] * posw[2] + base[:, None, :])

        keys = jnp.concatenate([k1, k2f], axis=1) + pos(k_rel)
        q_raw = win1[:, :nq] if q_prefix else q_ext
        query = q_raw * q_keep[..., None] + pos(q_rel)
        return jnp.sum(_ref_full_jax(query, keys, proj, bias,
                                     num_heads, scale) * gout)

    args = (win1, k2f, q_ext, base, posw, proj, pad_row)
    with jax.default_matmul_precision("float32"):
        out_k = loss_kernel(*args)
        out_r = loss_ref(*args)
        gk = jax.grad(loss_kernel, argnums=tuple(range(7)))(*args)
        gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    np.testing.assert_allclose(float(out_k), float(out_r), rtol=2e-4)
    names = ["win1", "k2", "q_ext", "base", "posw", "proj", "pad_row"]
    for name, a, b in zip(names, gk, gr):
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), atol=5e-3, rtol=5e-3,
                err_msg=name)
