"""Parity against the ACTUAL reference source (not hand-written replicas).

Loads the reference's pure-torch modules from /root/reference via
``ref_loader`` and uses them as oracles for:

- ``MixedScaleAttention`` (ref: mssvt_utils.py:65-157) — per-group key
  slicing (:106,117) and the additive -100 key mask (:129-134) — against our
  flax module under ``convert_state_dict``-imported weights.
- the block's voxel query table (ref: mssvt_backbone.py:73-122).
- the pos-MLP (ref: mssvt_backbone.py:43-54,278-282) shallow + deep forms.
- the FFN tail ordering (ref: mssvt_backbone.py:338-343), including the
  fused Pallas residual+LN+FFN path.
- ``get_corner_loss_lidar`` (ref: loss_utils.py:209-233).
- box coders (ref: box_coder_utils.py:5-222): ResidualCoder (both heading
  encodings), the legacy decoders, and PointResidualCoder.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from ref_loader import cpu_cuda_shim, load_ref

F32 = jax.default_matmul_precision("float32")


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _state_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------- attention


@pytest.mark.parametrize("heads", [(2, 2), (1, 3)])
def test_mixed_scale_attention_parity_vs_reference_source(heads):
    """Output equality vs the reference MixedScaleAttention loaded from
    /root/reference, including asymmetric head groups (per-group channel
    slices of different widths) and key-padding masks."""
    from mssvt_tpu.models.model_utils.attention import MixedScaleAttention
    from mssvt_tpu.runtime.torch_import import convert_state_dict

    mu = load_ref("models.model_utils.mssvt_utils")
    torch.manual_seed(0)
    d, nw, nq, nk_tot = 16, 4, 6, 10  # nk_tot = 5 per group
    ref = mu.MixedScaleAttention(embed_dim=d, num_heads=list(heads))
    ref.eval()

    rng = np.random.default_rng(1)
    q = rng.normal(size=(nw, nq, d)).astype(np.float32)
    k = rng.normal(size=(nw, nk_tot, d)).astype(np.float32)
    km = rng.random((nw, nk_tot)) < 0.3
    with torch.no_grad():
        want = ref(_t(q), _t(k), batch_first=True,
                   key_masks=_t(km)).numpy()

    model = MixedScaleAttention(embed_dim=d, num_heads=heads)
    with F32:
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(q),
                               jnp.asarray(k), None, jnp.asarray(km))
    wrapped = {k2: {"backbone_3d": {"blocks_0": {"ms_attn": v}}}
               for k2, v in variables.items()}
    state = {f"backbone_3d.backbone.0.ms_attn.{k2}": v
             for k2, v in _state_np(ref).items()}
    new_vars, report = convert_state_dict(state, wrapped)
    assert not report["missing"] and not report["unused"], report
    with F32:
        got = np.asarray(model.apply(
            {k2: v["backbone_3d"]["blocks_0"]["ms_attn"]
             for k2, v in new_vars.items()},
            jnp.asarray(q), jnp.asarray(k), None, jnp.asarray(km)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_attention_query_mask_zeroing_vs_reference():
    """query_mask zeroes masked query rows (ref: mssvt_utils.py:151-152)."""
    from mssvt_tpu.models.model_utils.attention import MixedScaleAttention
    from mssvt_tpu.runtime.torch_import import convert_state_dict

    mu = load_ref("models.model_utils.mssvt_utils")
    torch.manual_seed(3)
    d, nw, nq, nk_tot = 8, 2, 4, 6
    ref = mu.MixedScaleAttention(embed_dim=d, num_heads=[1, 1])
    ref.eval()
    rng = np.random.default_rng(2)
    q = rng.normal(size=(nw, nq, d)).astype(np.float32)
    k = rng.normal(size=(nw, nk_tot, d)).astype(np.float32)
    km = rng.random((nw, nk_tot)) < 0.4
    qm = rng.random((nw, nq)) < 0.5
    with torch.no_grad():
        want = ref(_t(q), _t(k), batch_first=True, query_mask=_t(qm),
                   key_masks=_t(km)).numpy()
    model = MixedScaleAttention(embed_dim=d, num_heads=(1, 1))
    with F32:
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(q),
                               jnp.asarray(k), jnp.asarray(qm),
                               jnp.asarray(km))
    wrapped = {k2: {"backbone_3d": {"blocks_0": {"ms_attn": v}}}
               for k2, v in variables.items()}
    state = {f"backbone_3d.backbone.0.ms_attn.{k2}": v
             for k2, v in _state_np(ref).items()}
    new_vars, report = convert_state_dict(state, wrapped)
    assert not report["missing"] and not report["unused"], report
    with F32:
        got = np.asarray(model.apply(
            {k2: v["backbone_3d"]["blocks_0"]["ms_attn"]
             for k2, v in new_vars.items()},
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(qm),
            jnp.asarray(km)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    assert np.all(got[qm] == 0.0)


# ------------------------------------------------------- block-level pieces


def _make_ref_block(bb, in_c=16, ff_c=32, out_c=16, two_scale=True):
    win = [[3, 3, 2], [9, 9, 4]] if two_scale else [[3, 3, 2]]
    with cpu_cuda_shim():
        blk = bb.MixedScaleSparseTransformerBlock(
            cfg=None, in_channels=in_c, ff_channels=ff_c, out_channels=out_c,
            num_heads=[2, 2], dropout=0.0, drop_path=0.0, window_size=win,
        )
    blk.eval()
    return blk


def test_query_table_parity_vs_reference_source():
    """Our query tables carry the same offset multisets per category (odd /
    even / rest-of-win1 / win2-only) as the REAL reference builder
    (mssvt_backbone.py:73-122), in non-decreasing Chebyshev order.

    (Within equal-distance shells the reference's ordering comes from an
    unstable torch.sort — not a contract; category membership and
    nearest-first fill are.)
    """
    from mssvt_tpu.ops.window import ODD, EVEN, WIN1, WIN2, build_query_tables

    bb = load_ref("models.backbones_3d.mssvt_backbone")
    blk = _make_ref_block(bb)
    ref_tab = {k: v.numpy() for k, v in blk.vox_query_table.items()}

    tabs = build_query_tables((3, 3, 2), (9, 9, 4))
    off = tabs.offsets  # (K, 3) int, our concatenated table
    elig = tabs.eligibility

    ours = {
        "odd": off[elig[:, ODD]],
        "even": off[elig[:, EVEN]],
        "win1": off[elig[:, WIN1] & ~(elig[:, ODD] | elig[:, EVEN])],
        "win2": off[elig[:, WIN2] & ~elig[:, WIN1]],
    }
    for name in ("odd", "even", "win1", "win2"):
        a = ours[name]
        b = ref_tab[name]
        assert a.shape == b.shape, (name, a.shape, b.shape)
        # same multiset of offsets
        a_set = set(map(tuple, a.tolist()))
        b_set = set(map(tuple, b.tolist()))
        assert a_set == b_set, name
        # both nearest-first (non-decreasing Chebyshev distance)
        for arr in (a, b):
            d = np.abs(arr).max(axis=1)
            assert np.all(np.diff(d) >= 0), name
    assert blk.max_num_odd == ours["odd"].shape[0]
    assert blk.max_num_even == ours["even"].shape[0]


def test_pos_proj_parity_vs_reference_source():
    """Shallow (two-scale) and deep (single-scale) pos-MLPs against the ref
    block's Conv1d stacks (mssvt_backbone.py:43-54), including from_planes."""
    from mssvt_tpu.models.model_utils.layers import PosProjection

    bb = load_ref("models.backbones_3d.mssvt_backbone")
    rng = np.random.default_rng(3)
    nw, n, c = 5, 7, 16
    x = rng.normal(size=(nw, n, 6)).astype(np.float32)

    for two_scale in (True, False):
        blk = _make_ref_block(bb, two_scale=two_scale)
        # ref applies the MLP channel-first: (nw, 6, n)
        with torch.no_grad():
            want = blk.pos_proj(_t(np.transpose(x, (0, 2, 1)))).numpy()
        want = np.transpose(want, (0, 2, 1))  # back to (nw, n, C)

        model = PosProjection(c, deep=not two_scale)
        params = {"proj0": {
            "kernel": jnp.asarray(
                blk.pos_proj[0].weight.detach().numpy()[:, :, 0].T),
            "bias": jnp.asarray(blk.pos_proj[0].bias.detach().numpy()),
        }}
        if not two_scale:
            params["proj1"] = {
                "kernel": jnp.asarray(
                    blk.pos_proj[2].weight.detach().numpy()[:, :, 0].T),
                "bias": jnp.asarray(blk.pos_proj[2].bias.detach().numpy()),
            }
        with F32:
            got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

        if two_scale:
            # plane-decomposed form: rel planes + per-window center scalars
            rel = x[..., :3]
            ctr = x[:, 0, 3:]  # centers are constant per window in real use
            x2 = np.concatenate(
                [rel, np.broadcast_to(ctr[:, None], (nw, n, 3))], axis=-1)
            with torch.no_grad():
                want2 = blk.pos_proj(
                    _t(np.transpose(x2, (0, 2, 1)))).numpy()
            want2 = np.transpose(want2, (0, 2, 1))
            with F32:
                got2 = np.asarray(model.apply(
                    {"params": params}, jnp.asarray(rel[..., 0]),
                    jnp.asarray(rel[..., 1]), jnp.asarray(rel[..., 2]),
                    jnp.asarray(ctr[:, 0]), jnp.asarray(ctr[:, 1]),
                    jnp.asarray(ctr[:, 2]), method="from_planes"))
            np.testing.assert_allclose(got2, want2, atol=1e-5, rtol=1e-5)


def test_ffn_tail_parity_vs_reference_source():
    """Residual + pre-norm FFN ordering (ref: mssvt_backbone.py:338-343):
    new = x + shortcut; new + linear2(relu(linear1(norm2(new)))) — checked
    against the ref block's own norm2/linear1/linear2 modules in eval mode,
    on both our unfused formulation and the fused Pallas kernel
    (interpret mode)."""
    from mssvt_tpu.ops.pallas_ffn import fused_residual_ffn

    bb = load_ref("models.backbones_3d.mssvt_backbone")
    blk = _make_ref_block(bb, in_c=16, ff_c=32)
    rng = np.random.default_rng(4)
    v, c = 11, 16
    upd = rng.normal(size=(v, c)).astype(np.float32)
    shortcut = rng.normal(size=(v, c)).astype(np.float32)

    # the reference tail, executed with the ref block's own modules
    # (drop_path/dropout are identity in eval)
    with torch.no_grad():
        new = _t(upd) + _t(shortcut)
        act = blk.linear2(blk.activation(blk.linear1(blk.norm2(new))))
        want = (new + act).numpy()

    pn_scale = jnp.asarray(blk.norm2.weight.detach().numpy())
    pn_bias = jnp.asarray(blk.norm2.bias.detach().numpy())
    w1 = jnp.asarray(blk.linear1.weight.detach().numpy().T)
    b1 = jnp.asarray(blk.linear1.bias.detach().numpy())
    w2 = jnp.asarray(blk.linear2.weight.detach().numpy().T)
    b2 = jnp.asarray(blk.linear2.bias.detach().numpy())

    x = jnp.asarray(upd) + jnp.asarray(shortcut)
    with F32:
        # unfused formulation (the flax eval path)
        ln = (x - x.mean(-1, keepdims=True)) / jnp.sqrt(
            x.var(-1, keepdims=True) + 1e-6) * pn_scale + pn_bias
        got_unfused = np.asarray(
            x + jax.nn.relu(ln @ w1 + b1) @ w2 + b2)
        got_fused = np.asarray(fused_residual_ffn(
            x, pn_scale, pn_bias, w1, b1, w2, b2, interpret=True))
    np.testing.assert_allclose(got_unfused, want, atol=2e-5, rtol=2e-5)
    # the fused kernel runs its GEMMs in bf16 by design (pallas_ffn.py:64)
    np.testing.assert_allclose(got_fused, want, atol=3e-2, rtol=3e-2)


# ------------------------------------------------------------------- losses


def test_corner_loss_parity_vs_reference_source():
    lu = load_ref("utils.loss_utils")
    from mssvt_tpu.models.losses import get_corner_loss_lidar

    rng = np.random.default_rng(5)
    n = 64
    pred = np.concatenate([
        rng.uniform(-40, 40, (n, 3)), rng.uniform(0.5, 6, (n, 3)),
        rng.uniform(-np.pi, np.pi, (n, 1)),
    ], axis=1).astype(np.float32)
    gt = pred + rng.normal(0, 0.4, pred.shape).astype(np.float32)
    with torch.no_grad():
        want = lu.get_corner_loss_lidar(_t(pred), _t(gt)).numpy()
    with F32:
        got = np.asarray(get_corner_loss_lidar(
            jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_corner_loss_flip_invariance():
    """pi-flipped GT headings give the same loss (the min over flips)."""
    from mssvt_tpu.models.losses import get_corner_loss_lidar

    rng = np.random.default_rng(6)
    pred = np.array([[0, 0, 0, 4, 2, 1.5, 0.3]], np.float32)
    gt = np.array([[0.2, -0.1, 0, 4, 2, 1.5, 0.25]], np.float32)
    gt_flip = gt.copy()
    gt_flip[:, 6] += np.pi
    a = np.asarray(get_corner_loss_lidar(jnp.asarray(pred), jnp.asarray(gt)))
    b = np.asarray(get_corner_loss_lidar(jnp.asarray(pred),
                                         jnp.asarray(gt_flip)))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow  # full-model CPU compile >15s
def test_roi_box_loss_corner_term_changes_loss():
    """corner_loss_weight wires through roi_box_loss and is differentiable."""
    from mssvt_tpu.models.roi_heads.roi_head_template import roi_box_loss

    rng = np.random.default_rng(7)
    b, r = 2, 8
    reg = jnp.asarray(rng.normal(0, 0.1, (b, r, 7)).astype(np.float32))
    gt = jnp.asarray(np.concatenate([
        rng.normal(0, 0.3, (b, r, 3)), rng.uniform(1, 4, (b, r, 3)),
        rng.normal(0, 0.2, (b, r, 1)), np.ones((b, r, 1))], -1,
        dtype=np.float32))
    rois = jnp.asarray(np.concatenate([
        rng.normal(0, 10, (b, r, 3)), rng.uniform(1, 4, (b, r, 3)),
        rng.uniform(-3, 3, (b, r, 1))], -1, dtype=np.float32))
    valid = jnp.asarray(rng.random((b, r)) < 0.7)

    base = roi_box_loss(reg, gt, rois, valid)
    with_corner = roi_box_loss(reg, gt, rois, valid, corner_loss_weight=1.0)
    assert float(with_corner) > float(base)
    g = jax.grad(lambda p: roi_box_loss(p, gt, rois, valid,
                                        corner_loss_weight=1.0))(reg)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


# --------------------------------------------------------------- box coders


def test_residual_coder_parity_vs_reference_source():
    bc = load_ref("utils.box_coder_utils")
    from mssvt_tpu.utils.box_coder import ResidualCoder

    rng = np.random.default_rng(8)
    n = 40
    boxes = np.concatenate([
        rng.uniform(-50, 50, (n, 3)), rng.uniform(0.5, 6, (n, 3)),
        rng.uniform(-np.pi, np.pi, (n, 1)), rng.normal(size=(n, 2)),
    ], axis=1).astype(np.float32)
    anchors = np.concatenate([
        rng.uniform(-50, 50, (n, 3)), rng.uniform(0.5, 6, (n, 3)),
        rng.uniform(-np.pi, np.pi, (n, 1)), rng.normal(size=(n, 2)),
    ], axis=1).astype(np.float32)

    for sincos in (False, True):
        ref = bc.ResidualCoder(code_size=7, encode_angle_by_sincos=sincos)
        ours = ResidualCoder(code_size=7, encode_angle_by_sincos=sincos)
        with torch.no_grad():
            want_e = ref.encode_torch(_t(boxes), _t(anchors)).numpy()
            want_d = ref.decode_torch(_t(want_e), _t(anchors)).numpy()
        got_e = np.asarray(ours.encode(jnp.asarray(boxes),
                                       jnp.asarray(anchors)))
        got_d = np.asarray(ours.decode(jnp.asarray(want_e),
                                       jnp.asarray(anchors)))
        np.testing.assert_allclose(got_e, want_e, atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(got_d, want_d, atol=1e-4, rtol=1e-4)


def test_legacy_decoders_parity_vs_reference_source():
    bc = load_ref("utils.box_coder_utils")
    from mssvt_tpu.utils.box_coder import (
        PreviousResidualDecoder, PreviousResidualRoIDecoder)

    rng = np.random.default_rng(9)
    n = 30
    enc = rng.normal(0, 0.4, (n, 9)).astype(np.float32)
    anchors = np.concatenate([
        rng.uniform(-50, 50, (n, 3)), rng.uniform(0.5, 6, (n, 3)),
        rng.uniform(-np.pi, np.pi, (n, 1)), rng.normal(size=(n, 2)),
    ], axis=1).astype(np.float32)

    with torch.no_grad():
        want = bc.PreviousResidualDecoder.decode_torch(
            _t(enc), _t(anchors)).numpy()
        want_roi = bc.PreviousResidualRoIDecoder.decode_torch(
            _t(enc), _t(anchors)).numpy()
    got = np.asarray(PreviousResidualDecoder.decode(
        jnp.asarray(enc), jnp.asarray(anchors)))
    got_roi = np.asarray(PreviousResidualRoIDecoder.decode(
        jnp.asarray(enc), jnp.asarray(anchors)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(got_roi, want_roi, atol=1e-4, rtol=1e-4)


def test_point_residual_coder_parity_vs_reference_source():
    bc = load_ref("utils.box_coder_utils")
    from mssvt_tpu.utils.box_coder import PointResidualCoder

    rng = np.random.default_rng(10)
    n = 30
    mean_size = [[4.0, 2.0, 1.6], [0.9, 0.7, 1.7], [1.8, 0.7, 1.7]]
    gt = np.concatenate([
        rng.uniform(-50, 50, (n, 3)), rng.uniform(0.5, 6, (n, 3)),
        rng.uniform(-np.pi, np.pi, (n, 1)),
    ], axis=1).astype(np.float32)
    pts = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    cls = rng.integers(1, 4, n)

    # use_mean_size=True (ref pins the table to .cuda(); shim it)
    with cpu_cuda_shim():
        ref = bc.PointResidualCoder(code_size=8, use_mean_size=True,
                                    mean_size=mean_size)
    ours = PointResidualCoder(code_size=8, use_mean_size=True,
                              mean_size=mean_size)
    with torch.no_grad():
        want_e = ref.encode_torch(_t(gt.copy()), _t(pts),
                                  _t(cls)).numpy()
        want_d = ref.decode_torch(_t(want_e), _t(pts), _t(cls)).numpy()
    got_e = np.asarray(ours.encode(jnp.asarray(gt), jnp.asarray(pts),
                                   jnp.asarray(cls)))
    got_d = np.asarray(ours.decode(jnp.asarray(want_e), jnp.asarray(pts),
                                   jnp.asarray(cls)))
    np.testing.assert_allclose(got_e, want_e, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(got_d, want_d, atol=1e-4, rtol=1e-4)

    ref2 = bc.PointResidualCoder(code_size=8, use_mean_size=False)
    ours2 = PointResidualCoder(code_size=8, use_mean_size=False)
    with torch.no_grad():
        want_e = ref2.encode_torch(_t(gt.copy()), _t(pts)).numpy()
        want_d = ref2.decode_torch(_t(want_e), _t(pts)).numpy()
    got_e = np.asarray(ours2.encode(jnp.asarray(gt), jnp.asarray(pts)))
    got_d = np.asarray(ours2.decode(jnp.asarray(want_e), jnp.asarray(pts)))
    np.testing.assert_allclose(got_e, want_e, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(got_d, want_d, atol=1e-4, rtol=1e-4)
