"""CaDDN camera branch: LID math, frustum sampler, DDN loss (verdict item 9).

Hand-computed values for the depth-bin LID discretization and the
frustum→voxel bilinear sampler, plus behavioral checks on the focal
fg/bg-balanced depth-distribution loss (ref: image_vfe_modules/ffn/ddn_loss).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mssvt_tpu.models.backbones_3d.image_vfe import (
    DepthFFN,
    ImageVFE,
    bin_depths_lid,
    ddn_loss,
)


def test_lid_bin_math_hand_values():
    """LID: bin i spans [dmin + w*i(i+1)/2, dmin + w*(i+1)(i+2)/2) with
    w = 2(dmax-dmin)/(D(D+1)); the continuous index at a bin's LEFT edge is
    exactly i - 0.5... the reference formula gives index i at the bin
    center-of-mass; check exact closed-form values."""
    d_min, d_max, n = 2.0, 46.8, 80
    w = 2 * (d_max - d_min) / (n * (1 + n))
    # depth at the analytic solution of idx = k: d = dmin + w*k(k+1)/2... the
    # formula idx = -0.5 + 0.5*sqrt(1 + 8(d-dmin)/w) inverts to
    # d = dmin + w * idx(idx+1)/2
    for k in [0.0, 1.0, 7.5, 40.0, 79.0]:
        d = d_min + w * k * (k + 1) / 2
        got = float(bin_depths_lid(jnp.asarray(d), d_min, d_max, n))
        assert got == pytest.approx(k, abs=1e-4), (k, got)
    # clamping: in front of dmin -> bin 0; beyond dmax -> last bin
    assert float(bin_depths_lid(jnp.asarray(0.5), d_min, d_max, n)) == 0.0
    assert float(bin_depths_lid(jnp.asarray(100.0), d_min, d_max, n)) \
        == pytest.approx(n - 1, abs=1e-3)
    # NaN-free for adversarial inputs
    assert np.isfinite(float(bin_depths_lid(jnp.asarray(-5.0), d_min, d_max, n)))


def test_frustum_sampler_hand_values():
    """A voxel center projecting exactly onto feature pixel (u, v) with a
    known depth must return feat[v, u] * depth_prob at its LID bin."""
    grid = (2, 1, 1)
    vs = (1.0, 1.0, 1.0)
    pcr = (9.5, -0.5, -0.5, 11.5, 0.5, 0.5)  # voxel centers x = 10, 11
    n_bins = 4
    model = ImageVFE(
        model_cfg={"FFN": {"DDN_CFG": {"NUM_CHANNELS": 4, "NUM_BLOCKS": 1}},
                   "DISCRETIZE": {"DEPTH_MIN": 2.0, "DEPTH_MAX": 20.0,
                                  "NUM_BINS": n_bins}},
        grid_size=grid, voxel_size=vs, point_cloud_range=pcr,
    )
    # lidar (x fwd, y left, z up) -> camera (z fwd): standard KITTI-ish
    l2c = np.array([[0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                    [0, 0, 0, 1]], np.float32)
    # pinhole f=8, principal point at (8, 8) in FULL-image pixels
    c2i = np.array([[8.0, 0, 8, 0], [0, 8, 8, 0], [0, 0, 1, 0]], np.float32)
    images = np.zeros((1, 16, 16, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images),
                           jnp.asarray(l2c[None]), jnp.asarray(c2i[None]))
    vox, depth_logits = model.apply(
        variables, jnp.asarray(images), jnp.asarray(l2c[None]),
        jnp.asarray(c2i[None]))
    # voxel at x=10 projects to pixel (8, 8) full-res -> feature pixel
    # (4, 4) at stride 2 (NUM_BLOCKS=1), depth 10
    feat, _ = DepthFFN(num_depth_bins=n_bins, num_channels=4,
                       num_blocks=1).apply(
        {"params": variables["params"]["ffn"],
         "batch_stats": variables["batch_stats"]["ffn"]},
        jnp.asarray(images))
    p = jax.nn.softmax(depth_logits, axis=-1)[..., :n_bins]
    dbin = float(bin_depths_lid(jnp.asarray(10.0), 2.0, 20.0, n_bins))
    b0 = int(dbin)
    frac = dbin - b0
    pexp = ((1 - frac) * p[0, 4, 4, b0]
            + frac * p[0, 4, 4, min(b0 + 1, n_bins - 1)])
    want = np.asarray(feat)[0, 4, 4] * float(pexp)
    got = np.asarray(vox)[0, 0, 0, 0]  # voxel (ix=0 -> x=10)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ddn_loss_focal_and_balancer():
    b, h, w, n_bins = 1, 4, 4, 8
    rng = np.random.default_rng(0)
    depth_maps = np.full((b, 8, 8), 10.0, np.float32)
    target_bin = int(bin_depths_lid(jnp.asarray(10.0), 2.0, 46.8, n_bins))

    # perfect logits -> tiny loss; uniform logits -> larger
    perfect = np.full((b, h, w, n_bins + 1), -20.0, np.float32)
    perfect[..., target_bin] = 20.0
    l_perf, _ = ddn_loss(jnp.asarray(perfect), jnp.asarray(depth_maps),
                         2.0, 46.8, n_bins)
    uniform = np.zeros((b, h, w, n_bins + 1), np.float32)
    l_unif, _ = ddn_loss(jnp.asarray(uniform), jnp.asarray(depth_maps),
                         2.0, 46.8, n_bins)
    assert float(l_perf) < 1e-6 < float(l_unif)

    # fg weighting: a box covering everything raises the loss ~13x
    boxes = np.asarray([[[0.0, 0, 8, 8]]], np.float32)
    l_fg, _ = ddn_loss(jnp.asarray(uniform), jnp.asarray(depth_maps),
                       2.0, 46.8, n_bins, gt_boxes2d=jnp.asarray(boxes))
    assert float(l_fg) == pytest.approx(13.0 * float(l_unif), rel=1e-5)

    # pixels without depth are masked
    nodepth = np.zeros((b, 8, 8), np.float32)
    l_mask, _ = ddn_loss(jnp.asarray(uniform), jnp.asarray(nodepth),
                         2.0, 46.8, n_bins)
    assert float(l_mask) == 0.0


def test_depth_ffn_deeplab_structure():
    """The upgraded FFN carries ResNet blocks + ASPP (not the old flat conv
    stack): params include stage blocks and aspp heads; output contract is
    unchanged (stride 2^num_blocks, D+1 logits)."""
    m = DepthFFN(num_depth_bins=8, num_channels=8, num_blocks=3,
                 blocks_per_stage=2)
    x = jnp.zeros((1, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    names = set(variables["params"].keys())
    assert {"stem", "stage1_block0", "stage1_block1", "stage2_block0",
            "aspp", "feat_head", "depth_head"} <= names
    feat, logits = m.apply(variables, x)
    assert feat.shape == (1, 4, 4, 8)
    assert logits.shape == (1, 4, 4, 9)
