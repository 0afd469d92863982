"""End-to-end model smoke tests on a tiny synthetic config (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mssvt_tpu.models import build_network
from mssvt_tpu.utils.edict import EasyDict

GRID = (24, 24, 8)  # x, y, z
VOXEL_SIZE = (0.4, 0.4, 0.5)
PC_RANGE = (0.0, -4.8, -2.0, 9.6, 4.8, 2.0)
MAX_VOXELS = 512
MAX_PTS = 5
BATCH = 2
MAX_GT = 12
C = 32


def tiny_model_cfg():
    return EasyDict({
        "NAME": "CenterPoint",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {
            "NAME": "MixedScaleSparseTransformer",
            "NUM_OUTPUT_FEATURES": C,
            "PARAMS": [
                {
                    "name": "MixedScaleSparseTransformerBlock",
                    "channels": [C, C * 2, C],
                    "num_heads": [1, 1],
                    "window_size": [[3, 3, 4], [9, 9, 4]],
                    "max_num_win1": 24,
                    "max_num_win2": 48,
                    "max_num_wins": 96,
                    "cbs_mode": "odd_even",
                    "cbs_pattern": 1,
                    "key_num_sample": 8,
                    "use_feature_interpolation": True,
                },
                {
                    "name": "MixedScaleSparseTransformerCompressBlock",
                    "channels": [C, C * 2, C],
                    "num_heads": [2],
                    "window_size": [[2, 2, 4]],
                    "max_num_win1": 16,
                    "max_num_wins": 64,
                },
            ],
        },
        "MAP_TO_BEV": {
            "NAME": "HeightCompression",
            "NUM_BEV_FEATURES": C * 2,  # C * (8/4 z planes)
            "COMPRESS_LAYER_NUMS": 1,
            "LAYER_STRIDES": [1],
            "LAYER_DIALATIONS": [1],
            "LAYER_PADDINGS": [1],
        },
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [1],
            "LAYER_STRIDES": [1],
            "NUM_FILTERS": [C],
            "UPSAMPLE_STRIDES": [1],
            "NUM_UPSAMPLE_FILTERS": [C],
        },
        "DENSE_HEAD": {
            "NAME": "CenterHead",
            "CLASS_NAMES_EACH_HEAD": [["Car", "Ped"]],
            "SHARED_CONV_CHANNEL": 16,
            "USE_BIAS_BEFORE_NORM": False,
            "NUM_HM_CONV": 2,
            "SEPARATE_HEAD_CFG": {
                "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
                "HEAD_DICT": {
                    "center": {"out_channels": 2, "num_conv": 2},
                    "center_z": {"out_channels": 1, "num_conv": 2},
                    "dim": {"out_channels": 3, "num_conv": 2},
                    "rot": {"out_channels": 2, "num_conv": 2},
                },
            },
            "TARGET_ASSIGNER_CONFIG": {
                "FEATURE_MAP_STRIDE": 2,
                "NUM_MAX_OBJS": MAX_GT,
                "GAUSSIAN_OVERLAP": 0.1,
                "MIN_RADIUS": 2,
                "MAX_RADIUS": 8,
            },
            "LOSS_CONFIG": {
                "LOSS_WEIGHTS": {
                    "cls_weight": 1.0,
                    "loc_weight": 2.0,
                    "code_weights": [1.0] * 8,
                },
            },
            "POST_PROCESSING": {
                "SCORE_THRESH": 0.1,
                "POST_CENTER_LIMIT_RANGE": [-10, -10, -10, 20, 10, 10],
                "MAX_OBJ_PER_SAMPLE": 32,
                "NMS_CONFIG": {
                    "NMS_TYPE": "nms_gpu",
                    "NMS_THRESH": 0.7,
                    "NMS_PRE_MAXSIZE": 32,
                    "NMS_POST_MAXSIZE": 16,
                },
            },
        },
    })


def synthetic_batch(rng):
    n = 300
    coords = np.unique(np.stack([
        rng.integers(0, BATCH, n),
        rng.integers(0, GRID[2], n),
        rng.integers(0, GRID[1], n),
        rng.integers(0, GRID[0], n),
    ], 1), axis=0).astype(np.int32)
    n = len(coords)
    pad = np.full((MAX_VOXELS, 4), -1, np.int32)
    pad[:n] = coords
    valid = np.arange(MAX_VOXELS) < n
    voxels = rng.normal(size=(MAX_VOXELS, MAX_PTS, 5)).astype(np.float32)
    voxels *= valid[:, None, None]
    num_points = (np.ones(MAX_VOXELS) * 3) * valid

    gt = np.zeros((BATCH, MAX_GT, 8), np.float32)
    for b in range(BATCH):
        for k in range(4):
            gt[b, k] = [
                rng.uniform(1, 8), rng.uniform(-4, 4), rng.uniform(-1, 1),
                rng.uniform(1, 3), rng.uniform(1, 2), rng.uniform(1, 2),
                rng.uniform(-np.pi, np.pi), rng.integers(1, 3),
            ]
    return {
        "voxels": jnp.asarray(voxels),
        "voxel_num_points": jnp.asarray(num_points, jnp.float32),
        "voxel_coords": jnp.asarray(pad),
        "voxel_valid": jnp.asarray(valid),
        "gt_boxes": jnp.asarray(gt),
    }


@pytest.fixture(scope="module")
def model_and_batch():
    rng = np.random.default_rng(1)
    model = build_network(
        model_cfg=tiny_model_cfg(), num_class=2, class_names=["Car", "Ped"],
        grid_size=GRID, voxel_size=VOXEL_SIZE, point_cloud_range=PC_RANGE,
        batch_size=BATCH, max_voxels=MAX_VOXELS, max_points_per_voxel=MAX_PTS,
    )
    batch = synthetic_batch(rng)
    # jit the init: eager init dispatches thousands of individually-compiled
    # primitives on CPU and takes minutes; one traced compile takes seconds.
    variables = jax.jit(
        lambda k0, k1, b: model.init({"params": k0, "dropout": k1}, b, train=False)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), batch)
    return model, variables, batch


def test_forward_inference(model_and_batch):
    model, variables, batch = model_and_batch
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    boxes, scores, labels, mask = (
        out["final_boxes"], out["final_scores"], out["final_labels"], out["final_mask"],
    )
    assert boxes.shape[0] == BATCH and boxes.shape[-1] == 7
    assert np.isfinite(np.asarray(boxes)).all()
    assert np.isfinite(np.asarray(scores)).all()
    lab = np.asarray(labels)
    msk = np.asarray(mask)
    assert ((lab[msk] >= 1) & (lab[msk] <= 2)).all()


def test_forward_train_loss_and_grads(model_and_batch):
    model, variables, batch = model_and_batch

    def loss_fn(params):
        out, _ = model.apply(
            {**variables, "params": params}, batch, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return out["loss"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # at least the 3D backbone and the head must receive nonzero grads
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0


def test_target_assignment_properties(model_and_batch):
    model, variables, batch = model_and_batch
    out, _ = jax.jit(
        lambda v, b: model.apply(
            v, b, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
        )
    )(variables, batch)
    # loss components present and finite
    assert "rpn_loss" in out["tb_dict"]
    assert np.isfinite(float(out["loss"]))


def test_caddn_camera_branch():
    """CaDDN monocular pipeline e2e on synthetic calib
    (ref: detectors/caddn.py + vfe/image_vfe.py + conv2d_collapse.py)."""
    import jax
    import numpy as np

    from mssvt_tpu.models import build_network
    from mssvt_tpu.utils.edict import EasyDict

    grid = (16, 16, 4)
    vs = (0.8, 0.8, 1.0)
    pcr = (0.0, -6.4, -2.0, 12.8, 6.4, 2.0)
    cfg = EasyDict({
        "NAME": "CaDDN",
        "VFE": {
            "NAME": "ImageVFE",
            "FFN": {"DDN_CFG": {"NUM_CHANNELS": 8, "NUM_BLOCKS": 2}},
            "DISCRETIZE": {"DEPTH_MIN": 2.0, "DEPTH_MAX": 20.0,
                           "NUM_BINS": 16},
            "LOSS_WEIGHT": 3.0,
        },
        "MAP_TO_BEV": {"NAME": "Conv2DCollapse", "NUM_BEV_FEATURES": 16},
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [2], "LAYER_STRIDES": [2],
            "NUM_FILTERS": [16],
            "UPSAMPLE_STRIDES": [2], "NUM_UPSAMPLE_FILTERS": [16],
        },
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle",
            "USE_DIRECTION_CLASSIFIER": False,
            "ANCHOR_GENERATOR_CONFIG": [{
                "class_name": "Car",
                "anchor_sizes": [[3.9, 1.6, 1.56]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [-1.78],
                "align_center": False, "feature_map_stride": 1,
                "matched_threshold": 0.6, "unmatched_threshold": 0.45,
            }],
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0,
                "code_weights": [1.0] * 7}},
        },
        "POST_PROCESSING": {
            "SCORE_THRESH": 0.1,
            "NMS_CONFIG": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
                           "NMS_PRE_MAXSIZE": 32, "NMS_POST_MAXSIZE": 16},
        },
    })
    model = build_network(
        model_cfg=cfg, num_class=1, class_names=["Car"],
        grid_size=grid, voxel_size=vs, point_cloud_range=pcr,
        batch_size=1, max_voxels=64, max_points_per_voxel=1,
    )
    rng = np.random.default_rng(0)
    l2c = np.eye(4, dtype=np.float32)[None]
    # camera looks down lidar +x: cam z = lidar x
    l2c[0, :3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    c2i = np.zeros((1, 3, 4), np.float32)
    c2i[0, 0, 0] = c2i[0, 1, 1] = 30.0  # focal
    c2i[0, 0, 2], c2i[0, 1, 2] = 32.0, 24.0  # principal point
    c2i[0, 2, 2] = 1.0
    batch = {
        "images": rng.uniform(0, 1, (1, 48, 64, 3)).astype(np.float32),
        "trans_lidar_to_cam": l2c,
        "trans_cam_to_img": c2i,
        "depth_maps": rng.uniform(2, 18, (1, 48, 64)).astype(np.float32),
        "gt_boxes": np.array(
            [[[6, 0, -1, 3.9, 1.6, 1.56, 0.2, 1]]], np.float32),
    }
    variables = jax.jit(
        lambda k0, k1, b: model.init({"params": k0, "dropout": k1}, b, train=True)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), batch)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert np.isfinite(np.asarray(out["final_boxes"])).all()

    def loss_fn(params):
        o, _ = model.apply({**variables, "params": params}, batch, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
        return o["loss"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_gather_fast_path_model_parity(model_and_batch, monkeypatch):
    """Full-model forward: the own-cell gather + inverse write-back must be
    numerically identical to the candidate-scatter path (same arithmetic,
    different data movement)."""
    model, variables, batch = model_and_batch
    monkeypatch.setenv("MSSVT_PALLAS", "off")
    ref = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    monkeypatch.setenv("MSSVT_PALLAS", "xla_fill")
    got = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    for key in ("final_boxes", "final_scores", "final_mask"):
        np.testing.assert_allclose(
            np.asarray(got[key], np.float32), np.asarray(ref[key], np.float32),
            rtol=1e-5, atol=1e-5, err_msg=key)


@pytest.mark.slow  # full-model CPU compile >15s
def test_pallas_kernels_model_parity(model_and_batch, monkeypatch):
    """Full-model forward through BOTH Pallas kernels (interpreter) vs the
    XLA paths — loose tolerance (kernel softmax runs f32 vs bf16 einsum)."""
    model, variables, batch = model_and_batch
    monkeypatch.setenv("MSSVT_PALLAS", "off")
    ref = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    monkeypatch.setenv("MSSVT_PALLAS", "interpret")
    got = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    rs, gs = np.asarray(ref["final_scores"]), np.asarray(got["final_scores"])
    rb, gb = np.asarray(ref["final_boxes"]), np.asarray(got["final_boxes"])
    np.testing.assert_allclose(gs, rs, atol=0.03, rtol=0.05)
    # near-tied scores may flip NMS survivors under the kernel's f32 softmax
    # (vs bf16 einsum); require the bulk of box elements to agree
    close = np.isclose(gb, rb, atol=0.3, rtol=0.1)
    assert close.mean() > 0.95, f"only {close.mean():.2%} of box elems match"


def test_gather_fast_path_grad_parity(model_and_batch, monkeypatch):
    """Training path: loss AND grads through the own-cell gather + feature
    scatter must match the candidate-scatter path (same math, different
    data movement — including the scatter-built win1 buffer's VJP)."""
    model, variables, batch = model_and_batch

    def loss_fn(params):
        o, _ = model.apply({**variables, "params": params}, batch, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
        return o["loss"]

    monkeypatch.setenv("MSSVT_PALLAS", "off")
    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    monkeypatch.setenv("MSSVT_PALLAS", "xla_fill")
    l_got, g_got = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_got = jax.tree_util.tree_leaves(g_got)
    for (path, r), g in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))
