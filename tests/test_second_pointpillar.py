"""Smoke tests for the SECOND and PointPillar model families."""

import jax
import numpy as np
import pytest

from mssvt_tpu.models import build_network
from mssvt_tpu.utils.edict import EasyDict

GRID = (32, 32, 32)  # x, y, z — z must survive the 8x down + z-compress
VOXEL_SIZE = (0.4, 0.4, 0.125)
PC_RANGE = (0.0, -6.4, -2.0, 12.8, 6.4, 2.0)
MAX_VOXELS = 256
BATCH = 2
MAX_GT = 8


def anchor_head_cfg():
    return {
        "NAME": "AnchorHeadSingle",
        "CLASS_AGNOSTIC": False,
        "USE_DIRECTION_CLASSIFIER": False,
        "ANCHOR_GENERATOR_CONFIG": [
            {
                "class_name": "Car",
                "anchor_sizes": [[3.9, 1.6, 1.56]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [-1.78],
                "align_center": False,
                "feature_map_stride": 8,
                "matched_threshold": 0.6,
                "unmatched_threshold": 0.45,
            },
        ],
        "LOSS_CONFIG": {
            "LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0,
                "code_weights": [1.0] * 7,
            },
        },
    }


def post_cfg():
    return {
        "SCORE_THRESH": 0.1,
        "NMS_CONFIG": {
            "NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
            "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 32,
        },
    }


def second_cfg():
    return EasyDict({
        "NAME": "SECONDNet",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "VoxelBackBone8x",
                        "NUM_FILTERS": [8, 16, 16, 16], "OUT_CHANNELS": 32},
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [1], "LAYER_STRIDES": [1], "NUM_FILTERS": [32],
            "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32],
        },
        "DENSE_HEAD": anchor_head_cfg(),
        "POST_PROCESSING": post_cfg(),
    })


def pillar_cfg():
    return EasyDict({
        "NAME": "PointPillar",
        "VFE": {"NAME": "PillarVFE", "NUM_FILTERS": [16], "USE_NORM": True,
                "WITH_DISTANCE": False, "USE_ABSLOTE_XYZ": True},
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [1, 1], "LAYER_STRIDES": [2, 2],
            "NUM_FILTERS": [16, 32],
            "UPSAMPLE_STRIDES": [1, 2], "NUM_UPSAMPLE_FILTERS": [16, 16],
        },
        "DENSE_HEAD": {**anchor_head_cfg(),
                       "ANCHOR_GENERATOR_CONFIG": [
                           {**anchor_head_cfg()["ANCHOR_GENERATOR_CONFIG"][0],
                            "feature_map_stride": 2}]},
        "POST_PROCESSING": post_cfg(),
    })


def make_batch(rng, nz=8, pillar=False):
    n = 150
    coords = np.unique(np.stack([
        rng.integers(0, BATCH, n),
        rng.integers(0, 1 if pillar else nz, n),
        rng.integers(0, GRID[1], n),
        rng.integers(0, GRID[0], n),
    ], 1), axis=0).astype(np.int32)
    cap = BATCH * MAX_VOXELS
    pad = np.full((cap, 4), -1, np.int32)
    valid = np.zeros(cap, bool)
    for b in range(BATCH):
        cb = coords[coords[:, 0] == b][: MAX_VOXELS]
        lo = b * MAX_VOXELS
        pad[lo:lo + len(cb)] = cb
        valid[lo:lo + len(cb)] = True
    voxels = rng.normal(size=(cap, 4, 4)).astype(np.float32) * valid[:, None, None]
    gt = np.zeros((BATCH, MAX_GT, 8), np.float32)
    for b in range(BATCH):
        gt[b, 0] = [5, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
        gt[b, 1] = [9, 3, -1, 3.9, 1.6, 1.56, -0.5, 1]
    return {
        "voxels": voxels,
        "voxel_num_points": np.full(cap, 3.0, np.float32) * valid,
        "voxel_coords": pad,
        "voxel_valid": valid,
        "gt_boxes": gt,
    }


@pytest.mark.slow  # full-model CPU compile >15s
@pytest.mark.parametrize("which", ["second", "pillar"])
def test_model_family_forward_and_loss(which, rng):
    if which == "second":
        cfg, pillar, grid = second_cfg(), False, GRID
    else:
        cfg, pillar, grid = pillar_cfg(), True, (GRID[0], GRID[1], 1)
        global VOXEL_SIZE
    vs = (0.4, 0.4, 0.5) if not pillar else (0.4, 0.4, 4.0)
    model = build_network(
        model_cfg=cfg, num_class=1, class_names=["Car"],
        grid_size=grid, voxel_size=vs, point_cloud_range=PC_RANGE,
        batch_size=BATCH, max_voxels=MAX_VOXELS, max_points_per_voxel=4,
    )
    batch = make_batch(rng, pillar=pillar)
    variables = jax.jit(
        lambda k0, k1, b: model.init({"params": k0, "dropout": k1}, b, train=False)
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


@pytest.mark.slow  # full-model CPU compile >15s
def test_anchor_head_multi_atss(rng):
    """SECOND + AnchorHeadMulti grouped heads + ATSS assigner
    (ref: anchor_head_multi.py:9-151, atss_target_assigner.py:7)."""
    cfg = second_cfg()
    cfg["DENSE_HEAD"] = {
        "NAME": "AnchorHeadMulti",
        "USE_DIRECTION_CLASSIFIER": True,
        "DIR_OFFSET": 0.78539, "NUM_DIR_BINS": 2,
        "SHARED_CONV_NUM_FILTER": 16,
        "RPN_HEAD_CFGS": [
            {"HEAD_CLS_NAME": ["Car"]},
            {"HEAD_CLS_NAME": ["Pedestrian"]},
        ],
        "TARGET_ASSIGNER_CONFIG": {"NAME": "ATSSTargetAssigner", "TOPK": 9},
        "ANCHOR_GENERATOR_CONFIG": [
            {**anchor_head_cfg()["ANCHOR_GENERATOR_CONFIG"][0]},
            {**anchor_head_cfg()["ANCHOR_GENERATOR_CONFIG"][0],
             "class_name": "Pedestrian",
             "anchor_sizes": [[0.8, 0.6, 1.73]],
             "anchor_bottom_heights": [-0.6]},
        ],
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {
            "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
            "code_weights": [1.0] * 7,
        }},
    }
    model = build_network(
        model_cfg=cfg, num_class=2, class_names=["Car", "Pedestrian"],
        grid_size=GRID, voxel_size=(0.4, 0.4, 0.5), point_cloud_range=PC_RANGE,
        batch_size=BATCH, max_voxels=MAX_VOXELS, max_points_per_voxel=4,
    )
    batch = make_batch(rng, pillar=False)
    variables = jax.jit(
        lambda k0, k1, b: model.init({"params": k0, "dropout": k1}, b, train=False)
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


def test_atss_assigner_adaptive_threshold():
    """A GT centered exactly on an anchor must make that anchor positive."""
    import jax.numpy as jnp
    from mssvt_tpu.models.dense_heads.anchor_head import generate_anchors
    from mssvt_tpu.models.dense_heads.anchor_head_multi import assign_atss_targets
    from mssvt_tpu.utils.box_coder import ResidualCoder

    cfgs = [anchor_head_cfg()["ANCHOR_GENERATOR_CONFIG"][0]]
    anchors, _ = generate_anchors(cfgs, GRID, PC_RANGE, 8)
    gt = np.zeros((4, 8), np.float32)
    gt[0, :7] = anchors[10]
    gt[0, 7] = 1
    labels, reg_t, reg_w = assign_atss_targets(
        jnp.asarray(anchors), jnp.asarray(gt), ResidualCoder())
    labels = np.asarray(labels)
    assert labels[10] == 1
    assert labels.sum() < 20  # only a handful of positives
    np.testing.assert_allclose(np.asarray(reg_t)[10], 0, atol=1e-5)
