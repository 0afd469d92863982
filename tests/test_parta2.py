"""PartA2 family tests: UNetV2 shapes, RoIAware pooling oracle, intra-part
targets, detector e2e (ref: spconv_unet.py:49, roiaware_pool3d_kernel.cu:
111-261, point_intra_part_head.py, PartA2_net.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mssvt_tpu.models import build_network
from mssvt_tpu.ops.roiaware_pool import roiaware_pool3d
from mssvt_tpu.utils.edict import EasyDict

GRID = (32, 32, 32)
VOXEL_SIZE = (0.4, 0.4, 0.125)
PC_RANGE = (0.0, -6.4, -2.0, 12.8, 6.4, 2.0)
MAX_VOXELS = 256
BATCH = 2
MAX_GT = 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_roiaware_pool_matches_bruteforce(rng):
    n, r, g, c = 64, 3, 4, 5
    pts = rng.uniform(-5, 5, (1, n, 3)).astype(np.float32)
    feats = rng.normal(size=(1, n, c)).astype(np.float32)
    valid = np.ones((1, n), bool)
    valid[0, 50:] = False
    rois = np.zeros((1, r, 7), np.float32)
    rois[0, 0] = [0, 0, 0, 4, 3, 2, 0.4]
    rois[0, 1] = [2, 2, 0, 3, 3, 3, -0.7]
    rois[0, 2] = [1, 1, 1, 2, 2, 2, 0.0]
    roi_valid = np.array([[True, True, False]])

    for pool in ("max", "avg"):
        got, empty = jax.jit(
            lambda p, f, v: roiaware_pool3d(
                p, f, v, jnp.asarray(rois), jnp.asarray(roi_valid), g, pool)
        )(jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(valid))
        got, empty = np.asarray(got), np.asarray(empty)

        # brute force
        exp = np.zeros((1, r, g, g, g, c), np.float32)
        cnt = np.zeros((1, r, g, g, g), np.int64)
        acc = np.zeros((1, r, g, g, g, c), np.float64)
        mx = np.full((1, r, g, g, g, c), -np.inf)
        for ri in range(r):
            if not roi_valid[0, ri]:
                continue
            cx0, cy0, cz0, dx, dy, dz, h = rois[0, ri]
            for pi in range(n):
                if not valid[0, pi]:
                    continue
                lx = (pts[0, pi, 0] - cx0) * np.cos(-h) - (pts[0, pi, 1] - cy0) * np.sin(-h)
                ly = (pts[0, pi, 0] - cx0) * np.sin(-h) + (pts[0, pi, 1] - cy0) * np.cos(-h)
                lz = pts[0, pi, 2] - cz0
                ux, uy, uz = (lx / dx + .5) * g, (ly / dy + .5) * g, (lz / dz + .5) * g
                if not (0 <= ux < g and 0 <= uy < g and 0 <= uz < g):
                    continue
                ci, cj, ck = int(ux), int(uy), int(uz)
                cnt[0, ri, ci, cj, ck] += 1
                acc[0, ri, ci, cj, ck] += feats[0, pi]
                mx[0, ri, ci, cj, ck] = np.maximum(mx[0, ri, ci, cj, ck], feats[0, pi])
        e = cnt == 0
        np.testing.assert_array_equal(empty, e)
        if pool == "max":
            exp = np.where(e[..., None], 0, mx).astype(np.float32)
        else:
            exp = np.where(e[..., None], 0, acc / np.clip(cnt, 1, None)[..., None]).astype(np.float32)
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_intra_part_targets_canonical():
    from mssvt_tpu.models.dense_heads.point_intra_part_head import intra_part_targets

    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [10, 0, 0, 4, 2, 2, 0, 1]
    pts = np.array([[[10, 0, 0],      # center → (0.5, 0.5, 0.5)
                     [12, 0, 0],      # +x face → (1, 0.5, 0.5)
                     [10, -1, -1]]],  # -y -z corner → (0.5, 0, 0)
                   np.float32)
    labels = np.array([[1, 1, 1]], np.int32)
    gt_of = np.broadcast_to(gt[0, 0], (1, 3, 8))
    part = np.asarray(intra_part_targets(
        jnp.asarray(pts), jnp.asarray(gt_of), jnp.asarray(labels)))
    np.testing.assert_allclose(part[0, 0], [0.5, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(part[0, 1], [1.0, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(part[0, 2], [0.5, 0.0, 0.0], atol=1e-6)


def parta2_cfg():
    return EasyDict({
        "NAME": "PartA2",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "UNetV2",
                        "NUM_FILTERS": [8, 16, 16, 16], "OUT_CHANNELS": 32},
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [2, 2], "LAYER_STRIDES": [1, 2],
            "NUM_FILTERS": [16, 32],
            "UPSAMPLE_STRIDES": [1, 2], "NUM_UPSAMPLE_FILTERS": [16, 16],
        },
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle",
            "USE_DIRECTION_CLASSIFIER": True,
            "DIR_OFFSET": 0.78539, "NUM_DIR_BINS": 2,
            "ANCHOR_GENERATOR_CONFIG": [{
                "class_name": "Car",
                "anchor_sizes": [[3.9, 1.6, 1.56]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [-1.78],
                "align_center": False,
                "feature_map_stride": 8,
                "matched_threshold": 0.6,
                "unmatched_threshold": 0.45,
            }],
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
                "code_weights": [1.0] * 7,
            }},
        },
        "POINT_HEAD": {"NAME": "PointIntraPartOffsetHead",
                       "CLS_FC": [16], "PART_FC": [16]},
        "ROI_HEAD": {
            "NAME": "PartA2FCHead",
            "SHARED_FC": [32],
            "CONV_CHANNELS": [8, 8],
            "DP_RATIO": 0.3,
            "ROI_AWARE_POOL": {"POOL_SIZE": 4},
            "NMS_CONFIG": {
                "TRAIN": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.8,
                          "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16},
                "TEST": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
                         "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16},
            },
            "TARGET_CONFIG": {"ROI_PER_IMAGE": 16},
        },
        "POST_PROCESSING": {"SCORE_THRESH": 0.1},
    })


@pytest.mark.slow  # full-model CPU compile >15s
def test_parta2_forward_and_loss(rng):
    model = build_network(
        model_cfg=parta2_cfg(), num_class=1, class_names=["Car"],
        grid_size=GRID, voxel_size=VOXEL_SIZE, point_cloud_range=PC_RANGE,
        batch_size=BATCH, max_voxels=MAX_VOXELS, max_points_per_voxel=4,
    )
    cap = BATCH * MAX_VOXELS
    coords = np.unique(np.stack([
        rng.integers(0, BATCH, cap * 2),
        rng.integers(0, GRID[2], cap * 2),
        rng.integers(0, GRID[1] // 2, cap * 2),
        rng.integers(0, GRID[0] // 2, cap * 2),
    ], 1), axis=0)
    pad = np.full((cap, 4), -1, np.int32)
    valid = np.zeros((cap,), bool)
    for b in range(BATCH):
        cb = coords[coords[:, 0] == b][:MAX_VOXELS]
        lo = b * MAX_VOXELS
        pad[lo:lo + len(cb)] = cb
        valid[lo:lo + len(cb)] = True
    voxels = rng.normal(size=(cap, 4, 4)).astype(np.float32) * valid[:, None, None]
    gt = np.zeros((BATCH, MAX_GT, 8), np.float32)
    for b in range(BATCH):
        gt[b, 0] = [5, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
        gt[b, 1] = [9, 3, -1, 3.9, 1.6, 1.56, -0.5, 1]
    batch = {
        "voxels": voxels,
        "voxel_num_points": np.full(cap, 3.0, np.float32) * valid,
        "voxel_coords": pad,
        "voxel_valid": valid,
        "gt_boxes": gt,
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
