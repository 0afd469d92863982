"""voxel_query oracle test + VoxelRCNN family e2e
(ref: voxel_query_gpu.cu:10-90, voxel_pool_modules.py:8,
roi_heads/voxelrcnn_head.py, detectors/voxel_rcnn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mssvt_tpu.models import build_network
from mssvt_tpu.ops.voxel_query import _neighborhood_offsets, voxel_query
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


def oracle_voxel_query(queries, coords, valid, grid, vs, pcr, max_range,
                       radius, nsample):
    """Brute-force CUDA-semantics simulator (z-major traversal, first-n)."""
    b, q, _ = queries.shape
    vmap = {}
    for row, (c, ok) in enumerate(zip(coords, valid)):
        if ok:
            vmap[tuple(c)] = row
    idx = np.full((b, q, nsample), -1, np.int64)
    empty = np.ones((b, q), bool)
    offs = _neighborhood_offsets(max_range)  # zyx
    for bi in range(b):
        for qi in range(q):
            p = queries[bi, qi]
            cell = np.floor((p - np.asarray(pcr[:3])) / np.asarray(vs)).astype(int)
            cnt = 0
            for dz, dy, dx in offs:
                cz, cy, cx = cell[2] + dz, cell[1] + dy, cell[0] + dx
                if not (0 <= cx < grid[0] and 0 <= cy < grid[1] and 0 <= cz < grid[2]):
                    continue
                row = vmap.get((bi, cz, cy, cx))
                if row is None:
                    continue
                ctr = (np.array([cx, cy, cz]) + 0.5) * np.asarray(vs) + np.asarray(pcr[:3])
                if np.sum((ctr - p) ** 2) >= radius ** 2:
                    continue
                if cnt < nsample:
                    idx[bi, qi, cnt] = row
                    cnt += 1
            if cnt > 0:
                empty[bi, qi] = False
                idx[bi, qi, cnt:] = idx[bi, qi, 0]  # pad with first hit
    return idx, empty


def test_voxel_query_matches_oracle(rng):
    n = 80
    coords = np.unique(np.stack([
        rng.integers(0, BATCH, n * 2),
        rng.integers(0, GRID[2], n * 2),
        rng.integers(0, GRID[1], n * 2),
        rng.integers(0, GRID[0], n * 2),
    ], 1), axis=0)[:n]
    pad = np.full((128, 4), -1, np.int32)
    pad[:len(coords)] = coords
    valid = np.arange(128) < len(coords)

    queries = np.stack([
        rng.uniform(PC_RANGE[0], PC_RANGE[3], (BATCH, 16)),
        rng.uniform(PC_RANGE[1], PC_RANGE[4], (BATCH, 16)),
        rng.uniform(PC_RANGE[2], PC_RANGE[5], (BATCH, 16)),
    ], axis=-1).astype(np.float32)

    max_range, radius, nsample = (2, 2, 2), 1.5, 8
    idx, empty = jax.jit(lambda qq, cc, vv: voxel_query(
        qq, cc, vv, GRID, VOXEL_SIZE, PC_RANGE, max_range, radius, nsample,
        BATCH,
    ))(jnp.asarray(queries), jnp.asarray(pad), jnp.asarray(valid))
    o_idx, o_empty = oracle_voxel_query(
        queries, pad, valid, GRID, VOXEL_SIZE, PC_RANGE, max_range, radius,
        nsample)
    np.testing.assert_array_equal(np.asarray(empty), o_empty)
    np.testing.assert_array_equal(np.asarray(idx), np.where(o_idx < 0, 0, o_idx))


def voxelrcnn_cfg():
    pool_layer = {"MLPS": [[8, 8]], "QUERY_RANGES": [[2, 2, 2]],
                  "POOL_RADIUS": [1.2], "NSAMPLE": [8]}
    return EasyDict({
        "NAME": "VoxelRCNN",
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "VoxelBackBone8x",
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
        "ROI_HEAD": {
            "NAME": "VoxelRCNNHead",
            "GRID_SIZE": 3,
            "SHARED_FC": [32],
            "DP_RATIO": 0.3,
            "ROI_GRID_POOL": {
                "FEATURES_SOURCE": ["x_conv3", "x_conv4"],
                "POOL_LAYERS": {"x_conv3": pool_layer, "x_conv4": pool_layer},
            },
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


def test_voxelrcnn_forward_and_loss(rng):
    model = build_network(
        model_cfg=voxelrcnn_cfg(), num_class=1, class_names=["Car"],
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
