"""Tests for pointnet2 primitives and the RoI head machinery."""

import jax.numpy as jnp
import numpy as np

from mssvt_tpu.models.roi_heads.bev_grid_head import (
    bilinear_sample_bev,
    roi_grid_points_bev,
)
from mssvt_tpu.models.roi_heads.roi_head_template import (
    assign_proposal_targets,
    proposal_layer,
)
from mssvt_tpu.ops.pointnet2 import ball_query, points_in_boxes, roipoint_pool3d
import pytest


def test_ball_query_semantics(rng):
    xyz = np.zeros((1, 6, 3), np.float32)
    xyz[0] = [[0, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [5, 5, 5], [0.05, 0, 0], [9, 9, 9]]
    new_xyz = np.zeros((1, 1, 3), np.float32)
    idx, empty = ball_query(0.3, 3, jnp.asarray(xyz), jnp.asarray(new_xyz))
    # first 3 in-radius points in index order: 0, 1, 2
    np.testing.assert_array_equal(np.asarray(idx)[0, 0], [0, 1, 2])
    assert not bool(empty[0, 0])

    # query far from all points → empty, slots replicate 0
    far = np.full((1, 1, 3), 100.0, np.float32)
    idx2, empty2 = ball_query(0.3, 3, jnp.asarray(xyz), jnp.asarray(far))
    assert bool(empty2[0, 0])


def test_points_in_boxes():
    pts = np.array([[0, 0, 0], [2, 0, 0], [0.9, 0, 0]], np.float32)
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0]], np.float32)
    inside = np.asarray(points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes)))
    np.testing.assert_array_equal(inside[:, 0], [True, False, True])


def test_roipoint_pool3d(rng):
    pts = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    feats = rng.normal(size=(50, 4)).astype(np.float32)
    boxes = np.array([
        [0, 0, 0, 2, 2, 2, 0.3],
        [50, 50, 50, 1, 1, 1, 0],  # empty
    ], np.float32)
    pooled, empty = roipoint_pool3d(
        jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(boxes), 16
    )
    pooled, empty = np.asarray(pooled), np.asarray(empty)
    assert not empty[0] and empty[1]
    assert (pooled[1] == 0).all()
    # pooled points of box 0 are actually inside it
    inside = np.asarray(points_in_boxes(jnp.asarray(pooled[0, :, :3]),
                                        jnp.asarray(boxes[:1])))[:, 0]
    n_inside = np.asarray(points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes[:1])))[:, 0].sum()
    assert inside[: min(16, n_inside)].all()


@pytest.mark.slow  # full-model CPU compile >15s
def test_proposal_layer_and_targets(rng):
    b, n = 2, 20
    boxes = np.zeros((b, n, 7), np.float32)
    boxes[..., 3:6] = 2.0
    boxes[..., 0] = rng.uniform(0, 50, (b, n))
    boxes[..., 1] = rng.uniform(0, 50, (b, n))
    scores = rng.uniform(0, 1, (b, n)).astype(np.float32)
    valid = np.ones((b, n), bool)

    rois, rscores, rlabels, rvalid = proposal_layer(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        nms_pre=16, nms_post=8, nms_thresh=0.5,
    )
    assert rois.shape == (b, 8, 7)
    rs = np.asarray(rscores)
    rv = np.asarray(rvalid)
    for bi in range(b):
        s = rs[bi][rv[bi]]
        assert (np.diff(s) <= 1e-6).all()  # score-ordered

    gt = np.zeros((b, 4, 8), np.float32)
    gt[:, 0] = [*boxes[0, 0, :7], 1]  # one gt at a proposal location
    targets = assign_proposal_targets(
        rois, rvalid, jnp.asarray(gt), roi_per_image=8,
    )
    assert targets["rois"].shape == (b, 8, 7)
    assert np.asarray(targets["cls_labels"]).max() <= 1.0


def test_bilinear_sample_bev():
    feat = np.zeros((1, 4, 4, 1), np.float32)
    feat[0, :, :, 0] = np.arange(16).reshape(4, 4)
    # cell size 1m, pc_range origin 0 → cell centers at 0.5, 1.5, ...
    pts = np.array([[[0.5, 0.5], [1.5, 0.5], [1.0, 0.5]]], np.float32)
    out = np.asarray(bilinear_sample_bev(
        jnp.asarray(feat), jnp.asarray(pts), (0, 0, 0, 4, 4, 1), (1.0, 1.0)
    ))[0, :, 0]
    assert abs(out[0] - 0.0) < 1e-5  # exact cell center (y=0.5 row 0, x=0.5 col 0)
    assert abs(out[1] - 1.0) < 1e-5
    assert abs(out[2] - 0.5) < 1e-5  # halfway between cells 0 and 1


def test_roi_grid_points_cover_box():
    rois = jnp.asarray([[10.0, -5.0, 0, 4, 2, 1.5, 0.7]])
    pts = np.asarray(roi_grid_points_bev(rois, 6))[0]
    # all grid points inside the rotated box (bev)
    from mssvt_tpu.ops.pointnet2 import points_in_boxes

    p3 = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], axis=1)
    inside = np.asarray(points_in_boxes(jnp.asarray(p3), rois))
    assert inside.all()
