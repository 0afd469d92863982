"""Golden tests for rotated-BEV IoU and NMS (oracle: grid rasterization)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mssvt_tpu.ops.box_ops import (
    boxes_to_corners_bev,
    pairwise_iou_3d,
    pairwise_iou_bev,
    rotated_intersection_area,
)
from mssvt_tpu.ops.nms import nms_bev


def _raster_iou(b1, b2, res=400):
    """Monte-Carlo-free rasterization IoU oracle for two BEV boxes."""
    c1 = np.asarray(boxes_to_corners_bev(jnp.asarray(b1[None]))[0])
    c2 = np.asarray(boxes_to_corners_bev(jnp.asarray(b2[None]))[0])
    lo = np.minimum(c1.min(0), c2.min(0)) - 0.1
    hi = np.maximum(c1.max(0), c2.max(0)) + 0.1
    xs = np.linspace(lo[0], hi[0], res)
    ys = np.linspace(lo[1], hi[1], res)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], -1)

    def inside(c):
        ok = np.ones(len(pts), bool)
        for i in range(4):
            a, b = c[i], c[(i + 1) % 4]
            cr = (b[0] - a[0]) * (pts[:, 1] - a[1]) - (b[1] - a[1]) * (pts[:, 0] - a[0])
            ok &= cr >= 0
        return ok

    i1, i2 = inside(c1), inside(c2)
    cell = (hi[0] - lo[0]) * (hi[1] - lo[1]) / res / res
    inter = (i1 & i2).sum() * cell
    union = (i1 | i2).sum() * cell
    return inter / union


def _box(x, y, dx, dy, heading):
    return np.array([x, y, 0.0, dx, dy, 1.0, heading], np.float32)


def test_axis_aligned_iou():
    a = _box(0, 0, 2, 2, 0)
    b = _box(1, 0, 2, 2, 0)  # half-overlap along x
    iou = float(pairwise_iou_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    assert abs(iou - (2.0 / 6.0)) < 1e-4


def test_identical_boxes():
    a = _box(1.0, -2.0, 3.0, 1.5, 0.7)
    iou = float(pairwise_iou_bev(jnp.asarray(a[None]), jnp.asarray(a[None]))[0, 0])
    assert abs(iou - 1.0) < 1e-3


def test_rotated_45_octagon():
    # unit square vs same square rotated 45deg: intersection is a regular
    # octagon with area 2*(sqrt(2)-1)
    a = _box(0, 0, 1, 1, 0)
    b = _box(0, 0, 1, 1, np.pi / 4)
    ca = boxes_to_corners_bev(jnp.asarray(a[None]))
    cb = boxes_to_corners_bev(jnp.asarray(b[None]))
    inter = float(rotated_intersection_area(ca, cb)[0])
    assert abs(inter - 2 * (np.sqrt(2) - 1)) < 1e-4


def test_disjoint_boxes():
    a = _box(0, 0, 1, 1, 0.3)
    b = _box(5, 5, 1, 1, -0.8)
    iou = float(pairwise_iou_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    assert iou == 0.0


def test_contained_box():
    a = _box(0, 0, 4, 4, 0.2)
    b = _box(0, 0, 1, 1, 1.0)  # fully inside a
    iou = float(pairwise_iou_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    assert abs(iou - 1.0 / 16.0) < 1e-3


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_vs_raster_oracle(seed):
    rng = np.random.default_rng(seed)
    boxes = np.stack([
        _box(rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(0.5, 3),
             rng.uniform(0.5, 3), rng.uniform(-np.pi, np.pi))
        for _ in range(6)
    ])
    iou = np.asarray(pairwise_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    for i in range(6):
        for j in range(i + 1, 6):
            expect = _raster_iou(boxes[i], boxes[j])
            assert abs(iou[i, j] - expect) < 0.02, (i, j, iou[i, j], expect)


@pytest.mark.parametrize("cx,cy", [(0.0, 0.0), (100.0, 100.0), (-57.3, 212.9)])
def test_abutting_boxes_zero_intersection(cx, cy):
    """Edge-sharing (abutting) boxes have inter == 0 regardless of position.

    Regression for the collinear anti-parallel edge case: the closed A-pass
    keeps the coincident edge but the open B-pass must keep its anti-parallel
    twin too, so the origin-dependent cross terms cancel exactly.
    """
    a = _box(cx, cy, 1, 1, 0)
    b = _box(cx + 1.0, cy, 1, 1, 0)  # shares the x = cx + 0.5 edge
    ca = boxes_to_corners_bev(jnp.asarray(a[None]))
    cb = boxes_to_corners_bev(jnp.asarray(b[None]))
    inter = float(rotated_intersection_area(ca, cb)[0])
    assert abs(inter) < 1e-5, inter
    iou = float(pairwise_iou_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    assert abs(iou) < 1e-5, iou


@pytest.mark.parametrize("cx,cy", [(0.0, 0.0), (100.0, 100.0)])
def test_corner_touching_boxes_zero_intersection(cx, cy):
    a = _box(cx, cy, 1, 1, 0)
    b = _box(cx + 1.0, cy + 1.0, 1, 1, 0)  # touch only at one corner
    iou = float(pairwise_iou_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    assert abs(iou) < 1e-5, iou


@pytest.mark.parametrize("cx,cy", [(0.0, 0.0), (100.0, 100.0)])
def test_partial_edge_overlap_abutting(cx, cy):
    """Boxes abutting along a PARTIAL shared edge segment still give inter 0."""
    a = _box(cx, cy, 1, 1, 0)
    b = _box(cx + 1.0, cy + 0.5, 1, 1, 0)  # shares only half the edge
    iou = float(pairwise_iou_bev(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    assert abs(iou) < 1e-5, iou


@pytest.mark.parametrize("cx,cy", [(0.0, 0.0), (100.0, 100.0)])
def test_identical_boxes_far_from_origin(cx, cy):
    a = _box(cx, cy, 3.0, 1.5, 0.7)
    iou = float(pairwise_iou_bev(jnp.asarray(a[None]), jnp.asarray(a[None]))[0, 0])
    assert abs(iou - 1.0) < 1e-3


def test_contained_sharing_edge():
    """Small box inside a big one, sharing part of one edge (co-oriented
    collinear case): intersection is the small box's full area."""
    a = _box(0, 0, 4, 4, 0)
    b = _box(1.5, 0, 1, 2, 0)  # right edge of b on right edge of a
    ca = boxes_to_corners_bev(jnp.asarray(a[None]))
    cb = boxes_to_corners_bev(jnp.asarray(b[None]))
    inter = float(rotated_intersection_area(ca, cb)[0])
    assert abs(inter - 2.0) < 1e-4, inter


def test_iou3d_z_overlap():
    a = np.array([0, 0, 0.0, 2, 2, 2, 0], np.float32)
    b = np.array([0, 0, 1.0, 2, 2, 2, 0], np.float32)  # half z-overlap
    iou = float(pairwise_iou_3d(jnp.asarray(a[None]), jnp.asarray(b[None]))[0, 0])
    assert abs(iou - (4.0 / 12.0)) < 1e-4


def test_nms_suppresses_cluster():
    boxes = np.stack([
        _box(0, 0, 2, 2, 0.0),
        _box(0.1, 0, 2, 2, 0.05),  # heavy overlap with box 0
        _box(5, 5, 2, 2, 0.0),  # far away
        _box(5.05, 5, 2, 2, 0.0),  # overlaps box 2
    ])
    scores = np.array([0.9, 0.8, 0.7, 0.95], np.float32)
    valid = np.ones(4, bool)
    sel, num = nms_bev(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        thresh=0.5, pre_max=4, post_max=4,
    )
    sel = np.asarray(sel)
    assert int(num) == 2
    assert set(sel[sel >= 0].tolist()) == {3, 0}


def test_nms_respects_validity_and_padding():
    boxes = np.stack([_box(0, 0, 2, 2, 0.0)] * 4)
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    valid = np.array([True, False, False, False])
    sel, num = nms_bev(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        thresh=0.5, pre_max=4, post_max=2,
    )
    assert int(num) == 1
    assert np.asarray(sel)[0] == 0 and (np.asarray(sel)[1:] == -1).all()


def test_blocked_nms_matches_sequential_oracle(rng):
    """Blocked greedy NMS must equal the classic sequential greedy scan."""
    n = 200
    boxes = np.stack([
        _box(rng.uniform(0, 30), rng.uniform(0, 30), rng.uniform(1.5, 4),
             rng.uniform(1.5, 4), rng.uniform(-np.pi, np.pi))
        for _ in range(n)
    ])
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.uniform(0, 1, n) > 0.1

    sel, num = nms_bev(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        thresh=0.3, pre_max=n, post_max=n,
    )
    sel = np.asarray(sel)
    got = sel[sel >= 0].tolist()

    # sequential oracle on the same (host-computed) IoU matrix
    from mssvt_tpu.ops.box_ops import pairwise_iou_bev

    order = np.argsort(-np.where(valid, scores, -np.inf), kind="stable")
    order = [i for i in order if valid[i]]
    iou = np.asarray(pairwise_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    keep, suppressed = [], set()
    for i in order:
        if i in suppressed:
            continue
        keep.append(i)
        for j in order:
            if j not in suppressed and iou[i, j] > 0.3 and j != i:
                suppressed.add(j)
    assert got == keep
