"""KITTI bbox-AP + AOS metrics and the lidar→camera→image projection chain.

Covers the two metrics the round-1 evaluator excluded (ref:
kitti_object_eval_python/eval.py:290 computes bbox/bev/3d/aos).
"""

import numpy as np
import pytest

from mssvt_tpu.utils.kitti_eval import (
    _bbox_iou_2d,
    _eval_class,
    kitti_official_eval,
)


class FakeCalib:
    """Identity rectification, f=100 pinhole at (cu, cv) = (200, 100)."""

    def __init__(self):
        self.P2 = np.array([[100.0, 0, 200, 0], [0, 100, 100, 0],
                            [0, 0, 1, 0]])
        self.R0 = np.eye(3)
        self.V2C = np.array([[0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]])

    def lidar_to_rect(self, pts):
        pts_hom = np.hstack([pts, np.ones((len(pts), 1))])
        return pts_hom @ self.V2C.T @ self.R0.T

    def rect_to_img(self, pts_rect):
        pts_hom = np.hstack([pts_rect, np.ones((len(pts_rect), 1))])
        p = pts_hom @ self.P2.T
        depth = p[:, 2]
        return p[:, :2] / np.clip(depth[:, None], 1e-6, None), depth


def test_projection_center_box():
    """A box straight ahead projects around the principal point with the
    right pixel size (f * size / depth)."""
    from mssvt_tpu.datasets.kitti import (
        boxes_camera_to_imageboxes,
        boxes_lidar_to_camera,
    )

    calib = FakeCalib()
    # lidar: 10 m ahead, ground z=0, l=4 x w=2 x h=1.5, heading 0
    boxes = np.array([[10.0, 0, 0, 4, 2, 1.5, 0]])
    cam = boxes_lidar_to_camera(boxes, calib)
    # camera frame: x right, y down, z forward — box center-bottom
    np.testing.assert_allclose(cam[0, :3], [0, 0.75, 10], atol=1e-6)
    np.testing.assert_allclose(cam[0, 3:6], [4, 1.5, 2], atol=1e-6)  # l,h,w
    bbox = boxes_camera_to_imageboxes(cam, calib)
    # heading 0 in lidar → ry = -pi/2: the box's LENGTH lies along depth
    # (8..12 m), width 2 m across. The extremes come from the NEAR face
    # (depth 8): half-width 1 m → 100/8 = 12.5 px; half-height 0.75 m →
    # 9.375 px around the principal point (200, 100).
    u1, v1, u2, v2 = bbox[0]
    np.testing.assert_allclose([u1, u2], [187.5, 212.5], atol=1e-4)
    np.testing.assert_allclose([v1, v2], [90.625, 109.375], atol=1e-4)


def test_bbox_iou_2d():
    det = np.array([[0.0, 0, 10, 10]])
    gt = np.array([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = _bbox_iou_2d(det, gt)
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175, 0.0], atol=1e-6)


def _frames(det_alpha, gt_alpha, h=60):
    """One frame, one Car det matching one Car GT, camera fields present."""
    det = [{
        "boxes": np.array([[10.0, 0, 0, 4, 2, 1.5, 0]], np.float32),
        "scores": np.array([0.9], np.float32),
        "name": np.array(["Car"]),
        "bbox": np.array([[100, 100, 150, 100 + h]], np.float32),
        "alpha": np.array([det_alpha], np.float32),
    }]
    gt = [{
        "boxes": np.array([[10.0, 0, 0, 4, 2, 1.5, 0]], np.float32),
        "name": np.array(["Car"]),
        "bbox": np.array([[100, 100, 150, 100 + h]], np.float32),
        "alpha": np.array([gt_alpha], np.float32),
        "occluded": np.array([0]),
        "truncated": np.array([0.0]),
    }]
    return det, gt


def test_aos_perfect_orientation_equals_bbox_ap():
    det, gt = _frames(0.5, 0.5)
    _, res = kitti_official_eval(det, gt, ["Car"])
    assert res["Car_bbox/easy_R40"] == pytest.approx(100.0)
    assert res["Car_aos/easy_R40"] == pytest.approx(
        res["Car_bbox/easy_R40"])
    assert res["Car_3d/easy_R40"] == pytest.approx(100.0)


def test_aos_opposite_orientation_is_zero():
    det, gt = _frames(0.0, np.pi)  # cos(pi) = -1 → similarity 0
    _, res = kitti_official_eval(det, gt, ["Car"])
    assert res["Car_bbox/easy_R40"] == pytest.approx(100.0)
    assert res["Car_aos/easy_R40"] == pytest.approx(0.0, abs=1e-6)


def test_small_det_is_ignored_not_fp():
    """A detection whose image box is under MIN_HEIGHT[easy]=40px takes the
    GT but counts neither TP nor FP — so easy-AP sees no detections at all
    (0 thresholds → AP 0), while hard (25px min) counts it as a TP."""
    det, gt = _frames(0.0, 0.0, h=30)
    ap_easy, _, _, _ = _eval_class(det, gt, "Car", 0, "bbox")
    ap_hard, _, _, _ = _eval_class(det, gt, "Car", 2, "bbox")
    # gt box is 30px high → falls out of the easy bucket too (clean_data);
    # easy has no care GT at all → NaN; hard: full marks
    assert np.isnan(ap_easy)
    assert ap_hard == pytest.approx(100.0)


def test_metrics_omitted_without_camera_fields():
    det = [{"boxes": np.array([[10.0, 0, 0, 4, 2, 1.5, 0]], np.float32),
            "scores": np.array([0.9], np.float32),
            "name": np.array(["Car"])}]
    gt = [{"boxes": np.array([[10.0, 0, 0, 4, 2, 1.5, 0]], np.float32),
           "name": np.array(["Car"])}]
    _, res = kitti_official_eval(det, gt, ["Car"])
    assert "Car_bev/easy_R40" in res and "Car_bbox/easy_R40" not in res


def test_generate_prediction_dict_fields():
    from mssvt_tpu.datasets.kitti import generate_kitti_prediction_dict

    calib = FakeCalib()
    out = generate_kitti_prediction_dict(
        np.array([[10.0, 0, 0, 4, 2, 1.5, 0.3]]), np.array([0.8]),
        np.array([1]), ["Car"], calib=calib, image_shape=(375, 1242))
    for k in ("name", "score", "bbox", "alpha", "location", "dimensions",
              "rotation_y", "boxes_lidar"):
        assert k in out, k
    assert out["name"][0] == "Car"
    # alpha = global ry minus azimuth: finite, in [-pi-eps, pi+eps] range
    assert np.isfinite(out["alpha"][0])
