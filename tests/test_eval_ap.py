"""Tests for the AP evaluator."""

import numpy as np

from mssvt_tpu.utils.eval_ap import eval_class_ap, kitti_style_eval


def _box(x, y, heading=0.0, dx=4.0, dy=2.0):
    return np.array([x, y, 0.0, dx, dy, 1.5, heading], np.float32)


def test_perfect_detections_ap1():
    gt = {"boxes": np.stack([_box(0, 0), _box(10, 0)]),
          "labels": np.array([1, 1])}
    det = {"boxes": gt["boxes"].copy(), "scores": np.array([0.9, 0.8]),
           "labels": np.array([1, 1])}
    ap, extra = eval_class_ap([det], [gt], 1, 0.7)
    assert ap > 0.99
    assert extra["max_recall"] == 1.0


def test_missed_detection_caps_recall():
    gt = {"boxes": np.stack([_box(0, 0), _box(10, 0)]),
          "labels": np.array([1, 1])}
    det = {"boxes": np.stack([_box(0, 0)]), "scores": np.array([0.9]),
           "labels": np.array([1])}
    ap, extra = eval_class_ap([det], [gt], 1, 0.7)
    assert 0.4 < ap < 0.6
    assert abs(extra["max_recall"] - 0.5) < 1e-6


def test_false_positive_hurts_precision():
    gt = {"boxes": np.stack([_box(0, 0)]), "labels": np.array([1])}
    det = {
        "boxes": np.stack([_box(50, 50), _box(0, 0)]),
        "scores": np.array([0.95, 0.9]),  # high-score FP first
        "labels": np.array([1, 1]),
    }
    ap, _ = eval_class_ap([det], [gt], 1, 0.7)
    assert 0.3 < ap < 0.7


def test_duplicate_detection_is_fp():
    gt = {"boxes": np.stack([_box(0, 0)]), "labels": np.array([1])}
    det = {
        "boxes": np.stack([_box(0, 0), _box(0.1, 0)]),
        "scores": np.array([0.9, 0.8]),
        "labels": np.array([1, 1]),
    }
    ap, _ = eval_class_ap([det], [gt], 1, 0.5)
    assert ap > 0.95  # second det is FP but comes after full recall


def test_kitti_style_eval_report():
    gt = [{"boxes": np.stack([_box(0, 0)]), "labels": np.array([1])}]
    det = [{"boxes": np.stack([_box(0, 0)]), "scores": np.array([0.9]),
            "labels": np.array([1])}]
    report, metrics = kitti_style_eval(det, gt, ["Vehicle", "Pedestrian"])
    assert "Vehicle" in report
    assert metrics["Vehicle_ap_bev_0.7"] > 0.99
    assert np.isnan(metrics["Pedestrian_ap_bev_0.5"])  # no GT → nan
