"""Official-protocol Waymo metric tests on synthetic annos
(ref protocol: pcdet/datasets/waymo/waymo_eval.py:26-146)."""

import numpy as np
import pytest

from mssvt_tpu.datasets.waymo_eval import (
    compute_waymo_metrics,
    generate_waymo_type_results,
)


def make_gt_frame(boxes, names, num_pts):
    return {
        "name": np.asarray(names),
        "difficulty": np.zeros(len(names), np.int64),
        "num_points_in_gt": np.asarray(num_pts, np.int64),
        "gt_boxes_lidar": np.asarray(boxes, np.float64),
    }


def make_pred_frame(boxes, names, scores):
    return {
        "name": np.asarray(names),
        "score": np.asarray(scores, np.float32),
        "boxes_lidar": np.asarray(boxes, np.float64),
    }


BOXES = np.array([
    [10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3],
    [-5.0, 8.0, 0.5, 4.2, 1.9, 1.6, -1.1],
    [3.0, -7.0, 0.0, 0.9, 0.9, 1.8, 0.0],
])


def test_type_conversion_and_difficulty_bucketing():
    gt = make_gt_frame(BOXES, ["Vehicle", "Vehicle", "Pedestrian"], [50, 3, 20])
    fid, boxes, typ, score, nlz, diff = generate_waymo_type_results(
        [gt], ["Vehicle", "Pedestrian", "Cyclist"], is_gt=True)
    assert boxes.shape == (3, 7)
    assert list(typ) == [1, 1, 2]
    # <=5 points → LEVEL_2, else LEVEL_1 (ref :44-48)
    assert list(diff) == [1, 2, 1]


def test_perfect_predictions_score_ap_1():
    gt = make_gt_frame(BOXES, ["Vehicle", "Vehicle", "Pedestrian"],
                       [50, 30, 20])
    pred = make_pred_frame(BOXES, ["Vehicle", "Vehicle", "Pedestrian"],
                           [0.9, 0.8, 0.7])
    res = compute_waymo_metrics([pred], [gt], ["Vehicle", "Pedestrian"])
    assert res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0, abs=0.02)
    assert res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0, abs=0.02)
    assert res["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_2/AP"] == pytest.approx(1.0, abs=0.02)
    # perfect headings → APH == AP
    assert res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/APH"] == pytest.approx(
        res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"], abs=1e-6)


def test_heading_error_reduces_aph_not_ap():
    gt = make_gt_frame(BOXES[:1], ["Vehicle"], [50])
    flipped = BOXES[:1].copy()
    flipped[0, 6] += np.pi  # opposite heading: same IoU, worst heading acc
    pred = make_pred_frame(flipped, ["Vehicle"], [0.9])
    res = compute_waymo_metrics([pred], [gt], ["Vehicle"])
    ap = res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"]
    aph = res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/APH"]
    assert ap == pytest.approx(1.0, abs=0.02)
    assert aph == pytest.approx(0.0, abs=0.02)


def test_missed_and_false_detections():
    gt = make_gt_frame(BOXES[:2], ["Vehicle", "Vehicle"], [50, 30])
    # one true hit + one far-away false positive at higher score
    pred_boxes = np.vstack([BOXES[0], [[30, 30, 0, 4, 2, 1.5, 0.0]]])
    pred = make_pred_frame(pred_boxes, ["Vehicle", "Vehicle"], [0.6, 0.9])
    res = compute_waymo_metrics([pred], [gt], ["Vehicle"])
    ap = res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"]
    # recall caps at 0.5 (one of two GT found); precision at that point 0.5
    assert 0.15 < ap < 0.55


def test_l1_ignores_l2_only_gt():
    # one L1 GT + one L2 GT (3 points); predictions match both
    gt = make_gt_frame(BOXES[:2], ["Vehicle", "Vehicle"], [50, 3])
    pred = make_pred_frame(BOXES[:2], ["Vehicle", "Vehicle"], [0.9, 0.8])
    res = compute_waymo_metrics([pred], [gt], ["Vehicle"])
    # L1: the L2-matched prediction is ignored, 1/1 GT found → AP 1.0
    assert res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0, abs=0.02)
    assert res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0, abs=0.02)


def test_hungarian_prefers_total_iou():
    # two overlapping GT; one pred overlapping both — must match exactly one
    gt_boxes = np.array([
        [0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
        [0.5, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
    ])
    gt = make_gt_frame(gt_boxes, ["Vehicle", "Vehicle"], [50, 50])
    pred = make_pred_frame(gt_boxes[:1], ["Vehicle"], [0.9])
    res = compute_waymo_metrics([pred], [gt], ["Vehicle"])
    ap = res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"]
    # 1 TP, 0 FP, 1 FN → precision 1, recall 0.5
    assert 0.35 < ap < 0.55
