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


def _frame(boxes, names, scores=None, num_pts=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 7)
    d = {"name": np.asarray(names)}
    if scores is None:  # gt frame
        d["gt_boxes_lidar"] = boxes
        d["num_points_in_gt"] = (np.asarray(num_pts) if num_pts is not None
                                 else np.full(len(boxes), 50))
        d["difficulty"] = np.zeros(len(boxes), np.int64)
    else:
        d["boxes_lidar"] = boxes
        d["score"] = np.asarray(scores, np.float32)
    return d


def _box(x, y=0.0, heading=0.0):
    return [x, y, 0.0, 4.0, 2.0, 1.5, heading]


def test_known_ap_high_score_fp():
    """2 preds (FP at 0.9, TP at 0.8), 1 GT → exact AP 0.5: the PR curve is
    (r=0, p=0) above 0.8 and (r=1, p=1/2) below; envelope area = 0.5."""
    from mssvt_tpu.datasets.waymo_eval import compute_waymo_metrics

    gt = [_frame([_box(0.0)], ["Vehicle"])]
    det = [_frame([_box(50.0), _box(0.0)], ["Vehicle", "Vehicle"],
                  scores=[0.9, 0.8])]
    res = compute_waymo_metrics(det, gt, ["Vehicle"])
    assert res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(0.5)
    assert res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(0.5)


def test_known_ap_interleaved():
    """2 GT; preds TP@0.9, FP@0.7, TP@0.5 → exact AP = 0.5*1 + 0.5*(2/3)."""
    from mssvt_tpu.datasets.waymo_eval import compute_waymo_metrics

    gt = [_frame([_box(0.0), _box(20.0)], ["Vehicle", "Vehicle"])]
    det = [_frame([_box(0.0), _box(50.0), _box(20.0)],
                  ["Vehicle"] * 3, scores=[0.9, 0.7, 0.5])]
    res = compute_waymo_metrics(det, gt, ["Vehicle"])
    want = 0.5 * 1.0 + 0.5 * (2.0 / 3.0)
    assert res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(
        want, abs=1e-9)


def test_known_aph_quarter_turn():
    """One TP with a pi/2 heading error on a SQUARE box (footprint is
    heading-invariant, so the IoU gate still passes at 1.0): heading
    accuracy 1 - (pi/2)/pi = 0.5 at every cutoff → APH = 0.5."""
    from mssvt_tpu.datasets.waymo_eval import compute_waymo_metrics

    sq = [0.0, 0.0, 0.0, 2.0, 2.0, 1.5]
    gt = [_frame([sq + [0.0]], ["Vehicle"])]
    det = [_frame([sq + [np.pi / 2]], ["Vehicle"], scores=[0.9])]
    res = compute_waymo_metrics(det, gt, ["Vehicle"])
    assert res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0)
    assert res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH"] == pytest.approx(0.5)


def test_known_tied_scores_single_cutoff():
    """Tied scores are one cutoff: TP and FP both at 0.7 with 1 GT →
    single PR point (r=1, p=0.5) → AP 0.5 (not 0.75 from rank-splitting)."""
    from mssvt_tpu.datasets.waymo_eval import compute_waymo_metrics

    gt = [_frame([_box(0.0)], ["Vehicle"])]
    det = [_frame([_box(0.0), _box(50.0)], ["Vehicle", "Vehicle"],
                  scores=[0.7, 0.7])]
    res = compute_waymo_metrics(det, gt, ["Vehicle"])
    assert res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(0.5)


def test_known_l1_ignore_semantics_value():
    """1 L1 GT + 1 L2 GT (<=5 pts), both detected (scores 0.9, 0.8):
    L1: the L2-matched pred is DROPPED (not FP) → perfect curve, AP 1.0;
    L2: both count → AP 1.0. A third FP at 0.85 sits between them: L1 sees
    [TP@0.9, FP@0.85] over 1 GT → AP = 1.0 (envelope: r=1 reached at 0.9
    with p=1)."""
    from mssvt_tpu.datasets.waymo_eval import compute_waymo_metrics

    gt = [_frame([_box(0.0), _box(20.0)], ["Vehicle", "Vehicle"],
                 num_pts=[50, 3])]
    det = [_frame([_box(0.0), _box(50.0), _box(20.0)], ["Vehicle"] * 3,
                  scores=[0.9, 0.85, 0.8])]
    res = compute_waymo_metrics(det, gt, ["Vehicle"])
    assert res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0)
    # L2: TP@0.9 (p=1, r=1/2), FP@0.85 (p=1/2), TP@0.8 (p=2/3, r=1)
    want_l2 = 0.5 * 1.0 + 0.5 * (2.0 / 3.0)
    assert res["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(
        want_l2, abs=1e-9)


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
