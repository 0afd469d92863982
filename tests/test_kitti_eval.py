"""Official-protocol KITTI evaluator tests
(ref: kitti_object_eval_python/eval.py:27-111,448,639)."""

import numpy as np
import pytest

from mssvt_tpu.utils.kitti_eval import (
    clean_data,
    get_thresholds,
    kitti_official_eval,
)

BOX_A = [10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.2]
BOX_B = [-6.0, 5.0, 0.3, 3.8, 1.7, 1.4, -0.9]


def test_clean_data_difficulty_and_neighbors():
    gt = {
        "bbox": np.array([[0, 0, 100, 50],    # height 50 → easy-eligible
                          [0, 0, 100, 30],    # height 30 → moderate+
                          [0, 0, 100, 50],
                          [0, 0, 100, 50]]),
        "occluded": np.array([0, 0, 0, 0]),
        "truncated": np.array([0.0, 0.0, 0.0, 0.0]),
    }
    names = np.array(["Car", "Car", "Van", "DontCare"])
    care, ign = clean_data(names, gt, "Car", difficulty=0)
    assert care.tolist() == [True, False, False, False]
    # short box → ignored at easy; Van (neighbor) and DontCare → ignored
    assert ign.tolist() == [False, True, True, True]
    care_m, _ = clean_data(names, gt, "Car", difficulty=1)
    assert care_m.tolist() == [True, True, False, False]


def test_thresholds_spacing():
    scores = np.linspace(0.9, 0.1, 50)
    th = get_thresholds(scores, num_gt=50)
    assert len(th) <= 41
    assert (np.diff(th) <= 0).all()


def test_perfect_detection_ap_100():
    det = [{"boxes": np.array([BOX_A, BOX_B]), "scores": np.array([0.9, 0.8]),
            "name": np.array(["Car", "Car"])}]
    gt = [{"boxes": np.array([BOX_A, BOX_B]),
           "name": np.array(["Car", "Car"])}]
    report, res = kitti_official_eval(det, gt, ["Car"])
    assert res["Car_3d/moderate_R40"] == pytest.approx(100.0, abs=0.5)
    assert res["Car_bev/easy_R40"] == pytest.approx(100.0, abs=0.5)


def test_van_match_not_penalized():
    """A detection on a Van (neighbor class) must not be a false positive."""
    det = [{"boxes": np.array([BOX_A, BOX_B]), "scores": np.array([0.9, 0.8]),
            "name": np.array(["Car", "Car"])}]
    gt = [{"boxes": np.array([BOX_A, BOX_B]),
           "name": np.array(["Car", "Van"])}]
    _, res = kitti_official_eval(det, gt, ["Car"])
    # 1 care GT, found; the Van hit is absorbed → AP 100
    assert res["Car_3d/moderate_R40"] == pytest.approx(100.0, abs=0.5)


def test_false_positive_lowers_ap():
    far = [30.0, 30.0, 0.0, 4.0, 2.0, 1.5, 0.0]
    det = [{"boxes": np.array([BOX_A, far]), "scores": np.array([0.6, 0.9]),
            "name": np.array(["Car", "Car"])}]
    gt = [{"boxes": np.array([BOX_A]), "name": np.array(["Car"])}]
    _, res = kitti_official_eval(det, gt, ["Car"])
    assert res["Car_3d/moderate_R40"] < 80.0
