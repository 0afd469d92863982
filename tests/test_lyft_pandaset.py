"""Lyft/Pandaset dataset-layer tests (SDK-free paths: cuboid conversion,
sweep aggregation, Lyft mAP protocol)."""

import numpy as np
import pytest


def test_pandaset_cuboid_conversion():
    pd = pytest.importorskip("pandas")
    from mssvt_tpu.datasets.pandaset import PandasetDataset

    cuboids = pd.DataFrame([
        {"label": "Car", "position.x": 1.0, "position.y": 2.0,
         "position.z": 0.5, "dimensions.x": 4.0, "dimensions.y": 2.0,
         "dimensions.z": 1.5, "yaw": 0.3},
        {"label": "Pedestrian with Object", "position.x": -3.0,
         "position.y": 0.0, "position.z": 0.2, "dimensions.x": 0.8,
         "dimensions.y": 0.7, "dimensions.z": 1.8, "yaw": -1.0},
        {"label": "Animal", "position.x": 0, "position.y": 0,
         "position.z": 0, "dimensions.x": 1, "dimensions.y": 1,
         "dimensions.z": 1, "yaw": 0.0},  # unmapped → dropped
    ])
    boxes, names = PandasetDataset.cuboids_to_boxes(cuboids)
    assert boxes.shape == (2, 7)
    assert names.tolist() == ["Car", "Pedestrian"]
    np.testing.assert_allclose(boxes[0], [1, 2, 0.5, 4, 2, 1.5, 0.3])


def test_lyft_map_eval_protocol():
    from mssvt_tpu.datasets.lyft import LyftDataset

    box = np.array([[5.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.2]])
    det = [{"boxes": box, "scores": np.array([0.9]),
            "labels": np.array([1])}]
    gt = [{"boxes": box, "labels": np.array([1])}]
    res = LyftDataset.lyft_map_eval(det, gt, ["car"])
    # perfect match at every IoU threshold → mAP 1
    assert res["car/mAP"] == pytest.approx(1.0, abs=0.02)

    # slightly offset box: passes low thresholds, fails high ones
    det2 = [{"boxes": box + np.array([[0.5, 0, 0, 0, 0, 0, 0]]),
             "scores": np.array([0.9]), "labels": np.array([1])}]
    res2 = LyftDataset.lyft_map_eval(det2, gt, ["car"])
    assert 0.05 < res2["car/mAP"] < 0.95


def test_lyft_sweep_aggregation(tmp_path):
    from mssvt_tpu.datasets.lyft import LyftDataset
    from mssvt_tpu.utils.edict import EasyDict

    key = np.random.normal(size=(10, 5)).astype(np.float32)
    swp = np.random.normal(size=(6, 5)).astype(np.float32)
    (tmp_path / "key.bin").write_bytes(key.tobytes())
    (tmp_path / "swp.bin").write_bytes(swp.tobytes())
    import pickle

    tm = np.eye(4)
    tm[0, 3] = 2.0  # +x shift
    infos = [{
        "lidar_path": "key.bin", "token": "f0",
        "sweeps": [{"lidar_path": "swp.bin", "transform_matrix": tm,
                    "time_lag": 0.1}],
        "gt_boxes": np.zeros((1, 7), np.float32),
        "gt_names": np.array(["car"]),
    }]
    with open(tmp_path / "infos_val.pkl", "wb") as f:
        pickle.dump(infos, f)

    ds = LyftDataset(
        dataset_cfg=EasyDict({
            "DATASET": "LyftDataset",
            "DATA_PATH": str(tmp_path),
            "INFO_PATH": {"test": ["infos_val.pkl"]},
            "MAX_SWEEPS": 2,
            "POINT_CLOUD_RANGE": [-10, -10, -3, 10, 10, 3],
            "POINT_FEATURE_ENCODING": {
                "encoding_type": "absolute_coordinates_encoding",
                "used_feature_list": ["x", "y", "z", "intensity"],
                "src_feature_list": ["x", "y", "z", "intensity", "timestamp"],
            },
            "DATA_PROCESSOR": [
                {"NAME": "mask_points_and_boxes_outside_range",
                 "REMOVE_OUTSIDE_BOXES": True},
                {"NAME": "transform_points_to_voxels",
                 "VOXEL_SIZE": [0.5, 0.5, 0.5],
                 "MAX_POINTS_PER_VOXEL": 5,
                 "MAX_NUMBER_OF_VOXELS": {"train": 100, "test": 100}},
            ],
        }),
        class_names=["car"], training=False, root_path=tmp_path,
    )
    pts = ds.get_lidar_with_sweeps(infos[0])
    assert pts.shape == (16, 5)
    # sweep points got the +2 x-shift and the time lag channel
    np.testing.assert_allclose(pts[10:, 0], swp[:, 0] + 2.0, atol=1e-5)
    np.testing.assert_allclose(pts[10:, 4], 0.1)
    np.testing.assert_allclose(pts[:10, 4], 0.0)
