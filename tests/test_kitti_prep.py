"""KITTI data-prep pipeline test on a synthetic mini-KITTI tree
(ref: kitti_dataset.py get_infos / create_groundtruth_database /
create_kitti_infos)."""

import pickle

import numpy as np
import pytest

from mssvt_tpu.datasets.kitti import KittiDataset, create_kitti_infos
from mssvt_tpu.utils.edict import EasyDict

CALIB = """P2: 700 0 600 40 0 700 200 0 0 0 1 0
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0
"""
# one Car at lidar (10, 0, 0) — camera frame loc is bottom-center:
# cam (x,y,z) = (-y_l, -z_l+?, x_l): with our Tr: cam = (0, 0.8, 10)
LABEL = "Car 0.0 0 1.57 500 150 700 300 1.5 1.6 3.9 0.0 0.8 10.0 -1.5708\n"  # ry=-pi/2 -> lidar heading 0


def make_tree(root, ids=("000000", "000001")):
    for sub in ("velodyne", "calib", "label_2"):
        (root / "training" / sub).mkdir(parents=True, exist_ok=True)
    (root / "ImageSets").mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in ids:
        pts = rng.uniform(0, 30, (300, 4)).astype(np.float32)
        pts[:, 1] = rng.uniform(-10, 10, 300)
        pts[:, 2] = rng.uniform(-2, 1, 300)
        pts[:50, 0] = rng.uniform(8.5, 11.5, 50)  # inside the gt box
        pts[:50, 1] = rng.uniform(-0.7, 0.7, 50)
        pts[:50, 2] = rng.uniform(-0.7, 0.7, 50)
        (root / "training" / "velodyne" / f"{i}.bin").write_bytes(pts.tobytes())
        (root / "training" / "calib" / f"{i}.txt").write_text(CALIB)
        (root / "training" / "label_2" / f"{i}.txt").write_text(LABEL)
    (root / "ImageSets" / "train.txt").write_text("\n".join(ids))
    (root / "ImageSets" / "val.txt").write_text(ids[0])


def ds_cfg(root):
    return EasyDict({
        "DATASET": "KittiDataset",
        "DATA_PATH": str(root),
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "FOV_POINTS_ONLY": False,
        "POINT_CLOUD_RANGE": [0, -20, -3, 40, 20, 1],
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "transform_points_to_voxels",
             "VOXEL_SIZE": [0.4, 0.4, 0.4],
             "MAX_POINTS_PER_VOXEL": 5,
             "MAX_NUMBER_OF_VOXELS": {"train": 500, "test": 500}},
        ],
    })


def test_create_kitti_infos_and_gtdb(tmp_path):
    make_tree(tmp_path)
    create_kitti_infos(
        ds_cfg(tmp_path), ["Car", "Pedestrian", "Cyclist"],
        data_path=tmp_path, save_path=tmp_path)

    with open(tmp_path / "kitti_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 2
    annos = infos[0]["annos"]
    assert annos["name"].tolist() == ["Car"]
    # camera loc (0, 0.8, 10) → lidar center (10, 0, -0.8 + h/2)
    box = annos["gt_boxes_lidar"][0]
    np.testing.assert_allclose(box[:2], [10, 0], atol=1e-5)
    np.testing.assert_allclose(box[3:6], [3.9, 1.6, 1.5], atol=1e-5)  # l w h
    assert annos["num_points_in_gt"][0] >= 40  # the planted cluster

    with open(tmp_path / "kitti_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    assert "Car" in db and len(db["Car"]) == 2
    obj = np.fromfile(tmp_path / db["Car"][0]["path"], np.float32).reshape(-1, 4)
    assert len(obj) == db["Car"][0]["num_points_in_gt"]
    # object points are box-centered
    assert np.abs(obj[:, :2]).max() < 3.0
