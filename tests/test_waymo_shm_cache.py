"""Cross-process shared lidar cache (ref: waymo_dataset.py:77-119 SharedArray
staging): a second dataset instance (fresh process stand-in with an empty
per-process dict) must hit the /dev/shm-style staging written by the first."""

import numpy as np
import pytest

from mssvt_tpu.datasets.waymo import WaymoDataset
from mssvt_tpu.utils.edict import EasyDict


def _make_dataset(tmp_path, shm_root):
    root = tmp_path / "waymo"
    (root / "ImageSets").mkdir(parents=True, exist_ok=True)
    (root / "ImageSets" / "train.txt").write_text("seq0\n")
    seq = root / "waymo_processed_data" / "seq0"
    seq.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 6)).astype(np.float32)
    pts[:, 5] = -1  # all outside no-label-zone
    np.save(seq / "0000.npy", pts)

    cfg = EasyDict({
        "DATASET": "WaymoDataset",
        "DATA_PATH": str(root),
        "PROCESSED_DATA_TAG": "waymo_processed_data",
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "POINT_CLOUD_RANGE": [-75.2, -75.2, -2, 75.2, 75.2, 4],
        "USE_SHARED_MEMORY": True,
        "SHARED_MEMORY_ROOT": str(shm_root),
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "elongation"],
            "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
        },
        "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"],
                           "AUG_CONFIG_LIST": []},
        "DATA_PROCESSOR": [],
    })
    return WaymoDataset(cfg, class_names=["Vehicle"], training=True,
                        root_path=root)


def test_shm_cache_shared_across_instances(tmp_path):
    shm_root = tmp_path / "shm"
    ds1 = _make_dataset(tmp_path, shm_root)
    pts1 = ds1.get_lidar("seq0", 0)
    staged = list(shm_root.rglob("*.npy"))
    assert staged, "first reader did not stage into the shared cache"

    # second instance: empty per-process dict — must come from the staging
    ds2 = _make_dataset(tmp_path, shm_root)
    assert not ds2._lidar_cache
    # delete the source npy: only the shared staging can serve the read
    (tmp_path / "waymo" / "waymo_processed_data" / "seq0" / "0000.npy"
     ).unlink()
    pts2 = ds2.get_lidar("seq0", 0)
    np.testing.assert_allclose(pts1, pts2)

    ds1.clean_shared_memory()
    assert not list(shm_root.rglob("*.npy"))
