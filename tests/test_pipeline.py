"""Data pipeline tests: voxelizer semantics, dataset → collate, loader."""

import numpy as np
import pytest

from mssvt_tpu.datasets.loader import build_dataloader
from mssvt_tpu.ops.voxelize import voxelize_points
from mssvt_tpu.utils.edict import EasyDict

VOXEL_SIZE = (0.5, 0.5, 0.5)
PCR = (0.0, 0.0, 0.0, 4.0, 4.0, 2.0)


def _oracle_voxelize(points, max_pts, max_vox):
    """Sequential simulator of spconv VoxelGenerator semantics."""
    voxels, coords, counts = [], [], []
    vmap = {}
    for p in points:
        idx = tuple(int(np.floor((p[i] - PCR[i]) / VOXEL_SIZE[i])) for i in range(3))
        grid = tuple(int(round((PCR[i + 3] - PCR[i]) / VOXEL_SIZE[i])) for i in range(3))
        if not all(0 <= idx[i] < grid[i] for i in range(3)):
            continue
        if idx not in vmap:
            if len(voxels) >= max_vox:
                continue
            vmap[idx] = len(voxels)
            voxels.append(np.zeros((max_pts, points.shape[1]), np.float32))
            coords.append((idx[2], idx[1], idx[0]))  # zyx
            counts.append(0)
        v = vmap[idx]
        if counts[v] < max_pts:
            voxels[v][counts[v]] = p
            counts[v] += 1
    return (
        np.array(voxels, np.float32),
        np.array(coords, np.int32),
        np.array(counts, np.int32),
    )


def test_voxelizer_matches_spconv_semantics(rng):
    pts = rng.uniform(-0.5, 4.5, (500, 5)).astype(np.float32)
    for max_pts, max_vox in [(3, 1000), (2, 10), (5, 5)]:
        v, c, n = voxelize_points(pts, VOXEL_SIZE, PCR, max_pts, max_vox)
        ov, oc, on = _oracle_voxelize(pts, max_pts, max_vox)
        np.testing.assert_array_equal(c, oc)
        np.testing.assert_array_equal(n, on)
        np.testing.assert_allclose(v, ov)


def test_voxelizer_empty():
    pts = np.full((10, 5), -100.0, np.float32)  # all out of range
    v, c, n = voxelize_points(pts, VOXEL_SIZE, PCR, 5, 100)
    assert len(v) == 0 and len(c) == 0


def test_jax_voxelizer_equivalence(rng):
    import jax.numpy as jnp

    from mssvt_tpu.ops.voxelize import voxelize_points_jax

    pts = rng.uniform(-0.5, 4.5, (300, 5)).astype(np.float32)
    hv, hc, hn = voxelize_points(pts, VOXEL_SIZE, PCR, 4, 256)

    pad = np.zeros((512, 5), np.float32)
    pad[:300] = pts
    valid = np.arange(512) < 300
    jv, jc, jn, jm = voxelize_points_jax(
        jnp.asarray(pad), jnp.asarray(valid), VOXEL_SIZE, PCR, 4, 256
    )
    jc, jn, jm = np.asarray(jc), np.asarray(jn), np.asarray(jm)
    # same voxel set + same per-voxel counts (order differs: sorted vs appearance)
    host = {tuple(c): n for c, n in zip(hc, hn)}
    dev = {tuple(c[1:]): n for c, n in zip(jc[jm], jn[jm])}
    assert host == dev
    # per-voxel point MEANS must agree (MeanVFE invariance)
    jv = np.asarray(jv)
    for i in np.flatnonzero(jm):
        key = tuple(jc[i][1:])
        hidx = [k for k, c in enumerate(hc) if tuple(c) == key][0]
        np.testing.assert_allclose(
            jv[i].sum(0) / max(jn[i], 1), hv[hidx].sum(0) / max(hn[hidx], 1),
            rtol=1e-5,
        )


def synthetic_cfg():
    return EasyDict({
        "DATASET": "SyntheticDataset",
        "NUM_FRAMES": 6,
        "POINTS_PER_FRAME": 3000,
        "POINT_CLOUD_RANGE": [0.0, -9.6, -2.0, 19.2, 9.6, 2.0],
        "MAX_GT_BOXES": 32,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_AUGMENTOR": {
            "DISABLE_AUG_LIST": ["gt_sampling"],
            "AUG_CONFIG_LIST": [
                {"NAME": "gt_sampling", "DB_INFO_PATH": ["none.pkl"],
                 "SAMPLE_GROUPS": [], "PREPARE": {}},
                {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x", "y"]},
                {"NAME": "random_world_rotation",
                 "WORLD_ROT_ANGLE": [-0.785, 0.785]},
                {"NAME": "random_world_scaling",
                 "WORLD_SCALE_RANGE": [0.95, 1.05]},
            ],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "shuffle_points",
             "SHUFFLE_ENABLED": {"train": True, "test": False}},
            {"NAME": "transform_points_to_voxels",
             "VOXEL_SIZE": [0.4, 0.4, 0.5],
             "MAX_POINTS_PER_VOXEL": 5,
             "MAX_NUMBER_OF_VOXELS": {"train": 2000, "test": 2000}},
        ],
    })


@pytest.mark.parametrize("training", [True, False])
def test_dataset_and_collate(training):
    dataset, loader = build_dataloader(
        dataset_cfg=synthetic_cfg(), class_names=["Vehicle", "Pedestrian", "Cyclist"],
        batch_size=2, training=training, workers=0, seed=0,
    )
    assert tuple(dataset.grid_size) == (48, 48, 8)
    batches = list(iter(loader))
    assert len(batches) == 3
    b = batches[0]
    cap = 2 * dataset.max_voxels
    assert b["voxels"].shape == (cap, 5, 4)
    assert b["voxel_coords"].shape == (cap, 4)
    assert b["gt_boxes"].shape == (2, 32, 8)
    # fixed per-sample slots
    v = b["voxel_valid"]
    c = b["voxel_coords"]
    assert (c[: dataset.max_voxels][v[: dataset.max_voxels]][:, 0] == 0).all()
    assert (c[dataset.max_voxels:][v[dataset.max_voxels:]][:, 0] == 1).all()
    # coords in grid bounds
    cc = c[v]
    assert (cc[:, 1] < 8).all() and (cc[:, 2] < 48).all() and (cc[:, 3] < 48).all()
    if training:
        assert (b["gt_boxes"][:, :, -1].max() <= 3) and (b["gt_boxes"].sum() != 0)


def test_loader_merge_all_iters_to_one_epoch():
    """merge_all_iters folds N shuffled passes into one stream
    (ref: datasets/__init__.py:69-74): N x the steps, every sample appears
    exactly N times, and per-pass orders differ."""
    from collections import Counter

    from mssvt_tpu.datasets.loader import Loader

    class Stub:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            return {"frame_id": i}

        @staticmethod
        def collate_batch(samples):
            return {"frame_id": [s["frame_id"] for s in samples]}

    loader = Loader(Stub(), batch_size=1, shuffle=True, num_workers=0, seed=7)
    base_steps = len(loader)
    assert base_steps == 12
    loader.merge_all_iters_to_one_epoch(merge=True, epochs=3)
    assert len(loader) == 3 * base_steps
    ids = [b["frame_id"][0] for b in loader]
    counts = Counter(ids)
    assert all(c == 3 for c in counts.values()) and len(counts) == 12
    p0, p1 = ids[:base_steps], ids[base_steps:2 * base_steps]
    assert sorted(p0) == sorted(p1) and p0 != p1
    loader.merge_all_iters_to_one_epoch(merge=False)
    assert len(loader) == base_steps


def test_loader_sharding():
    dataset, loader0 = build_dataloader(
        dataset_cfg=synthetic_cfg(), class_names=["Vehicle"],
        batch_size=1, training=False, workers=0, rank=0, world_size=2,
    )
    _, loader1 = build_dataloader(
        dataset_cfg=synthetic_cfg(), class_names=["Vehicle"],
        batch_size=1, training=False, workers=0, rank=1, world_size=2,
    )
    f0 = [b["frame_id"][0] for b in loader0]
    f1 = [b["frame_id"][0] for b in loader1]
    assert not (set(f0) & set(f1))
    assert len(f0) + len(f1) == 6


def test_named_processors_grid_size_and_depth_downsample():
    """Config-named calculate_grid_size / downsample_depth_map processors
    (ref: data_processor.py:177-194)."""
    from mssvt_tpu.datasets.processor import DataProcessor

    pcr = [-4.0, -4.0, -2.0, 4.0, 4.0, 2.0]
    proc = DataProcessor(
        processor_configs=[
            {"NAME": "calculate_grid_size", "VOXEL_SIZE": [0.5, 0.5, 1.0]},
            {"NAME": "downsample_depth_map", "DOWNSAMPLE_FACTOR": 2},
        ],
        point_cloud_range=pcr, training=True, num_point_features=4,
    )
    np.testing.assert_array_equal(proc.grid_size, [16, 16, 4])
    assert proc.voxel_size == [0.5, 0.5, 1.0]

    depth = np.arange(6 * 4, dtype=np.float32).reshape(6, 4)
    out = proc.forward({"points": np.zeros((1, 4), np.float32),
                        "depth_maps": depth.copy()})
    got = out["depth_maps"]
    assert got.shape == (3, 2)
    # block means (skimage downscale_local_mean semantics)
    want = depth.reshape(3, 2, 2, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # odd size: zero-padded to a factor multiple before the block mean
    depth5 = np.ones((5, 3), np.float32)
    out = proc.forward({"points": np.zeros((1, 4), np.float32),
                        "depth_maps": depth5})
    assert out["depth_maps"].shape == (3, 2)
    np.testing.assert_allclose(out["depth_maps"][0, 0], 1.0)
    np.testing.assert_allclose(out["depth_maps"][2, 1], 0.25)  # 1 of 4 cells


def test_average_across_hosts_single_process_identity():
    """Cross-host timing mean (ref: commu_utils.py:143-145) degrades to the
    identity on one process."""
    from mssvt_tpu.runtime.train_utils import average_across_hosts

    assert average_across_hosts(1.5) == 1.5
    assert average_across_hosts(1.0, 2.0) == (1.0, 2.0)
