"""Local/frustum/translation augmentor tests (ref: augmentor_utils.py:7-453)
+ road-plane GT placement (ref: database_sampler.py:137)."""

import numpy as np
import pytest

from mssvt_tpu.datasets.augmentor import (
    DataAugmentor,
    global_frustum_dropout,
    random_local_frustum_dropout,
    random_local_rotation,
    random_local_scaling,
    random_local_translation,
    random_world_translation,
)


@pytest.fixture(autouse=True)
def seed():
    np.random.seed(7)


def make_scene():
    gt = np.array([[5.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0, 1.0]], np.float32)
    inside = np.random.uniform(-0.9, 0.9, (20, 3)).astype(np.float32) + gt[0, :3]
    outside = np.random.uniform(10, 20, (30, 3)).astype(np.float32)
    points = np.concatenate([inside, outside]).astype(np.float32)
    points = np.concatenate([points, np.zeros((50, 1), np.float32)], 1)
    return gt.copy(), points


def test_world_translation_shifts_everything():
    gt, pts = make_scene()
    g2, p2 = random_world_translation(gt.copy(), pts.copy(), [0.5, 0.5, 0.5])
    off = p2[0, :3] - pts[0, :3]
    np.testing.assert_allclose(p2[:, :3] - pts[:, :3],
                               np.broadcast_to(off, (50, 3)), atol=1e-5)
    np.testing.assert_allclose(g2[0, :3] - gt[0, :3], off, atol=1e-5)


def test_local_translation_moves_only_object_points():
    gt, pts = make_scene()
    g2, p2 = random_local_translation(gt.copy(), pts.copy(), [0.3, 0.6])
    # outside points untouched
    np.testing.assert_allclose(p2[20:], pts[20:], atol=1e-6)
    # box moved with its points
    off = g2[0, :3] - gt[0, :3]
    assert np.abs(off[:2]).max() >= 0.3 - 1e-6
    np.testing.assert_allclose(p2[:20, :3] - pts[:20, :3],
                               np.broadcast_to(off, (20, 3)), atol=1e-6)


def test_local_rotation_preserves_distance_to_center():
    gt, pts = make_scene()
    g2, p2 = random_local_rotation(gt.copy(), pts.copy(), [0.3, 0.5])
    d_before = np.linalg.norm(pts[:20, :2] - gt[0, :2], axis=1)
    d_after = np.linalg.norm(p2[:20, :2] - g2[0, :2], axis=1)
    np.testing.assert_allclose(d_before, d_after, rtol=1e-5)
    assert g2[0, 6] != gt[0, 6]
    np.testing.assert_allclose(p2[20:], pts[20:], atol=1e-6)


def test_local_scaling_scales_box_and_points():
    gt, pts = make_scene()
    g2, p2 = random_local_scaling(gt.copy(), pts.copy(), [1.1, 1.3])
    scale = g2[0, 3] / gt[0, 3]
    assert 1.1 <= scale <= 1.3
    np.testing.assert_allclose(g2[0, 3:6], gt[0, 3:6] * scale, rtol=1e-5)
    np.testing.assert_allclose(
        p2[:20, :3] - gt[0, :3], (pts[:20, :3] - gt[0, :3]) * scale, rtol=1e-3, atol=1e-6)


def test_frustum_dropouts_remove_points():
    gt, pts = make_scene()
    _, p_glob = global_frustum_dropout(gt.copy(), pts.copy(), [0.3, 0.3], "top")
    assert len(p_glob) < len(pts)
    zmax = pts[:, 2].max()
    assert p_glob[:, 2].max() < zmax  # top band removed

    _, p_loc = random_local_frustum_dropout(
        gt.copy(), pts.copy(), [0.5, 0.5], "top")
    assert len(p_loc) < len(pts)
    # only object points are eligible for local dropout
    assert len(p_loc) >= len(pts) - 20


def test_queue_dispatch_and_heading_normalization():
    aug = DataAugmentor(
        root_path=None,
        augmentor_configs={"AUG_CONFIG_LIST": [
            {"NAME": "random_world_translation",
             "NOISE_TRANSLATE_STD": [0.1, 0.1, 0.1]},
            {"NAME": "random_local_rotation", "LOCAL_ROT_ANGLE": 0.2},
            {"NAME": "random_local_scaling", "LOCAL_SCALE_RANGE": [0.95, 1.05]},
            {"NAME": "random_world_frustum_dropout",
             "INTENSITY_RANGE": [0.0, 0.1], "DIRECTION": ["top"]},
        ], "DISABLE_AUG_LIST": ["placeholder"]},
        class_names=["Car"],
    )
    gt, pts = make_scene()
    gt[0, 6] = 7.0  # out of range heading
    out = aug.forward({"gt_boxes": gt, "points": pts,
                       "gt_names": np.array(["Car"])})
    h = out["gt_boxes"][0, 6]
    assert -np.pi <= h <= np.pi


def test_road_plane_placement():
    """Sampled boxes drop onto the plane z = 0.1x + 0.2 (lidar frame)."""
    import pickle
    import tempfile
    from pathlib import Path

    from mssvt_tpu.datasets.augmentor import DataBaseSampler

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        obj = np.random.normal(0, 0.3, (30, 5)).astype(np.float32)
        (td / "obj.bin").write_bytes(obj.tobytes())
        db = {"Car": [{
            "name": "Car", "path": "obj.bin",
            "box3d_lidar": np.array([6.0, 1.0, 2.0, 4, 2, 1.6, 0.3],
                                    np.float32),
            "num_points_in_gt": 30, "difficulty": 0,
        }]}
        with open(td / "db.pkl", "wb") as f:
            pickle.dump(db, f)
        sampler = DataBaseSampler(
            root_path=td,
            sampler_cfg={
                "DB_INFO_PATH": ["db.pkl"],
                "SAMPLE_GROUPS": ["Car:1"],
                "NUM_POINT_FEATURES": 5,
                "USE_ROAD_PLANE": True,
            },
            class_names=["Car"],
        )
        data = {
            "gt_boxes": np.zeros((0, 7), np.float32),
            "gt_names": np.array([], str),
            "points": np.zeros((5, 5), np.float32) + 50,
            "gt_boxes_mask": np.zeros((0,), bool),
            # plane a*x + b*y + c*z + d = 0 with z = 0.1x + 0.2
            "road_plane": np.array([0.1, 0.0, -1.0, 0.2]),
        }
        out = sampler(data)
        box = out["gt_boxes"][0]
        z_plane = 0.1 * box[0] + 0.2
        np.testing.assert_allclose(box[2] - box[5] / 2, z_plane, atol=1e-5)


def test_velocity_columns_transform_with_flips_and_rotation():
    """Boxes carrying [vx, vy] at 7:9 (multi-sweep datasets) must have their
    velocity transformed like the geometry (ref: augmentor_utils.py:20-22,
    37-39,55-59)."""
    from mssvt_tpu.datasets.augmentor import (
        global_rotation, random_flip_along_x, random_flip_along_y)

    def vel_scene():
        gt = np.array([[5.0, 2.0, 0.0, 2.0, 2.0, 2.0, 0.3, 1.5, -0.7]],
                      np.float32)
        pts = np.random.uniform(-1, 1, (10, 4)).astype(np.float32)
        return gt, pts

    # flip along x (y -> -y): vy negated, vx kept — force the coin to land
    for _ in range(50):
        gt, pts = vel_scene()
        g2, _ = random_flip_along_x(gt.copy(), pts.copy())
        if g2[0, 1] != gt[0, 1]:  # flip fired
            assert g2[0, 7] == gt[0, 7] and g2[0, 8] == -gt[0, 8]
            break
    else:
        raise AssertionError("flip never fired in 50 tries")

    # flip along y (x -> -x): vx negated, vy kept
    for _ in range(50):
        gt, pts = vel_scene()
        g2, _ = random_flip_along_y(gt.copy(), pts.copy())
        if g2[0, 0] != gt[0, 0]:
            assert g2[0, 7] == -gt[0, 7] and g2[0, 8] == gt[0, 8]
            break
    else:
        raise AssertionError("flip never fired in 50 tries")

    # rotation: (vx, vy) rotates by the same angle as the box center
    gt, pts = vel_scene()
    g2, _ = global_rotation(gt.copy(), pts.copy(), [0.7, 0.7])
    c, s = np.cos(0.7), np.sin(0.7)
    np.testing.assert_allclose(
        g2[0, 7:9],
        [c * gt[0, 7] - s * gt[0, 8], s * gt[0, 7] + c * gt[0, 8]],
        atol=1e-5)

    # 7-column boxes pass through all three untouched in the velocity slots
    gt7 = np.array([[5.0, 2.0, 0.0, 2.0, 2.0, 2.0, 0.3]], np.float32)
    for fn in (random_flip_along_x, random_flip_along_y):
        g2, _ = fn(gt7.copy(), np.zeros((4, 4), np.float32))
        assert g2.shape == (1, 7)
    g2, _ = global_rotation(gt7.copy(), np.zeros((4, 4), np.float32), [0.5, 0.5])
    assert g2.shape == (1, 7)
