"""KITTI dataset pipeline (ref: pcdet/datasets/kitti/kitti_dataset.py:21-483).

Self-contained numpy implementation: calibration parsing
(ref: utils/calibration_kitti.py), label parsing (ref: utils/object3d_kitti.py),
camera→lidar box conversion, .bin point loading, FOV filtering, and the
KITTI-style AP evaluation via utils/eval_ap.py.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .dataset import DatasetTemplate


class Calibration:
    """Ref: pcdet/utils/calibration_kitti.py (P2/R0/Tr_velo_to_cam algebra)."""

    def __init__(self, calib_file):
        lines = Path(calib_file).read_text().strip().splitlines()
        data = {}
        for line in lines:
            if ":" not in line:
                continue
            key, val = line.split(":", 1)
            data[key.strip()] = np.array([float(x) for x in val.split()])
        self.P2 = data["P2"].reshape(3, 4)
        self.R0 = data["R0_rect"].reshape(3, 3)
        self.V2C = data["Tr_velo_to_cam"].reshape(3, 4)

    def rect_to_lidar(self, pts_rect):
        pts_ref = pts_rect @ np.linalg.inv(self.R0.T)
        pts_hom = np.hstack([pts_ref, np.ones((len(pts_ref), 1))])
        # invert [R|t]
        rt = np.vstack([self.V2C, [0, 0, 0, 1]])
        return (pts_hom @ np.linalg.inv(rt).T)[:, :3]

    def lidar_to_rect(self, pts_lidar):
        pts_hom = np.hstack([pts_lidar, np.ones((len(pts_lidar), 1))])
        return pts_hom @ self.V2C.T @ self.R0.T

    def rect_to_img(self, pts_rect):
        pts_hom = np.hstack([pts_rect, np.ones((len(pts_rect), 1))])
        pts_2d = pts_hom @ self.P2.T
        depth = pts_2d[:, 2]
        return pts_2d[:, :2] / np.clip(depth[:, None], 1e-6, None), depth


def parse_label_file(label_file):
    """Ref: utils/object3d_kitti.py. Returns list of dicts."""
    objects = []
    for line in Path(label_file).read_text().strip().splitlines():
        p = line.split()
        if len(p) < 15:
            continue
        objects.append({
            "name": p[0],
            "truncated": float(p[1]),
            "occluded": int(float(p[2])),
            "alpha": float(p[3]),
            "bbox": np.array([float(x) for x in p[4:8]]),
            "hwl": np.array([float(x) for x in p[8:11]]),  # h, w, l
            "loc": np.array([float(x) for x in p[11:14]]),  # camera coords
            "ry": float(p[14]),
            "score": float(p[15]) if len(p) > 15 else -1.0,
        })
    return objects


def boxes_camera_to_lidar(objects, calib):
    """Camera-frame labels → lidar (x, y, z, dx, dy, dz, heading)."""
    if not objects:
        return np.zeros((0, 7), np.float32), np.array([], dtype="<U20")
    loc = np.stack([o["loc"] for o in objects])
    hwl = np.stack([o["hwl"] for o in objects])
    ry = np.array([o["ry"] for o in objects])
    names = np.array([o["name"] for o in objects])

    loc_lidar = calib.rect_to_lidar(loc)
    h, w, l = hwl[:, 0], hwl[:, 1], hwl[:, 2]
    loc_lidar[:, 2] += h / 2  # bottom-center → geometric center
    heading = -(np.pi / 2 + ry)
    boxes = np.concatenate(
        [loc_lidar, l[:, None], w[:, None], h[:, None], heading[:, None]], axis=1
    ).astype(np.float32)
    return boxes, names


class KittiDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg, class_names, training, root_path, logger)
        self.split = dataset_cfg["DATA_SPLIT"][self.mode]
        split_file = self.root_path / "ImageSets" / (self.split + ".txt")
        self.sample_id_list = (
            [x.strip() for x in open(split_file).readlines()]
            if split_file.exists() else []
        )
        self.kitti_dir = self.root_path / (
            "training" if self.split != "test" else "testing"
        )
        self.fov_points_only = bool(dataset_cfg.get("FOV_POINTS_ONLY", True))

    def __len__(self):
        return len(self.sample_id_list)

    def get_lidar(self, idx):
        return np.fromfile(
            self.kitti_dir / "velodyne" / f"{idx}.bin", np.float32
        ).reshape(-1, 4)

    def get_calib(self, idx):
        return Calibration(self.kitti_dir / "calib" / f"{idx}.txt")

    def get_label(self, idx):
        return parse_label_file(self.kitti_dir / "label_2" / f"{idx}.txt")

    def _fov_flag(self, points, calib, img_shape=(375, 1242)):
        pts_rect = calib.lidar_to_rect(points[:, :3])
        pts_img, depth = calib.rect_to_img(pts_rect)
        return (
            (pts_img[:, 0] >= 0) & (pts_img[:, 0] < img_shape[1])
            & (pts_img[:, 1] >= 0) & (pts_img[:, 1] < img_shape[0])
            & (depth >= 0)
        )

    def __getitem__(self, index):
        idx = self.sample_id_list[index]
        points = self.get_lidar(idx)
        calib = self.get_calib(idx)
        if self.fov_points_only:
            points = points[self._fov_flag(points, calib)]

        input_dict = {"points": points, "frame_id": idx}
        label_file = self.kitti_dir / "label_2" / f"{idx}.txt"
        if label_file.exists():
            objects = [o for o in self.get_label(idx) if o["name"] != "DontCare"]
            gt_boxes, gt_names = boxes_camera_to_lidar(objects, calib)
            input_dict.update({"gt_boxes": gt_boxes, "gt_names": gt_names})
        return self.prepare_data(input_dict)

    def evaluation(self, det_annos, class_names, **kwargs):
        """EVAL_METRIC 'kitti' → official-protocol R40 AP with difficulty
        buckets + ignored-GT semantics (utils/kitti_eval.py, ref:
        kitti_object_eval_python/eval.py:448,639); anything else → the fast
        proxy."""
        metric = self.dataset_cfg.get("EVAL_METRIC", "kitti")
        if metric == "kitti":
            from ..utils.kitti_eval import kitti_official_eval

            return kitti_official_eval(
                det_annos, kwargs["gt_annos"], class_names)
        from ..utils.eval_ap import kitti_style_eval

        return kitti_style_eval(det_annos, kwargs["gt_annos"], class_names)
