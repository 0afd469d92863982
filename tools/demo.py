"""Inference demo on a folder of point clouds (ref: tools/demo.py:23-110).

Loads .bin/.npy point files, runs the model, prints detections; --vis_dir
renders BEV PNGs via matplotlib (open3d/mayavi are absent in this env —
via open3d/mayavi is not available in this environment; results can be dumped
to .pkl with --out_file).
"""

from __future__ import annotations

import argparse
import glob
import pickle
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import jax

# repo-local persistent cache — ONE cache dir for every entry point
# (bench.py, __graft_entry__.py, tests, tools/): /tmp variants caused
# cold-compile misses between them (VERDICT r3 item 4)
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from mssvt_tpu.config import cfg, cfg_from_yaml_file
from mssvt_tpu.datasets.dataset import DatasetTemplate
from mssvt_tpu.models import build_network
from mssvt_tpu.runtime.checkpoint import CheckpointManager
from mssvt_tpu.utils.common import create_logger


class DemoDataset(DatasetTemplate):
    """Ref: demo.py DemoDataset — folder of raw point files."""

    def __init__(self, dataset_cfg, class_names, root_path, ext=".bin", logger=None):
        super().__init__(dataset_cfg, class_names, training=False,
                         root_path=root_path, logger=logger)
        self.ext = ext
        p = Path(root_path)
        self.sample_file_list = (
            sorted(glob.glob(str(p / f"*{ext}"))) if p.is_dir() else [str(p)]
        )

    def __len__(self):
        return len(self.sample_file_list)

    def __getitem__(self, index):
        f = self.sample_file_list[index]
        if self.ext == ".bin":
            points = np.fromfile(f, np.float32).reshape(-1, 4)
        elif self.ext == ".npy":
            points = np.load(f)
        else:
            raise NotImplementedError(self.ext)
        n_feat = self.point_feature_encoder.num_point_features
        if points.shape[1] < n_feat:
            points = np.concatenate([
                points, np.zeros((len(points), n_feat - points.shape[1]), np.float32)
            ], axis=1)
        return self.prepare_data({"points": points[:, :n_feat], "frame_id": index})


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--ext", type=str, default=".bin")
    parser.add_argument("--out_file", type=str, default=None)
    parser.add_argument("--vis_dir", type=str, default=None,
                        help="write a BEV PNG per frame (matplotlib)")
    args = parser.parse_args()

    cfg_from_yaml_file(args.cfg_file, cfg)
    logger = create_logger()

    demo_dataset = DemoDataset(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        root_path=args.data_path, ext=args.ext, logger=logger,
    )
    logger.info(f"Total samples: {len(demo_dataset)}")

    model = build_network(
        model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
        class_names=cfg.CLASS_NAMES, grid_size=demo_dataset.grid_size,
        voxel_size=demo_dataset.voxel_size,
        point_cloud_range=demo_dataset.point_cloud_range,
        batch_size=1, max_voxels=demo_dataset.max_voxels,
        max_points_per_voxel=demo_dataset.max_points_per_voxel,
    )

    first = demo_dataset.collate_batch([demo_dataset[0]])
    variables = jax.jit(
        lambda k0, k1, b: model.init({"params": k0, "dropout": k1}, b, train=False)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), first)
    if args.ckpt_dir:
        manager = CheckpointManager(args.ckpt_dir, logger=logger)
        state = manager.restore()
        variables = {"params": state["params"],
                     "batch_stats": state.get("batch_stats", {})}

    infer = jax.jit(lambda v, b: model.apply(v, b, train=False))
    results = []
    for i in range(len(demo_dataset)):
        batch = demo_dataset.collate_batch([demo_dataset[i]])
        out = infer(variables, batch)
        mask = np.asarray(out["final_mask"][0])
        det = {
            "frame_id": i,
            "boxes": np.asarray(out["final_boxes"][0])[mask],
            "scores": np.asarray(out["final_scores"][0])[mask],
            "labels": np.asarray(out["final_labels"][0])[mask],
        }
        results.append(det)
        if args.vis_dir:
            from mssvt_tpu.utils.visualize import draw_bev_scene

            Path(args.vis_dir).mkdir(parents=True, exist_ok=True)
            pts = np.asarray(batch["points"])[:, 1:] if "points" in batch \
                else np.zeros((0, 4))
            draw_bev_scene(
                pts, det_boxes=det["boxes"], det_scores=det["scores"],
                det_labels=det["labels"], class_names=cfg.CLASS_NAMES,
                point_range=demo_dataset.point_cloud_range,
                out_file=str(Path(args.vis_dir) / f"frame_{i:04d}.png"),
                title=f"frame {i}")
        logger.info(
            f"frame {i}: {mask.sum()} detections "
            f"(top score {det['scores'].max() if len(det['scores']) else 0:.3f})"
        )
    if args.out_file:
        with open(args.out_file, "wb") as f:
            pickle.dump(results, f)
        logger.info(f"wrote {args.out_file}")


if __name__ == "__main__":
    main()
