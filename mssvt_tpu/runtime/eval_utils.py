"""Evaluation loop (ref: tools/eval_utils/eval_utils.py:22-121).

Runs the jitted inference step over the eval split, strips padding on host,
accumulates per-frame predictions + GT, computes sec/example and the dataset
metric. Single- or multi-device (data mesh) capable.
"""

from __future__ import annotations

import pickle
import time
from pathlib import Path

import jax
import numpy as np

from ..parallel.mesh import make_sharded_eval_step, shard_batch_for_mesh
from ..utils.eval_ap import kitti_style_eval


def eval_one_epoch(
    model, params, batch_stats, loader, mesh, class_names,
    logger=None, result_dir=None, save_to_file=False,
):
    eval_step = make_sharded_eval_step(model, mesh)
    batch_size = loader.batch_size

    det_frames, gt_frames = [], []
    n_frames = 0
    t_total = 0.0
    for batch in loader:
        sharded = shard_batch_for_mesh(batch, mesh, batch_size)
        t0 = time.time()
        boxes, scores, labels, mask = jax.block_until_ready(
            eval_step(params, batch_stats, sharded)
        )
        t_total += time.time() - t0

        boxes = np.asarray(boxes).reshape(batch_size, *boxes.shape[2:])
        scores = np.asarray(scores).reshape(batch_size, -1)
        labels = np.asarray(labels).reshape(batch_size, -1)
        mask = np.asarray(mask).reshape(batch_size, -1)
        gt = batch["gt_boxes"]
        n_real = int(batch.get("n_real", batch_size))
        for b in range(n_real):
            m = mask[b]
            det_frames.append({
                "boxes": boxes[b][m][:, :7],
                "scores": scores[b][m],
                "labels": labels[b][m].astype(np.int64),
            })
            gvalid = gt[b][:, -1] > 0
            gt_frames.append({
                "boxes": gt[b][gvalid][:, :7],
                "labels": gt[b][gvalid][:, -1].astype(np.int64),
            })
            n_frames += 1

    sec_per_example = t_total / max(n_frames, 1)
    if logger:
        logger.info(
            f"eval: {n_frames} frames, {sec_per_example * 1000:.1f} ms/frame "
            f"({1.0 / max(sec_per_example, 1e-9):.1f} fps)"
        )

    if result_dir is not None:
        result_dir = Path(result_dir)
        result_dir.mkdir(parents=True, exist_ok=True)
        with open(result_dir / "result.pkl", "wb") as f:
            pickle.dump(det_frames, f)

    report, metrics = kitti_style_eval(det_frames, gt_frames, class_names)
    metrics["sec_per_example"] = sec_per_example
    if logger:
        logger.info("\n" + report)
    return metrics, det_frames
