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


def _frame_recall(pred_boxes, gt_boxes, thresh_list):
    """Recalled-GT counts at each IoU threshold for one frame
    (ref: detector3d_template.py:286-328 generate_recall_record)."""
    import jax

    from ..ops.box_ops import pairwise_iou_3d

    n_gt = len(gt_boxes)
    counts = {t: 0 for t in thresh_list}
    if n_gt == 0:
        return counts, 0
    if len(pred_boxes) == 0:
        return counts, n_gt
    with jax.default_device(jax.devices("cpu")[0]):
        iou = np.asarray(pairwise_iou_3d(
            np.asarray(pred_boxes[:, :7], np.float32),
            np.asarray(gt_boxes[:, :7], np.float32),
        ))
    best = iou.max(axis=0)  # per-GT best IoU
    for t in thresh_list:
        counts[t] = int((best > t).sum())
    return counts, n_gt


def merge_result_parts(tmp_dir, recall_thresh_list):
    """Merge per-process ``part_<rank>.pkl`` eval dumps from a shared dir.

    The multi-host analog of ref ``common_utils.merge_results_dist``
    (common_utils.py:199-220): each process pickles its per-frame results;
    rank 0 concatenates them in rank order. Returns
    (det_frames, gt_frames, recall_acc, gt_total, n_frames, t_total) —
    t_total is the MAX across ranks (processes evaluate concurrently).
    """
    det_frames, gt_frames = [], []
    recall_acc = {t: 0 for t in recall_thresh_list}
    gt_total = n_frames = 0
    t_total = 0.0
    for part in sorted(Path(tmp_dir).glob("part_*.pkl")):
        with open(part, "rb") as f:
            d = pickle.load(f)
        det_frames += d["det"]
        gt_frames += d["gt"]
        for t in recall_thresh_list:
            recall_acc[t] += d["recall"][t]
        gt_total += d["gt_total"]
        n_frames += d["n"]
        t_total = max(t_total, d["t"])
    return det_frames, gt_frames, recall_acc, gt_total, n_frames, t_total


def eval_one_epoch(
    model, params, batch_stats, loader, mesh, class_names,
    logger=None, result_dir=None, save_to_file=False,
    recall_thresh_list=(0.3, 0.5, 0.7),
):
    eval_step = make_sharded_eval_step(model, mesh)
    batch_size = loader.batch_size

    det_frames, gt_frames = [], []
    recall_acc = {t: 0 for t in recall_thresh_list}
    gt_total = 0
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
            counts, n_gt = _frame_recall(
                det_frames[-1]["boxes"], gt_frames[-1]["boxes"],
                recall_thresh_list,
            )
            for t in recall_thresh_list:
                recall_acc[t] += counts[t]
            gt_total += n_gt
            n_frames += 1

    # multi-host: merge per-process results through the shared filesystem,
    # exactly the reference's tmpdir-pickle + barrier scheme
    # (ref: common_utils.merge_results_dist, common_utils.py:199-220)
    if jax.process_count() > 1 and result_dir is not None:
        from jax.experimental import multihost_utils

        tmp = Path(result_dir) / "tmp_merge"
        tmp.mkdir(parents=True, exist_ok=True)
        with open(tmp / f"part_{jax.process_index()}.pkl", "wb") as f:
            pickle.dump({"det": det_frames, "gt": gt_frames,
                         "recall": recall_acc, "gt_total": gt_total,
                         "n": n_frames, "t": t_total}, f)
        multihost_utils.sync_global_devices("eval_merge")
        if jax.process_index() != 0:
            return {}, []
        (det_frames, gt_frames, recall_acc, gt_total, n_frames,
         t_total) = merge_result_parts(tmp, recall_thresh_list)

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
    for t in recall_thresh_list:
        r = recall_acc[t] / max(gt_total, 1)
        metrics[f"recall/rcnn_{t}"] = r
        if logger:
            logger.info(f"recall_rcnn_{t}: {r:.4f} "
                        f"({recall_acc[t]}/{gt_total})")
    if logger:
        logger.info("\n" + report)
    return metrics, det_frames
