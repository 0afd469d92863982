"""Official-protocol KITTI 3D/BEV AP evaluator (numpy, host-side).

Rebuild of ref pcdet/datasets/kitti/kitti_object_eval_python/eval.py
(:448 ``eval_class``, :639 ``get_official_eval_result``) minus the numba/CUDA
machinery. Matches the official semantics:

- difficulty buckets easy/moderate/hard by 2D bbox height, occlusion and
  truncation (MIN_HEIGHT [40, 25, 25] px, MAX_OCCLUSION [0, 1, 2],
  MAX_TRUNCATION [0.15, 0.30, 0.50]) when those annotations are present;
  lidar-only annos (no camera fields) fall into every bucket;
- "ignored" ground truth: boxes of a harder difficulty, neighbor classes
  (Van↔Car, Person_sitting↔Pedestrian) and DontCare regions neither count
  as false negatives nor penalize detections matched to them;
- score thresholds sampled at 41 recall points from the sorted
  true-positive scores (``get_thresholds``, ref eval.py:27-44), AP_R40 =
  mean precision over thresholds 1..40;
- metrics: BEV AP (rotated BEV IoU) and 3D AP (BEV x z-overlap), per class
  per difficulty; IoU thresholds 0.7 (Car) / 0.5 (Ped, Cyc).

AOS and image-plane 2D AP require camera-projected boxes and are
intentionally out of scope for the lidar-only pipeline (the reference only
produces them when image annos exist).
"""

from __future__ import annotations

import numpy as np

from .eval_ap import _frame_iou

MIN_HEIGHT = [40, 25, 25]
MAX_OCCLUSION = [0, 1, 2]
MAX_TRUNCATION = [0.15, 0.30, 0.50]
NEIGHBOR_CLASSES = {
    "Car": ["Van"],
    "Pedestrian": ["Person_sitting"],
    "Cyclist": [],
}
IOU_THRESH = {"Car": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}
N_SAMPLE_PTS = 41


def clean_data(gt_names, gt_anno, current_class, difficulty):
    """Per-frame GT triage (ref: eval.py ``clean_data``:47-111).

    Returns (care (G,) bool, ignored (G,) bool) — ignored boxes are matched
    but never counted; everything else is either care-FG or irrelevant.
    """
    g = len(gt_names)
    care = np.zeros(g, bool)
    ignored = np.zeros(g, bool)
    neighbors = NEIGHBOR_CLASSES.get(str(current_class), [])
    heights = gt_anno.get("bbox")
    occl = gt_anno.get("occluded")
    trunc = gt_anno.get("truncated")
    for i in range(g):
        name = str(gt_names[i])
        if name == "DontCare":
            ignored[i] = True
            continue
        same = name == str(current_class)
        neighbor = name in neighbors
        if not (same or neighbor):
            continue
        too_hard = False
        if heights is not None and occl is not None and trunc is not None:
            h = heights[i][3] - heights[i][1]
            too_hard = (
                h <= MIN_HEIGHT[difficulty]
                or occl[i] > MAX_OCCLUSION[difficulty]
                or trunc[i] > MAX_TRUNCATION[difficulty]
            )
        if same and not too_hard:
            care[i] = True
        else:  # harder-bucket same-class or neighbor class → ignore
            ignored[i] = True
    return care, ignored


def get_thresholds(tp_scores, num_gt, num_sample_pts=N_SAMPLE_PTS):
    """Score thresholds at evenly spaced recall points (ref: eval.py:27-44)."""
    scores = np.sort(np.asarray(tp_scores))[::-1]
    thresholds = []
    current_recall = 0.0
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if ((r_recall - current_recall) < (current_recall - l_recall)
                and i < len(scores) - 1):
            continue
        thresholds.append(score)
        current_recall += 1.0 / (num_sample_pts - 1)
    return np.asarray(thresholds)


def _eval_class(det_frames, gt_frames, current_class, difficulty, metric):
    thr_iou = IOU_THRESH.get(str(current_class), 0.5)
    n = len(det_frames)

    frames = []
    total_gt = 0
    all_tp_scores = []
    for f in range(n):
        det, gt = det_frames[f], gt_frames[f]
        dn = np.asarray(det["name"]) if "name" in det else None
        dmask = (dn == current_class) if dn is not None else \
            np.ones(len(det["boxes"]), bool)
        dboxes = np.asarray(det["boxes"])[dmask][:, :7]
        dscores = np.asarray(det["scores"])[dmask]
        gnames = np.asarray(gt["name"]) if "name" in gt else np.asarray(
            [str(current_class)] * len(gt["boxes"]))
        care, ign = clean_data(gnames, gt, current_class, difficulty)
        gboxes = np.asarray(gt["boxes"])[:, :7]
        total_gt += int(care.sum())

        iou = _frame_iou(dboxes, gboxes, metric=metric) if (
            len(dboxes) and len(gboxes)) else np.zeros(
            (len(dboxes), len(gboxes)))
        frames.append((dscores, iou, care, ign))

        # greedy high-score-first matching to find TP scores (stage 1,
        # compute_statistics with thresh=0, ref eval.py:121-200)
        order = np.argsort(-dscores)
        taken = np.zeros(len(gboxes), bool)
        for di in order:
            best, best_iou = -1, thr_iou
            for gi in range(len(gboxes)):
                if taken[gi] or not care[gi]:
                    continue
                if iou[di, gi] >= best_iou:
                    best_iou = iou[di, gi]
                    best = gi
            if best >= 0:
                taken[best] = True
                all_tp_scores.append(dscores[di])

    if total_gt == 0:
        return float("nan"), np.zeros(0), np.zeros(0)
    thresholds = get_thresholds(all_tp_scores, total_gt)
    if len(thresholds) == 0:
        return 0.0, np.zeros(0), np.zeros(0)

    tp = np.zeros(len(thresholds))
    fp = np.zeros(len(thresholds))
    fn = np.zeros(len(thresholds))
    for dscores, iou, care, ign in frames:
        for ti, thr in enumerate(thresholds):
            sel = dscores >= thr
            order = np.argsort(-dscores[sel])
            idxs = np.where(sel)[0][order]
            taken = np.zeros(iou.shape[1], bool)
            assigned_ign = np.zeros(len(dscores), bool)
            t = 0
            for di in idxs:
                best, best_iou = -1, thr_iou
                for gi in range(iou.shape[1]):
                    if taken[gi] or not care[gi]:
                        continue
                    if iou[di, gi] >= best_iou:
                        best_iou = iou[di, gi]
                        best = gi
                if best >= 0:
                    taken[best] = True
                    t += 1
                else:
                    # ignored/DontCare absorption: not an FP
                    for gi in range(iou.shape[1]):
                        if ign[gi] and iou[di, gi] >= thr_iou:
                            assigned_ign[di] = True
                            break
            n_det = int((dscores >= thr).sum())
            tp[ti] += t
            fp[ti] += n_det - t - int(assigned_ign[dscores >= thr].sum())
            fn[ti] += int(care.sum()) - t

    recall = tp / np.maximum(tp + fn, 1)
    precision = tp / np.maximum(tp + fp, 1)
    # monotone precision envelope (ref eval.py:418-421)
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    # AP_R40: mean over thresholds 1..40 (ref eval.py get_mAP_R40)
    ap = float(precision[1:].mean() * 100) if len(precision) > 1 else \
        float(precision.mean() * 100)
    return ap, recall, precision


def kitti_official_eval(det_frames, gt_frames, class_names,
                        metrics=("bev", "3d")):
    """Full official grid: {class} x {easy, moderate, hard} x {bev, 3d}.

    det_frames: per-frame {boxes (N, 7), scores (N,), name (N,) or labels}.
    gt_frames: per-frame {boxes (G, 7), name (G,), optional bbox/occluded/
        truncated for camera-based difficulty}.

    Returns (report str, {"Car_3d/moderate_R40": ap, ...}).
    """
    # allow labels instead of names
    for d in det_frames:
        if "name" not in d and "labels" in d:
            names = np.asarray(class_names)
            d["name"] = names[np.clip(np.asarray(d["labels"]) - 1, 0,
                                      len(names) - 1)]
    for g in gt_frames:
        if "name" not in g and "labels" in g:
            names = np.asarray(class_names)
            g["name"] = names[np.clip(np.asarray(g["labels"]) - 1, 0,
                                      len(names) - 1)]

    results = {}
    lines = ["KITTI official-protocol AP_R40:"]
    diff_names = ["easy", "moderate", "hard"]
    for cls in class_names:
        for metric in metrics:
            aps = []
            for d in range(3):
                ap, _, _ = _eval_class(det_frames, gt_frames, cls, d, metric)
                results[f"{cls}_{metric}/{diff_names[d]}_R40"] = ap
                aps.append(ap)
            lines.append(
                f"  {cls} AP_{metric} R40: "
                + " / ".join(f"{a:.2f}" for a in aps)
                + "  (easy/moderate/hard)"
            )
    return "\n".join(lines), results
