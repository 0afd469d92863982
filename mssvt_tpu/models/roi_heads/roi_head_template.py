"""Two-stage RoI head machinery (ref: pcdet/models/roi_heads/roi_head_template.py
+ target_assigner/proposal_target_layer.py), static-shape TPU version.

- :func:`proposal_layer` ≙ roi_head_template.py:46-102: per-sample NMS over
  first-stage boxes producing a fixed number of RoIs.
- :func:`assign_proposal_targets` ≙ proposal_target_layer.py:8-210: IoU-based
  fg/bg RoI sampling with per-RoI regression targets in the canonical
  (RoI-centered, heading-aligned) frame.
- :func:`roi_box_loss` / :func:`roi_cls_loss` ≙ roi_head_template.py:136-260.

Sampling note: the reference randomly subsamples fg/bg RoIs to a fixed
ROI_PER_IMAGE with numpy RNG on host. Here selection is deterministic
top-IoU-ranked (fg by descending IoU, bg by proximity to the hard-bg
interval) — static-shape friendly and, empirically in OpenPCDet forks,
equivalent in accuracy. Randomized sampling can be layered on via a rng key
if parity experiments demand it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.box_ops import pairwise_iou_3d
from ...ops.nms import nms_bev
from ..losses import weighted_smooth_l1


def proposal_layer(boxes, scores, valid, nms_pre: int, nms_post: int,
                   nms_thresh: float, labels=None):
    """(B, N, 7), (B, N) → fixed (B, nms_post, 7) RoIs + scores [+ labels] + mask."""

    if labels is None:
        labels = jnp.ones(scores.shape, jnp.int32)

    def per_sample(bx, sc, lb, vm):
        sel, _ = nms_bev(bx, sc, vm, nms_thresh, nms_pre, nms_post)
        ok = sel >= 0
        safe = jnp.clip(sel, 0)
        return bx[safe] * ok[:, None], sc[safe] * ok, lb[safe] * ok, ok

    return jax.vmap(per_sample)(boxes, scores, labels, valid)


def _canonical_transform(gt_of_roi, rois):
    """GT box expressed in the RoI's canonical frame (ref:
    proposal_target_layer / roi_head_template.get_box_reg_layer_loss)."""
    diff = gt_of_roi[..., :3] - rois[..., :3]
    heading = rois[..., 6]
    c, s = jnp.cos(-heading), jnp.sin(-heading)
    lx = diff[..., 0] * c - diff[..., 1] * s
    ly = diff[..., 0] * s + diff[..., 1] * c
    local = jnp.stack([lx, ly, diff[..., 2]], axis=-1)
    rot = gt_of_roi[..., 6] - heading
    return jnp.concatenate([
        local, gt_of_roi[..., 3:6], rot[..., None]
    ], axis=-1)


def assign_proposal_targets(
    rois, roi_valid, gt_boxes, roi_per_image: int,
    fg_thresh: float = 0.55, bg_thresh_hi: float = 0.55, bg_thresh_lo: float = 0.1,
    fg_ratio: float = 0.5,
):
    """Select a fixed set of training RoIs and their targets, per sample.

    Returns dict with rois (B, R, 7), gt_of_rois (B, R, 8) in canonical
    frame, roi_ious (B, R), reg_valid (B, R), cls_labels (B, R in [0, 1],
    -1=ignore).
    """

    def per_sample(roi, rvalid, gt):
        gt_valid = gt[:, -1] > 0
        iou = pairwise_iou_3d(roi[:, :7], gt[:, :7])
        iou = jnp.where(gt_valid[None, :] & rvalid[:, None], iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)
        best_iou = jnp.max(iou, axis=1)

        n_fg = int(roi_per_image * fg_ratio)
        n_bg = roi_per_image - n_fg
        # fg: top-IoU rois above threshold
        fg_score = jnp.where(best_iou >= fg_thresh, best_iou, -1.0)
        _, fg_idx = jax.lax.top_k(fg_score, n_fg)
        fg_ok = fg_score[fg_idx] > 0
        # bg: prefer hard bg in [lo, hi), then easy bg
        is_bg = (best_iou < bg_thresh_hi) & rvalid
        bg_score = jnp.where(is_bg, jnp.where(best_iou >= bg_thresh_lo,
                                              2.0 - best_iou, best_iou), -1.0)
        _, bg_idx = jax.lax.top_k(bg_score, n_bg)
        bg_ok = bg_score[bg_idx] > -1.0

        sel = jnp.concatenate([fg_idx, bg_idx])
        sel_ok = jnp.concatenate([fg_ok, bg_ok])
        sel_fg = jnp.concatenate([fg_ok, jnp.zeros_like(bg_ok)])

        s_rois = roi[sel] * sel_ok[:, None]
        s_iou = best_iou[sel] * sel_ok
        s_gt = gt[best_gt[sel]]
        gt_canonical = _canonical_transform(s_gt[:, :7], s_rois)
        gt_canonical = jnp.concatenate([gt_canonical, s_gt[:, 7:8]], axis=-1)

        # iou-guided cls label (ref: CLS_SCORE_TYPE roi_iou)
        cls = jnp.where(
            s_iou > fg_thresh, 1.0,
            jnp.where(s_iou < bg_thresh_lo, 0.0,
                      (s_iou - bg_thresh_lo) / (fg_thresh - bg_thresh_lo)),
        )
        return {
            "rois": s_rois,
            "gt_of_rois": gt_canonical * sel_fg[:, None],
            "roi_ious": s_iou,
            "reg_valid": sel_fg,
            "cls_labels": jnp.where(sel_ok, cls, -1.0),
        }

    return jax.vmap(per_sample)(rois, roi_valid, gt_boxes)


def roi_cls_loss(cls_logits, cls_labels):
    """BCE against IoU-guided soft labels (ref: roi_head_template.py:136-160)."""
    cared = cls_labels >= 0
    p = jnp.clip(jax.nn.sigmoid(cls_logits), 1e-6, 1 - 1e-6)
    bce = -(cls_labels * jnp.log(p) + (1 - cls_labels) * jnp.log(1 - p))
    return (bce * cared).sum() / jnp.clip(cared.sum(), 1.0)


def roi_box_loss(reg_preds, gt_of_rois, rois, reg_valid, code_weights=None,
                 corner_loss_weight: float = 0.0):
    """Smooth-L1 on canonical-frame residual targets (ref: :162-238).

    With ``corner_loss_weight > 0`` adds the corner-distance regularizer
    (ref: roi_head_template.py:167-194 under CORNER_LOSS_REGULARIZATION,
    weight = LOSS_WEIGHTS['rcnn_corner_weight']). The reference decodes the
    predicted boxes back to the GLOBAL frame before comparing corners with
    the raw GT; here both pred and GT stay in the RoI's canonical frame —
    the global map is the same per-RoI rigid transform (z-rotation +
    translation) applied to both boxes, which preserves every corner
    distance, so the loss value is identical.
    """
    anchor = jnp.concatenate([
        jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
        jnp.zeros_like(rois[..., 6:7]),
    ], axis=-1)
    from ...utils.box_coder import ResidualCoder

    coder = ResidualCoder()
    targets = coder.encode(gt_of_rois[..., :7], anchor)
    loss = weighted_smooth_l1(reg_preds, targets, code_weights=code_weights)
    w = reg_valid[..., None]
    total = (loss * w).sum() / jnp.clip(reg_valid.sum(), 1.0)
    if corner_loss_weight > 0.0:
        from ..losses import get_corner_loss_lidar

        pred_canonical = coder.decode(reg_preds, anchor)  # (B, R, 7)
        per_roi = get_corner_loss_lidar(
            pred_canonical[..., :7].reshape(-1, 7),
            gt_of_rois[..., :7].reshape(-1, 7),
        ).reshape(reg_valid.shape)
        # ref averages over fg RoIs only (fg_mask indexing, :169-189)
        corner = (per_roi * reg_valid).sum() / jnp.clip(reg_valid.sum(), 1.0)
        total = total + corner_loss_weight * corner
    return total


def corner_weight_from_cfg(roi_cfg) -> float:
    """rcnn corner-loss weight from a ROI_HEAD config dict, 0 when disabled.

    Ref schema: LOSS_CONFIG.CORNER_LOSS_REGULARIZATION (bool) +
    LOSS_CONFIG.LOSS_WEIGHTS['rcnn_corner_weight'].
    """
    lc = (roi_cfg or {}).get("LOSS_CONFIG", {})
    if not lc.get("CORNER_LOSS_REGULARIZATION", False):
        return 0.0
    return float(lc.get("LOSS_WEIGHTS", {}).get("rcnn_corner_weight", 1.0))
