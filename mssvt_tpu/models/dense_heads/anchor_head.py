"""Anchor-based dense head (ref: pcdet/models/dense_heads/anchor_head_single.py
+ anchor_head_template.py + target_assigner/{anchor_generator,
axis_aligned_target_assigner}.py).

TPU-native: anchors are a host-precomputed constant (num_anchors, 7); target
assignment is fully vectorized on device (argmax matching with the standard
pos/neg IoU thresholds and force-match of each GT's best anchor); losses are
masked sums over the static anchor set.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...utils.box_coder import ResidualCoder
from ..losses import sigmoid_focal_cls_loss, weighted_cross_entropy, weighted_smooth_l1


def generate_anchors(anchor_configs, grid_size, point_cloud_range,
                     feature_map_stride):
    """Dense anchor grid (ref: anchor_generator.py:4-79).

    Returns (num_anchors, 7) float32 and anchors-per-location per class.

    Layout is **location-major**: for each BEV cell (y, x) the anchors are
    the per-location block [class][height][size][rotation], and cells are
    row-major over (y, x). This matches the conv-head channel layout — the
    (B, H, W, apl*code) prediction maps reshape to (B, H*W*apl, code) — and
    the reference's ``torch.cat(anchors, dim=-3).view(-1, 7)`` ordering
    (ref: anchor_head_template.py get_box_reg_layer_loss).
    """
    per_class = []   # each (ny, nx, k_c, 7)
    counts = []      # anchors-per-location per class
    pcr = np.asarray(point_cloud_range, np.float64)
    nx = grid_size[0] // feature_map_stride
    ny = grid_size[1] // feature_map_stride
    for cfg in anchor_configs:
        sizes = np.asarray(cfg["anchor_sizes"], np.float64)  # (S, 3)
        rotations = np.asarray(cfg["anchor_rotations"], np.float64)  # (R,)
        heights = np.asarray(cfg["anchor_bottom_heights"], np.float64)  # (Hb,)
        align = bool(cfg.get("align_center", False))

        if align:
            x_stride = (pcr[3] - pcr[0]) / nx
            y_stride = (pcr[4] - pcr[1]) / ny
            x_offset, y_offset = x_stride / 2, y_stride / 2
        else:
            x_stride = (pcr[3] - pcr[0]) / (nx - 1)
            y_stride = (pcr[4] - pcr[1]) / (ny - 1)
            x_offset = y_offset = 0.0

        xs = np.arange(nx) * x_stride + pcr[0] + x_offset
        ys = np.arange(ny) * y_stride + pcr[1] + y_offset
        gx, gy = np.meshgrid(xs, ys)  # (ny, nx)
        anchors_k = []
        for h in heights:
            for s in sizes:
                for r in rotations:
                    z = h + s[2] / 2
                    a = np.stack([
                        gx, gy, np.full(gx.shape, z),
                        np.full(gx.shape, s[0]), np.full(gx.shape, s[1]),
                        np.full(gx.shape, s[2]), np.full(gx.shape, r),
                    ], axis=-1)  # (ny, nx, 7)
                    anchors_k.append(a)
        per_class.append(np.stack(anchors_k, axis=2))  # (ny, nx, k_c, 7)
        counts.append(len(anchors_k))
    all_a = np.concatenate(per_class, axis=2)  # (ny, nx, sum_k, 7)
    return all_a.reshape(-1, 7).astype(np.float32), counts


def _nearest_bev_iou(boxes_a, boxes_b):
    """Axis-aligned 'nearest BEV' IoU (ref: box_utils.boxes3d_nearest_bev_iou).

    Each rotated box is replaced by its axis-aligned envelope with (dx, dy)
    swapped when closer to 90 deg — the reference's fast anchor-matching IoU.
    """

    def to_aa(b):
        rot = jnp.abs(jnp.remainder(b[..., 6], np.pi))
        swap = (rot > np.pi / 4) & (rot < 3 * np.pi / 4)
        dx = jnp.where(swap, b[..., 4], b[..., 3])
        dy = jnp.where(swap, b[..., 3], b[..., 4])
        return jnp.stack([
            b[..., 0] - dx / 2, b[..., 1] - dy / 2,
            b[..., 0] + dx / 2, b[..., 1] + dy / 2,
        ], axis=-1)

    aa, bb = to_aa(boxes_a), to_aa(boxes_b)
    lt = jnp.maximum(aa[:, None, :2], bb[None, :, :2])
    rb = jnp.minimum(aa[:, None, 2:], bb[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (aa[:, 2] - aa[:, 0]) * (aa[:, 3] - aa[:, 1])
    area_b = (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1])
    return inter / jnp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-6, None)


def assign_anchor_targets(
    anchors, anchor_class_ids, gt_boxes, matched_thresholds,
    unmatched_thresholds, box_coder, num_classes,
):
    """Vectorized axis-aligned target assignment for ONE sample.

    Ref: axis_aligned_target_assigner.py:8-210. Per-class thresholds come in
    as per-anchor arrays. Returns (labels (N,), reg_targets (N, code),
    reg_weights (N,)).

    labels: -1 = ignore, 0 = background, 1..num_classes = fg class.
    """
    n = anchors.shape[0]
    m = gt_boxes.shape[0]
    gt_valid = gt_boxes[:, -1] > 0
    gt_cls = gt_boxes[:, -1].astype(jnp.int32)

    iou = _nearest_bev_iou(anchors, gt_boxes[:, :7])  # (N, M)
    # class-matched GT only (anchors of class c match GT of class c)
    cls_ok = anchor_class_ids[:, None] == (gt_cls[None, :] - 1)
    iou = jnp.where(cls_ok & gt_valid[None, :], iou, -1.0)

    best_gt = jnp.argmax(iou, axis=1)  # (N,)
    best_iou = jnp.max(iou, axis=1)

    labels = jnp.full((n,), -1, jnp.int32)
    labels = jnp.where(best_iou < unmatched_thresholds, 0, labels)
    pos = best_iou >= matched_thresholds
    labels = jnp.where(pos, gt_cls[best_gt], labels)

    # force-match: each valid GT claims its best anchor (ref :120-135)
    gt_best_anchor = jnp.argmax(iou, axis=0)  # (M,)
    gt_best_iou = jnp.max(iou, axis=0)
    force = gt_valid & (gt_best_iou > 1e-6)
    labels = labels.at[jnp.where(force, gt_best_anchor, n)].set(
        jnp.where(force, gt_cls, 0), mode="drop"
    )
    best_gt = best_gt.at[jnp.where(force, gt_best_anchor, n)].set(
        jnp.where(force, jnp.arange(m), 0), mode="drop"
    )

    fg = labels > 0
    tgt_boxes = gt_boxes[jnp.clip(best_gt, 0), :]
    reg_targets = box_coder.encode(tgt_boxes[:, :7], anchors) * fg[:, None]
    num_fg = jnp.clip(fg.sum(), 1)
    reg_weights = fg.astype(jnp.float32) / num_fg
    return labels, reg_targets, reg_weights


class AnchorHeadSingle(nn.Module):
    """Ref: anchor_head_single.py:7-80 + template losses (:136-260)."""

    model_cfg: Any
    input_channels: int
    num_class: int
    class_names: Sequence[str]
    grid_size: Sequence[int]
    point_cloud_range: Sequence[float]
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.model_cfg
        self.use_dir = cfg.get("USE_DIRECTION_CLASSIFIER", False)
        anchor_cfgs = cfg["ANCHOR_GENERATOR_CONFIG"]
        stride = int(anchor_cfgs[0].get("feature_map_stride", 8))
        anchors_np, counts = generate_anchors(
            anchor_cfgs, self.grid_size, self.point_cloud_range, stride
        )
        self.anchors = jnp.asarray(anchors_np)
        # per-location [class][height][size][rot] pattern, tiled over cells
        # (must mirror generate_anchors' location-major layout)
        loc_cls, loc_m, loc_u = [], [], []
        for ci, (acfg, k_c) in enumerate(zip(anchor_cfgs, counts)):
            loc_cls += [ci] * k_c
            loc_m += [float(acfg["matched_threshold"])] * k_c
            loc_u += [float(acfg["unmatched_threshold"])] * k_c
        n_loc = anchors_np.shape[0] // len(loc_cls)
        self.anchor_class_ids = jnp.asarray(
            np.tile(np.array(loc_cls, np.int32), n_loc))
        self.matched_th = jnp.asarray(np.tile(np.array(loc_m, np.float32), n_loc))
        self.unmatched_th = jnp.asarray(np.tile(np.array(loc_u, np.float32), n_loc))
        self.anchors_per_loc = int(sum(counts))

        self.box_coder = ResidualCoder(
            code_size=7,
            encode_angle_by_sincos=cfg.get("TARGET_ASSIGNER_CONFIG", {}).get(
                "BOX_CODER_CONFIG", {}
            ).get("encode_angle_by_sincos", False),
        )
        self.conv_cls = nn.Conv(
            self.anchors_per_loc * self.num_class, (1, 1), dtype=self.dtype,
            bias_init=nn.initializers.constant(-float(np.log((1 - 0.01) / 0.01))),
        )
        self.conv_box = nn.Conv(
            self.anchors_per_loc * self.box_coder.code_size, (1, 1),
            dtype=self.dtype, kernel_init=nn.initializers.normal(0.001),
        )
        if self.use_dir:
            self.num_dir_bins = int(cfg.get("NUM_DIR_BINS", 2))
            self.conv_dir = nn.Conv(
                self.anchors_per_loc * self.num_dir_bins, (1, 1), dtype=self.dtype,
            )

    def __call__(self, spatial_features_2d, train: bool = False):
        x = spatial_features_2d.astype(self.dtype)
        b = x.shape[0]
        cls_preds = self.conv_cls(x).astype(jnp.float32)
        box_preds = self.conv_box(x).astype(jnp.float32)
        out = {
            "cls_preds": cls_preds.reshape(b, -1, self.num_class),
            "box_preds": box_preds.reshape(b, -1, self.box_coder.code_size),
        }
        if self.use_dir:
            out["dir_cls_preds"] = self.conv_dir(x).astype(jnp.float32).reshape(
                b, -1, self.num_dir_bins
            )
        return out

    # ------------------------- targets / loss -------------------------- #

    def assign_targets(self, gt_boxes):
        fn = lambda gt: assign_anchor_targets(
            self.anchors, self.anchor_class_ids, gt, self.matched_th,
            self.unmatched_th, self.box_coder, self.num_class,
        )
        labels, reg_targets, reg_weights = jax.vmap(fn)(gt_boxes)
        return {"box_cls_labels": labels, "box_reg_targets": reg_targets,
                "reg_weights": reg_weights}

    @staticmethod
    def add_sin_difference(boxes1, boxes2, dim=6):
        """sin(a-b) trick on the heading channel (ref: template :171-178)."""
        rad_a = jnp.sin(boxes1[..., dim:dim + 1]) * jnp.cos(boxes2[..., dim:dim + 1])
        rad_b = jnp.cos(boxes1[..., dim:dim + 1]) * jnp.sin(boxes2[..., dim:dim + 1])
        b1 = jnp.concatenate(
            [boxes1[..., :dim], rad_a, boxes1[..., dim + 1:]], axis=-1)
        b2 = jnp.concatenate(
            [boxes2[..., :dim], rad_b, boxes2[..., dim + 1:]], axis=-1)
        return b1, b2

    def get_direction_target(self, reg_targets, dir_offset):
        """Heading bin targets from encoded residuals (ref: template :181-196)."""
        rot_gt = reg_targets[..., 6] + self.anchors[None, :, 6]
        period = 2 * np.pi / self.num_dir_bins
        offset_rot = jnp.remainder(rot_gt - dir_offset, 2 * np.pi)
        dir_cls = jnp.clip(
            jnp.floor(offset_rot / period).astype(jnp.int32),
            0, self.num_dir_bins - 1,
        )
        return dir_cls

    def get_loss(self, preds, targets):
        """Ref: anchor_head_template.py:136-260 (incl. sin-difference on the
        heading residual and the direction-classifier CE, :171-233)."""
        lw = self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
        labels = targets["box_cls_labels"]  # (B, N)
        cls_preds = preds["cls_preds"]  # (B, N, C)
        box_preds = preds["box_preds"]

        cared = labels >= 0
        positives = labels > 0
        negatives = labels == 0
        cls_weights = (negatives * 1.0 + positives * 1.0) * cared
        pos_norm = jnp.clip(positives.sum(axis=1, keepdims=True), 1.0)
        cls_weights = cls_weights / pos_norm

        one_hot = jax.nn.one_hot(
            jnp.clip(labels, 0), self.num_class + 1, dtype=jnp.float32
        )[..., 1:]
        cls_loss = sigmoid_focal_cls_loss(
            cls_preds, one_hot, cls_weights
        ).sum() / labels.shape[0] * float(lw["cls_weight"])

        reg_weights = targets["reg_weights"]
        reg_targets = targets["box_reg_targets"]
        box_preds_l, reg_targets_l = box_preds, reg_targets
        if self.box_coder.code_size == 7 and not self.box_coder.encode_angle_by_sincos:
            box_preds_l, reg_targets_l = self.add_sin_difference(
                box_preds, reg_targets)
        loc_loss = weighted_smooth_l1(
            box_preds_l, reg_targets_l, reg_weights,
            code_weights=lw.get("code_weights"),
        ).sum() / labels.shape[0] * float(lw["loc_weight"])

        total = cls_loss + loc_loss
        tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}

        if self.use_dir and "dir_cls_preds" in preds:
            dir_offset = float(self.model_cfg.get("DIR_OFFSET", 0.78539))
            dir_targets = self.get_direction_target(reg_targets, dir_offset)
            dir_onehot = jax.nn.one_hot(
                dir_targets, self.num_dir_bins, dtype=jnp.float32)
            dir_w = positives.astype(jnp.float32)
            dir_w = dir_w / jnp.clip(dir_w.sum(axis=-1, keepdims=True), 1.0)
            dir_loss = weighted_cross_entropy(
                preds["dir_cls_preds"], dir_onehot, dir_w
            ).sum() / labels.shape[0] * float(lw.get("dir_weight", 0.2))
            total = total + dir_loss
            tb["rpn_loss_dir"] = dir_loss

        tb["rpn_loss"] = total
        return total, tb

    def generate_predicted_boxes(self, preds):
        """Decode to (B, N, 7) + per-anchor class scores (B, N, C)."""
        boxes = self.box_coder.decode(preds["box_preds"], self.anchors[None])
        scores = jax.nn.sigmoid(preds["cls_preds"])
        if self.use_dir and "dir_cls_preds" in preds:
            dir_offset = float(self.model_cfg.get("DIR_OFFSET", 0.78539))
            dir_limit = float(self.model_cfg.get("DIR_LIMIT_OFFSET", 0.0))
            dir_labels = jnp.argmax(preds["dir_cls_preds"], axis=-1)
            period = 2 * np.pi / self.num_dir_bins
            rot = boxes[..., 6] - dir_offset
            rot = rot - jnp.floor(rot / period + dir_limit) * period
            boxes = boxes.at[..., 6].set(
                rot + dir_offset + period * dir_labels.astype(boxes.dtype)
            )
        return boxes, scores
