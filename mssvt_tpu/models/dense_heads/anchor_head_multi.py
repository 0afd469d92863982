"""Multi-group anchor head + ATSS target assigner.

Rebuild of ref pcdet/models/dense_heads/anchor_head_multi.py:9-151
(``SingleHead`` per RPN group + ``AnchorHeadMulti``) and
target_assigner/atss_target_assigner.py:7-120 (``ATSSTargetAssigner``).

Each RPN_HEAD_CFG group owns a conv tower + cls/box(+dir) outputs over its
own class subset's anchors; the shared trunk is a conv stack. Target
assignment is either the axis-aligned assigner (reused from AnchorHeadSingle)
or ATSS: per GT, the top-k center-closest anchors form the candidate set,
the IoU threshold adapts to mean+std of the candidate IoUs, and positives
must contain their GT center.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..model_utils.layers import BatchNorm

from ...utils.box_coder import ResidualCoder
from ..losses import sigmoid_focal_cls_loss, weighted_cross_entropy, weighted_smooth_l1
from .anchor_head import AnchorHeadSingle, _nearest_bev_iou, generate_anchors


def assign_atss_targets(anchors, gt_boxes, box_coder, topk: int = 9):
    """ATSS assignment for ONE sample (ref: atss_target_assigner.py:27-120).

    Returns (labels (N,), reg_targets (N, code), reg_weights (N,)).
    """
    n = anchors.shape[0]
    m = gt_boxes.shape[0]
    gt_valid = gt_boxes[:, -1] > 0
    gt_cls = gt_boxes[:, -1].astype(jnp.int32)

    iou = _nearest_bev_iou(anchors, gt_boxes[:, :7])  # (N, M)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)

    # candidate set: top-k anchors by center distance per GT
    d2 = jnp.sum(
        (anchors[:, None, :3] - gt_boxes[None, :, :3]) ** 2, axis=-1)  # (N, M)
    d2 = jnp.where(gt_valid[None, :], d2, jnp.inf)
    _, cand = jax.lax.top_k(-d2.T, min(topk, n))  # (M, k)

    cand_iou = jnp.take_along_axis(iou.T, cand, axis=1)  # (M, k)
    thr = cand_iou.mean(axis=1) + cand_iou.std(axis=1)  # (M,)

    # candidate anchors whose center is inside the GT BEV box
    ax = anchors[:, 0][cand] - gt_boxes[:, None, 0]
    ay = anchors[:, 1][cand] - gt_boxes[:, None, 1]
    c, s = jnp.cos(-gt_boxes[:, 6:7]), jnp.sin(-gt_boxes[:, 6:7])
    lx = ax * c - ay * s
    ly = ax * s + ay * c
    inside = (jnp.abs(lx) < gt_boxes[:, None, 3] / 2) & \
             (jnp.abs(ly) < gt_boxes[:, None, 4] / 2)
    pos_cand = (cand_iou >= thr[:, None]) & inside & gt_valid[:, None]  # (M, k)

    # resolve: each anchor takes the GT with the highest IoU among those that
    # selected it (ref resolves via INF-min distance; IoU-max is equivalent
    # up to ties and stays vectorized)
    sel_iou = jnp.zeros((n, m)).at[
        cand.reshape(-1), jnp.repeat(jnp.arange(m), cand.shape[1])
    ].max(jnp.where(pos_cand, cand_iou, 0.0).reshape(-1))
    best_gt = jnp.argmax(sel_iou, axis=1)
    pos = jnp.max(sel_iou, axis=1) > 0

    labels = jnp.where(pos, gt_cls[best_gt], 0)
    tgt = gt_boxes[jnp.clip(best_gt, 0)]
    reg_targets = box_coder.encode(tgt[:, :7], anchors) * pos[:, None]
    reg_weights = pos.astype(jnp.float32) / jnp.clip(pos.sum(), 1)
    return labels.astype(jnp.int32), reg_targets, reg_weights


class AnchorHeadMulti(nn.Module):
    """Ref: anchor_head_multi.py:151 — grouped RPN heads over a shared conv."""

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
        self.num_dir_bins = int(cfg.get("NUM_DIR_BINS", 2))
        self.shared_ch = int(cfg.get("SHARED_CONV_NUM_FILTER", 64))
        self.rpn_head_cfgs = [dict(c) for c in cfg["RPN_HEAD_CFGS"]]
        self.use_atss = str(cfg.get("TARGET_ASSIGNER_CONFIG", {}).get(
            "NAME", "AxisAlignedTargetAssigner")) == "ATSSTargetAssigner"
        self.atss_topk = int(cfg.get("TARGET_ASSIGNER_CONFIG", {}).get(
            "TOPK", 9))

        anchor_cfgs = cfg["ANCHOR_GENERATOR_CONFIG"]
        stride = int(anchor_cfgs[0].get("feature_map_stride", 8))
        self.box_coder = ResidualCoder(code_size=7)

        self.shared_conv = nn.Conv(
            self.shared_ch, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="shared_conv")
        self.shared_bn = BatchNorm(momentum=0.99, epsilon=1e-3,
                                      dtype=self.dtype)

        heads, metas = [], []
        for hi, hcfg in enumerate(self.rpn_head_cfgs):
            head_names = list(hcfg["HEAD_CLS_NAME"])
            sub_cfgs = [c for c in anchor_cfgs
                        if c["class_name"] in head_names]
            anchors_np, counts = generate_anchors(
                sub_cfgs, self.grid_size, self.point_cloud_range, stride)
            loc_cls, loc_m, loc_u = [], [], []
            for ci, (acfg, k_c) in enumerate(zip(sub_cfgs, counts)):
                gci = list(self.class_names).index(acfg["class_name"])
                loc_cls += [gci] * k_c
                loc_m += [float(acfg["matched_threshold"])] * k_c
                loc_u += [float(acfg["unmatched_threshold"])] * k_c
            n_loc = anchors_np.shape[0] // len(loc_cls)
            metas.append({
                "anchors": jnp.asarray(anchors_np),
                "global_cls": jnp.asarray(np.tile(np.array(loc_cls, np.int32), n_loc)),
                "matched": jnp.asarray(np.tile(np.array(loc_m, np.float32), n_loc)),
                "unmatched": jnp.asarray(np.tile(np.array(loc_u, np.float32), n_loc)),
                "apl": int(sum(counts)),
                "ncls": len(head_names),
                "head_names": head_names,
            })
            heads.append({
                "cls": nn.Conv(
                    int(sum(counts)) * len(head_names), (1, 1),
                    dtype=self.dtype,
                    bias_init=nn.initializers.constant(
                        -float(np.log((1 - 0.01) / 0.01))),
                    name=f"head{hi}_cls"),
                "box": nn.Conv(
                    int(sum(counts)) * self.box_coder.code_size, (1, 1),
                    dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.001),
                    name=f"head{hi}_box"),
                "dir": nn.Conv(
                    int(sum(counts)) * self.num_dir_bins, (1, 1),
                    dtype=self.dtype, name=f"head{hi}_dir",
                ) if self.use_dir else None,
            })
        self.heads = heads
        self.metas = metas

    def __call__(self, spatial_features_2d, train: bool = False):
        x = self.shared_conv(spatial_features_2d.astype(self.dtype))
        x = nn.relu(self.shared_bn(x, use_running_average=not train))
        b = x.shape[0]
        out = []
        for head, meta in zip(self.heads, self.metas):
            o = {
                "cls_preds": head["cls"](x).astype(jnp.float32).reshape(
                    b, -1, meta["ncls"]),
                "box_preds": head["box"](x).astype(jnp.float32).reshape(
                    b, -1, self.box_coder.code_size),
            }
            if head["dir"] is not None:
                o["dir_cls_preds"] = head["dir"](x).astype(jnp.float32).reshape(
                    b, -1, self.num_dir_bins)
            out.append(o)
        return out

    # ----------------------------- targets ----------------------------- #

    def assign_targets(self, gt_boxes):
        """Per-head assignment; ATSS or axis-aligned per config."""
        from .anchor_head import assign_anchor_targets

        ret = []
        for meta in self.metas:
            if self.use_atss:
                fn = lambda gt, meta=meta: assign_atss_targets(
                    meta["anchors"], gt, self.box_coder, topk=self.atss_topk)
                labels, reg_t, reg_w = jax.vmap(fn)(gt_boxes)
            else:
                fn = lambda gt, meta=meta: assign_anchor_targets(
                    meta["anchors"], meta["global_cls"], gt,
                    meta["matched"], meta["unmatched"], self.box_coder,
                    len(self.class_names),
                )
                labels, reg_t, reg_w = jax.vmap(fn)(gt_boxes)
            ret.append({"box_cls_labels": labels, "box_reg_targets": reg_t,
                        "reg_weights": reg_w})
        return ret

    def get_loss(self, preds_list, targets_list):
        total = 0.0
        tb = {}
        lw = self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
        for hi, (preds, targets, meta) in enumerate(
                zip(preds_list, targets_list, self.metas)):
            labels = targets["box_cls_labels"]
            cared = labels >= 0
            positives = labels > 0
            cls_w = cared.astype(jnp.float32)
            cls_w = cls_w / jnp.clip(
                positives.sum(axis=1, keepdims=True), 1.0)
            # map global 1-based labels → head-local one-hot
            lut = np.zeros((len(self.class_names) + 1,), np.int32)
            for li, name in enumerate(meta["head_names"]):
                lut[list(self.class_names).index(name) + 1] = li + 1
            local = jnp.asarray(lut)[jnp.clip(labels, 0)]
            one_hot = jax.nn.one_hot(
                local, meta["ncls"] + 1, dtype=jnp.float32)[..., 1:]
            cls_loss = sigmoid_focal_cls_loss(
                preds["cls_preds"], one_hot, cls_w
            ).sum() / labels.shape[0] * float(lw["cls_weight"])

            box_p, reg_t = AnchorHeadSingle.add_sin_difference(
                preds["box_preds"], targets["box_reg_targets"])
            loc_loss = weighted_smooth_l1(
                box_p, reg_t, targets["reg_weights"],
                code_weights=lw.get("code_weights"),
            ).sum() / labels.shape[0] * float(lw["loc_weight"])
            head_loss = cls_loss + loc_loss

            if self.use_dir and "dir_cls_preds" in preds:
                dir_offset = float(self.model_cfg.get("DIR_OFFSET", 0.78539))
                rot_gt = (targets["box_reg_targets"][..., 6]
                          + meta["anchors"][None, :, 6])
                period = 2 * np.pi / self.num_dir_bins
                dir_t = jnp.clip(jnp.floor(
                    jnp.remainder(rot_gt - dir_offset, 2 * np.pi) / period
                ).astype(jnp.int32), 0, self.num_dir_bins - 1)
                dw = positives.astype(jnp.float32)
                dw = dw / jnp.clip(dw.sum(axis=-1, keepdims=True), 1.0)
                dir_loss = weighted_cross_entropy(
                    preds["dir_cls_preds"],
                    jax.nn.one_hot(dir_t, self.num_dir_bins), dw
                ).sum() / labels.shape[0] * float(lw.get("dir_weight", 0.2))
                head_loss = head_loss + dir_loss

            total = total + head_loss
            tb[f"rpn_head{hi}_loss"] = head_loss
        tb["rpn_loss"] = total
        return total, tb

    def generate_predicted_boxes(self, preds_list):
        """Decode all heads → (B, N, 7), per-anchor GLOBAL class scores."""
        boxes_all, scores_all = [], []
        for preds, meta in zip(preds_list, self.metas):
            boxes = self.box_coder.decode(
                preds["box_preds"], meta["anchors"][None])
            local_scores = jax.nn.sigmoid(preds["cls_preds"])  # (B, N, nc_h)
            b, n = local_scores.shape[:2]
            glob = jnp.zeros((b, n, len(self.class_names)))
            for li, name in enumerate(meta["head_names"]):
                gi = list(self.class_names).index(name)
                glob = glob.at[..., gi].set(local_scores[..., li])
            if self.use_dir and "dir_cls_preds" in preds:
                dir_offset = float(self.model_cfg.get("DIR_OFFSET", 0.78539))
                dir_labels = jnp.argmax(preds["dir_cls_preds"], axis=-1)
                period = 2 * np.pi / self.num_dir_bins
                rot = boxes[..., 6] - dir_offset
                rot = rot - jnp.floor(rot / period) * period
                boxes = boxes.at[..., 6].set(
                    rot + dir_offset + period * dir_labels.astype(boxes.dtype))
            boxes_all.append(boxes)
            scores_all.append(glob)
        return (jnp.concatenate(boxes_all, axis=1),
                jnp.concatenate(scores_all, axis=1))
