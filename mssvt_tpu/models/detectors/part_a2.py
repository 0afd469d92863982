"""Part-A2 detector (ref: pcdet/models/detectors/PartA2_net.py).

Stage 1: MeanVFE → UNetV2 (encoder feeds the BEV/anchor RPN, decoder emits
stride-1 per-voxel features) → PointIntraPartOffsetHead (foreground seg +
intra-object part locations per voxel). Stage 2: proposal NMS →
PartA2FCHead (RoIAware-pooled part + seg grids → conv/FC refinement).
The "points" of the part/pool machinery are the stride-1 voxel centers,
exactly like the reference (PartA2 operates on voxel centers, not raw
points).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.sparse import SparseVoxels
from ...utils.box_coder import ResidualCoder
from ..builders import (
    BuildCtx,
    build_backbone_2d,
    build_backbone_3d,
    build_dense_head,
    build_vfe,
)
from ..dense_heads.point_intra_part_head import PointIntraPartOffsetHead
from .generic_post import apply_vfe
from ..roi_heads.partA2_head import PartA2FCHead
from ..roi_heads.roi_head_template import (
    assign_proposal_targets,
    proposal_layer,
    corner_weight_from_cfg,
    roi_box_loss,
    roi_cls_loss,
)


class PartA2Net(nn.Module):
    model_cfg: Any
    num_class: int
    class_names: Sequence[str]
    grid_size: Sequence[int]
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    batch_size: int
    max_voxels: int
    max_points_per_voxel: int
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.model_cfg
        ctx = BuildCtx(
            num_class=self.num_class, class_names=tuple(self.class_names),
            grid_size=tuple(self.grid_size),
            voxel_size=tuple(self.voxel_size),
            point_cloud_range=tuple(self.point_cloud_range),
            batch_size=self.batch_size, max_voxels=self.max_voxels,
            max_points_per_voxel=self.max_points_per_voxel, dtype=self.dtype,
        )
        self.vfe = build_vfe(cfg["VFE"], ctx)
        self.backbone_3d = build_backbone_3d(cfg["BACKBONE_3D"], ctx)
        self.backbone_2d = build_backbone_2d(cfg["BACKBONE_2D"], ctx)
        self.dense_head = build_dense_head(
            cfg["DENSE_HEAD"], ctx,
            input_channels=self.backbone_2d.num_bev_features)
        self.point_head = PointIntraPartOffsetHead(
            model_cfg=cfg["POINT_HEAD"],
            input_channels=int(cfg["BACKBONE_3D"].get("NUM_FILTERS", [16])[0]),
            num_class=1,
            dtype=self.dtype,
        )
        self.roi_head = PartA2FCHead(model_cfg=cfg["ROI_HEAD"], dtype=self.dtype)
        self.roi_cfg = cfg["ROI_HEAD"]
        self.coder = ResidualCoder()

    def __call__(self, batch, train: bool = False):
        voxel_features = apply_vfe(self.vfe, batch, train=train)
        sp = SparseVoxels.create(
            features=voxel_features, coords=batch["voxel_coords"],
            valid=batch["voxel_valid"], batch_size=self.batch_size,
            spatial_shape=self.grid_size, voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
        )
        encoded, sp_points = self.backbone_3d(sp, train=train)
        spatial_2d = self.backbone_2d(encoded.bev(), train=train)
        preds = self.dense_head(spatial_2d, train=train)
        seg_logits, part_preds = self.point_head(sp_points.features, train=train)

        boxes, scores_mc = self.dense_head.generate_predicted_boxes(preds)
        scores = jnp.max(scores_mc, axis=-1)
        labels = jnp.argmax(scores_mc, axis=-1) + 1

        nms_cfg = self.roi_cfg["NMS_CONFIG"]["TRAIN" if train else "TEST"]
        rois, roi_scores, roi_labels, roi_valid = proposal_layer(
            boxes[..., :7], scores, jnp.ones_like(scores, bool),
            nms_pre=int(nms_cfg["NMS_PRE_MAXSIZE"]),
            nms_post=int(nms_cfg["NMS_POST_MAXSIZE"]),
            nms_thresh=float(nms_cfg["NMS_THRESH"]),
            labels=labels,
        )

        # pooled-feature inputs: stride-1 voxel centers + part/seg channels
        pts = sp_points.metric_centers().reshape(self.batch_size, -1, 3)
        pvalid = sp_points.valid.reshape(self.batch_size, -1)
        part_feats = jnp.concatenate([
            jax.nn.sigmoid(part_preds), jax.nn.sigmoid(seg_logits)
        ], axis=-1).reshape(self.batch_size, pts.shape[1], -1)
        seg_feats = sp_points.features.reshape(
            self.batch_size, pts.shape[1], -1)

        out = {"pred_dicts": preds}
        if train:
            tcfg = self.roi_cfg["TARGET_CONFIG"]
            targets = assign_proposal_targets(
                rois, roi_valid, batch["gt_boxes"],
                roi_per_image=int(tcfg.get("ROI_PER_IMAGE", 128)),
                fg_thresh=float(tcfg.get("REG_FG_THRESH", 0.55)),
                bg_thresh_hi=float(tcfg.get("CLS_BG_THRESH", 0.55)),
                bg_thresh_lo=float(tcfg.get("CLS_BG_THRESH_LO", 0.1)),
                fg_ratio=float(tcfg.get("FG_RATIO", 0.5)),
            )
            cls_logits, reg = self.roi_head(
                pts, part_feats, seg_feats, pvalid, targets["rois"],
                targets["reg_valid"] | (targets["cls_labels"] >= 0),
                train=train,
            )
            rcnn_cls = roi_cls_loss(cls_logits, targets["cls_labels"])
            rcnn_reg = roi_box_loss(
                reg, targets["gt_of_rois"], targets["rois"], targets["reg_valid"],
                corner_loss_weight=corner_weight_from_cfg(self.roi_cfg),
            )
            seg_loss, part_loss, _ = PointIntraPartOffsetHead.get_loss(
                seg_logits.reshape(self.batch_size, pts.shape[1], -1),
                part_preds.reshape(self.batch_size, pts.shape[1], -1),
                pts, pvalid, batch["gt_boxes"],
            )
            rpn_targets = self.dense_head.assign_targets(batch["gt_boxes"])
            rpn_loss, tb = self.dense_head.get_loss(preds, rpn_targets)
            loss = rpn_loss + rcnn_cls + rcnn_reg + seg_loss + part_loss
            tb.update({
                "rcnn_loss_cls": rcnn_cls, "rcnn_loss_reg": rcnn_reg,
                "point_loss_seg": seg_loss, "point_loss_part": part_loss,
            })
            out["loss"] = loss
            out["tb_dict"] = tb
        else:
            cls_logits, reg = self.roi_head(
                pts, part_feats, seg_feats, pvalid, rois, roi_valid,
                train=False,
            )
            anchor = jnp.concatenate([
                jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
                jnp.zeros_like(rois[..., 6:7]),
            ], axis=-1)
            local = self.coder.decode(reg, anchor)
            h = rois[..., 6]
            c, s = jnp.cos(h), jnp.sin(h)
            gx = local[..., 0] * c - local[..., 1] * s + rois[..., 0]
            gy = local[..., 0] * s + local[..., 1] * c + rois[..., 1]
            refined = jnp.stack([
                gx, gy, local[..., 2] + rois[..., 2],
                local[..., 3], local[..., 4], local[..., 5],
                local[..., 6] + h,
            ], axis=-1)
            out.update({
                "final_boxes": refined * roi_valid[..., None],
                "final_scores": jax.nn.sigmoid(cls_logits) * roi_valid,
                "final_labels": roi_labels,
                "final_mask": roi_valid,
            })
        return out
