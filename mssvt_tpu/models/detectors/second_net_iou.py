"""SECOND-IoU two-stage detector (ref: pcdet/models/detectors/second_net_iou.py).

SECOND first stage + BEV-grid RoI refinement head. Demonstrates the full
two-stage machinery (proposal NMS, IoU-based target sampling, canonical-frame
regression) on static shapes.
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
from .generic_post import apply_vfe
from ..roi_heads.bev_grid_head import BEVGridRoIHead
from ..roi_heads.roi_head_template import (
    assign_proposal_targets,
    proposal_layer,
    corner_weight_from_cfg,
    roi_box_loss,
    roi_cls_loss,
)


class SECONDNetIoU(nn.Module):
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
        roi_cfg = cfg["ROI_HEAD"]
        # stride-8 backbone, metric cell size of the 2D map
        bev_stride = int(roi_cfg.get("BEV_STRIDE", 8))
        self.roi_head = BEVGridRoIHead(
            model_cfg=roi_cfg,
            input_channels=self.backbone_2d.num_bev_features,
            point_cloud_range=tuple(self.point_cloud_range),
            bev_stride_metric=(
                self.voxel_size[0] * bev_stride, self.voxel_size[1] * bev_stride,
            ),
            dtype=self.dtype,
        )
        self.roi_cfg = roi_cfg
        self.coder = ResidualCoder()

    def __call__(self, batch, train: bool = False):
        voxel_features = apply_vfe(self.vfe, batch, train=train)
        sp = SparseVoxels.create(
            features=voxel_features, coords=batch["voxel_coords"],
            valid=batch["voxel_valid"], batch_size=self.batch_size,
            spatial_shape=self.grid_size, voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
        )
        sp = self.backbone_3d(sp, train=train)
        spatial_2d = self.backbone_2d(sp.bev(), train=train)
        preds = self.dense_head(spatial_2d, train=train)
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
                spatial_2d, targets["rois"], targets["reg_valid"] | (targets["cls_labels"] >= 0),
                train=train,
            )
            rcnn_cls = roi_cls_loss(cls_logits, targets["cls_labels"])
            rcnn_reg = roi_box_loss(
                reg, targets["gt_of_rois"], targets["rois"], targets["reg_valid"],
                code_weights=self.roi_cfg.get("LOSS_CONFIG", {}).get(
                    "LOSS_WEIGHTS", {}
                ).get("code_weights"),
                corner_loss_weight=corner_weight_from_cfg(self.roi_cfg),
            )
            rpn_targets = self.dense_head.assign_targets(batch["gt_boxes"])
            rpn_loss, tb = self.dense_head.get_loss(preds, rpn_targets)
            loss = rpn_loss + rcnn_cls + rcnn_reg
            tb.update({"rcnn_loss_cls": rcnn_cls, "rcnn_loss_reg": rcnn_reg})
            out["loss"] = loss
            out["tb_dict"] = tb
        else:
            cls_logits, reg = self.roi_head(spatial_2d, rois, roi_valid, train=False)
            anchor = jnp.concatenate([
                jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
                jnp.zeros_like(rois[..., 6:7]),
            ], axis=-1)
            local = self.coder.decode(reg, anchor)
            # rotate local refinement back to global frame
            h = rois[..., 6]
            c, s = jnp.cos(h), jnp.sin(h)
            gx = local[..., 0] * c - local[..., 1] * s + rois[..., 0]
            gy = local[..., 0] * s + local[..., 1] * c + rois[..., 1]
            refined = jnp.stack([
                gx, gy, local[..., 2] + rois[..., 2],
                local[..., 3], local[..., 4], local[..., 5],
                local[..., 6] + h,
            ], axis=-1)
            # final score: rcnn iou-score * roi score (ref second_net_iou)
            final_scores = jax.nn.sigmoid(cls_logits) * roi_scores
            out.update({
                "final_boxes": refined * roi_valid[..., None],
                "final_scores": final_scores * roi_valid,
                "final_labels": roi_labels,
                "final_mask": roi_valid,
            })
        return out
