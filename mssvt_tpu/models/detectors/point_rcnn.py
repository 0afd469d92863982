"""PointRCNN detector (ref: pcdet/models/detectors/point_rcnn.py).

PointNet2MSG backbone over raw points → PointHeadBox (per-point proposals)
→ proposal NMS → RoIPointPool3d + canonical-frame refinement head.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..model_utils.layers import BatchNorm

from ...ops.pointnet2 import roipoint_pool3d
from ...utils.box_coder import ResidualCoder
from ..backbones_3d.pointnet2_backbone import SharedMLP
from ..builders import BuildCtx, build_backbone_3d
from ..dense_heads.point_head import PointHeadBox, assign_point_targets
from ..roi_heads.roi_head_template import (
    assign_proposal_targets,
    proposal_layer,
    corner_weight_from_cfg,
    roi_box_loss,
    roi_cls_loss,
)

MEAN_SIZES_DEFAULT = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]


class PointRCNNRoIHead(nn.Module):
    """Canonical-frame point pooling + PointNet encode (ref: pointrcnn_head.py)."""

    model_cfg: Any
    num_sampled_points: int = 128
    code_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points_xyz, point_features, points_valid, rois,
                 roi_valid, train: bool = False):
        b, r = rois.shape[:2]

        def pool_sample(xyz, feat, valid, roi):
            pooled, empty = roipoint_pool3d(
                xyz, feat, roi, self.num_sampled_points, valid
            )  # (R, S, 3+C)
            return pooled, empty

        pooled, empty = jax.vmap(pool_sample)(
            points_xyz, point_features, points_valid, rois
        )  # (B, R, S, 3+C)

        # canonical transform of the xyz part (ref: pointrcnn_head canonical)
        xyz = pooled[..., :3] - rois[..., None, :3]
        h = rois[..., 6][..., None]
        c, s = jnp.cos(-h), jnp.sin(-h)
        lx = xyz[..., 0] * c - xyz[..., 1] * s
        ly = xyz[..., 0] * s + xyz[..., 1] * c
        canon = jnp.stack([lx, ly, xyz[..., 2]], axis=-1)
        x = jnp.concatenate([canon, pooled[..., 3:]], axis=-1)

        for i, m in enumerate(self.model_cfg.get("XYZ_UP_LAYER", [[64, 64]])):
            x = SharedMLP(tuple(m), dtype=self.dtype, name=f"up_{i}")(x, train=train)
        x = jnp.max(x, axis=2)  # (B, R, C)

        for i, fc in enumerate(self.model_cfg.get("SHARED_FC", [256, 256])):
            x = nn.Dense(fc, use_bias=False, dtype=self.dtype,
                         name=f"shared_fc_{i}")(x)
            x = BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"shared_bn_{i}")(x)
            x = nn.relu(x)

        cls = nn.Dense(1, dtype=self.dtype, name="cls_out")(x)[..., 0]
        reg = nn.Dense(self.code_size, dtype=self.dtype, name="reg_out")(x)
        m = roi_valid.astype(jnp.float32)
        return cls.astype(jnp.float32) * m, reg.astype(jnp.float32) * m[..., None]


class PointRCNN(nn.Module):
    model_cfg: Any
    num_class: int
    class_names: Sequence[str]
    grid_size: Sequence[int]
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    batch_size: int
    max_voxels: int
    max_points_per_voxel: int
    max_points: int = 16384
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
        self.backbone_3d = build_backbone_3d(cfg["BACKBONE_3D"], ctx)
        fp_out = int(cfg["BACKBONE_3D"]["FP_MLPS"][0][-1])
        self.point_head = PointHeadBox(
            model_cfg=cfg["POINT_HEAD"], input_channels=fp_out,
            num_class=self.num_class, dtype=self.dtype,
        )
        self.roi_head = PointRCNNRoIHead(
            model_cfg=cfg["ROI_HEAD"],
            num_sampled_points=int(cfg["ROI_HEAD"].get("NUM_SAMPLED_POINTS", 128)),
            dtype=self.dtype,
        )
        self.roi_cfg = cfg["ROI_HEAD"]
        self.mean_sizes = cfg["POINT_HEAD"].get(
            "MEAN_SIZES", MEAN_SIZES_DEFAULT[: self.num_class]
        )
        self.coder = ResidualCoder()

    def _points(self, batch):
        pts = batch["points"].reshape(self.batch_size, self.max_points, -1)
        valid = batch["points_valid"].reshape(self.batch_size, self.max_points)
        return pts[..., :3] * valid[..., None], pts[..., 3:] * valid[..., None], valid

    def __call__(self, batch, train: bool = False):
        xyz, feat, valid = self._points(batch)
        point_features = self.backbone_3d(
            xyz, feat if feat.shape[-1] else None, valid, train=train
        )  # (B, N, C)
        cls_logits, box_preds = self.point_head(point_features, train=train)

        labels_pred = jnp.argmax(cls_logits, axis=-1) + 1
        scores = jnp.max(jax.nn.sigmoid(cls_logits), axis=-1) * valid
        boxes = PointHeadBox.decode_point_boxes(
            xyz, box_preds, labels_pred, self.mean_sizes
        )

        nms_cfg = self.roi_cfg["NMS_CONFIG"]["TRAIN" if train else "TEST"]
        rois, roi_scores, roi_labels, roi_valid = proposal_layer(
            boxes, scores, valid,
            nms_pre=int(nms_cfg["NMS_PRE_MAXSIZE"]),
            nms_post=int(nms_cfg["NMS_POST_MAXSIZE"]),
            nms_thresh=float(nms_cfg["NMS_THRESH"]),
            labels=labels_pred,
        )

        out = {}
        if train:
            pt_labels, gt_of_points = assign_point_targets(
                xyz, valid, batch["gt_boxes"]
            )
            box_targets = PointHeadBox.encode_point_targets(
                xyz, gt_of_points, pt_labels, self.mean_sizes
            )
            p_cls, p_reg = PointHeadBox.get_loss(
                cls_logits, box_preds, pt_labels, box_targets, self.num_class
            )
            tcfg = self.roi_cfg["TARGET_CONFIG"]
            targets = assign_proposal_targets(
                rois, roi_valid, batch["gt_boxes"],
                roi_per_image=int(tcfg.get("ROI_PER_IMAGE", 128)),
            )
            r_cls_logits, r_reg = self.roi_head(
                xyz, point_features, valid, targets["rois"],
                targets["reg_valid"] | (targets["cls_labels"] >= 0), train=train,
            )
            rcnn_cls = roi_cls_loss(r_cls_logits, targets["cls_labels"])
            rcnn_reg = roi_box_loss(
                r_reg, targets["gt_of_rois"], targets["rois"], targets["reg_valid"],
                corner_loss_weight=corner_weight_from_cfg(self.roi_cfg),
            )
            loss = p_cls + p_reg + rcnn_cls + rcnn_reg
            out["loss"] = loss
            out["tb_dict"] = {
                "point_loss_cls": p_cls, "point_loss_box": p_reg,
                "rcnn_loss_cls": rcnn_cls, "rcnn_loss_reg": rcnn_reg,
                "rpn_loss": loss,
            }
        else:
            r_cls, r_reg = self.roi_head(
                xyz, point_features, valid, rois, roi_valid, train=False
            )
            anchor = jnp.concatenate([
                jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
                jnp.zeros_like(rois[..., 6:7]),
            ], axis=-1)
            local = self.coder.decode(r_reg, anchor)
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
                "final_scores": jax.nn.sigmoid(r_cls) * roi_valid,
                "final_labels": roi_labels,
                "final_mask": roi_valid,
            })
        return out
