"""Intra-object part location head (ref:
pcdet/models/dense_heads/point_intra_part_head.py ``PointIntraPartOffsetHead``).

PartA2 stage-1: per-voxel foreground segmentation + intra-part location
regression — where inside its object each foreground voxel sits, as
normalized [0,1]^3 coordinates in the box's canonical frame. Targets are
computed on device from the matched GT box.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..model_utils.layers import BatchNorm

from ..losses import sigmoid_focal_cls_loss
from .point_head import assign_point_targets


def intra_part_targets(points_xyz, gt_of_points, labels):
    """(B, N, 3) normalized canonical part coordinates for fg points
    (ref: point_head_template.assign_stack_targets ret_part_labels)."""
    local = points_xyz - gt_of_points[..., :3]
    h = gt_of_points[..., 6]
    c, s = jnp.cos(-h), jnp.sin(-h)
    lx = local[..., 0] * c - local[..., 1] * s
    ly = local[..., 0] * s + local[..., 1] * c
    lz = local[..., 2]
    dims = jnp.clip(gt_of_points[..., 3:6], 1e-3, None)
    part = jnp.stack([
        lx / dims[..., 0] + 0.5,
        ly / dims[..., 1] + 0.5,
        lz / dims[..., 2] + 0.5,
    ], axis=-1)
    return jnp.clip(part, 0.0, 1.0) * (labels > 0)[..., None]


class PointIntraPartOffsetHead(nn.Module):
    """Seg + part towers over per-voxel UNet features."""

    model_cfg: Any
    input_channels: int
    num_class: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, point_features, train: bool = False):
        def tower(x, fcs, out, name):
            for i, ch in enumerate(fcs):
                x = nn.Dense(ch, use_bias=False, dtype=self.dtype,
                             name=f"{name}_fc_{i}")(x)
                x = BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, dtype=self.dtype,
                                 name=f"{name}_bn_{i}")(x)
                x = nn.relu(x)
            return nn.Dense(out, dtype=self.dtype, name=f"{name}_out")(x)

        x = point_features.astype(self.dtype)
        seg = tower(x, self.model_cfg.get("CLS_FC", [128, 128]),
                    self.num_class, "seg").astype(jnp.float32)
        part = tower(x, self.model_cfg.get("PART_FC", [128, 128]),
                     3, "part").astype(jnp.float32)
        return seg, part

    @staticmethod
    def get_loss(seg_logits, part_preds, points_xyz, points_valid, gt_boxes):
        labels, gt_of = assign_point_targets(points_xyz, points_valid, gt_boxes)
        cared = labels >= 0
        pos = labels > 0
        one_hot = pos[..., None].astype(jnp.float32)
        w = cared.astype(jnp.float32) / jnp.clip(pos.sum(), 1.0)
        seg_loss = sigmoid_focal_cls_loss(seg_logits, one_hot, w).sum()

        part_t = intra_part_targets(points_xyz, gt_of, labels)
        # BCE on sigmoid(part) vs target (ref: get_part_layer_loss)
        p = jax.nn.sigmoid(part_preds)
        bce = -(part_t * jnp.log(jnp.clip(p, 1e-7))
                + (1 - part_t) * jnp.log(jnp.clip(1 - p, 1e-7)))
        part_loss = (bce.mean(-1) * pos).sum() / jnp.clip(pos.sum(), 1.0)
        return seg_loss, part_loss, labels
