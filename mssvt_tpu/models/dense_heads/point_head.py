"""Point-wise heads (ref: pcdet/models/dense_heads/point_head_{simple,box}.py
+ point_head_template.py).

- :class:`PointHeadSimple`: per-point foreground classification (PV-RCNN's
  keypoint weighting head).
- :class:`PointHeadBox`: per-point class + box regression (PointRCNN's
  first stage).

Targets are assigned on device: a point is foreground iff inside a GT box
(ref: point_head_template.assign_stack_targets), with PointResidualCoder-style
box encoding for the box head.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..model_utils.layers import BatchNorm

from ...ops.pointnet2 import points_in_boxes
from ..losses import sigmoid_focal_cls_loss, weighted_smooth_l1


def assign_point_targets(points_xyz, points_valid, gt_boxes,
                         extra_width=(0.2, 0.2, 0.2)):
    """Per-point fg/bg labels + matched gt box.

    Returns labels (B, N) in {-1 ignore, 0 bg, c fg-class}, gt_of_points
    (B, N, 8). Points inside an enlarged-but-not-exact box are ignored
    (ref: assign_stack_targets ignore_flag).
    """

    def per_sample(xyz, valid, gt):
        gt_valid = gt[:, -1] > 0
        inside = points_in_boxes(xyz, gt[:, :7]) & gt_valid[None, :]
        enlarged = gt.at[:, 3:6].add(jnp.asarray(extra_width) * 2)
        inside_ext = points_in_boxes(xyz, enlarged[:, :7]) & gt_valid[None, :]

        box_idx = jnp.argmax(inside, axis=1)
        is_fg = inside.any(axis=1)
        is_ignore = inside_ext.any(axis=1) & ~is_fg
        cls = gt[:, -1].astype(jnp.int32)[box_idx]
        labels = jnp.where(is_fg, cls, 0)
        labels = jnp.where(is_ignore, -1, labels)
        labels = jnp.where(valid, labels, -1)
        return labels, gt[box_idx]

    return jax.vmap(per_sample)(points_xyz, points_valid, gt_boxes)


class PointHeadSimple(nn.Module):
    """Foreground score per point (ref: point_head_simple.py)."""

    model_cfg: Any
    input_channels: int
    num_class: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, point_features, train: bool = False):
        x = point_features.astype(self.dtype)
        for i, c in enumerate(self.model_cfg.get("CLS_FC", [256, 256])):
            x = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"cls_fc_{i}")(x)
            x = BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype, name=f"cls_bn_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.num_class, dtype=self.dtype, name="cls_out")(x).astype(
            jnp.float32
        )

    @staticmethod
    def get_loss(cls_logits, labels):
        """Focal point-cls loss; labels per assign_point_targets."""
        cared = labels >= 0
        pos = labels > 0
        one_hot = (pos)[..., None].astype(jnp.float32)  # class-agnostic fg
        weights = cared.astype(jnp.float32)
        weights = weights / jnp.clip(pos.sum(), 1.0)
        loss = sigmoid_focal_cls_loss(cls_logits, one_hot, weights)
        return loss.sum()


class PointHeadBox(nn.Module):
    """Per-point class + box head (ref: point_head_box.py)."""

    model_cfg: Any
    input_channels: int
    num_class: int
    code_size: int = 8  # PointResidualCoder: offset(3) log-dims(3) cos sin
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, point_features, train: bool = False):
        def tower(x, fcs, out, name):
            for i, c in enumerate(fcs):
                x = nn.Dense(c, use_bias=False, dtype=self.dtype,
                             name=f"{name}_fc_{i}")(x)
                x = BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, dtype=self.dtype,
                                 name=f"{name}_bn_{i}")(x)
                x = nn.relu(x)
            return nn.Dense(out, dtype=self.dtype, name=f"{name}_out")(x)

        x = point_features.astype(self.dtype)
        cls = tower(x, self.model_cfg.get("CLS_FC", [256, 256]),
                    self.num_class, "cls").astype(jnp.float32)
        box = tower(x, self.model_cfg.get("REG_FC", [256, 256]),
                    self.code_size, "reg").astype(jnp.float32)
        return cls, box

    @staticmethod
    def encode_point_targets(points_xyz, gt_of_points, labels, mean_sizes):
        """PointResidualCoder encoding (ref: box_coder_utils.py:144-222)."""
        fg = labels > 0
        ms = jnp.asarray(mean_sizes, jnp.float32)  # (num_class, 3)
        size_anchor = ms[jnp.clip(labels - 1, 0)]
        diag = jnp.sqrt(size_anchor[..., 0] ** 2 + size_anchor[..., 1] ** 2)
        offset = gt_of_points[..., :3] - points_xyz
        xt = offset[..., 0] / diag
        yt = offset[..., 1] / diag
        zt = offset[..., 2] / size_anchor[..., 2]
        dims = jnp.log(jnp.clip(gt_of_points[..., 3:6], 1e-5, None)
                       / jnp.clip(size_anchor, 1e-5, None))
        cos = jnp.cos(gt_of_points[..., 6])
        sin = jnp.sin(gt_of_points[..., 6])
        t = jnp.concatenate([
            xt[..., None], yt[..., None], zt[..., None], dims,
            cos[..., None], sin[..., None],
        ], axis=-1)
        return t * fg[..., None]

    @staticmethod
    def decode_point_boxes(points_xyz, preds, labels, mean_sizes):
        ms = jnp.asarray(mean_sizes, jnp.float32)
        size_anchor = ms[jnp.clip(labels - 1, 0)]
        diag = jnp.sqrt(size_anchor[..., 0] ** 2 + size_anchor[..., 1] ** 2)
        x = preds[..., 0] * diag + points_xyz[..., 0]
        y = preds[..., 1] * diag + points_xyz[..., 1]
        z = preds[..., 2] * size_anchor[..., 2] + points_xyz[..., 2]
        dims = jnp.exp(jnp.clip(preds[..., 3:6], -8, 8)) * size_anchor
        heading = jnp.arctan2(preds[..., 7], preds[..., 6])
        return jnp.concatenate([
            x[..., None], y[..., None], z[..., None], dims, heading[..., None],
        ], axis=-1)

    @staticmethod
    def get_loss(cls_logits, box_preds, labels, box_targets, num_class,
                 code_weights=None):
        cared = labels >= 0
        pos = labels > 0
        one_hot = jax.nn.one_hot(jnp.clip(labels, 0), num_class + 1)[..., 1:]
        w = cared.astype(jnp.float32) / jnp.clip(pos.sum(), 1.0)
        cls_loss = sigmoid_focal_cls_loss(cls_logits, one_hot, w).sum()
        reg_loss = weighted_smooth_l1(
            box_preds, box_targets, pos.astype(jnp.float32),
            code_weights=code_weights,
        ).sum() / jnp.clip(pos.sum(), 1.0)
        return cls_loss, reg_loss
