"""PartA2 RoI head (ref: pcdet/models/roi_heads/partA2_head.py).

RoIAware-pools stage-1 part predictions (avg pool) and UNet point features
(max pool) into per-RoI 14^3 grids, merges them through 3D convs (the pooled
grids are dense, so plain strided Conv3D replaces the reference's sparse
convs over the grid), flattens, and regresses cls/reg through shared FCs.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..model_utils.layers import BatchNorm

from ...ops.roiaware_pool import roiaware_pool3d


class PartA2FCHead(nn.Module):
    model_cfg: Any
    code_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points_xyz, part_feats, seg_feats, points_valid,
                 rois, roi_valid, train: bool = False):
        """points_xyz (B, N, 3); part_feats (B, N, Cp) [sigmoid part + seg
        score]; seg_feats (B, N, Cs) UNet features; rois (B, R, 7)."""
        cfg = self.model_cfg
        g = int(cfg.get("ROI_AWARE_POOL", {}).get("POOL_SIZE", 12))

        part_pooled, _ = roiaware_pool3d(
            points_xyz, part_feats, points_valid, rois, roi_valid, g, "avg")
        seg_pooled, empty = roiaware_pool3d(
            points_xyz, seg_feats, points_valid, rois, roi_valid, g, "max")

        b, r = rois.shape[:2]
        x = jnp.concatenate([part_pooled, seg_pooled], axis=-1)
        x = x.reshape(b * r, g, g, g, -1).astype(self.dtype)
        # conv_part/conv_rpn merge + sparse-conv downsampling of the ref
        # becomes dense Conv3D over the (small, dense) pooled grid
        for i, ch in enumerate(cfg.get("CONV_CHANNELS", [64, 64])):
            stride = 2 if i == 1 else 1  # ref max-pools the grid once
            x = nn.Conv(ch, (3, 3, 3), strides=(stride,) * 3, use_bias=False,
                        dtype=self.dtype, name=f"conv3d_{i}")(x)
            x = BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"conv3d_bn_{i}")(x)
            x = nn.relu(x)
        x = x.reshape(b, r, -1)

        for i, fc in enumerate(cfg.get("SHARED_FC", [256, 256])):
            x = nn.Dense(fc, use_bias=False, dtype=self.dtype,
                         name=f"shared_fc_{i}")(x)
            x = BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"shared_bn_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(float(cfg.get("DP_RATIO", 0.3)),
                           name=f"dp_{i}")(x, deterministic=not train)

        cls = nn.Dense(1, dtype=self.dtype, name="cls_out")(x)[..., 0]
        reg = nn.Dense(self.code_size, dtype=self.dtype, name="reg_out")(x)
        m = roi_valid.astype(jnp.float32)
        return cls.astype(jnp.float32) * m, reg.astype(jnp.float32) * m[..., None]
