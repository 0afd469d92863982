"""PV-RCNN RoI head (ref: pcdet/models/roi_heads/pvrcnn_head.py).

Pools keypoint features at a 3D grid of points inside each RoI (ball-query SA
over the keypoint set), flattens the grid, shared FC → cls/reg branches.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..model_utils.layers import BatchNorm

from ...ops.pointnet2 import query_and_group
from ..backbones_3d.pointnet2_backbone import SharedMLP


def roi_grid_points_3d(rois: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """(B, R, 7) → (B, R, G^3, 3) metric xyz grid points inside each box."""
    g = grid_size
    u = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5
    gx, gy, gz = jnp.meshgrid(u, u, u, indexing="ij")
    local = jnp.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], -1)
    scale = rois[..., None, 3:6]
    p = local * scale  # (B, R, G^3, 3)
    c = jnp.cos(rois[..., 6])[..., None]
    s = jnp.sin(rois[..., 6])[..., None]
    x = p[..., 0] * c - p[..., 1] * s + rois[..., 0:1]
    y = p[..., 0] * s + p[..., 1] * c + rois[..., 1:2]
    z = p[..., 2] + rois[..., 2:3]
    return jnp.stack([x, y, z], axis=-1)


class PVRCNNHead(nn.Module):
    model_cfg: Any
    input_channels: int  # keypoint feature dim
    code_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, keypoints, kp_features, rois, roi_valid,
                 train: bool = False):
        """keypoints (B, K, 3); kp_features (B, K, C); rois (B, R, 7)."""
        cfg = self.model_cfg
        g = int(cfg.get("GRID_SIZE", 6))
        pool_cfg = cfg["ROI_GRID_POOL"]

        b, r = rois.shape[:2]
        grid_pts = roi_grid_points_3d(rois, g).reshape(b, r * g ** 3, 3)

        pooled = []
        for i, (rad, ns, mlp) in enumerate(zip(
            pool_cfg["POOL_RADIUS"], pool_cfg["NSAMPLE"], pool_cfg["MLPS"],
        )):
            grouped, empty = query_and_group(
                float(rad), int(ns), keypoints, grid_pts, kp_features,
            )
            h = SharedMLP(tuple(mlp), dtype=self.dtype, name=f"pool_mlp_{i}")(
                grouped, train=train
            )
            pooled.append(jnp.max(h, axis=2) * (~empty)[..., None])
        x = jnp.concatenate(pooled, axis=-1).reshape(b, r, -1)

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
