"""BEV-grid RoI refinement head (ref: pcdet/models/roi_heads/second_head.py).

The reference's SECONDHead pools BEV features under each RoI by bilinear
sampling a grid of points inside the rotated box, then runs shared FC stacks
into cls/reg branches. TPU version: fully batched bilinear gather over
(B, R, G*G) grid points, MXU-friendly Dense towers.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def roi_grid_points_bev(rois: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """(.., R, 7) rois → (.., R, G*G, 2) metric xy sample points."""
    g = grid_size
    u = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5  # (-0.5, 0.5)
    gx, gy = jnp.meshgrid(u, u, indexing="ij")
    local = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (G*G, 2)
    scale = jnp.stack([rois[..., 3], rois[..., 4]], axis=-1)[..., None, :]
    p = local * scale  # (..., R, G*G, 2)
    c = jnp.cos(rois[..., 6])[..., None]
    s = jnp.sin(rois[..., 6])[..., None]
    x = p[..., 0] * c - p[..., 1] * s + rois[..., 0:1]
    y = p[..., 0] * s + p[..., 1] * c + rois[..., 1:2]
    return jnp.stack([x, y], axis=-1)


def bilinear_sample_bev(features: jnp.ndarray, pts_xy: jnp.ndarray,
                        point_cloud_range, bev_stride_metric):
    """Sample (B, H, W, C) NHWC BEV features at metric xy points.

    pts_xy: (B, P, 2). Returns (B, P, C). Out-of-map points give zeros.
    """
    b, h, w, c = features.shape
    x0m, y0m = point_cloud_range[0], point_cloud_range[1]
    sx, sy = bev_stride_metric
    fx = (pts_xy[..., 0] - x0m) / sx - 0.5
    fy = (pts_xy[..., 1] - y0m) / sy - 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    def gather(yi, xi):
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = features.reshape(b, h * w, c)
        v = jnp.take_along_axis(flat, (yi * w + xi)[..., None], axis=1)
        return v * ok[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return (
        v00 * ((1 - wx) * (1 - wy))[..., None]
        + v01 * (wx * (1 - wy))[..., None]
        + v10 * ((1 - wx) * wy)[..., None]
        + v11 * (wx * wy)[..., None]
    )


class BEVGridRoIHead(nn.Module):
    """Grid-pool BEV features per RoI → shared FC → cls/reg branches."""

    model_cfg: Any
    input_channels: int
    point_cloud_range: Sequence[float]
    bev_stride_metric: Sequence[float]  # metric size of one BEV cell (x, y)
    code_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bev_features, rois, roi_valid, train: bool = False):
        cfg = self.model_cfg
        g = int(cfg.get("GRID_SIZE", 6))
        fc_sizes = list(cfg.get("SHARED_FC", [256, 256]))
        dp = float(cfg.get("DP_RATIO", 0.3))

        b, r = rois.shape[:2]
        pts = roi_grid_points_bev(rois, g)  # (B, R, G*G, 2)
        feat = bilinear_sample_bev(
            bev_features, pts.reshape(b, r * g * g, 2),
            self.point_cloud_range, self.bev_stride_metric,
        ).reshape(b, r, g * g * bev_features.shape[-1])

        x = feat.astype(self.dtype)
        for i, fc in enumerate(fc_sizes):
            x = nn.Dense(fc, dtype=self.dtype, name=f"shared_fc_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(dp, name=f"shared_dp_{i}")(x, deterministic=not train)

        cls_logits = nn.Dense(1, dtype=self.dtype, name="cls_out")(x)[..., 0]
        reg = nn.Dense(self.code_size, dtype=self.dtype, name="reg_out")(x)
        mask = roi_valid.astype(jnp.float32)
        return cls_logits.astype(jnp.float32) * mask, reg.astype(jnp.float32) * mask[..., None]
