"""Voxel feature encoders.

- :class:`MeanVFE` ≙ ref pcdet/models/backbones_3d/vfe/mean_vfe.py:6-31 —
  the VFE used by MsSVT: per-voxel mean of raw point features.
- :class:`PillarVFE` ≙ ref vfe/pillar_vfe.py:52 — PointPillars PFN (used by
  the PointPillar model family).

Static-shape versions: voxels come in as (max_voxels, max_points, C) with a
per-voxel point count; padding voxels/points contribute zeros.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class MeanVFE(nn.Module):
    """Mean of the (zero-padded) points in each voxel (ref: mean_vfe.py:14-31)."""

    num_point_features: int

    def __call__(self, voxels: jnp.ndarray, voxel_num_points: jnp.ndarray) -> jnp.ndarray:
        # voxels: (V, P, C); voxel_num_points: (V,)
        s = voxels.sum(axis=1)
        n = jnp.clip(voxel_num_points, 1.0, None).astype(voxels.dtype)
        return s / n[:, None]


class PillarVFE(nn.Module):
    """PointPillars pillar feature net (ref: pillar_vfe.py:52-194).

    Augments each point with its offset from the pillar's point-mean
    (``use_cluster``) and from the pillar center (``use_center``), then runs
    PFN Dense+BN+ReLU layers with a max-pool over points.
    """

    num_filters: Sequence[int]
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    use_norm: bool = True
    use_absolute_xyz: bool = True
    with_distance: bool = False

    @nn.compact
    def __call__(self, voxels, voxel_num_points, coords, train: bool = False):
        # voxels (V, P, C>=3); coords (V, 4) (b, z, y, x)
        v, p, _ = voxels.shape
        count = jnp.clip(voxel_num_points, 1, None).astype(voxels.dtype)
        points_mean = voxels[..., :3].sum(1, keepdims=True) / count[:, None, None]
        f_cluster = voxels[..., :3] - points_mean

        vx, vy, vz = self.voxel_size
        x0, y0, z0 = self.point_cloud_range[:3]
        cx = coords[:, 3:4].astype(voxels.dtype) * vx + (vx / 2 + x0)
        cy = coords[:, 2:3].astype(voxels.dtype) * vy + (vy / 2 + y0)
        cz = coords[:, 1:2].astype(voxels.dtype) * vz + (vz / 2 + z0)
        center = jnp.concatenate([cx, cy, cz], axis=-1)[:, None, :]
        f_center = voxels[..., :3] - center

        feats = [voxels if self.use_absolute_xyz else voxels[..., 3:], f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)

        # zero out padding points (ref: pillar_vfe.py get_paddings_indicator)
        pt_mask = (jnp.arange(p)[None, :] < voxel_num_points[:, None])[..., None]
        x = x * pt_mask.astype(x.dtype)

        for i, nf in enumerate(self.num_filters):
            last = i == len(self.num_filters) - 1
            # non-final PFN layers emit nf//2 and concat with their max (ref
            # pillar_vfe.py PFNLayer: out_channels //= 2 when not last)
            units = nf if last else nf // 2
            x = nn.Dense(units, use_bias=not self.use_norm, name=f"pfn_{i}")(x)
            if self.use_norm:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.99, epsilon=1e-3,
                    name=f"pfn_bn_{i}",
                )(x)
            x = nn.relu(x)
            x_max = jnp.max(x, axis=1, keepdims=True)
            if last:
                return x_max[:, 0, :]
            x = jnp.concatenate([x, jnp.broadcast_to(x_max, x.shape)], axis=-1)
        return x
