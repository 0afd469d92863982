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

from ..model_utils.layers import BatchNorm


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
                x = BatchNorm(
                    use_running_average=not train, momentum=0.99, epsilon=1e-3,
                    name=f"pfn_bn_{i}",
                )(x)
            x = nn.relu(x)
            x_max = jnp.max(x, axis=1, keepdims=True)
            if last:
                return x_max[:, 0, :]
            x = jnp.concatenate([x, jnp.broadcast_to(x_max, x.shape)], axis=-1)
        return x


class HardVFE(nn.Module):
    """mmdet3d-style hard-voxelization VFE (ref: vfe/hard_vfe.py:229-442).

    Same cluster/center augmentation as PillarVFE but for 3D voxels and with
    a stack of VFE layers; each non-final layer concatenates the per-voxel
    max back onto every point, the final layer max-pools to one vector per
    voxel.
    """

    num_filters: Sequence[int]
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    use_norm: bool = True
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    with_distance: bool = False

    @nn.compact
    def __call__(self, voxels, voxel_num_points, coords, train: bool = False):
        v, p, _ = voxels.shape
        count = jnp.clip(voxel_num_points, 1, None).astype(voxels.dtype)
        feats = [voxels]
        if self.with_cluster_center:
            mean = voxels[..., :3].sum(1, keepdims=True) / count[:, None, None]
            feats.append(voxels[..., :3] - mean)
        if self.with_voxel_center:
            vx, vy, vz = self.voxel_size
            x0, y0, z0 = self.point_cloud_range[:3]
            cx = coords[:, 3:4].astype(voxels.dtype) * vx + (vx / 2 + x0)
            cy = coords[:, 2:3].astype(voxels.dtype) * vy + (vy / 2 + y0)
            cz = coords[:, 1:2].astype(voxels.dtype) * vz + (vz / 2 + z0)
            center = jnp.concatenate([cx, cy, cz], -1)[:, None, :]
            feats.append(voxels[..., :3] - center)
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        pt_mask = (jnp.arange(p)[None, :] < voxel_num_points[:, None])[..., None]
        x = x * pt_mask.astype(x.dtype)

        for i, nf in enumerate(self.num_filters):
            last = i == len(self.num_filters) - 1
            units = nf if last else nf // 2
            x = nn.Dense(units, use_bias=not self.use_norm, name=f"vfe_{i}")(x)
            if self.use_norm:
                x = BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, name=f"vfe_bn_{i}")(x)
            x = nn.relu(x) * pt_mask.astype(x.dtype)
            x_max = jnp.max(x, axis=1, keepdims=True)
            if last:
                return x_max[:, 0, :]
            x = jnp.concatenate([x, jnp.broadcast_to(x_max, x.shape)], axis=-1)
        return x


class DynamicVFE(nn.Module):
    """Dynamic-voxelization VFE (ref: vfe/dynamic_vfe.py:13-137).

    No per-voxel point cap: every point scatters into its voxel. The
    reference uses torch_scatter mean; here the voxelizer provides each
    point's voxel ROW (static (P,) int32, -1 = dropped) and the scatters are
    XLA segment ops — deterministic. Per layer: point MLP → scatter-mean to
    voxels → gather back and concat (the reference's scatter/gather VFE
    layer pattern).
    """

    num_filters: Sequence[int]
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    num_voxels: int  # static voxel capacity V
    use_norm: bool = True

    @nn.compact
    def __call__(self, points, point_voxel_rows, voxel_coords,
                 train: bool = False):
        """points (P, C>=3); point_voxel_rows (P,) int32 into [0, V) or -1;
        voxel_coords (V, 4). Returns (V, num_filters[-1])."""
        v = self.num_voxels
        ok = point_voxel_rows >= 0
        rows = jnp.where(ok, point_voxel_rows, v)

        def scatter_mean(x):
            s = jnp.zeros((v + 1, x.shape[-1]), x.dtype).at[rows].add(
                x * ok[:, None], mode="drop")
            n = jnp.zeros((v + 1,), x.dtype).at[rows].add(
                ok.astype(x.dtype), mode="drop")
            return s[:v] / jnp.clip(n[:v], 1)[:, None]

        # cluster + center augmentation (ref :60-92)
        vmean = scatter_mean(points[:, :3])
        f_cluster = points[:, :3] - vmean[jnp.clip(rows, 0, v - 1)]
        vx, vy, vz = self.voxel_size
        x0, y0, z0 = self.point_cloud_range[:3]
        safe_rows = jnp.clip(rows, 0, v - 1)
        cc = voxel_coords[safe_rows]
        center = jnp.stack([
            cc[:, 3].astype(points.dtype) * vx + (vx / 2 + x0),
            cc[:, 2].astype(points.dtype) * vy + (vy / 2 + y0),
            cc[:, 1].astype(points.dtype) * vz + (vz / 2 + z0),
        ], axis=-1)
        f_center = points[:, :3] - center
        x = jnp.concatenate([points, f_cluster, f_center], -1) * ok[:, None]

        for i, nf in enumerate(self.num_filters):
            last = i == len(self.num_filters) - 1
            x = nn.Dense(nf, use_bias=not self.use_norm, name=f"dvfe_{i}")(x)
            if self.use_norm:
                x = BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, name=f"dvfe_bn_{i}")(x)
            x = nn.relu(x) * ok[:, None]
            voxel_feat = scatter_mean(x)
            if last:
                return voxel_feat
            x = jnp.concatenate(
                [x, voxel_feat[jnp.clip(rows, 0, v - 1)]], axis=-1
            ) * ok[:, None]
        return voxel_feat
