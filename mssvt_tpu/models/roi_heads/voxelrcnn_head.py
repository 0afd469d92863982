"""VoxelRCNN head (ref: pcdet/models/roi_heads/voxelrcnn_head.py +
pointnet2_stack/voxel_pool_modules.py:8 NeighborVoxelSAModuleMSG).

Pools multi-scale sparse-conv voxel features at a 3D grid of points inside
each RoI via :func:`voxel_query` neighborhoods (instead of PV-RCNN's
keypoint ball query), runs a per-scale shared MLP + max-pool, flattens the
grid, and regresses cls/reg through shared FCs.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..model_utils.layers import BatchNorm

from ...ops.sampling import group_features
from ...ops.voxel_query import voxel_query
from ..backbones_3d.pointnet2_backbone import SharedMLP
from .pvrcnn_head import roi_grid_points_3d


class NeighborVoxelSA(nn.Module):
    """One scale of neighbor-voxel set abstraction
    (ref: voxel_pool_modules.py:8-115)."""

    mlps: Sequence[int]
    max_range: Sequence[int]  # (z, y, x) cell radii
    radius: float
    nsample: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, grid_pts, sp, batch_size, train: bool = False):
        """grid_pts (B, G, 3) metric; sp: stage SparseVoxels. → (B, G, C)."""
        idx, empty = voxel_query(
            grid_pts, sp.coords, sp.valid, sp.spatial_shape, sp.voxel_size,
            sp.point_cloud_range, self.max_range, self.radius, self.nsample,
            batch_size,
        )  # (B, G, S) global rows
        feats = group_features(sp.features, idx)  # (B, G, S, C)
        ctr = sp.metric_centers()  # (V, 3)
        nb_xyz = group_features(ctr, idx)  # (B, G, S, 3)
        rel = (nb_xyz - grid_pts[:, :, None, :]) * (~empty)[..., None, None]
        x = jnp.concatenate([rel.astype(feats.dtype), feats], axis=-1)
        x = SharedMLP(tuple(self.mlps), dtype=self.dtype, name="mlp")(
            x, train=train)
        return jnp.max(x, axis=2) * (~empty)[..., None]


class VoxelRCNNHead(nn.Module):
    """Ref: voxelrcnn_head.py VoxelRCNNHead."""

    model_cfg: Any
    code_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, stages: Dict[str, Any], rois, roi_valid, batch_size,
                 train: bool = False):
        """stages: {name: SparseVoxels}; rois (B, R, 7). → (cls, reg)."""
        cfg = self.model_cfg
        g = int(cfg.get("GRID_SIZE", 6))
        pool_cfg = cfg["ROI_GRID_POOL"]

        b, r = rois.shape[:2]
        grid_pts = roi_grid_points_3d(rois, g).reshape(b, r * g ** 3, 3)

        pooled = []
        for name in pool_cfg["FEATURES_SOURCE"]:
            scfg = pool_cfg["POOL_LAYERS"][name]
            outs = []
            for i, (rad, ns, mlp) in enumerate(zip(
                scfg["QUERY_RANGES"], scfg["NSAMPLE"], scfg["MLPS"],
            )):
                sa = NeighborVoxelSA(
                    mlps=tuple(mlp), max_range=tuple(rad[::-1]),
                    radius=float(scfg["POOL_RADIUS"][i]), nsample=int(ns),
                    dtype=self.dtype, name=f"{name}_sa_{i}",
                )
                outs.append(sa(grid_pts, stages[name], batch_size, train=train))
            pooled.append(jnp.concatenate(outs, axis=-1))
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
