"""PointPillar detector (ref: pcdet/models/detectors/pointpillar.py:4-55).

PillarVFE → PointPillarScatter → BaseBEVBackbone → AnchorHeadSingle.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builders import (
    BuildCtx,
    build_backbone_2d,
    build_dense_head,
    build_map_to_bev,
    build_vfe,
)
from .generic_post import apply_vfe, run_dense_head


class PointPillar(nn.Module):
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
        m2b = dict(cfg.get("MAP_TO_BEV", {"NAME": "PointPillarScatter"}))
        m2b.setdefault("NUM_BEV_FEATURES",
                       int(cfg["VFE"].get("NUM_FILTERS", [64])[-1]))
        self.map_to_bev = build_map_to_bev(m2b, ctx)
        self.backbone_2d = build_backbone_2d(cfg["BACKBONE_2D"], ctx)
        self.dense_head = build_dense_head(
            cfg["DENSE_HEAD"], ctx,
            input_channels=self.backbone_2d.num_bev_features)

    def __call__(self, batch, train: bool = False):
        pillar_features = apply_vfe(self.vfe, batch, train=train)
        pillar_features = pillar_features * batch["voxel_valid"][:, None]
        spatial = self.map_to_bev(
            pillar_features, batch["voxel_coords"], batch["voxel_valid"],
            self.batch_size,
        )
        spatial_2d = self.backbone_2d(spatial, train=train)
        return run_dense_head(
            self.dense_head, spatial_2d, batch,
            self.model_cfg.get("POST_PROCESSING"), train=train)
