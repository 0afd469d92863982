"""CenterPoint detector shell (ref: pcdet/models/detectors/centerpoint.py:4-50).

The MsSVT flagship stack: MeanVFE → MixedScaleSparseTransformer →
HeightCompression → BaseBEVBackbone → CenterHead. Composition is
config-driven like the reference's topology-ordered module builder
(ref: detector3d_template.py:35-50), but with static shapes throughout.

Inputs (all padded to static capacities by the data pipeline):
    voxels:            (max_voxels, max_points, C_pt)
    voxel_num_points:  (max_voxels,)
    voxel_coords:      (max_voxels, 4) int32 (b, z, y, x)
    voxel_valid:       (max_voxels,) bool
    gt_boxes:          (batch_size, max_gt, 8) — training only
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.sparse import SparseVoxels
from ..builders import (
    BuildCtx,
    build_backbone_2d,
    build_backbone_3d,
    build_dense_head,
    build_map_to_bev,
    build_vfe,
)
from .generic_post import apply_backbone_3d, apply_vfe, run_dense_head


class CenterPoint(nn.Module):
    model_cfg: Any
    num_class: int
    class_names: Sequence[str]
    grid_size: Sequence[int]  # (nx, ny, nz)
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
        # registry-driven assembly: each section's NAME selects the module
        # (≙ ref Detector3DTemplate.build_networks topology loop, :35-50)
        self.vfe = build_vfe(cfg["VFE"], ctx)
        self.backbone_3d = build_backbone_3d(cfg["BACKBONE_3D"], ctx)
        self.map_to_bev = build_map_to_bev(cfg["MAP_TO_BEV"], ctx)
        self.backbone_2d = build_backbone_2d(cfg["BACKBONE_2D"], ctx)
        self.dense_head = build_dense_head(
            cfg["DENSE_HEAD"], ctx,
            input_channels=self.backbone_2d.num_bev_features)

    def __call__(self, batch, train: bool = False):
        voxel_features = apply_vfe(self.vfe, batch, train=train)
        sp = SparseVoxels.create(
            features=voxel_features,
            coords=batch["voxel_coords"],
            valid=batch["voxel_valid"],
            batch_size=self.batch_size,
            spatial_shape=self.grid_size,
            voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
            with_index=False,  # MsSVT uses dense window tables only
        )
        sp = apply_backbone_3d(self.backbone_3d, sp, train=train)
        spatial_features = self.map_to_bev(sp, train=train)
        spatial_features_2d = self.backbone_2d(spatial_features, train=train)
        out = run_dense_head(
            self.dense_head, spatial_features_2d, batch,
            self.model_cfg.get("POST_PROCESSING"), train=train)
        out["feature_map_size"] = spatial_features_2d.shape[1:3]
        return out
