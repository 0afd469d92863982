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
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_2d.map_to_bev import HeightCompression
from ..backbones_3d.mssvt import MixedScaleSparseTransformer
from ..backbones_3d.vfe import MeanVFE
from ..dense_heads.center_head import CenterHead


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
        vfe_cfg = cfg["VFE"]
        assert vfe_cfg["NAME"] == "MeanVFE", vfe_cfg["NAME"]
        self.vfe = MeanVFE(num_point_features=0)

        b3d = cfg["BACKBONE_3D"]
        assert b3d["NAME"] == "MixedScaleSparseTransformer"
        self.backbone_3d = MixedScaleSparseTransformer(
            params_cfg=tuple(dict(p) for p in b3d["PARAMS"]), dtype=self.dtype,
        )
        self.backbone_3d_out_stride = self._infer_3d_stride(b3d["PARAMS"])

        m2b = cfg["MAP_TO_BEV"]
        assert m2b["NAME"] == "HeightCompression"
        self.map_to_bev = HeightCompression(
            num_bev_features=int(m2b["NUM_BEV_FEATURES"]),
            compress_layer_nums=int(m2b.get("COMPRESS_LAYER_NUMS", 3)),
            layer_strides=tuple(m2b.get("LAYER_STRIDES", [1, 1, 1])),
            layer_dilations=tuple(m2b.get("LAYER_DIALATIONS", [1, 1, 2])),
            layer_paddings=tuple(m2b.get("LAYER_PADDINGS", [1, 1, 2])),
            dtype=self.dtype,
        )

        b2d = cfg["BACKBONE_2D"]
        self.backbone_2d = BaseBEVBackbone(
            layer_nums=tuple(b2d["LAYER_NUMS"]),
            layer_strides=tuple(b2d["LAYER_STRIDES"]),
            num_filters=tuple(b2d["NUM_FILTERS"]),
            upsample_strides=tuple(b2d.get("UPSAMPLE_STRIDES", [])),
            num_upsample_filters=tuple(b2d.get("NUM_UPSAMPLE_FILTERS", [])),
            dtype=self.dtype,
        )

        self.dense_head = CenterHead(
            model_cfg=cfg["DENSE_HEAD"],
            input_channels=self.backbone_2d.num_bev_features,
            num_class=self.num_class,
            class_names=tuple(self.class_names),
            grid_size=tuple(self.grid_size),
            point_cloud_range=tuple(self.point_cloud_range),
            voxel_size=tuple(self.voxel_size),
            dtype=self.dtype,
        )

    @staticmethod
    def _infer_3d_stride(params):
        """Product of compress-block window xy strides (assumes isotropic xy)."""
        s = 1
        for p in params:
            if p["name"] == "MixedScaleSparseTransformerCompressBlock":
                s *= int(p["window_size"][0][0])
        return s

    def __call__(self, batch, train: bool = False):
        voxel_features = self.vfe(batch["voxels"], batch["voxel_num_points"])
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
        sp = self.backbone_3d(sp, deterministic=not train)
        spatial_features = self.map_to_bev(sp, train=train)
        spatial_features_2d = self.backbone_2d(spatial_features, train=train)
        pred_dicts = self.dense_head(spatial_features_2d, train=train)

        out = {"pred_dicts": pred_dicts,
               "feature_map_size": spatial_features_2d.shape[1:3]}
        if train:
            target_dicts = self.dense_head.assign_targets(
                batch["gt_boxes"], feature_map_size=spatial_features_2d.shape[1:3]
            )
            loss, tb = self.dense_head.get_loss(pred_dicts, target_dicts)
            out["loss"] = loss
            out["tb_dict"] = tb
        else:
            boxes, scores, labels, mask = self.dense_head.generate_predicted_boxes(
                pred_dicts
            )
            out["final_boxes"] = boxes
            out["final_scores"] = scores
            out["final_labels"] = labels
            out["final_mask"] = mask
        return out
