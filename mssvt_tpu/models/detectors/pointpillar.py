"""PointPillar detector (ref: pcdet/models/detectors/pointpillar.py:4-55).

PillarVFE → PointPillarScatter → BaseBEVBackbone → AnchorHeadSingle.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_2d.map_to_bev import PointPillarScatter
from ..backbones_3d.vfe import PillarVFE
from ..dense_heads.anchor_head import AnchorHeadSingle
from ..dense_heads.anchor_head_multi import AnchorHeadMulti
from .generic_post import post_process_anchor


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
        vfe_cfg = cfg["VFE"]
        self.vfe = PillarVFE(
            num_filters=tuple(vfe_cfg.get("NUM_FILTERS", [64])),
            voxel_size=tuple(self.voxel_size),
            point_cloud_range=tuple(self.point_cloud_range),
            use_norm=bool(vfe_cfg.get("USE_NORM", True)),
            use_absolute_xyz=bool(vfe_cfg.get("USE_ABSLOTE_XYZ",
                                              vfe_cfg.get("USE_ABSOLUTE_XYZ", True))),
            with_distance=bool(vfe_cfg.get("WITH_DISTANCE", False)),
        )
        num_pillar_features = int(vfe_cfg.get("NUM_FILTERS", [64])[-1])
        self.map_to_bev = PointPillarScatter(
            num_bev_features=num_pillar_features,
            grid_size=tuple(self.grid_size),
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
        head_cls = (AnchorHeadMulti if cfg["DENSE_HEAD"]["NAME"]
                    == "AnchorHeadMulti" else AnchorHeadSingle)
        self.dense_head = head_cls(
            model_cfg=cfg["DENSE_HEAD"],
            input_channels=self.backbone_2d.num_bev_features,
            num_class=self.num_class,
            class_names=tuple(self.class_names),
            grid_size=tuple(self.grid_size),
            point_cloud_range=tuple(self.point_cloud_range),
            dtype=self.dtype,
        )

    def __call__(self, batch, train: bool = False):
        pillar_features = self.vfe(
            batch["voxels"], batch["voxel_num_points"], batch["voxel_coords"],
            train=train,
        )
        pillar_features = pillar_features * batch["voxel_valid"][:, None]
        spatial = self.map_to_bev(
            pillar_features, batch["voxel_coords"], batch["voxel_valid"],
            self.batch_size,
        )
        spatial_2d = self.backbone_2d(spatial, train=train)
        preds = self.dense_head(spatial_2d, train=train)

        out = {"pred_dicts": preds}
        if train:
            targets = self.dense_head.assign_targets(batch["gt_boxes"])
            loss, tb = self.dense_head.get_loss(preds, targets)
            out["loss"] = loss
            out["tb_dict"] = tb
        else:
            boxes, scores = self.dense_head.generate_predicted_boxes(preds)
            fb, fs, fl, fm = post_process_anchor(
                boxes, scores, self.model_cfg["POST_PROCESSING"]
            )
            out.update({"final_boxes": fb, "final_scores": fs,
                        "final_labels": fl, "final_mask": fm})
        return out
