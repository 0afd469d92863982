"""SECOND detector (ref: pcdet/models/detectors/second_net.py:4-55).

MeanVFE → VoxelBackBone8x (TPU sparse conv engine) → HeightCompression →
BaseBEVBackbone → AnchorHeadSingle.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...core.sparse import SparseVoxels
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_3d.spconv_backbone import VoxelBackBone8x
from ..backbones_3d.vfe import MeanVFE
from ..dense_heads.anchor_head import AnchorHeadSingle
from ..dense_heads.anchor_head_multi import AnchorHeadMulti
from .generic_post import post_process_anchor


class SECONDNet(nn.Module):
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
        self.vfe = MeanVFE(num_point_features=0)
        b3d = cfg["BACKBONE_3D"]
        self.backbone_3d = VoxelBackBone8x(
            input_capacity=self.max_voxels * self.batch_size,
            num_filters=tuple(b3d.get("NUM_FILTERS", [16, 32, 64, 64])),
            out_channels=int(b3d.get("OUT_CHANNELS", 128)),
            residual=b3d.get("NAME") == "VoxelResBackBone8x",
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
        voxel_features = self.vfe(batch["voxels"], batch["voxel_num_points"])
        sp = SparseVoxels.create(
            features=voxel_features, coords=batch["voxel_coords"],
            valid=batch["voxel_valid"], batch_size=self.batch_size,
            spatial_shape=self.grid_size, voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
        )
        sp = self.backbone_3d(sp, train=train)
        spatial = sp.bev()  # (B, H, W, D*C) at stride 8
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
