"""CaDDN monocular detector (ref: pcdet/models/detectors/caddn.py).

Camera-only pipeline: ImageVFE (depth-distribution FFN + frustum→voxel
sampling) → Conv2DCollapse BEV → BaseBEVBackbone → AnchorHeadSingle, with
the depth-distribution focal loss on projected lidar depth maps when
present (ref: ffn/ddn_loss/ddn_loss.py — here a CE on binned GT depth).

Batch inputs: images (B, H, W, 3), trans_lidar_to_cam (B, 4, 4),
trans_cam_to_img (B, 3, 4), optional depth_maps (B, h, w) for the depth
loss, gt_boxes for the RPN loss.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_2d.map_to_bev import Conv2DCollapse
from ..backbones_3d.image_vfe import ImageVFE, bin_depths_lid
from ..dense_heads.anchor_head import AnchorHeadSingle
from .generic_post import post_process_anchor


class CaDDN(nn.Module):
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
        self.vfe = ImageVFE(
            model_cfg=cfg["VFE"],
            grid_size=tuple(int(g) for g in self.grid_size),
            voxel_size=tuple(self.voxel_size),
            point_cloud_range=tuple(self.point_cloud_range),
            dtype=self.dtype,
        )
        m2b = cfg["MAP_TO_BEV"]
        self.map_to_bev = Conv2DCollapse(
            num_bev_features=int(m2b["NUM_BEV_FEATURES"]), dtype=self.dtype)
        b2d = cfg["BACKBONE_2D"]
        self.backbone_2d = BaseBEVBackbone(
            layer_nums=tuple(b2d["LAYER_NUMS"]),
            layer_strides=tuple(b2d["LAYER_STRIDES"]),
            num_filters=tuple(b2d["NUM_FILTERS"]),
            upsample_strides=tuple(b2d.get("UPSAMPLE_STRIDES", [])),
            num_upsample_filters=tuple(b2d.get("NUM_UPSAMPLE_FILTERS", [])),
            dtype=self.dtype,
        )
        self.dense_head = AnchorHeadSingle(
            model_cfg=cfg["DENSE_HEAD"],
            input_channels=self.backbone_2d.num_bev_features,
            num_class=self.num_class,
            class_names=tuple(self.class_names),
            grid_size=tuple(self.grid_size),
            point_cloud_range=tuple(self.point_cloud_range),
            dtype=self.dtype,
        )

    def depth_loss(self, depth_logits, depth_maps, gt_boxes2d=None):
        """Focal depth-distribution loss with fg/bg balancing
        (ref: ffn/ddn_loss/ddn_loss.py + balancer.py; see
        image_vfe.ddn_loss)."""
        from ..backbones_3d.image_vfe import ddn_loss

        vfe_cfg = self.model_cfg["VFE"]
        disc = vfe_cfg.get("DISCRETIZE", {})
        args = vfe_cfg.get("FFN", {}).get("LOSS", {}).get("ARGS", {})
        loss, _ = ddn_loss(
            depth_logits, depth_maps,
            d_min=float(disc.get("DEPTH_MIN", 2.0)),
            d_max=float(disc.get("DEPTH_MAX", 46.8)),
            n_bins=int(disc.get("NUM_BINS", 80)),
            gt_boxes2d=gt_boxes2d,
            alpha=float(args.get("alpha", 0.25)),
            gamma=float(args.get("gamma", 2.0)),
            fg_weight=float(args.get("fg_weight", 13.0)),
            bg_weight=float(args.get("bg_weight", 1.0)),
        )
        return loss

    def __call__(self, batch, train: bool = False):
        vox, depth_logits = self.vfe(
            batch["images"], batch["trans_lidar_to_cam"],
            batch["trans_cam_to_img"], train=train,
        )
        bev = self.map_to_bev(vox, train=train)
        spatial_2d = self.backbone_2d(bev, train=train)
        preds = self.dense_head(spatial_2d, train=train)

        out = {"pred_dicts": preds}
        if train:
            targets = self.dense_head.assign_targets(batch["gt_boxes"])
            loss, tb = self.dense_head.get_loss(preds, targets)
            if "depth_maps" in batch:
                dl = self.depth_loss(depth_logits, batch["depth_maps"],
                                     batch.get("gt_boxes2d"))
                loss = loss + dl * float(
                    self.model_cfg["VFE"].get("LOSS_WEIGHT", 3.0))
                tb["depth_loss"] = dl
            out["loss"] = loss
            out["tb_dict"] = tb
        else:
            boxes, scores = self.dense_head.generate_predicted_boxes(preds)
            fb, fs, fl, fm = post_process_anchor(
                boxes, scores, self.model_cfg["POST_PROCESSING"])
            out.update({"final_boxes": fb, "final_scores": fs,
                        "final_labels": fl, "final_mask": fm})
        return out
