"""Point feature extraction: VoxelSetAbstraction (PV-RCNN keypoint branch).

Rebuild of ref pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py:124-411:
FPS keypoints from raw points, then aggregate multi-source features per
keypoint — raw points (SA over points), multi-scale sparse conv outputs (SA
over voxel centers), and bilinear BEV features — concatenated and fused by a
linear layer.

Static-shape version: each source grouping is a ball_query over padded
per-sample tensors; the "stacked" ragged batching of the reference collapses
into (B, N, ...) tensors with validity masks.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..model_utils.layers import BatchNorm

from ...ops.pointnet2 import query_and_group
from ...ops.sampling import (
    farthest_point_sample,
    gather_along_batch,
    sample_points_with_roi,
    sector_fps,
)
from ..roi_heads.bev_grid_head import bilinear_sample_bev
from .pointnet2_backbone import SharedMLP


class VoxelSetAbstraction(nn.Module):
    model_cfg: Any
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    num_keypoints: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points_xyz, points_feat, points_valid, sources: Dict,
                 bev_features=None, bev_stride=8, rois=None, roi_valid=None,
                 train: bool = False):
        """
        Args:
            points_xyz: (B, N, 3) raw points (padded, origin-filled).
            points_feat: (B, N, C_pt) extra point features (may be None).
            sources: {name: (xyz (B, M, 3), feats (B, M, C), valid (B, M))}
                from sparse conv stages (voxel centers in metric space).
            bev_features: (B, H, W, C_bev) NHWC.
            rois/roi_valid: (B, R, 7+)/(B, R) RPN proposals — used only by
                SAMPLE_METHOD: SPC (sectorized proposal-centric keypoint
                sampling, ref: voxel_set_abstraction.py:45-121).

        Returns keypoints (B, K, 3), keypoint features (B, K, C_out).
        """
        cfg = self.model_cfg
        method = str(cfg.get("SAMPLE_METHOD", "FPS")).upper()
        if method == "SPC":
            spc = cfg.get("SPC_SAMPLING", {})
            valid = points_valid
            if rois is not None:
                valid = sample_points_with_roi(
                    points_xyz, valid, rois[..., :7], roi_valid,
                    float(spc.get("SAMPLE_RADIUS_WITH_ROI", 1.6)),
                )
            fps_idx = sector_fps(
                points_xyz, valid, self.num_keypoints,
                int(spc.get("NUM_SECTORS", 6)),
            )
        else:
            fps_idx = farthest_point_sample(points_xyz, self.num_keypoints)
        keypoints = gather_along_batch(points_xyz, fps_idx)  # (B, K, 3)

        feats = []
        sa_cfg = cfg["SA_LAYER"]
        if bev_features is not None:
            bev = bilinear_sample_bev(
                bev_features, keypoints[..., :2], self.point_cloud_range,
                (self.voxel_size[0] * bev_stride, self.voxel_size[1] * bev_stride),
            )
            feats.append(bev)

        if "raw_points" in dict(sa_cfg):
            scfg = sa_cfg["raw_points"]
            outs = []
            for i, (r, ns, mlp) in enumerate(zip(
                scfg["POOL_RADIUS"], scfg["NSAMPLE"], scfg["MLPS"],
            )):
                grouped, empty = query_and_group(
                    float(r), int(ns), points_xyz, keypoints, points_feat,
                    points_valid,
                )
                h = SharedMLP(tuple(mlp), dtype=self.dtype,
                              name=f"raw_mlp_{i}")(grouped, train=train)
                outs.append(jnp.max(h, axis=2) * (~empty)[..., None])
            feats.append(jnp.concatenate(outs, axis=-1))

        for name, (sx, sf, sv) in sources.items():
            scfg = sa_cfg[name]
            outs = []
            use_vp = str(scfg.get("NAME", "")).startswith("VectorPool")
            for i, (r, ns, mlp) in enumerate(zip(
                scfg["POOL_RADIUS"], scfg["NSAMPLE"], scfg["MLPS"],
            )):
                if use_vp:
                    # PV-RCNN++ vector-pool aggregation (ref:
                    # vector_pool_gpu.cu + pointnet2_utils
                    # VectorPoolAggregationModuleMSG)
                    from ...ops.pointnet2 import vector_pool

                    pooled, empty = vector_pool(
                        keypoints, sx, sf, sv, float(r), int(ns),
                        grid=int(scfg.get("GRID_SIZE", 2)),
                    )
                    h = nn.Dense(int(mlp[-1]), use_bias=False,
                                 dtype=self.dtype,
                                 name=f"{name}_vp_fc_{i}")(pooled)
                    h = BatchNorm(use_running_average=not train,
                                     momentum=0.99, epsilon=1e-3,
                                     dtype=self.dtype,
                                     name=f"{name}_vp_bn_{i}")(h)
                    outs.append(nn.relu(h) * (~empty)[..., None])
                    continue
                grouped, empty = query_and_group(
                    float(r), int(ns), sx, keypoints, sf, sv,
                )
                h = SharedMLP(tuple(mlp), dtype=self.dtype,
                              name=f"{name}_mlp_{i}")(grouped, train=train)
                outs.append(jnp.max(h, axis=2) * (~empty)[..., None])
            feats.append(jnp.concatenate(outs, axis=-1))

        kp_feat = jnp.concatenate(feats, axis=-1)
        out_c = int(cfg["NUM_OUTPUT_FEATURES"])
        fused = nn.Dense(out_c, use_bias=False, dtype=self.dtype,
                         name="vsa_point_fc")(kp_feat)
        fused = BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype, name="vsa_bn")(fused)
        fused = nn.relu(fused)
        return keypoints, fused.astype(jnp.float32), kp_feat.astype(jnp.float32)
