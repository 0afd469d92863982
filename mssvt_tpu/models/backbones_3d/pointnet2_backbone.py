"""PointNet++ modules and the point-based backbone.

Rebuild of ref pcdet/models/backbones_3d/pointnet2_backbone.py:9-206 and
ops/pointnet2/pointnet2_batch/pointnet2_modules.py: multi-scale-grouping Set
Abstraction (FPS centers + ball-query grouping + shared MLP + maxpool) and
Feature Propagation (3-NN inverse-distance upsampling + MLP), in flax with
static shapes and validity masks.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..model_utils.layers import BatchNorm

from ...ops.pointnet2 import query_and_group
from ...ops.sampling import farthest_point_sample, gather_along_batch, three_interpolate, three_nn


class SharedMLP(nn.Module):
    """Pointwise Dense+BN+ReLU stack (≙ Conv2d-1x1 stacks in the reference)."""

    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"mlp_{i}")(x)
            x = BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, name=f"bn_{i}",
            )(x)
            x = nn.relu(x)
        return x


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (pointnet2_modules.py:10-100)."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, xyz_valid=None, train: bool = False):
        """xyz (B, N, 3); features (B, N, C) → new_xyz (B, npoint, 3),
        new_features (B, npoint, sum(mlp[-1]))."""
        # FPS over xyz (padding should sit at origin; callers mask after)
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = gather_along_batch(xyz, fps_idx)

        outs = []
        for i, (r, ns, mlp) in enumerate(zip(self.radii, self.nsamples, self.mlps)):
            grouped, empty = query_and_group(
                r, ns, xyz, new_xyz, features, xyz_valid, self.use_xyz
            )  # (B, M, ns, 3+C)
            h = SharedMLP(tuple(mlp), dtype=self.dtype, name=f"mlp_g{i}")(
                grouped, train=train
            )
            h = jnp.max(h, axis=2)  # (B, M, mlp[-1])
            outs.append(h * (~empty)[..., None])
        return new_xyz, jnp.concatenate(outs, axis=-1), fps_idx


class FPModule(nn.Module):
    """Feature propagation (pointnet2_modules.py upsampling path)."""

    mlp: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats, known_feats,
                 train: bool = False):
        d2, idx = three_nn(unknown_xyz, known_xyz)
        # ref FP module: dist_recip = 1 / (sqrt(d2) + 1e-8) — inverse L2
        # distance (the torch three_nn wrapper sqrt's the kernel's squared
        # output; ref: pointnet2_batch/pointnet2_modules.py:153-156)
        w = 1.0 / (jnp.sqrt(d2) + 1e-8)
        w = w / w.sum(-1, keepdims=True)
        interp = three_interpolate(known_feats, idx, w)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(tuple(self.mlp), dtype=self.dtype, name="mlp")(
            interp, train=train
        )


class PointNet2MSG(nn.Module):
    """Point-based encoder-decoder backbone (ref: pointnet2_backbone.py:9-95).

    Config: SA_CONFIG with NPOINTS/RADIUS/NSAMPLE/MLPS lists and FP_MLPS.
    Input: per-sample points (B, N, 3 + C). Output: per-point features
    (B, N, FP_MLPS[0][-1]).
    """

    model_cfg: Any
    input_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, xyz_valid=None, train: bool = False):
        sa_cfg = self.model_cfg["SA_CONFIG"]
        npoints = list(sa_cfg["NPOINTS"])
        radii = list(sa_cfg["RADIUS"])
        nsamples = list(sa_cfg["NSAMPLE"])
        mlps = [list(m) for m in sa_cfg["MLPS"]]
        fp_mlps = [list(m) for m in self.model_cfg["FP_MLPS"]]

        xyz_list = [xyz]
        feat_list = [features]
        valid_list = [xyz_valid]
        for i, np_i in enumerate(npoints):
            new_xyz, new_feat, _ = SAModuleMSG(
                npoint=int(np_i), radii=tuple(radii[i]),
                nsamples=tuple(nsamples[i]), mlps=tuple(tuple(m) for m in mlps[i]),
                dtype=self.dtype, name=f"sa_{i}",
            )(xyz_list[-1], feat_list[-1], valid_list[-1], train=train)
            xyz_list.append(new_xyz)
            feat_list.append(new_feat)
            valid_list.append(None)

        # FP decoding from coarsest back to the input resolution
        for i in range(len(fp_mlps) - 1, -1, -1):
            feat_list[i] = FPModule(tuple(fp_mlps[i]), dtype=self.dtype,
                                    name=f"fp_{i}")(
                xyz_list[i], xyz_list[i + 1], feat_list[i], feat_list[i + 1],
                train=train,
            )
        return feat_list[0]  # (B, N, C_out)
