"""Sparse-3D → dense-BEV conversion modules.

- :class:`HeightCompression` ≙ ref
  pcdet/models/backbones_2d/map_to_bev/height_compression.py:5-51, including
  the MsSVT-repo extension: an optional Conv+BN+ReLU compress stack with
  per-layer stride/dilation/padding.
- :class:`PointPillarScatter` ≙ ref map_to_bev/pointpillar_scatter.py:5.

TPU-native notes: NHWC layout throughout (XLA's preferred conv layout); the
densify is a single direct BEV scatter (see SparseVoxels.bev) instead of a 5D
densify + reshape; bf16 compute is a dtype policy rather than autocast.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..model_utils.layers import BatchNorm

from ...core.sparse import SparseVoxels


class HeightCompression(nn.Module):
    num_bev_features: int
    compress_layer_nums: int = 3
    layer_strides: Sequence[int] = (1, 1, 1)
    layer_dilations: Sequence[int] = (1, 1, 2)
    layer_paddings: Sequence[int] = (1, 1, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sp: SparseVoxels, train: bool = False) -> jnp.ndarray:
        x = sp.bev()  # (B, H, W, D*C)
        assert x.shape[-1] == self.num_bev_features, (
            f"BEV feature dim {x.shape[-1]} != NUM_BEV_FEATURES "
            f"{self.num_bev_features}"
        )
        x = x.astype(self.dtype)
        for i in range(self.compress_layer_nums):
            s, d, p = (
                self.layer_strides[i],
                self.layer_dilations[i],
                self.layer_paddings[i],
            )
            x = nn.Conv(
                self.num_bev_features, (3, 3), strides=(s, s),
                padding=[(p, p), (p, p)], kernel_dilation=(d, d),
                use_bias=False, dtype=self.dtype, name=f"compress_conv_{i}",
            )(x)
            x = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"compress_bn_{i}",
            )(x)
            x = nn.relu(x)
        return x.astype(jnp.float32)  # (B, H, W, C_bev)


class PointPillarScatter(nn.Module):
    """Scatter pillar features onto the BEV canvas (ref: pointpillar_scatter.py)."""

    num_bev_features: int
    grid_size: Sequence[int]  # (nx, ny, nz) with nz == 1

    def __call__(self, pillar_features: jnp.ndarray, coords: jnp.ndarray,
                 valid: jnp.ndarray, batch_size: int) -> jnp.ndarray:
        nx, ny, nz = (int(g) for g in self.grid_size)
        assert nz == 1
        out = jnp.zeros((batch_size, ny, nx, self.num_bev_features),
                        pillar_features.dtype)
        b, _, y, x = (coords[:, i] for i in range(4))
        b = jnp.where(valid, b, batch_size)
        return out.at[b, y, x].set(pillar_features, mode="drop")


class Conv2DCollapse(nn.Module):
    """Collapse a dense (B, X, Y, Z, C) camera-voxel grid to BEV
    (ref: map_to_bev/conv2d_collapse.py:7 — channel-stack z then 1x1 conv
    with BasicBlock2D)."""

    num_bev_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, voxel_features: jnp.ndarray, train: bool = False):
        b, gx, gy, gz, c = voxel_features.shape
        # (B, Y, X, Z*C): BEV layout matches SparseVoxels.bev()
        x = jnp.transpose(voxel_features, (0, 2, 1, 3, 4)).reshape(
            b, gy, gx, gz * c).astype(self.dtype)
        x = nn.Conv(self.num_bev_features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="collapse_conv")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="collapse_bn")(x)
        return nn.relu(x).astype(jnp.float32)
