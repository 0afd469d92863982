"""Sparse CNN backbones (ref: pcdet/models/backbones_3d/spconv_backbone.py:69-284).

``VoxelBackBone8x`` / ``VoxelResBackBone8x``: the SECOND-style 4-stage 8x
sparse CNN, built on the TPU-native sparse conv engine (ops/sparse_conv.py)
instead of the external spconv library. Stage capacities are static (set via
``STAGE_CAPACITY_FRACTIONS`` or defaults): downsampling stages allocate a
fraction of the incoming capacity.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.sparse import SparseVoxels
from ...ops.sparse_conv import (
    build_strided_neighbor_table,
    build_subm_neighbor_table,
    downsample_output_sites,
    subm_conv_apply,
)
from ..model_utils.layers import MaskedBatchNorm


class SubMConvLayer(nn.Module):
    """SubMConv3d + BN + ReLU on a SparseVoxels, reusing a neighbor table."""

    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    use_relu: bool = True
    use_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sp: SparseVoxels, neighbor_rows, train: bool = False):
        k = int(np.prod(self.kernel_size))
        cin = sp.features.shape[1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k, cin, self.out_channels),
        )
        x = subm_conv_apply(sp.features.astype(self.dtype), neighbor_rows,
                            w.astype(self.dtype))
        if self.use_norm:
            x = MaskedBatchNorm(dtype=self.dtype, name="bn")(x, sp.valid, train)
        if self.use_relu:
            x = nn.relu(x)
        return sp.with_features(x * sp.valid[:, None])


class SparseConvDownLayer(nn.Module):
    """Strided SparseConv3d + BN + ReLU: new (downsampled) site set."""

    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (2, 2, 2)
    padding: Tuple[int, int, int] = (1, 1, 1)
    max_out: int = 0  # static output capacity (required)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sp: SparseVoxels, train: bool = False) -> SparseVoxels:
        assert self.max_out > 0
        out_coords, out_valid, out_shape = downsample_output_sites(
            sp.coords, sp.valid, sp.spatial_shape, self.kernel_size,
            self.stride, self.padding, self.max_out,
        )
        rows = build_strided_neighbor_table(
            sp.coords, sp.valid, sp.index, sp.spatial_shape,
            out_coords, out_valid, self.kernel_size, self.stride, self.padding,
        )
        k = int(np.prod(self.kernel_size))
        cin = sp.features.shape[1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k, cin, self.out_channels),
        )
        x = subm_conv_apply(sp.features.astype(self.dtype), rows,
                            w.astype(self.dtype))
        x = MaskedBatchNorm(dtype=self.dtype, name="bn")(x, out_valid, train)
        x = nn.relu(x) * out_valid[:, None]
        new_voxel_size = tuple(
            sp.voxel_size[i] * self.stride[i] for i in range(3)
        )
        return SparseVoxels.create(
            features=x, coords=out_coords, valid=out_valid,
            batch_size=sp.batch_size, spatial_shape=out_shape,
            voxel_size=new_voxel_size, point_cloud_range=sp.point_cloud_range,
        )


class _SubMStage(nn.Module):
    """N submanifold convs sharing one neighbor table."""

    channels: Sequence[int]
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sp: SparseVoxels, train: bool = False) -> SparseVoxels:
        rows = build_subm_neighbor_table(
            sp.coords, sp.valid, sp.index, sp.spatial_shape
        )
        if not self.residual:
            for i, c in enumerate(self.channels):
                sp = SubMConvLayer(c, dtype=self.dtype, name=f"subm_{i}")(
                    sp, rows, train
                )
            return sp
        # SparseBasicBlock pairs (ref: spconv_backbone.py:10-66)
        for i in range(0, len(self.channels), 2):
            identity = sp.features
            c = self.channels[i]
            sp = SubMConvLayer(c, dtype=self.dtype, name=f"res{i}_a")(sp, rows, train)
            sp = SubMConvLayer(c, use_relu=False, dtype=self.dtype,
                               name=f"res{i}_b")(sp, rows, train)
            sp = sp.with_features(
                nn.relu(sp.features + identity) * sp.valid[:, None]
            )
        return sp


class VoxelBackBone8x(nn.Module):
    """Ref: spconv_backbone.py:69-146. Returns the stride-8 SparseVoxels
    (after the extra z-down conv_out) for HeightCompression."""

    input_capacity: int  # static max voxels entering the backbone
    num_filters: Sequence[int] = (16, 32, 64, 64)
    out_channels: int = 128
    residual: bool = False
    capacity_fractions: Sequence[float] = (1.0, 0.8, 0.6, 0.4, 0.3)
    return_stages: bool = False  # also return {x_conv1..x_conv4} (VoxelRCNN/PV-RCNN multi-scale)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sp: SparseVoxels, train: bool = False):
        caps = [max(int(self.input_capacity * f), 64) for f in self.capacity_fractions]
        f = self.num_filters
        stages = {}

        # conv_input + conv1 (stride 1)
        sp = _SubMStage((f[0],), dtype=self.dtype, name="conv_input")(sp, train)
        sp = _SubMStage((f[0],) * (2 if self.residual else 1),
                        residual=self.residual, dtype=self.dtype,
                        name="conv1")(sp, train)
        stages["x_conv1"] = sp

        # conv2..conv4: strided down + 2 subm convs each
        for i, (c, cap) in enumerate(zip(f[1:], caps[1:4]), start=2):
            # padding tuples are (x, y, z); ref conv4 zero-pads z only
            pad = (1, 1, 1) if i < 4 else (1, 1, 0)
            sp = SparseConvDownLayer(
                c, stride=(2, 2, 2), padding=pad, max_out=cap,
                dtype=self.dtype, name=f"conv{i}_down",
            )(sp, train)
            sp = _SubMStage((c, c), residual=self.residual, dtype=self.dtype,
                            name=f"conv{i}_subm")(sp, train)
            stages[f"x_conv{i}"] = sp

        # conv_out: (3,1,1) stride (2,1,1) z-compression (ref :129-137)
        sp = SparseConvDownLayer(
            self.out_channels, kernel_size=(1, 1, 3), stride=(1, 1, 2),
            padding=(0, 0, 0), max_out=caps[4], dtype=self.dtype,
            name="conv_out",
        )(sp, train)
        if self.return_stages:
            return sp, stages
        return sp


class VoxelResBackBone8x(VoxelBackBone8x):
    """Residual variant (ref: spconv_backbone.py:~150 VoxelResBackBone8x):
    SparseBasicBlock pairs instead of plain subm convs."""

    residual: bool = True
