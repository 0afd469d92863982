"""UNetV2 sparse-conv UNet (ref: pcdet/models/backbones_3d/spconv_unet.py:49-212).

Encoder = the VoxelBackBone8x stage stack; decoder walks back up through the
encoder's OWN site sets (skip connections fix the fine sites, so spconv's
SparseInverseConv3d becomes a plain gather over the transposed neighbor
table — ``build_inverse_neighbor_table``). Per level the reference's
``UR_block_forward``: transform the lateral skip, concat with the bottom
features, merge-conv, residual channel-reduce add, inverse-conv up.

Outputs: ``point_features`` (V_in, C) at the input (stride-1) site set for
the point head / PartA2 seg, plus the stride-8 SparseVoxels for the BEV path
(same contract as VoxelBackBone8x).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.sparse import SparseVoxels
from ...ops.sparse_conv import (
    build_inverse_neighbor_table,
    build_subm_neighbor_table,
    subm_conv_apply,
)
from .spconv_backbone import SparseConvDownLayer, SubMConvLayer, _SubMStage


class UNetV2(nn.Module):
    input_capacity: int
    num_filters: Sequence[int] = (16, 32, 64, 64)
    out_channels: int = 128
    return_encoded: bool = True  # also return the stride-8 tensor for BEV
    capacity_fractions: Sequence[float] = (1.0, 0.8, 0.6, 0.4, 0.3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sp: SparseVoxels, train: bool = False):
        caps = [max(int(self.input_capacity * f), 64)
                for f in self.capacity_fractions]
        f = list(self.num_filters)
        strides = []  # (kernel, stride, padding) per down level

        # ---- encoder (identical staging to VoxelBackBone8x) ----
        sp = _SubMStage((f[0],), dtype=self.dtype, name="conv_input")(sp, train)
        sp = _SubMStage((f[0],), dtype=self.dtype, name="conv1")(sp, train)
        stages = [sp]
        for i, (c, cap) in enumerate(zip(f[1:], caps[1:4]), start=2):
            pad = (1, 1, 1) if i < 4 else (1, 1, 0)
            sp = SparseConvDownLayer(
                c, stride=(2, 2, 2), padding=pad, max_out=cap,
                dtype=self.dtype, name=f"conv{i}_down",
            )(sp, train)
            sp = _SubMStage((c, c), dtype=self.dtype, name=f"conv{i}_subm")(sp, train)
            stages.append(sp)
            strides.append(((3, 3, 3), (2, 2, 2), pad))

        encoded = None
        if self.return_encoded:
            encoded = SparseConvDownLayer(
                self.out_channels, kernel_size=(1, 1, 3), stride=(1, 1, 2),
                padding=(0, 0, 0), max_out=caps[4], dtype=self.dtype,
                name="conv_out",
            )(sp, train)

        # ---- decoder (ref UR_block_forward per level, :120-150) ----
        x = stages[-1]  # bottom features start at the deepest stage
        for lvl in range(len(stages) - 1, 0, -1):
            lateral = stages[lvl]
            finer = stages[lvl - 1]
            c_out = finer.features.shape[-1]
            c_here = lateral.features.shape[-1]

            rows = build_subm_neighbor_table(
                lateral.coords, lateral.valid, lateral.index,
                lateral.spatial_shape)
            x_trans = SubMConvLayer(
                c_here, dtype=self.dtype, name=f"up{lvl}_t")(
                lateral, rows, train).features
            cat = jnp.concatenate([x.features, x_trans], axis=-1)
            x_m = SubMConvLayer(
                c_here, dtype=self.dtype, name=f"up{lvl}_m")(
                lateral.with_features(cat), rows, train).features
            # channel reduction of the concat (ref channel_reduction: view +
            # sum over the channel-ratio axis) + residual merge
            ratio = cat.shape[-1] // c_here
            red = cat.reshape(cat.shape[0], c_here, ratio).sum(-1)
            merged = x_m + red

            ks, st, pad = strides[lvl - 1]
            inv_rows = build_inverse_neighbor_table(
                finer.coords, finer.valid, lateral.index,
                lateral.spatial_shape, ks, st, pad)
            k = int(np.prod(ks))
            w = self.param(
                f"up{lvl}_inv_kernel",
                nn.initializers.variance_scaling(
                    1.0, "fan_in", "truncated_normal"),
                (k, c_here, c_out),
            )
            up = subm_conv_apply(
                merged.astype(self.dtype), inv_rows, w.astype(self.dtype))
            up = nn.LayerNorm(dtype=self.dtype, name=f"up{lvl}_ln")(up)
            up = nn.relu(up) * finer.valid[:, None]
            x = finer.with_features(up)

        point_features = nn.Dense(
            int(f[0]), dtype=self.dtype, name="conv5_out")(x.features)
        point_features = point_features.astype(jnp.float32) * x.valid[:, None]
        return encoded, x.with_features(point_features)
