"""Multi-scale dense BEV backbone (ref: pcdet/models/backbones_2d/base_bev_backbone.py:6-114).

Down blocks (strided Conv + N conv layers) + transposed-conv up blocks,
concatenated. NHWC layout; BatchNorm eps/momentum match the reference
(eps=1e-3, momentum=0.01 torch ≙ 0.99 flax).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..model_utils.layers import BatchNorm


def _bn(train: bool, dtype, name: str):
    # torch BatchNorm2d(momentum=0.01) ≙ flax BatchNorm(momentum=0.99)
    return BatchNorm(
        use_running_average=not train, momentum=0.99, epsilon=1e-3,
        dtype=dtype, name=name,
    )


class BaseBEVBackbone(nn.Module):
    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    upsample_strides: Sequence[int] = ()
    num_upsample_filters: Sequence[int] = ()
    dtype: Any = jnp.float32

    @property
    def num_bev_features(self) -> int:
        if self.num_upsample_filters:
            c = sum(self.num_upsample_filters)
        else:
            c = self.num_filters[-1]
        return c

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        num_levels = len(self.layer_nums)
        ups = []
        for i in range(num_levels):
            # reference uses ZeroPad2d(1) + valid conv ≙ SAME-ish padding (1,1)
            x = nn.Conv(
                self.num_filters[i], (3, 3),
                strides=(self.layer_strides[i], self.layer_strides[i]),
                padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                name=f"block{i}_conv0",
            )(x)
            x = nn.relu(_bn(train, self.dtype, f"block{i}_bn0")(x))
            for k in range(self.layer_nums[i]):
                x = nn.Conv(
                    self.num_filters[i], (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name=f"block{i}_conv{k + 1}",
                )(x)
                x = nn.relu(_bn(train, self.dtype, f"block{i}_bn{k + 1}")(x))

            if self.upsample_strides:
                s = self.upsample_strides[i]
                if s >= 1:
                    u = nn.ConvTranspose(
                        self.num_upsample_filters[i], (s, s), strides=(s, s),
                        use_bias=False, dtype=self.dtype, name=f"deblock{i}_conv",
                    )(x)
                else:
                    s_inv = int(np.round(1 / s))
                    u = nn.Conv(
                        self.num_upsample_filters[i], (s_inv, s_inv),
                        strides=(s_inv, s_inv), use_bias=False,
                        dtype=self.dtype, name=f"deblock{i}_conv",
                    )(x)
                u = nn.relu(_bn(train, self.dtype, f"deblock{i}_bn")(u))
                ups.append(u)
            else:
                ups.append(x)

        if len(ups) > 1:
            # odd input sizes make ConvTranspose overshoot by one pixel
            # (59*2=118 vs 117); crop to the smallest map. The torch
            # reference has the same constraint and simply requires even
            # grids — the crop keeps odd grids usable.
            min_h = min(u.shape[1] for u in ups)
            min_w = min(u.shape[2] for u in ups)
            ups = [u[:, :min_h, :min_w] for u in ups]
            out = jnp.concatenate(ups, axis=-1)
        else:
            out = ups[0]

        if len(self.upsample_strides) > num_levels:
            s = self.upsample_strides[-1]
            out = nn.ConvTranspose(
                out.shape[-1], (s, s), strides=(s, s), use_bias=False,
                dtype=self.dtype, name="deblock_extra_conv",
            )(out)
            out = nn.relu(_bn(train, self.dtype, "deblock_extra_bn")(out))
        return out.astype(jnp.float32)
