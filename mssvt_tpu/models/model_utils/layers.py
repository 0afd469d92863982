"""Small shared layers (DropPath, position-embedding MLP)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class DropPath(nn.Module):
    """Stochastic depth, per leading-axis row (timm DropPath equivalent).

    The reference applies timm's DropPath to the flat (N, C) voxel feature
    tensor (ref: mssvt_backbone.py:42,338-340), which drops each voxel row
    independently with probability ``rate`` and rescales by 1/(1-rate).
    """

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        import jax

        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x * mask / keep


class PosProjection(nn.Module):
    """Position-embedding MLP over (rel_xyz ++ window_center_xyz) = 6 dims.

    Equivalent of the reference's 1x1-Conv1d stacks
    (ref: mssvt_backbone.py:43-54): one Dense+ReLU for two-scale blocks,
    Dense+ReLU+Dense+ReLU for single-scale blocks. A kernel-size-1 Conv1d is
    exactly a Dense applied token-wise.
    """

    channels: int
    deep: bool = False  # True for single-scale (compress) blocks
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (..., 6)
        x = nn.relu(nn.Dense(self.channels, dtype=self.dtype, name="proj0")(x))
        if self.deep:
            x = nn.relu(nn.Dense(self.channels, dtype=self.dtype, name="proj1")(x))
        return x
