"""Small shared layers (DropPath, position-embedding MLP)."""

from __future__ import annotations

from typing import Any

import jax
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


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid rows of a padded (V, C) feature array.

    The reference applies BatchNorm1d to dynamic (N, C) sparse features
    (spconv norm layers); with static padding the statistics must exclude
    padding rows or they drift toward zero with occupancy.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray, train: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            w = valid.astype(jnp.float32)[:, None]
            n = jnp.clip(w.sum(), 1.0)
            mean = (x * w).sum(0) / n
            var = ((x - mean) ** 2 * w).sum(0) / n
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y * valid[:, None]


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
