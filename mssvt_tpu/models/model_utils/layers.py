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


def BatchNorm(**kw):
    """flax BatchNorm bound to the active SyncBN axis (see syncbn.py).

    Under the sharded train step the construction-time context supplies
    ``axis_name`` so batch statistics sync across the data mesh — the
    reference's SyncBN conversion (ref: train.py:118-119). Outside that
    context it is a plain local BatchNorm.
    """
    from . import syncbn

    kw.setdefault("axis_name", syncbn.bn_axis())
    return nn.BatchNorm(**kw)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid rows of a padded (V, C) feature array.

    The reference applies BatchNorm1d to dynamic (N, C) sparse features
    (spconv norm layers); with static padding the statistics must exclude
    padding rows or they drift toward zero with occupancy.

    Under :func:`syncbn.sync_bn` the sums AND counts are psum'd over the
    data axis, giving EXACT global statistics even when devices hold
    unequal valid-voxel counts (stronger than mean-of-means SyncBN).
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray, train: bool = False):
        from . import syncbn

        axis = syncbn.bn_axis()
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            w = valid.astype(jnp.float32)[:, None]
            xf = x.astype(jnp.float32)
            n = w.sum()
            sum_x = (xf * w).sum(0)
            sum_x2 = (xf * xf * w).sum(0)
            if axis is not None:
                n = jax.lax.psum(n, axis)
                sum_x = jax.lax.psum(sum_x, axis)
                sum_x2 = jax.lax.psum(sum_x2, axis)
            n = jnp.clip(n, 1.0)
            mean = sum_x / n
            var = jnp.clip(sum_x2 / n - mean * mean, 0.0)
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

    def setup(self):
        self.proj0 = nn.Dense(self.channels, dtype=self.dtype)
        if self.deep:
            self.proj1 = nn.Dense(self.channels, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (..., 6)
        x = nn.relu(self.proj0(x))
        if self.deep:
            x = nn.relu(self.proj1(x))
        return x

    def rel_kernel(self):
        """(3, C) relative-coordinate rows of the shallow Dense kernel —
        consumed by the assembled attention kernel together with
        ``base_from_centers`` (pallas_attention.py)."""
        assert not self.deep
        self.proj0(jnp.zeros((1, 6), self.dtype))  # materialize params
        p = self.get_variable("params", "proj0")
        return jnp.asarray(p["kernel"], self.dtype)[:3]

    def base_from_centers(self, cx, cy, cz):
        """Pre-relu per-window center half of the shallow embedding:
        ``stack(cx, cy, cz) @ W[3:] + b`` — (NW, C)."""
        assert not self.deep
        self.proj0(jnp.zeros((1, 6), self.dtype))
        p = self.get_variable("params", "proj0")
        w = jnp.asarray(p["kernel"], self.dtype)
        b = jnp.asarray(p["bias"], self.dtype)
        ctr = jnp.stack([cx, cy, cz], axis=-1).astype(self.dtype)
        return ctr @ w[3:] + b

    def from_planes(self, rx, ry, rz, cx, cy, cz):
        """Shallow-path embedding from (NW, cap) relative-coordinate planes
        plus per-window center scalars (NW,) — no 6-channel stack.

        Mathematically identical to ``__call__(stack([rx,ry,rz,bcast(cx..)]))``
        but avoids materializing the (NW, cap, 6) input (a 6/128-lane array)
        and the K=6 MXU-hostile matmul: the window-center half of the Dense
        collapses to a per-window (NW, C) base computed from scalars, and the
        relative half becomes three broadcast multiply-adds that XLA fuses
        into the single (NW, cap, C) output sweep. Measured ~21 ms/frame in
        the stack+GEMM form (ablation 'posz').
        """
        assert not self.deep, "from_planes is the shallow (two-scale) path"
        zed = jnp.zeros((1, 6), self.dtype)
        self.proj0(zed)  # materialize params
        p = self.get_variable("params", "proj0")
        w = jnp.asarray(p["kernel"], self.dtype)   # (6, C)
        b = jnp.asarray(p["bias"], self.dtype)     # (C,)
        # per-window base: center coords ride the tiny (NW, 3) @ (3, C) GEMM
        ctr = jnp.stack([cx, cy, cz], axis=-1).astype(self.dtype)  # (NW, 3)
        base = ctr @ w[3:] + b  # (NW, C)
        out = (rx[..., None].astype(self.dtype) * w[0]
               + ry[..., None].astype(self.dtype) * w[1]
               + rz[..., None].astype(self.dtype) * w[2]
               + base[:, None, :])
        return nn.relu(out)

    def deep_from_planes(self, rx, ry, rz, cx, cy, cz):
        """Deep-path (compress-block) embedding from relative-coordinate
        planes: layer 0 collapses exactly like ``from_planes`` (no
        (NW, cap, 6) stack, no K=6 GEMM); layer 1 stays the token-wise
        Dense+ReLU on the (NW, cap, C) activations."""
        assert self.deep, "deep_from_planes is the single-scale path"
        self.proj0(jnp.zeros((1, 6), self.dtype))  # materialize params
        p = self.get_variable("params", "proj0")
        w = jnp.asarray(p["kernel"], self.dtype)   # (6, C)
        b = jnp.asarray(p["bias"], self.dtype)     # (C,)
        ctr = jnp.stack([cx, cy, cz], axis=-1).astype(self.dtype)  # (NW, 3)
        base = ctr @ w[3:] + b  # (NW, C)
        x = nn.relu(rx[..., None].astype(self.dtype) * w[0]
                    + ry[..., None].astype(self.dtype) * w[1]
                    + rz[..., None].astype(self.dtype) * w[2]
                    + base[:, None, :])
        return nn.relu(self.proj1(x))
