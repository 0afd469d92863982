"""Point sampling / grouping / interpolation ops (TPU-native pointnet2 core).

Replaces the pointnet2_batch CUDA kernels the MsSVT backbone depends on
(ref: pcdet/ops/pointnet2/pointnet2_batch/src/):

- ``farthest_point_sampling_kernel`` (sampling_gpu.cu:101-185) →
  :func:`farthest_point_sample`: the same sequential min-dist/argmax loop,
  vectorized over the "batch" axis (here: windows) with ``lax.fori_loop``.
- ``group_points_kernel_fast`` / the mssvt ``group_features_kernel_stack``
  (group_features_gpu.cu:15-106) → :func:`group_features`: one
  ``jnp.take`` with -1→zero masking. The backward pass is XLA scatter-add —
  deterministic, unlike the reference's float atomicAdd (:46).
- ``three_nn_kernel_fast`` / ``three_interpolate``
  (interpolate_gpu.cu:16-127) → :func:`three_nn` /
  :func:`three_interpolate`: a batched distance matrix + ``lax.top_k``.

Channel-last layout throughout ((..., n, C) rather than (..., C, n)) — the
natural layout for TPU matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Iterative farthest point sampling.

    Semantics match the reference kernel (sampling_gpu.cu:101-185): the first
    selected index is always 0, min-distance caches start at 1e10, and ties in
    the argmax resolve to the lowest index (deterministic here; the CUDA tree
    reduction's tie-break depends on thread striding).

    Args:
        xyz: (B, N, 3) float coordinates. Padding rows should be zeros — the
            caller masks repeats of index 0 afterwards, exactly like the
            reference (ref: mssvt_backbone.py:248-252).
        npoint: static number of samples.

    Returns:
        (B, npoint) int32 indices into N.
    """
    b, n, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    def body(i, carry):
        min_dist, last, out = carry
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((xyz - last_xyz) ** 2, axis=-1)  # (B, N)
        min_dist = jnp.minimum(min_dist, d)
        nxt = jnp.argmax(min_dist, axis=1).astype(jnp.int32)
        out = out.at[:, i].set(nxt)
        return min_dist, nxt, out

    out = jnp.zeros((b, npoint), jnp.int32)  # slot 0 = index 0
    init = (jnp.full((b, n), 1e10, jnp.float32), jnp.zeros((b,), jnp.int32), out)
    _, _, out = jax.lax.fori_loop(1, npoint, body, init)
    return out


def gather_along_batch(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather (B, N, ...) values by (B, M) indices → (B, M, ...).

    Equivalent of ``gather_operation`` (sampling_gpu.cu:15) in channel-last
    layout.
    """
    extra = values.ndim - 2
    ix = idx.reshape(idx.shape + (1,) * extra)
    return jnp.take_along_axis(values, ix, axis=1)


def group_features(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather flat (V, C) features by (..., nsample) global rows; -1 → zeros.

    Equivalent of the mssvt ``grouping_operation``
    (ref: mssvt_ops.py:136-192 + group_features_gpu.cu:15-44) except indices
    are global rows (the batch offset is already folded in by the sorted-key
    index) and output is channel-last (..., nsample, C). Gradients flow to
    `features` via XLA scatter-add — deterministic, replacing the reference's
    atomicAdd backward (group_features_gpu.cu:46-106).
    """
    gathered = jnp.take(features, jnp.clip(idx, 0), axis=0)
    return jnp.where((idx >= 0)[..., None], gathered, 0)


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray, known_valid=None):
    """3 nearest neighbors by squared euclidean distance.

    Equivalent of ``three_nn_kernel_fast`` (interpolate_gpu.cu:16-57):
    returns *squared* distances, ascending, ties to the lower index.

    Args:
        unknown: (B, n, 3); known: (B, m, 3).
        known_valid: optional (B, m) bool; invalid candidates are pushed to
            +inf distance (the reference has no mask — callers there rely on
            zero-padded coords, which we also support by passing None).

    Returns:
        dist2 (B, n, 3) float32, idx (B, n, 3) int32.
    """
    diff = unknown[:, :, None, :] - known[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)  # (B, n, m)
    if known_valid is not None:
        d2 = jnp.where(known_valid[:, None, :], d2, jnp.inf)
    m = known.shape[1]
    k_eff = min(3, m)
    neg, idx = jax.lax.top_k(-d2, k_eff)
    if k_eff < 3:
        # fewer than 3 candidates: pad like the CUDA kernel's untouched slots
        # (index 0, distance 1e40 — interpolate weight ~0 after normalization)
        pad = 3 - k_eff
        neg = jnp.concatenate(
            [neg, jnp.full(neg.shape[:-1] + (pad,), -1e40, neg.dtype)], axis=-1
        )
        idx = jnp.concatenate(
            [idx, jnp.zeros(idx.shape[:-1] + (pad,), idx.dtype)], axis=-1
        )
    return -neg, idx.astype(jnp.int32)


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray):
    """Weighted sum of 3 neighbor features.

    Equivalent of ``three_interpolate_kernel_fast`` (interpolate_gpu.cu:84-107)
    in channel-last layout: features (B, m, C), idx/weight (B, n, 3) →
    (B, n, C).
    """
    gathered = jnp.take_along_axis(features[:, None, :, :], idx[..., None], axis=2)
    return jnp.sum(gathered * weight[..., None], axis=2)  # (B, n, C)
