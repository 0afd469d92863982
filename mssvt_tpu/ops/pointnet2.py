"""PointNet++ primitives (TPU-native pointnet2_batch/stack equivalent).

Replaces the CUDA kernels in ref pcdet/ops/pointnet2/ with vectorized jnp:

- :func:`ball_query` ≙ ball_query_gpu.cu:15 (batch) /
  ball_query_gpu.cu:16 (stack): first-``nsample`` points within radius,
  slot 0 replicated for padding (the reference fills unfound slots with the
  first found index).
- :func:`query_and_group` ≙ pointnet2_utils.QueryAndGroup: relative-xyz
  concat feature grouping.
- FPS and 3-NN interpolation live in ops/sampling.py.

All take static shapes with validity masks; "stacked/ragged" batching from
the reference collapses into padded batch tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ball_query(radius: float, nsample: int, xyz: jnp.ndarray,
               new_xyz: jnp.ndarray, xyz_valid=None):
    """For each query point, indices of up to ``nsample`` points within radius.

    Args:
        xyz: (B, N, 3) support points; new_xyz: (B, M, 3) query centers.
        xyz_valid: optional (B, N) mask.

    Returns:
        idx (B, M, nsample) int32, empty (B, M) bool (no point in radius).
        Fill semantics match the CUDA kernel: the first ``nsample`` support
        points (in index order) within radius; remaining slots replicate the
        first found index (ball_query_gpu.cu fills idx[0] everywhere first).
    """
    d2 = jnp.sum((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)
    in_ball = d2 < radius ** 2  # (B, M, N)
    if xyz_valid is not None:
        in_ball = in_ball & xyz_valid[:, None, :]

    n = xyz.shape[1]
    # rank of each support point among in-ball hits (first-come order)
    rank = jnp.cumsum(in_ball, axis=-1) - 1
    keep = in_ball & (rank < nsample)
    dest = jnp.where(keep, rank, nsample)  # overflow → dropped

    b, m = new_xyz.shape[:2]
    base = jnp.full((b, m, nsample + 1), -1, jnp.int32)
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, None], in_ball.shape)
    idx = jax.vmap(jax.vmap(
        lambda d, s: jnp.full((nsample + 1,), -1, jnp.int32).at[d].set(s, mode="drop")
    ))(dest, src)[..., :nsample]
    del base

    empty = ~jnp.any(in_ball, axis=-1)
    first = jnp.where(idx[..., 0] >= 0, idx[..., 0], 0)
    idx = jnp.where(idx >= 0, idx, first[..., None])  # replicate slot 0
    return idx.astype(jnp.int32), empty


def query_and_group(radius, nsample, xyz, new_xyz, features=None,
                    xyz_valid=None, use_xyz=True):
    """Ball query + relative-xyz feature grouping (QueryAndGroup).

    Returns grouped (B, M, nsample, 3 [+C]) and empty-mask (B, M).
    """
    idx, empty = ball_query(radius, nsample, xyz, new_xyz, xyz_valid)
    grouped_xyz = jnp.take_along_axis(
        xyz[:, None], idx[..., None], axis=2
    ) - new_xyz[:, :, None, :]
    parts = [grouped_xyz] if use_xyz else []
    if features is not None:
        parts.append(jnp.take_along_axis(features[:, None], idx[..., None], axis=2))
    out = jnp.concatenate(parts, axis=-1)
    return out * (~empty)[..., None, None], empty


def points_in_boxes(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) points x (M, 7) boxes → (N, M) bool containment.

    jnp equivalent of ``points_in_boxes_gpu``
    (ref: ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:313).
    """
    local = points[:, None, :] - boxes[None, :, 0:3]
    c = jnp.cos(-boxes[:, 6])
    s = jnp.sin(-boxes[:, 6])
    lx = local[..., 0] * c[None] - local[..., 1] * s[None]
    ly = local[..., 0] * s[None] + local[..., 1] * c[None]
    lz = local[..., 2]
    half = boxes[:, 3:6] / 2
    return (
        (jnp.abs(lx) <= half[None, :, 0])
        & (jnp.abs(ly) <= half[None, :, 1])
        & (jnp.abs(lz) <= half[None, :, 2])
    )


def roipoint_pool3d(points, point_features, boxes, num_sampled_points: int,
                    points_valid=None):
    """Pool a fixed number of raw points per RoI box.

    Equivalent of ``RoIPointPool3d``
    (ref: ops/roipoint_pool3d/src/roipoint_pool3d_kernel.cu:38-103): first
    ``num_sampled_points`` contained points per box (index order); boxes with
    fewer points repeat... the reference wraps indices modulo the found count.

    Args:
        points: (N, 3); point_features: (N, C); boxes: (M, 7).

    Returns:
        pooled (M, num_sampled_points, 3 + C), empty (M,) bool.
    """
    inside = points_in_boxes(points, boxes)  # (N, M)
    if points_valid is not None:
        inside = inside & points_valid[:, None]
    inside = inside.T  # (M, N)
    n = points.shape[0]
    m = boxes.shape[0]
    k = num_sampled_points

    rank = jnp.cumsum(inside, axis=-1) - 1
    keep = inside & (rank < k)
    dest = jnp.where(keep, rank, k)
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (m, n))
    idx = jax.vmap(
        lambda d, s: jnp.full((k + 1,), -1, jnp.int32).at[d].set(s, mode="drop")
    )(dest, src)[:, :k]

    count = jnp.minimum(inside.sum(-1), k)
    empty = count == 0
    # wrap unfilled slots modulo count (reference semantics)
    slot = jnp.arange(k)[None]
    wrapped = slot % jnp.clip(count[:, None], 1)
    idx = jnp.where(idx >= 0, idx, jnp.take_along_axis(idx, wrapped, axis=1))
    idx = jnp.clip(idx, 0)

    feat = jnp.concatenate([points, point_features], axis=-1)
    pooled = feat[idx]  # (M, k, 3+C)
    return pooled * (~empty)[:, None, None], empty


def vector_pool(queries_xyz, support_xyz, support_feat, support_valid,
                radius: float, nsample: int, grid: int = 2):
    """PV-RCNN++ vector-pool local-grid aggregation.

    Rebuild of ref pcdet/ops/pointnet2/pointnet2_stack/src/
    vector_pool_gpu.cu:19-433 (``vector_pool_kernel`` family): the spherical
    neighborhood of each query is divided into a ``grid^3`` local sub-voxel
    grid over [-radius, radius]^3; points falling in each sub-voxel are
    AVERAGED (features and relative xyz separately), and the per-cell
    (3 + C) vectors concatenate into one fixed-length descriptor — giving
    position-structured pooling without per-point MLPs.

    Args:
        queries_xyz: (B, M, 3); support_xyz: (B, N, 3);
        support_feat: (B, N, C); support_valid: (B, N).

    Returns:
        pooled: (B, M, grid^3 * (3 + C)) float32.
        empty: (B, M) bool (no neighbor at all).
    """
    idx, empty = ball_query(radius, nsample, support_xyz, queries_xyz,
                            support_valid)
    g = int(grid)
    nb_xyz = jnp.take_along_axis(support_xyz[:, None], idx[..., None], axis=2)
    rel = nb_xyz - queries_xyz[:, :, None, :]  # (B, M, S, 3)
    nb_feat = jnp.take_along_axis(support_feat[:, None], idx[..., None], axis=2)

    # slot mask: replicated padding slots must count once only — slot j is
    # real iff it's the first occurrence of its index
    first = idx[..., :1]
    real = jnp.concatenate(
        [jnp.ones(idx[..., :1].shape, bool), idx[..., 1:] != first], axis=-1
    ) & (~empty)[..., None]

    u = jnp.clip(((rel / radius + 1.0) * 0.5 * g).astype(jnp.int32), 0, g - 1)
    cell = (u[..., 0] * g + u[..., 1]) * g + u[..., 2]  # (B, M, S)
    onehot = jax.nn.one_hot(
        jnp.where(real, cell, g ** 3), g ** 3, dtype=rel.dtype)  # (B,M,S,G3)
    cnt = onehot.sum(axis=2)  # (B, M, G3)
    inv = 1.0 / jnp.clip(cnt, 1.0, None)
    mean_rel = jnp.einsum("bmsg,bmsc->bmgc", onehot, rel) * inv[..., None]
    mean_feat = jnp.einsum("bmsg,bmsc->bmgc", onehot, nb_feat) * inv[..., None]
    occupied = (cnt > 0)[..., None]
    out = jnp.concatenate([mean_rel, mean_feat], axis=-1) * occupied
    b, m = queries_xyz.shape[:2]
    return out.reshape(b, m, -1).astype(jnp.float32), empty
