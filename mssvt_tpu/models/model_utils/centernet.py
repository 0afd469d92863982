"""CenterNet target assignment + heatmap decoding (TPU-native, static shapes).

Rebuild of ref pcdet/models/model_utils/centernet_utils.py and the target
assignment in center_head.py:103-219, with two TPU-first changes:

1. Gaussian heatmap drawing is a *vectorized scatter-max over fixed-size
   patches* on device, replacing the reference's per-sample, per-box CPU
   python loop (ref: center_head.py:136-157 + centernet_utils.py:47-69).
2. Decode returns fixed-K padded arrays + validity masks instead of
   per-sample boolean indexing (ref: centernet_utils.py:194-216) — the
   dynamic filtering happens on host at the very end of post-processing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_radius(height, width, min_overlap=0.5):
    """Ref: centernet_utils.py:9-35 (CornerNet radius heuristic)."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1 ** 2 - 4 * a1 * c1, 0, None))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.clip(b2 ** 2 - 4 * a2 * c2, 0, None))
    r2 = (b2 + sq2) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, 0, None))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_gaussians(heatmap_shape, centers, radii, class_ids, valid, max_radius: int):
    """Scatter-max gaussians for all boxes of a batch at once.

    Args:
        heatmap_shape: static (B, num_classes, H, W).
        centers: (B, M, 2) float (x, y) feature-map coords.
        radii: (B, M) int radii (already clamped to >= min_radius).
        class_ids: (B, M) int32 0-based class channel.
        valid: (B, M) bool.
        max_radius: static patch cap; radii are clipped to it.

    Returns:
        (B, num_classes, H, W) float32 heatmap.

    Matches ``draw_gaussian_to_heatmap`` (ref: centernet_utils.py:47-69):
    gaussian sigma = (2r+1)/6, cells outside the radius box or the map are
    ignored, overlaps resolved by max.
    """
    b, num_classes, h, w = heatmap_shape
    m = centers.shape[1]
    p = 2 * max_radius + 1
    radii = jnp.minimum(radii, max_radius)

    cx = centers[..., 0].astype(jnp.int32)  # int() truncation like the ref
    cy = centers[..., 1].astype(jnp.int32)

    dy = jnp.arange(-max_radius, max_radius + 1)
    dx = jnp.arange(-max_radius, max_radius + 1)
    dyy, dxx = jnp.meshgrid(dy, dx, indexing="ij")  # (P, P)

    sigma = (2 * radii.astype(jnp.float32) + 1) / 6.0  # (B, M)
    d2 = (dxx ** 2 + dyy ** 2).astype(jnp.float32)  # (P, P)
    g = jnp.exp(-d2[None, None] / (2.0 * sigma[..., None, None] ** 2))  # (B,M,P,P)

    in_radius = (jnp.abs(dxx)[None, None] <= radii[..., None, None]) & (
        jnp.abs(dyy)[None, None] <= radii[..., None, None]
    )
    px = cx[..., None, None] + dxx[None, None]  # (B, M, P, P)
    py = cy[..., None, None] + dyy[None, None]
    in_map = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    ok = in_radius & in_map & valid[..., None, None]

    batch_ids = jnp.broadcast_to(jnp.arange(b)[:, None, None, None], (b, m, p, p))
    cls = jnp.broadcast_to(class_ids[..., None, None], (b, m, p, p))
    flat_idx = ((batch_ids * num_classes + cls) * h + py) * w + px
    flat_idx = jnp.where(ok, flat_idx, b * num_classes * h * w)  # dropped

    heat = jnp.zeros((b * num_classes * h * w,), jnp.float32)
    heat = heat.at[flat_idx.reshape(-1)].max(g.reshape(-1), mode="drop")
    return heat.reshape(b, num_classes, h, w)


def draw_gaussians_dense(heatmap_shape, centers, radii, class_ids, valid,
                         max_radius: int):
    """Dense-evaluation form of :func:`draw_gaussians` — identical output.

    Instead of scatter-maxing B*M*(2r+1)^2 patch elements (XLA element
    scatters are descriptor-rate bound on TPU; at MAX_RADIUS=24 the Waymo
    config issues ~4.8M descriptors per step), evaluate every gaussian at
    every heatmap pixel and max-reduce over boxes per class: pure VPU math +
    an (B, M, H, W) sweep (~115 MB at Waymo scale — milliseconds of HBM).
    The radius-box cutoff and int() center truncation match exactly; pixels
    outside the map don't exist, matching the scatter's bounds mask.
    """
    b, num_classes, h, w = heatmap_shape
    radii = jnp.minimum(radii, max_radius)
    cx = centers[..., 0].astype(jnp.int32)[..., None, None]  # (B, M, 1, 1)
    cy = centers[..., 1].astype(jnp.int32)[..., None, None]

    ys = jnp.arange(h)[None, None, :, None]  # (1, 1, H, 1)
    xs = jnp.arange(w)[None, None, None, :]  # (1, 1, 1, W)
    dx = (xs - cx).astype(jnp.float32)  # (B, M, H, W)
    dy = (ys - cy).astype(jnp.float32)
    sigma = (2 * radii.astype(jnp.float32) + 1) / 6.0  # (B, M)
    g = jnp.exp(-(dx * dx + dy * dy)
                / (2.0 * sigma[..., None, None] ** 2))  # (B, M, H, W)
    r = radii.astype(jnp.float32)[..., None, None]
    ok = ((jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
          & valid[..., None, None])
    g = jnp.where(ok, g, 0.0)
    heat = []
    for c in range(num_classes):  # static, small (3 on Waymo)
        gc = jnp.where((class_ids == c)[..., None, None], g, 0.0)
        heat.append(jnp.max(gc, axis=1))  # (B, H, W)
    return jnp.stack(heat, axis=1).astype(jnp.float32)


def topk_heatmap(scores: jnp.ndarray, k: int):
    """Two-stage top-K over (B, C, H, W), ref: centernet_utils.py:136-151.

    Stage 1 uses ``approx_max_k`` (recall 0.99): ``lax.top_k`` lowers to a
    full bitonic sort on TPU (~10 ms/frame at Waymo heatmap sizes) while the
    TPU-native approximate reduction is ~free; candidates it can miss are
    deep-tail scores that NMS/score-threshold would drop anyway.
    """
    b, num_class, h, w = scores.shape
    flat = scores.reshape(b, num_class, h * w)
    if flat.shape[-1] > 4 * k:
        topk_scores, topk_inds = jax.lax.approx_max_k(
            flat, k, recall_target=0.99, aggregate_to_topk=True)
    else:
        topk_scores, topk_inds = jax.lax.top_k(flat, k)  # (B, C, K)
    topk_ys = (topk_inds // w).astype(jnp.float32)
    topk_xs = (topk_inds % w).astype(jnp.float32)

    topk_score, topk_ind = jax.lax.top_k(topk_scores.reshape(b, -1), k)  # (B, K)
    topk_classes = (topk_ind // k).astype(jnp.int32)

    def g(x):
        return jnp.take_along_axis(x.reshape(b, -1), topk_ind, axis=1)

    return topk_score, g(topk_inds), topk_classes, g(topk_ys), g(topk_xs)


def decode_bbox_from_heatmap(
    heatmap, rot_cos, rot_sin, center, center_z, dim,
    point_cloud_range, voxel_size, feature_map_stride,
    vel=None, k=100, score_thresh=None, post_center_limit_range=None,
):
    """Static-shape decode (ref: centernet_utils.py:154-216).

    Heads come in NHWC: heatmap (B, H, W, C_cls), regression heads
    (B, H, W, c). Returns (boxes (B, K, 7/9), scores (B, K),
    labels (B, K) int32, mask (B, K) bool) — masked entries are NOT removed.
    """
    b, h, w, num_class = heatmap.shape
    hm = jnp.transpose(heatmap, (0, 3, 1, 2))
    scores, inds, class_ids, ys, xs = topk_heatmap(hm, k)

    def gather(feat):  # (B, H, W, c) by (B, K) flat yx inds
        c = feat.shape[-1]
        flat = feat.reshape(b, h * w, c)
        return jnp.take_along_axis(flat, inds[..., None], axis=1)  # (B, K, c)

    center = gather(center)
    rot_sin_g = gather(rot_sin)
    rot_cos_g = gather(rot_cos)
    center_z = gather(center_z)
    dim = gather(dim)

    angle = jnp.arctan2(rot_sin_g, rot_cos_g)
    xs = xs[..., None] + center[..., 0:1]
    ys = ys[..., None] + center[..., 1:2]
    xs = xs * feature_map_stride * voxel_size[0] + point_cloud_range[0]
    ys = ys * feature_map_stride * voxel_size[1] + point_cloud_range[1]

    parts = [xs, ys, center_z, dim, angle]
    if vel is not None:
        parts.append(gather(vel))
    boxes = jnp.concatenate(parts, axis=-1)

    mask = jnp.ones_like(scores, bool)
    if post_center_limit_range is not None:
        r = jnp.asarray(post_center_limit_range, jnp.float32)
        mask &= jnp.all(boxes[..., :3] >= r[:3], axis=-1)
        mask &= jnp.all(boxes[..., :3] <= r[3:], axis=-1)
    if score_thresh is not None:
        mask &= scores > score_thresh
    return boxes, scores, class_ids, mask
