"""Rotated box geometry in pure jnp (TPU-native iou3d_nms equivalent).

Replaces the polygon-clipping CUDA kernels
(ref: pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu:104-265) with a fully
vectorized, static-shape formulation: the intersection polygon of two rotated
rectangles is spanned by at most 24 candidate vertices (16 edge-edge
crossings + 2x4 contained corners); we enumerate all candidates, mask the
invalid ones, sort by angle about their centroid, and apply the shoelace
formula. Deterministic, batched, runs on TPU or CPU (the same code backs both
device NMS and host-side evaluation).

Boxes follow the OpenPCDet convention: (x, y, z, dx, dy, dz, heading),
heading about +z.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def boxes_to_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) → (N, 4, 2) BEV corners, counter-clockwise."""
    x, y = boxes[..., 0], boxes[..., 1]
    dx, dy, heading = boxes[..., 3], boxes[..., 4], boxes[..., 6]
    cos, sin = jnp.cos(heading), jnp.sin(heading)
    lx = jnp.stack([dx, -dx, -dx, dx], axis=-1) / 2  # (..., 4) local ccw
    ly = jnp.stack([dy, dy, -dy, -dy], axis=-1) / 2
    cx = lx * cos[..., None] - ly * sin[..., None] + x[..., None]
    cy = lx * sin[..., None] + ly * cos[..., None] + y[..., None]
    return jnp.stack([cx, cy], axis=-1)


def _points_in_quad(pts: jnp.ndarray, quad: jnp.ndarray) -> jnp.ndarray:
    """pts (..., P, 2) inside convex ccw quad (..., 4, 2) → (..., P) bool."""
    a = quad
    b = jnp.roll(quad, -1, axis=-2)
    e = (b - a)[..., :, None, :]  # (..., 4, 1, 2)
    ap = pts[..., None, :, :] - a[..., :, None, :]  # (..., 4, P, 2)
    cr = e[..., 0] * ap[..., 1] - e[..., 1] * ap[..., 0]  # (..., 4, P)
    return jnp.all(cr >= -EPS, axis=-2)


def _segment_intersections(ca: jnp.ndarray, cb: jnp.ndarray):
    """All 16 edge-edge crossings of two quads (..., 4, 2) → pts (..., 16, 2)."""
    a0 = ca
    a1 = jnp.roll(ca, -1, axis=-2)
    b0 = cb
    b1 = jnp.roll(cb, -1, axis=-2)

    p = a0[..., :, None, :]  # (..., 4, 1, 2)
    r = (a1 - a0)[..., :, None, :]
    q = b0[..., None, :, :]  # (..., 1, 4, 2)
    s = (b1 - b0)[..., None, :, :]

    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]  # (..., 4, 4)
    safe = jnp.where(jnp.abs(rxs) < EPS, 1.0, rxs)
    qp = q - p
    t = (qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]) / safe
    u = (qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]) / safe
    valid = (jnp.abs(rxs) >= EPS) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = p + t[..., None] * r  # (..., 4, 4, 2)

    lead = pts.shape[:-3]
    return pts.reshape(lead + (16, 2)), valid.reshape(lead + (16,))


def rotated_intersection_area(ca: jnp.ndarray, cb: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two batches of convex ccw quads (..., 4, 2)."""
    inter_pts, inter_valid = _segment_intersections(ca, cb)
    a_in_b = _points_in_quad(ca, cb)  # (..., 4)
    b_in_a = _points_in_quad(cb, ca)

    pts = jnp.concatenate([inter_pts, ca, cb], axis=-2)  # (..., 24, 2)
    valid = jnp.concatenate([inter_valid, a_in_b, b_in_a], axis=-1)  # (..., 24)

    count = valid.sum(axis=-1)  # (...,)
    vf = valid[..., None].astype(pts.dtype)
    centroid = (pts * vf).sum(axis=-2) / jnp.clip(count, 1, None)[..., None]

    rel = pts - centroid[..., None, :]
    # Shoelace over the angular ordering WITHOUT a sort: each vertex's cyclic
    # successor is the valid vertex with the smallest strictly-greater angle
    # (wrapping to the global minimum), selected by a (24, 24) comparison
    # matrix and two tiny contractions. The argsort + take_along_axis
    # formulation this replaces was the single hottest kernel of the whole
    # model at NMS sizes (2 x 59 ms/frame gathers of (512^2, 24, 2)).
    n_cand = pts.shape[-2]
    angle = jnp.arctan2(rel[..., 1], rel[..., 0])
    # deterministic tie-break: duplicate candidate points get distinct
    # angles; consecutive duplicates contribute zero area either way
    angle = angle + jnp.arange(n_cand, dtype=angle.dtype) * 1e-7
    ang = jnp.where(valid, angle, jnp.inf)

    bigger = ang[..., None, :] > ang[..., :, None]  # (..., i, j)
    m = jnp.min(jnp.where(bigger, ang[..., None, :], jnp.inf), axis=-1)
    g = jnp.min(ang, axis=-1, keepdims=True)
    target = jnp.where(jnp.isinf(m), g, m)  # (..., i)
    succ = ((ang[..., None, :] == target[..., None])
            & valid[..., None, :]).astype(rel.dtype)
    x_n = jnp.einsum("...ij,...j->...i", succ, rel[..., 0])
    y_n = jnp.einsum("...ij,...j->...i", succ, rel[..., 1])
    cross = rel[..., 0] * y_n - rel[..., 1] * x_n
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0), axis=-1))
    return jnp.where(count >= 3, area, 0.0)


def pairwise_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) x (M, 7) → (N, M) rotated BEV IoU (ref: iou3d_nms_kernel.cu:227-249)."""
    ca = boxes_to_corners_bev(boxes_a)  # (N, 4, 2)
    cb = boxes_to_corners_bev(boxes_b)  # (M, 4, 2)
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    ca_b = jnp.broadcast_to(ca[:, None], (n, m, 4, 2))
    cb_b = jnp.broadcast_to(cb[None, :], (n, m, 4, 2))
    inter = rotated_intersection_area(ca_b, cb_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.clip(area_a + area_b - inter, 1e-6, None)


def pairwise_iou_3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) x (M, 7) → (N, M) 3D IoU with z-overlap (ref: iou3d_nms.cpp boxes_iou3d_gpu)."""
    ca = boxes_to_corners_bev(boxes_a)
    cb = boxes_to_corners_bev(boxes_b)
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    inter_bev = rotated_intersection_area(
        jnp.broadcast_to(ca[:, None], (n, m, 4, 2)),
        jnp.broadcast_to(cb[None, :], (n, m, 4, 2)),
    )
    za0 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za1 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb0 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb1 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    zo = jnp.clip(
        jnp.minimum(za1[:, None], zb1[None, :]) - jnp.maximum(za0[:, None], zb0[None, :]),
        0, None,
    )
    inter = inter_bev * zo
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.clip(vol_a + vol_b - inter, 1e-6, None)
