"""Rotated box geometry in pure jnp (TPU-native iou3d_nms equivalent).

Replaces the polygon-clipping CUDA kernels
(ref: pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu:104-265) with a fully
vectorized, static-shape formulation: each quad edge is clipped to the
other quad's four ccw half-planes as a parameter interval [t0, t1], and the
shoelace/Green's-theorem sum decomposes per retained sub-segment — no
candidate-vertex enumeration, no angular sort. Deterministic, batched, runs
on TPU or CPU (the same code backs both device NMS and host-side
evaluation).

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




def _clipped_edge_cross_sum(p0: jnp.ndarray, d: jnp.ndarray,
                            h0: jnp.ndarray, he: jnp.ndarray,
                            bound: float) -> jnp.ndarray:
    """Σ over the (p0, d) edges of cross(P1, P2) after clipping to the
    (h0, he) half-planes.

    Each ccw edge is restricted to the parameter interval [t0, t1] where it
    satisfies all four ccw half-planes (inside(x) = cross(he, x - h0) >=
    bound); the retained sub-segment contributes cross(P1, P2) to the
    shoelace sum about the origin. ``bound`` = -EPS keeps
    boundary-coincident edges (closed interior), +EPS drops them (open
    interior) — the A/B passes use opposite signs so a shared boundary
    segment is counted exactly once.

    Edge vectors ``d``/``he`` arrive PRECOMPUTED (callers take the
    roll-difference on the small per-box corner arrays BEFORE any pairwise
    broadcast: on the 500-candidate NMS path the rolls otherwise run as
    concatenates over (B, K, K, 4, 2) — six ~32 MB materializations per
    IoU matrix, xplane 2026-08-21). All four operands broadcast together.
    """
    # Running [t0, t1] over the 4 half-planes as an unrolled elementwise
    # chain on (..., 4 edges) planes. A broadcast (..., 4, 4) clip table +
    # axis reductions materializes ~16x the bytes at NMS pair counts — XLA
    # keeps the reduce operands live in HBM — while this form fuses into a
    # single elementwise kernel (measured on the decode+NMS path).
    t0 = jnp.zeros(d.shape[:-1], d.dtype)
    t1 = jnp.ones(d.shape[:-1], d.dtype)
    dead = jnp.zeros(d.shape[:-1], bool)
    for k in range(4):  # static: 4 half-planes
        hk = h0[..., k:k + 1, :]  # (..., 1, 2) broadcasts over edges
        ek = he[..., k:k + 1, :]
        rel = p0 - hk
        # inside(p + t d) = num + t * den >= bound
        num = ek[..., 0] * rel[..., 1] - ek[..., 1] * rel[..., 0]  # (..., 4)
        den = ek[..., 0] * d[..., 1] - ek[..., 1] * d[..., 0]
        safe = jnp.where(jnp.abs(den) < EPS,
                         jnp.where(den >= 0, EPS, -EPS), den)
        tc = (bound - num) / safe
        t0 = jnp.maximum(t0, jnp.where(den > EPS, tc, 0.0))   # entering
        t1 = jnp.minimum(t1, jnp.where(den < -EPS, tc, 1.0))  # exiting
        kill = (jnp.abs(den) <= EPS) & (num < bound)  # parallel & outside
        if bound > 0:
            # Open pass, collinear edge (|den|,|num| ~ 0): orientation decides.
            # Co-oriented with the half-plane edge -> the quads overlap on the
            # same side and the closed pass already counted the shared segment
            # once: drop it here. ANTI-parallel -> the quads merely abut; the
            # closed pass kept the other quad's coincident edge, so keep this
            # one too — the opposite traversals' cross terms cancel exactly,
            # leaving the correct zero area (origin-independent).
            collinear = (jnp.abs(den) <= EPS) & (jnp.abs(num) <= EPS)
            anti = (d[..., 0] * ek[..., 0] + d[..., 1] * ek[..., 1]) < 0
            kill &= ~(collinear & anti)
        dead |= kill
    t0 = jnp.clip(t0, 0.0, 1.0)  # (..., 4)
    t1 = jnp.clip(t1, 0.0, 1.0)
    alive = (~dead) & (t1 > t0)
    p1 = p0 + t0[..., None] * d
    p2 = p0 + t1[..., None] * d
    cr = p1[..., 0] * p2[..., 1] - p1[..., 1] * p2[..., 0]
    return jnp.sum(jnp.where(alive, cr, 0.0), axis=-1)


def rotated_intersection_area(ca: jnp.ndarray, cb: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two batches of convex ccw quads (..., 4, 2).

    Edge-clipping + Green's theorem: the intersection boundary consists of
    sub-segments of A's edges inside B and of B's edges inside A, meeting
    at edge-crossing points. The ccw shoelace sum therefore decomposes per
    retained sub-segment as cross(P1, P2) — independent of traversal order,
    since consecutive boundary segments share endpoints (cross(P, P) = 0).
    This replaces the 24-candidate / angle-successor formulation (see git
    history): max intermediate rank drops from (..., 24, 24) comparison
    matrices to (..., 4, 4) clip tables — ~20x fewer bytes through HBM at
    NMS sizes, no arctan2, and XLA fuses the whole chain.
    Ref semantics: iou3d_nms_kernel.cu:104-265 (box_overlap).
    """
    # closed interior for the A pass, open for the B pass: a boundary
    # segment shared by both quads is counted exactly once (identical
    # boxes would otherwise sum their common boundary twice)
    da = jnp.roll(ca, -1, axis=-2) - ca
    db = jnp.roll(cb, -1, axis=-2) - cb
    total = (_clipped_edge_cross_sum(ca, da, cb, db, -EPS)
             + _clipped_edge_cross_sum(cb, db, ca, da, EPS))
    return 0.5 * jnp.abs(total)


def _inter_area_pairwise(ca: jnp.ndarray, cb: jnp.ndarray) -> jnp.ndarray:
    """(N, 4, 2) x (M, 4, 2) → (N, M) intersection areas.

    Same math as :func:`rotated_intersection_area`, but the per-box edge
    vectors are computed BEFORE the pairwise broadcast and the operands
    broadcast lazily as (N, 1, ...) x (1, M, ...) — no (N, M, 4, 2)
    corner/edge tensors are ever materialized."""
    da = jnp.roll(ca, -1, axis=-2) - ca
    db = jnp.roll(cb, -1, axis=-2) - cb
    ca_, da_ = ca[:, None], da[:, None]
    cb_, db_ = cb[None], db[None]
    total = (_clipped_edge_cross_sum(ca_, da_, cb_, db_, -EPS)
             + _clipped_edge_cross_sum(cb_, db_, ca_, da_, EPS))
    return 0.5 * jnp.abs(total)


def pairwise_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) x (M, 7) → (N, M) rotated BEV IoU (ref: iou3d_nms_kernel.cu:227-249)."""
    ca = boxes_to_corners_bev(boxes_a)  # (N, 4, 2)
    cb = boxes_to_corners_bev(boxes_b)  # (M, 4, 2)
    inter = _inter_area_pairwise(ca, cb)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.clip(area_a + area_b - inter, 1e-6, None)


def pairwise_iou_3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) x (M, 7) → (N, M) 3D IoU with z-overlap (ref: iou3d_nms.cpp boxes_iou3d_gpu)."""
    ca = boxes_to_corners_bev(boxes_a)
    cb = boxes_to_corners_bev(boxes_b)
    inter_bev = _inter_area_pairwise(ca, cb)
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
