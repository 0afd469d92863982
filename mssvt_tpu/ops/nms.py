"""Rotated-BEV NMS, on-device with static shapes.

Replaces the bitmask CUDA NMS (ref: iou3d_nms_kernel.cu:267-327) with:
precomputed pairwise rotated IoU + a sequential greedy suppression loop
(``lax.fori_loop``) over score-sorted boxes. For the CenterHead post-sizes
used here (pre ≤ ~1024 boxes) the IoU matrix is tiny and the loop is cheap.

Outputs are fixed-size: (selected_idx (post_max,), count) where padding slots
are -1 — the caller filters on host at the very end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .box_ops import pairwise_iou_bev


def nms_bev(boxes, scores, valid, thresh: float, pre_max: int, post_max: int):
    """Greedy rotated NMS.

    Args:
        boxes: (N, 7+) padded boxes.
        scores: (N,) scores (invalid entries ignored).
        valid: (N,) bool.
        thresh: IoU threshold.
        pre_max: static candidate cap (top-scoring `pre_max` considered),
            matching NMS_PRE_MAXSIZE (ref: model_nms_utils.py:27-38).
        post_max: static output cap (NMS_POST_MAXSIZE).

    Returns:
        selected: (post_max,) int32 indices into the INPUT boxes, -1 padded.
        num_selected: () int32.
    """
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg_inf)
    top_scores, order = jax.lax.top_k(s, min(pre_max, boxes.shape[0]))
    cand = boxes[order][:, :7]
    cand_valid = jnp.isfinite(top_scores)
    k = cand.shape[0]

    iou = pairwise_iou_bev(cand, cand)

    # Blocked greedy suppression (same recipe as the CUDA bitmask kernel,
    # ref: iou3d_nms_kernel.cu:267-327): the score-ordered scan runs in
    # blocks of 64 — the intra-block pass is fully unrolled straight-line
    # vector code, and cross-block suppression is one masked any-reduction —
    # cutting sequential loop trips from K to K/64 (measured 956ms → see
    # bench history for the 1024-box case).
    block = 64
    k_pad = ((k + block - 1) // block) * block
    pad = k_pad - k
    iou_p = jnp.pad(iou, ((0, pad), (0, pad)))
    valid_p = jnp.pad(cand_valid, (0, pad))

    def outer(bi, state):
        keep, suppressed = state
        start = bi * block
        sup_blk = jax.lax.dynamic_slice(suppressed, (start,), (block,))
        val_blk = jax.lax.dynamic_slice(valid_p, (start,), (block,))
        iou_intra = jax.lax.dynamic_slice(iou_p, (start, start), (block, block))
        keep_blk = jnp.zeros((block,), bool)
        cols = jnp.arange(block)
        for i in range(block):  # static unroll
            k_i = (~sup_blk[i]) & val_blk[i]
            keep_blk = keep_blk.at[i].set(k_i)
            sup_blk = sup_blk | (k_i & (iou_intra[i] > thresh) & (cols > i))
        keep = jax.lax.dynamic_update_slice(keep, keep_blk, (start,))
        iou_rows = jax.lax.dynamic_slice(iou_p, (start, 0), (block, k_pad))
        sup_new = jnp.any((iou_rows > thresh) & keep_blk[:, None], axis=0)
        after = jnp.arange(k_pad) >= start + block
        return keep, suppressed | (sup_new & after)

    keep = jnp.zeros((k_pad,), bool)
    suppressed = jnp.zeros((k_pad,), bool)
    keep, _ = jax.lax.fori_loop(0, k_pad // block, outer, (keep, suppressed))
    keep = keep[:k]

    # compact kept candidates (in score order) into post_max slots
    slot = jnp.cumsum(keep) - 1
    dest = jnp.where(keep & (slot < post_max), slot, post_max)
    selected = jnp.full((post_max,), -1, jnp.int32).at[dest].set(
        order.astype(jnp.int32), mode="drop"
    )
    num = jnp.minimum(keep.sum(), post_max).astype(jnp.int32)
    return selected, num


def circle_nms(boxes, scores, valid, min_radius: float, pre_max: int,
               post_max: int):
    """Center-distance greedy suppression (ref: numba ``circle_nms``,
    pcdet/models/model_utils/centernet_utils.py:80-104): a candidate is
    suppressed when its center lies within ``min_radius`` of an already-kept
    higher-scoring box. No rotated IoU at all — the CenterPoint fast path.

    Same fixed-size contract as :func:`nms_bev`.
    """
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg_inf)
    top_scores, order = jax.lax.top_k(s, min(pre_max, boxes.shape[0]))
    cand = boxes[order][:, :2]  # centers only
    cand_valid = jnp.isfinite(top_scores)
    k = cand.shape[0]

    d2 = jnp.sum(
        (cand[:, None, :] - cand[None, :, :]) ** 2, axis=-1)  # (K, K)
    close = d2 < float(min_radius) ** 2

    block = 64
    k_pad = ((k + block - 1) // block) * block
    pad = k_pad - k
    close_p = jnp.pad(close, ((0, pad), (0, pad)))
    valid_p = jnp.pad(cand_valid, (0, pad))

    def outer(bi, state):
        keep, suppressed = state
        start = bi * block
        sup_blk = jax.lax.dynamic_slice(suppressed, (start,), (block,))
        val_blk = jax.lax.dynamic_slice(valid_p, (start,), (block,))
        cl_intra = jax.lax.dynamic_slice(close_p, (start, start), (block, block))
        keep_blk = jnp.zeros((block,), bool)
        cols = jnp.arange(block)
        for i in range(block):  # static unroll
            k_i = (~sup_blk[i]) & val_blk[i]
            keep_blk = keep_blk.at[i].set(k_i)
            sup_blk = sup_blk | (k_i & cl_intra[i] & (cols > i))
        keep = jax.lax.dynamic_update_slice(keep, keep_blk, (start,))
        cl_rows = jax.lax.dynamic_slice(close_p, (start, 0), (block, k_pad))
        sup_new = jnp.any(cl_rows & keep_blk[:, None], axis=0)
        after = jnp.arange(k_pad) >= start + block
        return keep, suppressed | (sup_new & after)

    keep = jnp.zeros((k_pad,), bool)
    suppressed = jnp.zeros((k_pad,), bool)
    keep, _ = jax.lax.fori_loop(0, k_pad // block, outer, (keep, suppressed))
    keep = keep[:k]

    slot = jnp.cumsum(keep) - 1
    dest = jnp.where(keep & (slot < post_max), slot, post_max)
    selected = jnp.full((post_max,), -1, jnp.int32).at[dest].set(
        order.astype(jnp.int32), mode="drop"
    )
    num = jnp.minimum(keep.sum(), post_max).astype(jnp.int32)
    return selected, num
