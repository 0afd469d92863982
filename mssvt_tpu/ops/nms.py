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

    def body(i, state):
        keep, suppressed = state
        is_keep = (~suppressed[i]) & cand_valid[i]
        keep = keep.at[i].set(is_keep)
        newly = is_keep & (iou[i] > thresh) & (jnp.arange(k) > i)
        return keep, suppressed | newly

    keep = jnp.zeros((k,), bool)
    suppressed = jnp.zeros((k,), bool)
    keep, _ = jax.lax.fori_loop(0, k, body, (keep, suppressed))

    # compact kept candidates (in score order) into post_max slots
    slot = jnp.cumsum(keep) - 1
    dest = jnp.where(keep & (slot < post_max), slot, post_max)
    selected = jnp.full((post_max,), -1, jnp.int32).at[dest].set(
        order.astype(jnp.int32), mode="drop"
    )
    num = jnp.minimum(keep.sum(), post_max).astype(jnp.int32)
    return selected, num
