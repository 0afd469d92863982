"""Generic detector post-processing (ref: detector3d_template.py:178-284).

Class-agnostic multi-class NMS over anchor-head outputs with fixed-size
padded results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.nms import nms_bev


def post_process_anchor(boxes, cls_scores, post_cfg):
    """boxes (B, N, 7), cls_scores (B, N, C) sigmoid → padded final dets.

    Implements the class-agnostic path of the reference post_processing
    (ref: detector3d_template.py:220-272): max over classes for the score,
    score threshold, rotated NMS.
    """
    nms_cfg = post_cfg["NMS_CONFIG"]
    score_thresh = float(post_cfg.get("SCORE_THRESH", 0.1))
    pre_max = int(nms_cfg["NMS_PRE_MAXSIZE"])
    post_max = int(nms_cfg["NMS_POST_MAXSIZE"])
    thresh = float(nms_cfg["NMS_THRESH"])

    scores = jnp.max(cls_scores, axis=-1)
    labels = jnp.argmax(cls_scores, axis=-1) + 1  # 1-based
    valid = scores > score_thresh

    def per_sample(bx, sc, lb, vm):
        sel, num = nms_bev(bx, sc, vm, thresh, pre_max, post_max)
        ok = sel >= 0
        safe = jnp.clip(sel, 0)
        return (
            bx[safe] * ok[:, None],
            sc[safe] * ok,
            lb[safe] * ok,
            ok,
        )

    return jax.vmap(per_sample)(boxes, scores, labels, valid)
