"""Detection losses (ref: pcdet/utils/loss_utils.py:9-385).

All losses are pure jnp functions over padded, masked tensors.
"""

from __future__ import annotations

import jax.numpy as jnp


def sigmoid_focal_cls_loss(pred_logits, target, weights, gamma=2.0, alpha=0.25):
    """Sigmoid focal loss (ref: loss_utils.py:9-73). Returns per-anchor loss."""
    pred_sigmoid = jnp.clip(jax_sigmoid(pred_logits), 1e-7, 1 - 1e-7)
    alpha_weight = target * alpha + (1 - target) * (1 - alpha)
    pt = target * (1.0 - pred_sigmoid) + (1.0 - target) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    # numerically-stable BCE with logits
    bce = jnp.clip(pred_logits, 0, None) - pred_logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(pred_logits))
    )
    loss = focal_weight * bce
    return loss * weights[..., None] if weights is not None else loss


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def weighted_smooth_l1(pred, target, weights=None, beta=1.0 / 9.0, code_weights=None):
    """Smooth-L1 (ref: loss_utils.py:75-137)."""
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)
    n = jnp.abs(diff)
    loss = jnp.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_l1(pred, target, weights=None, code_weights=None):
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)
    loss = jnp.abs(diff)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_cross_entropy(pred_logits, target_onehot, weights):
    """Per-anchor CE with one-hot targets (ref: loss_utils.py:181-207)."""
    logp = pred_logits - jax_logsumexp(pred_logits)
    loss = -(target_onehot * logp).sum(-1)
    return loss * weights


def jax_logsumexp(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True))


def focal_loss_centernet(pred, gt):
    """CornerNet focal loss on an already-sigmoided heatmap.

    Ref: loss_utils.py:264-300 (``neg_loss_cornernet`` +
    ``FocalLossCenterNet``): positives at gt==1, negative weights (1-gt)^4,
    normalized by the number of positives.
    """
    pos_inds = (gt == 1.0).astype(pred.dtype)
    neg_inds = (gt < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1 - gt, 4)

    pos_loss = jnp.log(pred) * jnp.power(1 - pred, 2) * pos_inds
    neg_loss = jnp.log(1 - pred) * jnp.power(pred, 2) * neg_weights * neg_inds

    num_pos = pos_inds.sum()
    pos_loss = pos_loss.sum()
    neg_loss = neg_loss.sum()
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.clip(num_pos, 1.0))


def _boxes_to_corners_3d(boxes):
    """(N, 7) → (N, 8, 3) corners, jnp (ref: box_utils.py boxes_to_corners_3d).

    Same corner ordering as the reference template (x-major, bottom face
    first), so corner-wise distances match the torch oracle exactly.
    """
    template = jnp.asarray([
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ], boxes.dtype) / 2
    corners = boxes[:, None, 3:6] * template[None]  # (N, 8, 3)
    cosa = jnp.cos(boxes[:, 6])[:, None]
    sina = jnp.sin(boxes[:, 6])[:, None]
    x = corners[..., 0] * cosa - corners[..., 1] * sina
    y = corners[..., 0] * sina + corners[..., 1] * cosa
    return jnp.stack([x, y, corners[..., 2]], axis=-1) + boxes[:, None, 0:3]


def get_corner_loss_lidar(pred_bbox3d, gt_bbox3d):
    """Corner-distance smooth-L1 with heading-flip tolerance.

    Ref: loss_utils.py:209-233 (``get_corner_loss_lidar``): corner L2
    distances against the GT box and its pi-flipped twin, elementwise min,
    smooth-L1 at beta=1, mean over the 8 corners. (N, 7) x (N, 7) → (N,).
    """
    pred_c = _boxes_to_corners_3d(pred_bbox3d)
    gt_c = _boxes_to_corners_3d(gt_bbox3d)
    gt_flip = gt_bbox3d.at[:, 6].add(jnp.pi)
    gt_c_flip = _boxes_to_corners_3d(gt_flip)

    def _safe_norm(v):
        # sqrt has an infinite derivative at 0; padded RoIs produce exactly
        # coincident (zero) corners, so guard or the whole backward NaNs
        s = (v * v).sum(axis=2)
        nz = s > 1e-12
        return jnp.sqrt(jnp.where(nz, s, 1.0)) * nz

    d = jnp.minimum(_safe_norm(pred_c - gt_c),
                    _safe_norm(pred_c - gt_c_flip))  # (N, 8)
    loss = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    return loss.mean(axis=1)


def reg_loss_centernet(pred_bhwc, mask, ind, target):
    """Masked L1 regression at object centers.

    Ref: loss_utils.py:330-385 (``RegLossCenterNet`` + ``_reg_loss``):
    gather predictions at flat center indices, L1 against targets, normalized
    per-channel by (num_pos + 1e-4). ``pred_bhwc`` is NHWC; returns a
    per-code-dim loss vector (code_weights applied by the caller).
    """
    b, h, w, c = pred_bhwc.shape
    flat = pred_bhwc.reshape(b, h * w, c)
    pred = jnp.take_along_axis(flat, ind[..., None], axis=1)  # (B, M, c)
    m = mask[..., None].astype(pred.dtype)
    num = mask.astype(pred.dtype).sum()
    loss = jnp.abs(pred * m - target * m)  # isnan guard unnecessary: targets finite
    loss = loss.sum(axis=(0, 1)) / (num + 1e-4)
    return loss  # (c,)
