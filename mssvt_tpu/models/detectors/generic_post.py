"""Generic detector post-processing (ref: detector3d_template.py:178-284).

Class-agnostic multi-class NMS over anchor-head outputs with fixed-size
padded results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.nms import nms_bev


def apply_vfe(vfe, batch, train: bool = False):
    """Dispatch the batch onto the VFE family's call signature (the
    reference's VFEs likewise read different batch_dict keys — ref:
    vfe/mean_vfe.py:14 vs pillar_vfe.py:52 vs dynamic_vfe.py:13)."""
    from ..backbones_3d.vfe import DynamicVFE, HardVFE, MeanVFE, PillarVFE

    if isinstance(vfe, MeanVFE):
        return vfe(batch["voxels"], batch["voxel_num_points"])
    if isinstance(vfe, (PillarVFE, HardVFE)):
        return vfe(batch["voxels"], batch["voxel_num_points"],
                   batch["voxel_coords"], train=train)
    if isinstance(vfe, DynamicVFE):
        return vfe(batch["points"], batch["point_voxel_rows"],
                   batch["voxel_coords"], train=train)
    raise TypeError(f"unknown VFE family: {type(vfe).__name__}")


def apply_backbone_3d(b3d, sp, train: bool = False):
    """Dispatch on the 3D-backbone family's call signature."""
    from ..backbones_3d.mssvt import MixedScaleSparseTransformer

    if isinstance(b3d, MixedScaleSparseTransformer):
        return b3d(sp, deterministic=not train)
    return b3d(sp, train=train)


def run_dense_head(head, spatial_2d, batch, post_cfg, train: bool = False):
    """Family-dispatched dense-head tail: targets+loss in train, decoded
    (boxes, scores, labels, mask) in eval. CenterHead decodes + NMSes
    internally (ref: centerpoint.py:36); anchor heads decode raw boxes that
    go through the generic post-processing (ref: detector3d_template.py:178).
    """
    from ..dense_heads.center_head import CenterHead

    preds = head(spatial_2d, train=train)
    out = {"pred_dicts": preds}
    if train:
        if isinstance(head, CenterHead):
            targets = head.assign_targets(
                batch["gt_boxes"], feature_map_size=spatial_2d.shape[1:3])
        else:
            targets = head.assign_targets(batch["gt_boxes"])
        loss, tb = head.get_loss(preds, targets)
        out["loss"] = loss
        out["tb_dict"] = tb
        return out
    if isinstance(head, CenterHead):
        fb, fs, fl, fm = head.generate_predicted_boxes(preds)
    else:
        boxes, scores = head.generate_predicted_boxes(preds)
        fb, fs, fl, fm = post_process_anchor(boxes, scores, post_cfg)
    out.update({"final_boxes": fb, "final_scores": fs,
                "final_labels": fl, "final_mask": fm})
    return out


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
