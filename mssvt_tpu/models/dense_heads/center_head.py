"""CenterPoint-style detection head (ref: pcdet/models/dense_heads/center_head.py).

TPU-native re-design:
- NHWC convs; BatchNorm via flax.
- Target assignment (:func:`assign_targets`) is fully vectorized on device
  (scatter-max gaussians), replacing the reference's per-sample/per-box CPU
  python loop (ref: center_head.py:103-219).
- Decode + NMS produce fixed-size padded outputs with validity masks; the
  host strips padding at the very end (ref does dynamic filtering inline).

Multi-head support (CLASS_NAMES_EACH_HEAD), per-class NMS_THRESH lists (the
MsSVT-repo extension, ref: center_head.py:281-307) are supported via config.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..model_utils.layers import BatchNorm

from ...ops.nms import nms_bev
from ..losses import focal_loss_centernet, reg_loss_centernet
from ..model_utils.centernet import (
    decode_bbox_from_heatmap,
    draw_gaussians,
    draw_gaussians_dense,
    gaussian_radius,
)


class SeparateHead(nn.Module):
    """Per-task conv towers (ref: center_head.py:11-45)."""

    head_dict: Any  # {name: {out_channels, num_conv}}
    init_bias: float = -2.19
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        out = {}
        for name, spec in dict(self.head_dict).items():
            h = x
            for k in range(int(spec["num_conv"]) - 1):
                h = nn.Conv(
                    x.shape[-1], (3, 3), padding="SAME", use_bias=self.use_bias,
                    dtype=self.dtype, name=f"{name}_conv{k}",
                )(h)
                h = BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name=f"{name}_bn{k}",
                )(h)
                h = nn.relu(h)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if "hm" in name
                else nn.initializers.zeros
            )
            h = nn.Conv(
                int(spec["out_channels"]), (3, 3), padding="SAME", use_bias=True,
                bias_init=bias_init, dtype=self.dtype, name=f"{name}_out",
            )(h)
            out[name] = h.astype(jnp.float32)
        return out


class CenterHead(nn.Module):
    model_cfg: Any  # MODEL.DENSE_HEAD EasyDict
    input_channels: int
    num_class: int
    class_names: Sequence[str]
    grid_size: Sequence[int]
    point_cloud_range: Sequence[float]
    voxel_size: Sequence[float]
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.model_cfg
        self.class_names_each_head = [
            [x for x in names if x in self.class_names]
            for names in cfg["CLASS_NAMES_EACH_HEAD"]
        ]
        # global (1-based) class id for each head-local class
        self.class_id_mapping_each_head = [
            np.array([list(self.class_names).index(x) for x in names], np.int32)
            for names in self.class_names_each_head
        ]
        self.feature_map_stride = int(
            cfg["TARGET_ASSIGNER_CONFIG"].get("FEATURE_MAP_STRIDE", 1)
        )
        self.shared_channel = int(cfg["SHARED_CONV_CHANNEL"])

        self.shared_conv = nn.Conv(
            self.shared_channel, (3, 3), padding="SAME",
            use_bias=bool(cfg.get("USE_BIAS_BEFORE_NORM", False)),
            dtype=self.dtype, name="shared_conv",
        )
        self.shared_bn = BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        heads = []
        for i, names in enumerate(self.class_names_each_head):
            head_dict = {k: dict(v) for k, v in dict(cfg["SEPARATE_HEAD_CFG"]["HEAD_DICT"]).items()}
            head_dict["hm"] = dict(
                out_channels=len(names), num_conv=int(cfg["NUM_HM_CONV"])
            )
            heads.append(SeparateHead(
                head_dict=head_dict,
                use_bias=bool(cfg.get("USE_BIAS_BEFORE_NORM", False)),
                dtype=self.dtype, name=f"head_{i}",
            ))
        self.heads_list = heads

    def __call__(self, spatial_features_2d: jnp.ndarray, train: bool = False):
        x = self.shared_conv(spatial_features_2d.astype(self.dtype))
        x = nn.relu(self.shared_bn(x, use_running_average=not train))
        return [head(x, train=train) for head in self.heads_list]

    # ------------------------------------------------------------------ #
    # Target assignment / loss / decode: pure functions of the config.
    # ------------------------------------------------------------------ #

    def assign_targets(self, gt_boxes: jnp.ndarray, feature_map_size: Tuple[int, int]):
        """Vectorized on-device target assignment (ref: center_head.py:103-219).

        Args:
            gt_boxes: (B, M, C+1) padded; last column is the 1-based global
                class id (0 = padding).
            feature_map_size: static (H, W) of the head feature map.

        Returns one dict per head: heatmaps (B, ncls, H, W),
        target_boxes (B, M, 8+extras), inds (B, M), masks (B, M).
        """
        tac = self.model_cfg["TARGET_ASSIGNER_CONFIG"]
        h, w = feature_map_size
        b, m, code = gt_boxes.shape
        gaussian_overlap = float(tac.get("GAUSSIAN_OVERLAP", 0.1))
        min_radius = int(tac.get("MIN_RADIUS", 2))
        max_radius = int(tac.get("MAX_RADIUS", 24))

        x, y, z = gt_boxes[..., 0], gt_boxes[..., 1], gt_boxes[..., 2]
        dx, dy, dz = gt_boxes[..., 3], gt_boxes[..., 4], gt_boxes[..., 5]
        heading = gt_boxes[..., 6]
        gcls = gt_boxes[..., -1].astype(jnp.int32)  # 1-based global, 0 = pad

        vx, vy = self.voxel_size[0], self.voxel_size[1]
        stride = self.feature_map_stride
        coord_x = jnp.clip((x - self.point_cloud_range[0]) / vx / stride, 0, w - 0.5)
        coord_y = jnp.clip((y - self.point_cloud_range[1]) / vy / stride, 0, h - 0.5)
        center = jnp.stack([coord_x, coord_y], axis=-1)  # (B, M, 2)
        center_int = center.astype(jnp.int32)

        dxf = dx / vx / stride
        dyf = dy / vy / stride
        radius = gaussian_radius(dxf, dyf, min_overlap=gaussian_overlap)
        radius = jnp.clip(radius.astype(jnp.int32), min_radius, None)

        ret = []
        for head_idx, names in enumerate(self.class_names_each_head):
            # global 1-based → head-local 0-based channel, -1 if not in head
            lut = np.full((self.num_class + 1,), -1, np.int32)
            for local, gname in enumerate(names):
                lut[list(self.class_names).index(gname) + 1] = local
            local_cls = jnp.asarray(lut)[jnp.clip(gcls, 0, self.num_class)]

            valid = (
                (local_cls >= 0)
                & (dxf > 0) & (dyf > 0)
                & (center_int[..., 0] >= 0) & (center_int[..., 0] < w)
                & (center_int[..., 1] >= 0) & (center_int[..., 1] < h)
            )

            # dense evaluation (VPU math + max-reduce) beats the scatter-max
            # (descriptor-rate bound: B*M*(2r+1)^2 ≈ 4.8M descriptors/step at
            # MAX_RADIUS=24 on Waymo) whenever the (B, M, H, W) sweep fits;
            # identical output (tests/test_centernet_targets.py)
            drawer = (draw_gaussians_dense
                      if b * m * h * w <= 128 * 1024 * 1024 else draw_gaussians)
            heatmap = drawer(
                (b, len(names), h, w), center, radius,
                jnp.clip(local_cls, 0), valid, max_radius,
            )

            inds = jnp.where(valid, center_int[..., 1] * w + center_int[..., 0], 0)
            safe_dims = jnp.clip(gt_boxes[..., 3:6], 1e-6, None)
            tb = [
                center - center_int.astype(jnp.float32),  # (B, M, 2)
                z[..., None],
                jnp.log(safe_dims),
                jnp.cos(heading)[..., None],
                jnp.sin(heading)[..., None],
            ]
            if code > 8:  # extra regressed attrs (e.g. velocity), ref :154-155
                tb.append(gt_boxes[..., 7:-1])
            target_boxes = jnp.concatenate(tb, axis=-1) * valid[..., None]

            ret.append({
                "heatmaps": heatmap,
                "target_boxes": target_boxes,
                "inds": inds.astype(jnp.int32),
                "masks": valid,
            })
        return ret

    def get_loss(self, pred_dicts: List[Dict], target_dicts: List[Dict]):
        """Ref: center_head.py:225-250."""
        lw = self.model_cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
        code_weights = jnp.asarray(lw["code_weights"], jnp.float32)
        loc_weight = float(lw["loc_weight"])
        head_order = list(self.model_cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"])

        total = 0.0
        tb = {}
        for i, (pred, tgt) in enumerate(zip(pred_dicts, target_dicts)):
            hm = jnp.clip(jax.nn.sigmoid(pred["hm"]), 1e-4, 1 - 1e-4)
            hm_nchw = jnp.transpose(hm, (0, 3, 1, 2))
            hm_loss = focal_loss_centernet(hm_nchw, tgt["heatmaps"])

            pred_boxes = jnp.concatenate([pred[k] for k in head_order], axis=-1)
            reg = reg_loss_centernet(pred_boxes, tgt["masks"], tgt["inds"], tgt["target_boxes"])
            loc_loss = (reg * code_weights).sum() * loc_weight

            total = total + hm_loss + loc_loss
            tb[f"hm_loss_head_{i}"] = hm_loss
            tb[f"loc_loss_head_{i}"] = loc_loss
        tb["rpn_loss"] = total
        return total, tb

    def generate_predicted_boxes(self, pred_dicts: List[Dict]):
        """Decode + per-head NMS → fixed-size padded outputs.

        Ref: center_head.py:252-330. Returns (boxes (B, N, 7+), scores (B, N),
        labels (B, N) 1-based, mask (B, N)) with N = heads * NMS_POST_MAXSIZE.
        """
        pp = self.model_cfg["POST_PROCESSING"]
        nms_cfg = pp["NMS_CONFIG"]
        k = int(pp["MAX_OBJ_PER_SAMPLE"])
        score_thresh = float(pp["SCORE_THRESH"])
        post_range = list(pp["POST_CENTER_LIMIT_RANGE"])
        head_order = list(self.model_cfg["SEPARATE_HEAD_CFG"]["HEAD_ORDER"])
        pre_max = int(nms_cfg["NMS_PRE_MAXSIZE"])
        post_max = int(nms_cfg["NMS_POST_MAXSIZE"])
        thresh_cfg = nms_cfg["NMS_THRESH"]
        # NMS_TYPE circle_nms: center-distance suppression, no rotated IoU
        # (ref: centernet_utils.py:80-104 + model_nms_utils class_agnostic_nms
        # dispatch); thresholds are metric radii in that mode.
        if str(nms_cfg.get("NMS_TYPE", "nms_gpu")) == "circle_nms":
            from ...ops.nms import circle_nms as _nms_fn
        else:
            _nms_fn = nms_bev

        all_boxes, all_scores, all_labels, all_mask = [], [], [], []
        for head_idx, pred in enumerate(pred_dicts):
            hm = jax.nn.sigmoid(pred["hm"])
            boxes, scores, labels_local, mask = decode_bbox_from_heatmap(
                heatmap=hm,
                rot_cos=pred["rot"][..., 0:1],
                rot_sin=pred["rot"][..., 1:2],
                center=pred["center"],
                center_z=pred["center_z"],
                dim=jnp.exp(jnp.clip(pred["dim"], -8, 8)),
                vel=pred.get("vel") if "vel" in head_order else None,
                point_cloud_range=self.point_cloud_range,
                voxel_size=self.voxel_size,
                feature_map_stride=self.feature_map_stride,
                k=k, score_thresh=score_thresh,
                post_center_limit_range=post_range,
            )
            id_map = jnp.asarray(self.class_id_mapping_each_head[head_idx])

            if isinstance(thresh_cfg, (list, tuple)) and len(thresh_cfg) > 1:
                # per-class NMS (MsSVT-repo extension, ref :286-307)
                for ci, cth in enumerate(thresh_cfg):
                    cmask = mask & (labels_local == ci)
                    sel, _ = jax.vmap(
                        lambda bx, sc, vm: _nms_fn(bx, sc, vm, float(cth), pre_max, post_max)
                    )(boxes, scores, cmask)
                    self._append_selected(
                        sel, boxes, scores, labels_local, id_map,
                        all_boxes, all_scores, all_labels, all_mask,
                    )
            else:
                th = float(thresh_cfg[0] if isinstance(thresh_cfg, (list, tuple)) else thresh_cfg)
                sel, _ = jax.vmap(
                    lambda bx, sc, vm: _nms_fn(bx, sc, vm, th, pre_max, post_max)
                )(boxes, scores, mask)
                self._append_selected(
                    sel, boxes, scores, labels_local, id_map,
                    all_boxes, all_scores, all_labels, all_mask,
                )

        return (
            jnp.concatenate(all_boxes, axis=1),
            jnp.concatenate(all_scores, axis=1),
            jnp.concatenate(all_labels, axis=1),
            jnp.concatenate(all_mask, axis=1),
        )

    @staticmethod
    def _append_selected(sel, boxes, scores, labels_local, id_map,
                         all_boxes, all_scores, all_labels, all_mask):
        ok = sel >= 0
        safe = jnp.clip(sel, 0)
        bsel = jnp.take_along_axis(boxes, safe[..., None], axis=1)
        ssel = jnp.take_along_axis(scores, safe, axis=1)
        lsel = jnp.take_along_axis(labels_local, safe, axis=1)
        gsel = id_map[jnp.clip(lsel, 0)] + 1  # 1-based global (ref :328)
        all_boxes.append(bsel * ok[..., None])
        all_scores.append(ssel * ok)
        all_labels.append(gsel * ok)
        all_mask.append(ok)
