"""Whole-detector TAIL parity vs the reference source (VERDICT r4 item 5).

HeightCompression (+compress conv stack) → BaseBEVBackbone → CenterHead
forward → ``decode_bbox_from_heatmap`` top-K decode → ``class_agnostic_nms``,
all executed from the ACTUAL reference source files
(ref: pcdet/models/backbones_2d/map_to_bev/height_compression.py:5-51,
backbones_2d/base_bev_backbone.py:6-114, dense_heads/center_head.py:252-330,
model_utils/centernet_utils.py:136-216, model_utils/model_nms_utils.py:6-36)
via ``ref_loader`` on CPU, against our flax modules under
``convert_state_dict``-imported weights. Together with
tests/test_block_parity.py (MeanVFE + full 3D backbone), this closes numeric
parity over the ENTIRE inference graph: the decoded boxes, scores and labels
coming out of both detectors must match.

Oracle-independence note: the reference's rotated-IoU NMS lives in a compiled
CUDA extension absent from the snapshot runtime, so the ``nms_gpu`` stub here
reimplements its documented greedy semantics
(ref: pcdet/ops/iou3d_nms/iou3d_nms_utils.py:84-99 + iou3d_nms_kernel.cu) on
CPU using our ``pairwise_iou_bev`` — whose values are themselves validated
against a rasterization oracle in tests/test_box_ops.py. Decode parity is
additionally asserted BEFORE NMS (pre-NMS top-K boxes/scores/labels), so the
NMS stage receives provably identical inputs on both sides.

Top-K note: the decode grid is sized so ``topk_heatmap`` takes its EXACT
``lax.top_k`` path (h*w <= 4K) — the approximate top-k is a documented
TPU-scale optimization, not a semantics change at test scale.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from ref_cpu_ops import install_ref_cpu_ops
from ref_loader import cpu_cuda_shim, load_ref

from mssvt_tpu.core.sparse import SparseVoxels
from mssvt_tpu.utils.edict import EasyDict

F32 = jax.default_matmul_precision("float32")

GRID = (16, 16, 4)        # (x, y, z)
VOXEL = (0.4, 0.4, 0.5)
PCR = (-3.2, -3.2, -1.0, 3.2, 3.2, 1.0)
C = 32
NUM_BEV = C * GRID[2]     # 128
BATCH = 2
CLASS_NAMES = ["Vehicle", "Pedestrian", "Cyclist"]


def _stub_numba():
    """The reference's centernet_utils imports numba (absent from the image)
    only for the CUDA-free circle_nms path, which this test never takes."""
    if "numba" in sys.modules:
        return
    numba = types.ModuleType("numba")
    numba.jit = lambda *a, **k: (lambda f: f)
    sys.modules["numba"] = numba


def _install_cpu_nms():
    """Attach a CPU ``nms_gpu`` with the reference's exact greedy semantics
    to the iou3d_nms_utils stub (see module docstring)."""
    from mssvt_tpu.ops.box_ops import pairwise_iou_bev

    def nms_gpu(boxes, scores, thresh, pre_maxsize=None, **kwargs):
        order = scores.sort(0, descending=True)[1]
        if pre_maxsize is not None:
            order = order[:pre_maxsize]
        b = boxes[order].detach().numpy()
        n = len(b)
        if n == 0:
            return torch.zeros((0,), dtype=torch.long), None
        iou = np.asarray(pairwise_iou_bev(jnp.asarray(b), jnp.asarray(b)))
        keep, suppressed = [], np.zeros(n, bool)
        for i in range(n):
            if suppressed[i]:
                continue
            keep.append(i)
            suppressed |= iou[i] > thresh
        return order[torch.tensor(keep, dtype=torch.long)], None

    sys.modules["refpcdet.ops.iou3d_nms.iou3d_nms_utils"].nms_gpu = nms_gpu


def _dense_head_cfg():
    return EasyDict({
        "CLASS_NAMES_EACH_HEAD": [CLASS_NAMES],
        "SHARED_CONV_CHANNEL": 32,
        "USE_BIAS_BEFORE_NORM": False,
        "NUM_HM_CONV": 2,
        "SEPARATE_HEAD_CFG": EasyDict({
            "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
            "HEAD_DICT": EasyDict({
                "center": {"out_channels": 2, "num_conv": 2},
                "center_z": {"out_channels": 1, "num_conv": 2},
                "dim": {"out_channels": 3, "num_conv": 2},
                "rot": {"out_channels": 2, "num_conv": 2},
            }),
        }),
        "TARGET_ASSIGNER_CONFIG": EasyDict({
            "FEATURE_MAP_STRIDE": 1, "NUM_MAX_OBJS": 16,
            "GAUSSIAN_OVERLAP": 0.1, "MIN_RADIUS": 2, "MAX_RADIUS": 8,
        }),
        "LOSS_CONFIG": EasyDict({"LOSS_WEIGHTS": {
            "cls_weight": 1.0, "loc_weight": 2.0, "code_weights": [1.0] * 8}}),
        "POST_PROCESSING": EasyDict({
            "SCORE_THRESH": 0.05,
            "POST_CENTER_LIMIT_RANGE": [-10.0, -10.0, -10.0, 10.0, 10.0, 10.0],
            "MAX_OBJ_PER_SAMPLE": 64,
            "NMS_CONFIG": EasyDict({
                "NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
                "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16,
            }),
        }),
    })


def _hc_cfg():
    return EasyDict({
        "NUM_BEV_FEATURES": NUM_BEV, "COMPRESS_LAYER_NUMS": 2,
        "LAYER_STRIDES": [1, 1], "LAYER_DIALATIONS": [1, 2],
        "LAYER_PADDINGS": [1, 2],
    })


def _bev_cfg():
    return EasyDict({
        "LAYER_NUMS": [1, 1], "LAYER_STRIDES": [1, 2],
        "NUM_FILTERS": [32, 64], "UPSAMPLE_STRIDES": [1, 2],
        "NUM_UPSAMPLE_FILTERS": [32, 32],
    })


def _randomize_state(module, rng):
    """Random-but-loadable weights: conv/linear get fan-in-scaled noise so
    activations stay O(1) through the stack (large activations would push the
    heads into sigmoid/exp saturation and swamp the f32 conv-order noise);
    BN stats are moved off their init so eval-mode normalization is
    exercised for real."""
    sd = module.state_dict()
    new = {}
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            new[k] = v
            continue
        r = torch.from_numpy(
            rng.standard_normal(tuple(v.shape)).astype(np.float32))
        if "running_var" in k:
            new[k] = r.abs() * 0.3 + 0.85
        elif "running_mean" in k:
            new[k] = r * 0.1
        elif k.endswith(".bias") or "bias" in k.split(".")[-1]:
            new[k] = r * 0.1
        elif v.ndim <= 1:  # BN weight
            new[k] = r.abs() * 0.2 + 0.9
        else:
            fan_in = int(np.prod(v.shape[1:]))
            new[k] = r * (1.3 / np.sqrt(fan_in))
    module.load_state_dict(new)


def _make_scene(rng, n=180):
    rows = set()
    while len(rows) < n:
        rows.add((int(rng.integers(0, BATCH)), int(rng.integers(0, GRID[2])),
                  int(rng.integers(0, GRID[1])), int(rng.integers(0, GRID[0]))))
    coords = np.asarray(sorted(rows), np.int32)
    feats = rng.standard_normal((len(coords), C)).astype(np.float32)
    return coords, feats


def test_detector_tail_parity_vs_reference_source():
    install_ref_cpu_ops()
    _stub_numba()
    mu = load_ref("models.model_utils.mssvt_utils")
    hc_mod = load_ref("models.backbones_2d.map_to_bev.height_compression")
    bev_mod = load_ref("models.backbones_2d.base_bev_backbone")
    with cpu_cuda_shim():
        ch_mod = load_ref("models.dense_heads.center_head")
    _install_cpu_nms()

    rng = np.random.default_rng(123)
    coords, feats = _make_scene(rng)

    # ---------------- reference side (actual source, CPU) ----------------
    with cpu_cuda_shim():
        ref_hc = hc_mod.HeightCompression(_hc_cfg())
        ref_bev = bev_mod.BaseBEVBackbone(_bev_cfg(), NUM_BEV)
        ref_head = ch_mod.CenterHead(
            _dense_head_cfg(), input_channels=64, num_class=3,
            class_names=CLASS_NAMES, grid_size=np.asarray(GRID),
            point_cloud_range=PCR, voxel_size=VOXEL,
            predict_boxes_when_training=False)
    _randomize_state(ref_hc, np.random.default_rng(1))
    _randomize_state(ref_bev, np.random.default_rng(2))
    _randomize_state(ref_head, np.random.default_rng(3))
    ref_hc.eval(), ref_bev.eval(), ref_head.eval()

    sp_ref = mu.SparseTensor(
        features=torch.from_numpy(feats.copy()),
        indices=torch.from_numpy(coords.copy()),
        spatial_shape=list(GRID), voxel_size=list(VOXEL),
        point_cloud_range=list(PCR), batch_size=BATCH, hash_size=10007)
    bd = {"encoded_spconv_tensor": sp_ref, "encoded_spconv_tensor_stride": 1,
          "batch_size": BATCH}
    with torch.no_grad(), cpu_cuda_shim():
        bd = ref_hc(bd)
        bd = ref_bev(bd)
        x_shared = ref_head.shared_conv(bd["spatial_features_2d"])
        ref_preds = [h(x_shared) for h in ref_head.heads_list]
        ref_final = ref_head.generate_predicted_boxes(BATCH, [
            {k: v.clone() for k, v in p.items()} for p in ref_preds])

    # ---------------- our side (flax, imported weights) -------------------
    from mssvt_tpu.models.backbones_2d.base_bev_backbone import BaseBEVBackbone
    from mssvt_tpu.models.backbones_2d.map_to_bev import HeightCompression
    from mssvt_tpu.models.dense_heads.center_head import CenterHead
    from mssvt_tpu.runtime.torch_import import convert_state_dict

    cap = 256
    pad_c = np.full((cap, 4), -1, np.int32)
    pad_c[: len(coords)] = coords
    pad_f = np.zeros((cap, C), np.float32)
    pad_f[: len(feats)] = feats
    valid = np.arange(cap) < len(coords)
    sp = SparseVoxels.create(
        features=jnp.asarray(pad_f), coords=jnp.asarray(pad_c),
        valid=jnp.asarray(valid), batch_size=BATCH, spatial_shape=GRID,
        voxel_size=VOXEL, point_cloud_range=PCR, with_index=False)

    hc = HeightCompression(
        num_bev_features=NUM_BEV, compress_layer_nums=2,
        layer_strides=(1, 1), layer_dilations=(1, 2), layer_paddings=(1, 2))
    bev = BaseBEVBackbone(
        layer_nums=(1, 1), layer_strides=(1, 2), num_filters=(32, 64),
        upsample_strides=(1, 2), num_upsample_filters=(32, 32))
    head = CenterHead(
        model_cfg=_dense_head_cfg(), input_channels=64, num_class=3,
        class_names=CLASS_NAMES, grid_size=GRID, point_cloud_range=PCR,
        voxel_size=VOXEL)

    k0 = jax.random.PRNGKey(0)
    with F32:
        v_hc = hc.init(k0, sp, train=False)
        bev_in = hc.apply(v_hc, sp, train=False)
        v_bev = bev.init(k0, bev_in, train=False)
        x2d = bev.apply(v_bev, bev_in, train=False)
        v_head = head.init(k0, x2d, train=False)

    # assemble the full-model tree shape convert_state_dict expects, with the
    # reference state dict keyed as a whole-detector checkpoint would be
    def merged(tree_key):
        return {
            "map_to_bev": v_hc.get(tree_key, {}),
            "backbone_2d": v_bev.get(tree_key, {}),
            "dense_head": v_head.get(tree_key, {}),
        }

    variables = {"params": merged("params"), "batch_stats": merged("batch_stats")}
    state = {}
    for prefix, mod in (("map_to_bev_module.", ref_hc),
                        ("backbone_2d.", ref_bev),
                        ("dense_head.", ref_head)):
        for k, v in mod.state_dict().items():
            state[prefix + k] = v.detach().numpy()
    new_vars, report = convert_state_dict(state, variables,
                                          bev_depth=GRID[2])
    missing = [m for m in report["missing"]]
    assert not missing, f"unmapped flax leaves: {missing}"
    assert not report["shape_mismatch"], report["shape_mismatch"]

    def split(tree_key, name):
        return new_vars[tree_key][name]

    nv_hc = {"params": split("params", "map_to_bev"),
             "batch_stats": split("batch_stats", "map_to_bev")}
    nv_bev = {"params": split("params", "backbone_2d"),
              "batch_stats": split("batch_stats", "backbone_2d")}
    nv_head = {"params": split("params", "dense_head"),
               "batch_stats": split("batch_stats", "dense_head")}

    with F32:
        bev_in = hc.apply(nv_hc, sp, train=False)
        x2d = bev.apply(nv_bev, bev_in, train=False)
        preds = head.apply(nv_head, x2d, train=False)
        boxes, scores, labels, mask = head.apply(
            nv_head, preds,
            method=lambda m, pd: m.generate_predicted_boxes(pd))

    # ---- stage checks: BEV features and head maps match ----
    ref_2d = bd["spatial_features_2d"].numpy()        # (B, C, H, W)
    ours_2d = np.transpose(np.asarray(x2d), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_2d, ref_2d, rtol=1e-4, atol=2e-4)
    for name in ("hm", "center", "center_z", "dim", "rot"):
        r = ref_preds[0][name].detach().numpy()       # (B, c, H, W)
        o = np.transpose(np.asarray(preds[0][name]), (0, 3, 1, 2))
        np.testing.assert_allclose(o, r, rtol=1e-4, atol=3e-4, err_msg=name)

    # ---- pre-NMS decode parity: run the REFERENCE decode on the ref maps
    # and our decode on ours; the surviving (mask=True) top-K sets match ----
    from mssvt_tpu.models.model_utils.centernet import decode_bbox_from_heatmap

    pp = _dense_head_cfg()["POST_PROCESSING"]
    with F32:
        our_boxes, our_scores, our_labels, our_mask = decode_bbox_from_heatmap(
            heatmap=jax.nn.sigmoid(preds[0]["hm"]),
            rot_cos=preds[0]["rot"][..., 0:1],
            rot_sin=preds[0]["rot"][..., 1:2],
            center=preds[0]["center"], center_z=preds[0]["center_z"],
            dim=jnp.exp(jnp.clip(preds[0]["dim"], -8, 8)),
            point_cloud_range=PCR, voxel_size=VOXEL, feature_map_stride=1,
            k=pp["MAX_OBJ_PER_SAMPLE"], score_thresh=pp["SCORE_THRESH"],
            post_center_limit_range=pp["POST_CENTER_LIMIT_RANGE"])
    cn = load_ref("models.model_utils.centernet_utils")
    with torch.no_grad(), cpu_cuda_shim():
        ref_decoded = cn.decode_bbox_from_heatmap(
            heatmap=ref_preds[0]["hm"].sigmoid(),
            rot_cos=ref_preds[0]["rot"][:, 0].unsqueeze(1),
            rot_sin=ref_preds[0]["rot"][:, 1].unsqueeze(1),
            center=ref_preds[0]["center"], center_z=ref_preds[0]["center_z"],
            dim=ref_preds[0]["dim"].exp(),
            point_cloud_range=PCR, voxel_size=VOXEL, feature_map_stride=1,
            K=pp["MAX_OBJ_PER_SAMPLE"], score_thresh=pp["SCORE_THRESH"],
            post_center_limit_range=torch.tensor(
                pp["POST_CENTER_LIMIT_RANGE"]).float())
    for b in range(BATCH):
        r_boxes = ref_decoded[b]["pred_boxes"].numpy()
        r_scores = ref_decoded[b]["pred_scores"].numpy()
        r_labels = ref_decoded[b]["pred_labels"].numpy()
        o_m = np.asarray(our_mask[b])
        o_boxes = np.asarray(our_boxes[b])[o_m]
        o_scores = np.asarray(our_scores[b])[o_m]
        o_labels = np.asarray(our_labels[b])[o_m]
        assert len(o_scores) == len(r_scores), (len(o_scores), len(r_scores))
        ro = np.argsort(-r_scores, kind="stable")
        oo = np.argsort(-o_scores, kind="stable")
        np.testing.assert_allclose(o_scores[oo], r_scores[ro], atol=2e-4)
        np.testing.assert_allclose(o_boxes[oo], r_boxes[ro], atol=2e-3)
        np.testing.assert_array_equal(o_labels[oo], r_labels[ro])

    # ---- post-NMS final outputs match ----
    for b in range(BATCH):
        r_boxes = ref_final[b]["pred_boxes"].numpy()
        r_scores = ref_final[b]["pred_scores"].numpy()
        r_labels = ref_final[b]["pred_labels"].numpy()  # 1-based
        m = np.asarray(mask[b])
        o_boxes = np.asarray(boxes[b])[m]
        o_scores = np.asarray(scores[b])[m]
        o_labels = np.asarray(labels[b])[m]
        assert len(o_scores) == len(r_scores), (
            f"batch {b}: {len(o_scores)} vs {len(r_scores)} survivors")
        ro = np.argsort(-r_scores, kind="stable")
        oo = np.argsort(-o_scores, kind="stable")
        np.testing.assert_allclose(o_scores[oo], r_scores[ro], atol=2e-4)
        np.testing.assert_allclose(o_boxes[oo], r_boxes[ro], atol=2e-3)
        np.testing.assert_array_equal(o_labels[oo], r_labels[ro])
        assert len(o_scores) > 0, "degenerate test: no detections survived"
