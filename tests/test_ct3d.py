"""CT3D: channel-wise transformer parity vs the reference source, the RoI
point sampler semantics, and the CT3D_3CAT detector e2e smoke
(ref: pcdet/models/roi_heads/ct3d_head.py, model_utils/ctrans.py,
detectors/ct3d_3cat.py)."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from ref_loader import load_ref

F32 = jax.default_matmul_precision("float32")


def _ct_params_from_ref(ref, enc_layers, dec_layers, d):
    """Map ref ctrans.Transformer state to our CTransformer param tree."""
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {}

    def attn(prefix):
        w = sd[f"{prefix}.in_proj_weight"]
        b = sd[f"{prefix}.in_proj_bias"]
        return {
            "q_w": w[:d].T, "q_b": b[:d],
            "k_w": w[d:2 * d].T, "k_b": b[d:2 * d],
            "v_w": w[2 * d:].T, "v_b": b[2 * d:],
            "out_w": sd[f"{prefix}.out_proj.weight"].T,
            "out_b": sd[f"{prefix}.out_proj.bias"],
        }

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    for i in range(enc_layers):
        p = f"encoder.layers.{i}"
        params[f"enc{i}"] = {
            "self_attn": attn(f"{p}.self_attn"),
            "norm1": ln(f"{p}.norm1"), "norm2": ln(f"{p}.norm2"),
            "linear1": dense(f"{p}.linear1"), "linear2": dense(f"{p}.linear2"),
        }
    for i in range(dec_layers):
        p = f"decoder.layers.{i}"
        params[f"dec{i}"] = {
            "self_attn": attn(f"{p}.self_attn"),
            "multihead_attn": {
                # ref proj: ModuleList of Conv1d(d, d, 1), order q/k/v
                "proj_q_w": sd[f"{p}.multihead_attn.proj.0.weight"][:, :, 0],
                "proj_q_b": sd[f"{p}.multihead_attn.proj.0.bias"],
                "proj_k_w": sd[f"{p}.multihead_attn.proj.1.weight"][:, :, 0],
                "proj_k_b": sd[f"{p}.multihead_attn.proj.1.bias"],
                "proj_v_w": sd[f"{p}.multihead_attn.proj.2.weight"][:, :, 0],
                "proj_v_b": sd[f"{p}.multihead_attn.proj.2.bias"],
                "down_w": sd[f"{p}.multihead_attn.down_mlp.layers.0.weight"].T,
                "down_b": sd[f"{p}.multihead_attn.down_mlp.layers.0.bias"],
            },
            "norm1": ln(f"{p}.norm1"), "norm2": ln(f"{p}.norm2"),
            "norm3": ln(f"{p}.norm3"),
            "linear1": dense(f"{p}.linear1"), "linear2": dense(f"{p}.linear2"),
        }
    params["dec_norm"] = ln("decoder.norm")
    return params


def test_ctransformer_parity_vs_reference_source():
    """Our CTransformer reproduces the ref ctrans.Transformer — including the
    channel-wise decoder cross-attention einsum chain (ctrans.py:207-236) —
    on imported weights."""
    ct = load_ref("models.model_utils.ctrans")
    from mssvt_tpu.models.model_utils.ctrans import CTransformer

    d, heads, enc_l, dec_l, ff = 16, 2, 2, 2, 32
    torch.manual_seed(0)
    ref = ct.Transformer(d_model=d, nhead=heads, num_encoder_layers=enc_l,
                         num_decoder_layers=dec_l, dim_feedforward=ff,
                         dropout=0.0, normalize_before=False,
                         return_intermediate_dec=True)
    ref.eval()

    rng = np.random.default_rng(1)
    b, n = 3, 10
    src = rng.normal(size=(b, n, d)).astype(np.float32)
    qe = rng.normal(size=(1, d)).astype(np.float32)
    pos = np.zeros_like(src)
    with torch.no_grad():
        hs = ref(torch.from_numpy(src), torch.from_numpy(qe),
                 torch.from_numpy(pos))[0]  # (L, b, nq, d)
        want = hs[-1].numpy()  # final decoder layer, post decoder-norm

    model = CTransformer(d_model=d, nhead=heads, num_encoder_layers=enc_l,
                         num_decoder_layers=dec_l, dim_feedforward=ff,
                         num_queries=1)
    params = _ct_params_from_ref(ref, enc_l, dec_l, d)
    params["query_embed"] = qe
    params = jax.tree_util.tree_map(jnp.asarray, params)
    with F32:
        got = np.asarray(model.apply({"params": params}, jnp.asarray(src)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_sample_roi_points_semantics():
    """First-K in-order cylinder pick with the ref padding rules
    (ct3d_head.py:135-160): zero rows for empty RoIs, first-point repeats
    for underfull ones, 1.2x-diagonal BEV radius."""
    from mssvt_tpu.models.roi_heads.ct3d_head import sample_roi_points

    pts = np.zeros((1, 8, 4), np.float32)
    # 3 points near origin, others far away; point 3 invalid
    pts[0, 0] = [0.1, 0.0, 0.0, 1.0]
    pts[0, 1] = [0.0, 0.2, 0.5, 2.0]
    pts[0, 2] = [-0.3, 0.1, -0.5, 3.0]
    pts[0, 3] = [0.2, 0.2, 0.0, 9.0]
    pts[0, 4:] = [50.0, 50.0, 0.0, 4.0]
    valid = np.ones((1, 8), bool)
    valid[0, 3] = False
    rois = np.zeros((1, 2, 7), np.float32)
    rois[0, 0] = [0, 0, 0, 2.0, 1.0, 1.0, 0.0]   # catches pts 0-2
    rois[0, 1] = [-40, -40, 0, 2.0, 1.0, 1.0, 0.0]  # empty

    out = np.asarray(jax.jit(
        lambda p, v, r: sample_roi_points(p, v, r, 5)
    )(jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(rois)))
    assert out.shape == (1, 2, 5, 4)
    np.testing.assert_allclose(out[0, 0, :3], pts[0, :3], atol=1e-6)
    # underfull → repeat of the FIRST selected point
    np.testing.assert_allclose(out[0, 0, 3], pts[0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 0, 4], pts[0, 0], atol=1e-6)
    # empty RoI → zeros
    np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-6)


def _ct3d_cfg():
    from mssvt_tpu.utils.edict import EasyDict

    return EasyDict({
        "NAME": "CT3D_3CAT",
        "MAX_POINTS": 512,
        "VFE": {"NAME": "MeanVFE"},
        "BACKBONE_3D": {"NAME": "VoxelBackBone8x",
                        "NUM_FILTERS": [8, 16, 16, 16], "OUT_CHANNELS": 32},
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [2, 2], "LAYER_STRIDES": [1, 2],
            "NUM_FILTERS": [16, 32],
            "UPSAMPLE_STRIDES": [1, 2], "NUM_UPSAMPLE_FILTERS": [16, 16],
        },
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle",
            "USE_DIRECTION_CLASSIFIER": True,
            "DIR_OFFSET": 0.78539, "NUM_DIR_BINS": 2,
            "ANCHOR_GENERATOR_CONFIG": [{
                "class_name": "Car",
                "anchor_sizes": [[3.9, 1.6, 1.56]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [-1.78],
                "align_center": False,
                "feature_map_stride": 8,
                "matched_threshold": 0.6,
                "unmatched_threshold": 0.45,
            }],
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
                "code_weights": [1.0] * 7,
            }},
        },
        "ROI_HEAD": {
            "NAME": "CT3DHead",
            "Transformer": {
                "num_queries": 1, "hidden_dim": 32, "num_points": 16,
                "nheads": 2, "enc_layers": 1, "dec_layers": 1,
                "dim_feedforward": 32, "dropout": 0.0,
            },
            "NMS_CONFIG": {
                "TRAIN": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.8,
                          "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16},
                "TEST": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.7,
                         "NMS_PRE_MAXSIZE": 64, "NMS_POST_MAXSIZE": 16},
            },
            "TARGET_CONFIG": {"ROI_PER_IMAGE": 16},
            "LOSS_CONFIG": {
                "CORNER_LOSS_REGULARIZATION": True,
                "LOSS_WEIGHTS": {"rcnn_corner_weight": 1.0},
            },
        },
        "POST_PROCESSING": {
            "SCORE_THRESH": 0.1,
            "CAT_THRE": {"Car": 0.0, "Ped": 0.0, "Cyc": 0.0},
        },
    })


@pytest.mark.slow
def test_ct3d_3cat_forward_and_loss():
    """Detector matrix 11/11: forward (eval, with CAT_THRE gating) + training
    loss with finite grads through the transformer refinement."""
    from mssvt_tpu.models import build_network

    rng = np.random.default_rng(0)
    grid = (32, 32, 32)
    voxel_size = (0.4, 0.4, 0.125)
    pc_range = (0.0, -6.4, -2.0, 12.8, 6.4, 2.0)
    batch_size, max_voxels, max_pts = 2, 128, 512

    model = build_network(
        model_cfg=_ct3d_cfg(), num_class=1, class_names=["Car"],
        grid_size=grid, voxel_size=voxel_size, point_cloud_range=pc_range,
        batch_size=batch_size, max_voxels=max_voxels, max_points_per_voxel=4,
    )
    cap = batch_size * max_voxels
    coords = np.unique(np.stack([
        rng.integers(0, batch_size, cap * 2),
        rng.integers(0, grid[2], cap * 2),
        rng.integers(0, grid[1] // 2, cap * 2),
        rng.integers(0, grid[0] // 2, cap * 2),
    ], 1), axis=0)
    pad = np.full((cap, 4), -1, np.int32)
    valid = np.zeros((cap,), bool)
    for b in range(batch_size):
        cb = coords[coords[:, 0] == b][:max_voxels]
        lo = b * max_voxels
        pad[lo:lo + len(cb)] = cb
        valid[lo:lo + len(cb)] = True
    voxels = rng.normal(size=(cap, 4, 4)).astype(np.float32) * valid[:, None, None]
    pts = np.concatenate([
        rng.uniform(0, 12.8, (batch_size * max_pts, 1)),
        rng.uniform(-6.4, 6.4, (batch_size * max_pts, 1)),
        rng.uniform(-2, 2, (batch_size * max_pts, 1)),
        rng.random((batch_size * max_pts, 1)),
    ], axis=1).astype(np.float32)
    gt = np.zeros((batch_size, 8, 8), np.float32)
    for b in range(batch_size):
        gt[b, 0] = [5, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
        gt[b, 1] = [9, 3, -1, 3.9, 1.6, 1.56, -0.5, 1]
    batch = {
        "voxels": voxels,
        "voxel_num_points": np.full(cap, 3.0, np.float32) * valid,
        "voxel_coords": pad,
        "voxel_valid": valid,
        "points": pts,
        "points_valid": np.ones((batch_size * max_pts,), bool),
        "gt_boxes": gt,
    }
    variables = jax.jit(
        lambda k0, k1, b: model.init({"params": k0, "dropout": k1}, b,
                                     train=True)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), batch)

    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert np.isfinite(np.asarray(out["final_boxes"])).all()
    assert out["final_scores"].shape == out["final_mask"].shape

    def loss_fn(params):
        o, _ = model.apply({**variables, "params": params}, batch, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
        return o["loss"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    # the transformer actually received gradient
    tr = grads["roi_head"]["transformer"]
    assert any(float(jnp.abs(g).sum()) > 0
               for g in jax.tree_util.tree_leaves(tr))
