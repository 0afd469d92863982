"""Training-loop convergence + golden-scene accuracy gate (verdict items
4b/10): a fixed-seed synthetic scene trained for ~120 steps must show a
decreasing loss curve, finite grads in bf16-free f32, and the trained model
must actually DETECT the scene's boxes (end-to-end accuracy floor — the
suite's first gate that would catch a silent decode/target-assignment
regression)."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mssvt_tpu.parallel.mesh import make_mesh, make_sharded_train_step, shard_batch_for_mesh
from mssvt_tpu.runtime.optimization import build_optimizer
from mssvt_tpu.utils.edict import EasyDict


@pytest.mark.slow
def test_loss_decreases_and_golden_scene_ap():
    from __graft_entry__ import (
        GRID, MAX_PTS, PC_RANGE, VOXEL_SIZE, _make_batch, _model_cfg,
    )
    from mssvt_tpu.models import build_network

    max_voxels = 256
    cfg = _model_cfg()
    cfg["BACKBONE_3D"]["PARAMS"] = cfg["BACKBONE_3D"]["PARAMS"][:2]
    cfg["MAP_TO_BEV"]["NUM_BEV_FEATURES"] = 64 * 2
    model = build_network(
        model_cfg=cfg, num_class=3,
        class_names=["Vehicle", "Pedestrian", "Cyclist"],
        grid_size=GRID, voxel_size=VOXEL_SIZE, point_cloud_range=PC_RANGE,
        batch_size=1, max_voxels=max_voxels, max_points_per_voxel=MAX_PTS,
    )
    batch = _make_batch(1, max_voxels, seed=3)
    mesh = make_mesh(1)
    sharded = shard_batch_for_mesh(batch, mesh, 1)
    one = jax.tree_util.tree_map(lambda x: x[0], sharded)

    variables = jax.jit(
        lambda k0, k1, b: model.init({"params": k0, "dropout": k1}, b,
                                     train=True)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), one)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    n_steps = 120
    tx, _ = build_optimizer(EasyDict({
        "OPTIMIZER": "adam_onecycle", "LR": 0.003, "WEIGHT_DECAY": 0.01,
        "MOMS": [0.95, 0.85], "PCT_START": 0.4, "DIV_FACTOR": 10,
        "GRAD_NORM_CLIP": 10.0,
    }), total_steps=n_steps, steps_per_epoch=n_steps)
    opt_state = tx.init(params)
    step = make_sharded_train_step(model, tx, mesh)

    losses = []
    for i in range(n_steps):
        params, bstats, opt_state, loss, _ = step(
            params, bstats, opt_state, sharded, jax.random.PRNGKey(100 + i))
        l = float(np.asarray(loss))
        assert np.isfinite(l), f"non-finite loss at step {i}: {l}"
        losses.append(l)

    # loss curve: the tail must sit well below the head (overfitting one
    # fixed scene — memorization is the point of the gate)
    head = float(np.mean(losses[:5]))
    tail = float(np.mean(losses[-5:]))
    assert tail < 0.5 * head, (head, tail, losses[::20])

    # golden-scene eval: the overfit model must place boxes on the GT.
    # recall of GT boxes by center distance < 2m with score > 0.1.
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        {"params": params, "batch_stats": bstats}, one)
    boxes = np.asarray(out["final_boxes"])[0]
    scores = np.asarray(out["final_scores"])[0]
    mask = np.asarray(out["final_mask"])[0]
    det = boxes[mask & (scores > 0.1)]
    gt = np.asarray(batch["gt_boxes"])[0]
    gt = gt[gt[:, 7] > 0]
    assert len(gt) >= 4
    hits = 0
    for g in gt:
        if len(det) and np.min(
                np.linalg.norm(det[:, :2] - g[None, :2], axis=1)) < 2.0:
            hits += 1
    recall = hits / len(gt)
    assert recall >= 0.5, (
        f"golden-scene recall {recall:.2f} below floor (dets={len(det)}, "
        f"gt={len(gt)}, losses {losses[0]:.2f}->{losses[-1]:.2f})")
