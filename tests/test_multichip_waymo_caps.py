"""Waymo-capacity multi-device train step (VERDICT r4 weak item 6).

``dryrun_multichip`` validates collective correctness on a toy config
(C=64, 512 voxels); nothing exercised the reconstructed ``mssvt.yaml``
CAPACITIES (C=128, max_num_win1=48 / win2=96, key_num_sample=32, the real
5-block interleave) through ``make_sharded_train_step``. This slow test runs
ONE 2-device sharded train step with the yaml's exact MODEL config — only
the spatial grid and voxel count are scaled down (capacity semantics don't
depend on them) so the CPU mesh finishes in test time.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mssvt_tpu.config import cfg_from_yaml_file
from mssvt_tpu.models import build_network
from mssvt_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_step,
    shard_batch_for_mesh,
)
from mssvt_tpu.runtime.optimization import build_optimizer
from mssvt_tpu.utils.edict import EasyDict

GRID = (120, 120, 32)
VOXEL_SIZE = (0.32, 0.32, 0.1875)
PCR = (-19.2, -19.2, -2.0, 19.2, 19.2, 4.0)
MAX_VOXELS = 6000  # per device
N_DEV = 2


def _make_batch(rng, batch_size):
    parts = []
    per = MAX_VOXELS // 1
    for b in range(batch_size):
        c = np.unique(np.stack([
            np.full(per, b),
            rng.integers(0, GRID[2], per),
            rng.integers(0, GRID[1], per),
            rng.integers(0, GRID[0], per),
        ], 1), axis=0)[: per]
        parts.append(c)
    cap = batch_size * MAX_VOXELS
    pad = np.full((cap, 4), -1, np.int32)
    valid = np.zeros((cap,), bool)
    off = 0
    for c in parts:
        pad[off: off + len(c)] = c
        valid[off: off + len(c)] = True
        off += MAX_VOXELS
    voxels = (rng.normal(size=(cap, 5, 5)).astype(np.float32)
              * valid[:, None, None])
    num_points = np.full((cap,), 3.0, np.float32) * valid
    gt = np.zeros((batch_size, 24, 8), np.float32)
    for b in range(batch_size):
        for k in range(10):
            gt[b, k] = [
                rng.uniform(-15, 15), rng.uniform(-15, 15),
                rng.uniform(-1, 2), rng.uniform(1.5, 5),
                rng.uniform(1.0, 2.5), rng.uniform(1.0, 2.5),
                rng.uniform(-np.pi, np.pi), rng.integers(1, 4),
            ]
    return {
        "voxels": voxels, "voxel_num_points": num_points,
        "voxel_coords": pad, "voxel_valid": valid, "gt_boxes": gt,
    }


@pytest.mark.slow
def test_waymo_caps_two_device_train_step():
    cfg = EasyDict()
    cfg_from_yaml_file(
        str(Path(__file__).resolve().parent.parent
            / "tools/cfgs/waymo_models/mssvt.yaml"), cfg)
    # the yaml MODEL block VERBATIM — capacities, channels, heads, the
    # 5-block interleave, CenterHead post-processing — only grid/range shrink
    model = build_network(
        model_cfg=cfg.MODEL, num_class=3,
        class_names=["Vehicle", "Pedestrian", "Cyclist"],
        grid_size=GRID, voxel_size=VOXEL_SIZE, point_cloud_range=PCR,
        batch_size=1, max_voxels=MAX_VOXELS, max_points_per_voxel=5,
    )

    mesh = make_mesh(N_DEV)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, N_DEV)
    sharded = shard_batch_for_mesh(batch, mesh, N_DEV)
    one_dev = jax.tree_util.tree_map(lambda x: x[0], sharded)

    variables = jax.jit(
        lambda k0, k1, b: model.init({"params": k0, "dropout": k1}, b,
                                     train=True)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), one_dev)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=20,
                            steps_per_epoch=10)
    opt_state = tx.init(params)
    step = make_sharded_train_step(model, tx, mesh)
    params, batch_stats, opt_state, loss, tb = jax.block_until_ready(step(
        params, batch_stats, opt_state, sharded, jax.random.PRNGKey(2)))
    loss_v = float(np.asarray(loss))
    assert np.isfinite(loss_v), loss_v
    # a second step through the same compiled executable (shapes static)
    params, batch_stats, opt_state, loss, _ = step(
        params, batch_stats, opt_state, sharded, jax.random.PRNGKey(3))
    assert np.isfinite(float(np.asarray(loss)))
