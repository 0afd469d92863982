"""Tests for the one-cycle / step-decay schedules and optimizer builder."""

import numpy as np
import optax

from mssvt_tpu.runtime.optimization import (
    build_optimizer,
    decay_step_schedule,
    one_cycle_schedules,
)
from mssvt_tpu.utils.edict import EasyDict


def test_one_cycle_shape():
    lr_fn, mom_fn = one_cycle_schedules(
        0.003, total_steps=1000, moms=(0.95, 0.85), div_factor=10, pct_start=0.4
    )
    assert abs(lr_fn(0) - 0.0003) < 1e-7  # lr_max / div_factor
    assert abs(lr_fn(400) - 0.003) < 1e-6  # peak at pct_start
    assert lr_fn(1000) < 1e-6  # final ≈ lr_max / (div*1e4)
    # monotone up then down
    ups = [float(lr_fn(s)) for s in range(0, 400, 50)]
    downs = [float(lr_fn(s)) for s in range(400, 1001, 100)]
    assert all(a < b for a, b in zip(ups, ups[1:]))
    assert all(a > b for a, b in zip(downs, downs[1:]))
    # momentum goes 0.95 → 0.85 → 0.95
    assert abs(mom_fn(0) - 0.95) < 1e-6
    assert abs(mom_fn(400) - 0.85) < 1e-6
    assert abs(mom_fn(1000) - 0.95) < 1e-6


def test_decay_step_schedule():
    lr_fn = decay_step_schedule(
        0.01, decay_step_list=[2, 4], lr_decay=0.1, lr_clip=1e-7,
        total_iters_per_epoch=10,
    )
    assert abs(lr_fn(0) - 0.01) < 1e-8
    assert abs(lr_fn(25) - 0.001) < 1e-8  # epoch 2.5
    assert abs(lr_fn(45) - 0.0001) < 1e-8  # epoch 4.5


def test_build_optimizer_onecycle_updates_params():
    import jax.numpy as jnp

    cfg = EasyDict({
        "OPTIMIZER": "adam_onecycle", "LR": 0.01, "WEIGHT_DECAY": 0.01,
        "MOMS": [0.95, 0.85], "PCT_START": 0.4, "DIV_FACTOR": 10,
        "GRAD_NORM_CLIP": 10.0,
    })
    tx, lr_fn = build_optimizer(cfg, total_steps=100, steps_per_epoch=10)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((3,))}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert float(jnp.abs(new["w"] - params["w"]).sum()) > 0


def test_build_optimizer_sgd():
    import jax.numpy as jnp

    cfg = EasyDict({
        "OPTIMIZER": "sgd", "LR": 0.1, "MOMENTUM": 0.9,
        "DECAY_STEP_LIST": [10], "LR_DECAY": 0.1, "LR_CLIP": 1e-7,
        "GRAD_NORM_CLIP": 0.0,
    })
    tx, _ = build_optimizer(cfg, total_steps=100, steps_per_epoch=10)
    params = {"w": jnp.ones((2,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((2,))}, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1, rtol=1e-5)
