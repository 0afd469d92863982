"""Optimizers and LR schedules (optax).

Rebuild of ref tools/train_utils/optimization/ (fastai OptimWrapper +
OneCycle, __init__.py:11-79, learning_schedules_fastai.py:12-114):

- ``adam_onecycle`` / ``adamw_onecycle``: cosine one-cycle over lr AND Adam
  beta1 ("momentum"), stepped per iteration, with decoupled ("true") weight
  decay — the optax-native equivalent of the fastai wrapper.
- ``adam`` / ``adamw`` / ``sgd``: step-decay schedule with LR clip + optional
  linear warmup (ref: __init__.py:55-79).
- global-norm gradient clipping is folded into the optax chain
  (ref applies clip_grad_norm_ in the train loop, train_utils.py:55).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def annealing_cos(start, end, pct):
    """Ref: learning_schedules_fastai.py (fastai cosine annealing)."""
    cos_out = jnp.cos(jnp.pi * pct) + 1
    return end + (start - end) / 2 * cos_out


def one_cycle_schedules(lr_max, total_steps, moms=(0.95, 0.85), div_factor=10.0,
                        pct_start=0.4):
    """Returns (lr(step), b1(step)) — jnp-traceable (called inside jit by
    optax.inject_hyperparams) and usable with python ints for logging."""
    lr_low = lr_max / div_factor
    lr_final = lr_max / (div_factor * 1e4)
    split = pct_start * total_steps

    def _phase(step, a0, a1, b0, b1):
        step = jnp.minimum(jnp.asarray(step, jnp.float32), total_steps)
        pct_w = step / jnp.maximum(split, 1.0)
        pct_a = (step - split) / jnp.maximum(total_steps - split, 1.0)
        return jnp.where(
            step < split,
            annealing_cos(a0, a1, jnp.clip(pct_w, 0.0, 1.0)),
            annealing_cos(b0, b1, jnp.clip(pct_a, 0.0, 1.0)),
        )

    def lr_fn(step):
        return _phase(step, lr_low, lr_max, lr_max, lr_final)

    def mom_fn(step):
        return _phase(step, moms[0], moms[1], moms[1], moms[0])

    return lr_fn, mom_fn


def decay_step_schedule(lr, decay_step_list, lr_decay, lr_clip, total_iters_per_epoch,
                        warmup=False, warmup_epoch=1):
    """Epoch-threshold step decay with clip (ref: __init__.py:58-77),
    jnp-traceable."""

    def lr_fn(step):
        epoch = jnp.asarray(step, jnp.float32) / max(total_iters_per_epoch, 1)
        cur = jnp.asarray(lr, jnp.float32)
        for threshold in decay_step_list:
            cur = jnp.where(epoch >= threshold, cur * lr_decay, cur)
        cur = jnp.maximum(cur, lr_clip)
        if warmup:
            warm = jnp.maximum(lr * epoch / max(warmup_epoch, 1e-6), lr_clip)
            cur = jnp.where(epoch < warmup_epoch, warm, cur)
        return cur

    return lr_fn


def build_optimizer(opt_cfg, total_steps, steps_per_epoch):
    """Build the optax GradientTransformation + the lr schedule for logging.

    Returns (tx, lr_fn). The tx consumes (grads, state, params).
    """
    name = opt_cfg["OPTIMIZER"]
    lr = float(opt_cfg["LR"])
    wd = float(opt_cfg.get("WEIGHT_DECAY", 0.0))
    clip = float(opt_cfg.get("GRAD_NORM_CLIP", 0.0))

    chain = []
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))

    if name in ("adam_onecycle", "adamw_onecycle"):
        lr_fn, mom_fn = one_cycle_schedules(
            lr, total_steps,
            moms=tuple(opt_cfg.get("MOMS", [0.95, 0.85])),
            div_factor=float(opt_cfg.get("DIV_FACTOR", 10.0)),
            pct_start=float(opt_cfg.get("PCT_START", 0.4)),
        )

        @optax.inject_hyperparams
        def make(learning_rate, b1):
            return optax.chain(
                optax.scale_by_adam(b1=b1, b2=0.99),
                optax.add_decayed_weights(wd),
                optax.scale_by_learning_rate(learning_rate),
            )

        tx = make(
            learning_rate=lambda step: lr_fn(step),
            b1=lambda step: mom_fn(step),
        )
        chain.append(tx)
        return optax.chain(*chain), lr_fn

    if name in ("adam", "adamw", "sgd"):
        lr_fn = decay_step_schedule(
            lr,
            decay_step_list=list(opt_cfg.get("DECAY_STEP_LIST", [])),
            lr_decay=float(opt_cfg.get("LR_DECAY", 0.1)),
            lr_clip=float(opt_cfg.get("LR_CLIP", 1e-7)),
            total_iters_per_epoch=steps_per_epoch,
            warmup=bool(opt_cfg.get("LR_WARMUP", False)),
            warmup_epoch=int(opt_cfg.get("WARMUP_EPOCH", 1)),
        )
        if name == "adam":
            chain.append(optax.adam(lr_fn))
        elif name == "adamw":
            chain.append(optax.adamw(lr_fn, weight_decay=wd))
        else:
            chain.append(optax.sgd(
                lr_fn, momentum=float(opt_cfg.get("MOMENTUM", 0.9))
            ))
        return optax.chain(*chain), lr_fn

    raise NotImplementedError(name)
