"""Training loop (ref: tools/train_utils/train_utils.py:11-143).

Single-host data-parallel over all local devices (or a subset). The per-iter
body is one jitted sharded step; timing meters mirror the reference's
data/forward/batch meters (ref: train_utils.py:19-21,65-79).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from ..parallel.mesh import make_sharded_train_step, shard_batch_for_mesh
from .checkpoint import CheckpointManager


def average_across_hosts(*values):
    """Cross-process mean of host-side timing scalars.

    The reference averages data/forward/batch wall-clock times across ranks
    every iteration so the progress bar shows fleet-wide numbers
    (ref: pcdet/utils/commu_utils.py:143-145, tools/train_utils/
    train_utils.py:67-69). Single-process: identity (no device work).
    """
    if jax.process_count() == 1:
        return values if len(values) > 1 else values[0]
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(values, np.float64))
    means = np.mean(np.asarray(arr).reshape(jax.process_count(), -1), axis=0)
    return tuple(means) if len(values) > 1 else float(means[0])


class AverageMeter:
    """Ref: common_utils.py:250-265."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.avg = self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def train_model(
    model,
    params,
    batch_stats,
    tx,
    opt_state,
    train_loader,
    mesh,
    total_epochs: int,
    ckpt_manager: Optional[CheckpointManager] = None,
    ckpt_save_interval: int = 1,
    start_epoch: int = 0,
    start_iter: int = 0,
    rng_seed: int = 0,
    lr_fn=None,
    logger=None,
    tb_log=None,
    log_interval: int = 50,
):
    train_step = make_sharded_train_step(model, tx, mesh)
    rng = jax.random.PRNGKey(rng_seed)
    accumulated_iter = start_iter
    batch_size = train_loader.batch_size

    for epoch in range(start_epoch, total_epochs):
        train_loader.set_epoch(epoch)
        data_meter, batch_meter = AverageMeter(), AverageMeter()
        end = time.time()
        for batch in train_loader:
            sharded = shard_batch_for_mesh(batch, mesh, batch_size)
            data_meter.update(average_across_hosts(time.time() - end))

            rng, step_rng = jax.random.split(rng)
            params, batch_stats, opt_state, loss, tb = train_step(
                params, batch_stats, opt_state, sharded, step_rng
            )
            accumulated_iter += 1

            if accumulated_iter % log_interval == 0:
                loss_v = float(jax.device_get(loss))
                lr_v = float(lr_fn(accumulated_iter)) if lr_fn else float("nan")
                batch_meter.update(average_across_hosts(time.time() - end))
                if logger:
                    logger.info(
                        f"epoch {epoch} it {accumulated_iter} "
                        f"loss {loss_v:.4f} lr {lr_v:.6f} "
                        f"data {data_meter.avg:.3f}s batch {batch_meter.avg:.3f}s"
                    )
                if tb_log:
                    tb_log.add_scalar("train/loss", loss_v, accumulated_iter)
                    tb_log.add_scalar("meta_data/learning_rate", lr_v, accumulated_iter)
                    for k, v in jax.device_get(tb).items():
                        tb_log.add_scalar(f"train/{k}", float(v), accumulated_iter)
            end = time.time()

        if ckpt_manager and (epoch + 1) % ckpt_save_interval == 0:
            ckpt_manager.save(epoch + 1, {
                "params": jax.device_get(params),
                "batch_stats": jax.device_get(batch_stats),
                "opt_state": jax.device_get(opt_state),
                "epoch": epoch + 1,
                "it": accumulated_iter,
            })
            if logger:
                logger.info(f"saved checkpoint @ epoch {epoch + 1}")

    return params, batch_stats, opt_state, accumulated_iter
