"""Data-parallel training over a jax.sharding.Mesh.

The reference's only parallelism is DDP/NCCL data parallelism
(ref: tools/train.py:142-144, SURVEY.md §2.6). The TPU-native equivalent:

- a 1-D ``Mesh`` over devices, axis "data";
- ``shard_map`` of the per-device train step: each device runs the model on
  its own sub-batch (the model is built with the per-device batch size) and
  gradients/losses are ``psum``-averaged over ICI — exactly DDP's implicit
  allreduce (ref: train.py:144), but inserted by us and fused by XLA;
- parameters and optimizer state are replicated.

Host-side batch prep (:func:`shard_batch_for_mesh`) reshapes each array to a
leading device axis and localizes the batch-index column of voxel_coords,
relying on the collator's fixed per-sample slots.

SyncBN note: the reference converts BN to SyncBN (ref: train.py:118-119).
Here BN statistics are computed per device and the running stats are
psum-averaged once per step — statistically equivalent for equal-size
sub-batches.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(launcher: str = "none", coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None, logger=None):
    """Multi-host rendezvous (TPU analog of ref common_utils.py:134-174).

    launcher:
      - "none": single host (no-op).
      - "jax": ``jax.distributed.initialize`` with env/auto detection — on
        Cloud TPU pods the coordinator is discovered from the TPU metadata
        (≙ the reference's pytorch env:// init).
      - "slurm": derive coordinator/rank/world from SLURM_* variables
        (≙ ref init_dist_slurm's scontrol-based MASTER_ADDR).

    Returns (rank, world_size) as (process_index, process_count).
    """
    import os

    if launcher == "none":
        return 0, 1
    if launcher == "slurm":
        node_list = os.environ["SLURM_NODELIST"]
        # first hostname in the (possibly compressed) node list, as the
        # reference does via scontrol (common_utils.py:141-146)
        import subprocess

        addr = subprocess.getoutput(
            f"scontrol show hostname {node_list} | head -n1").strip()
        coordinator = coordinator or f"{addr}:12345"
        num_processes = num_processes or int(os.environ["SLURM_NTASKS"])
        process_id = process_id if process_id is not None else int(
            os.environ["SLURM_PROCID"])
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes, process_id=process_id,
        )
    else:
        assert launcher == "jax", launcher
        kwargs = {}
        if coordinator:
            kwargs = dict(coordinator_address=coordinator,
                          num_processes=num_processes, process_id=process_id)
        jax.distributed.initialize(**kwargs)
    rank, world = jax.process_index(), jax.process_count()
    if logger:
        logger.info(f"distributed: rank {rank}/{world}")
    return rank, world


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data mesh.

    Multi-host note: ``jax.devices()`` after ``init_distributed`` returns
    the GLOBAL device list ordered process-major, so the flat mesh keeps
    each host's sub-batch on its own chips; the grad pmean rides ICI within
    a slice and DCN across slices (XLA picks the collective path from the
    device assignment — SURVEY.md §2.6's NCCL analog).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_batch_for_mesh(batch: dict, mesh: Mesh, batch_size: int) -> dict:
    """Reshape a host batch to (n_dev, per_device, ...), localize indices,
    and PLACE the result on the mesh (leading axis sharded over "data").

    The device placement is part of the contract: returning host numpy made
    every train-step invocation re-upload the whole batch through the
    dispatch path (~175 MB/step at Waymo batch 4 — xplane r5 showed the
    train step's wall time at 4x its device time, the gap being exactly
    this per-step host→device transfer). Callers that reuse batches across
    steps (the bench, tests) now transfer once.
    """
    n_dev = mesh.devices.size
    assert batch_size % n_dev == 0, (batch_size, n_dev)
    per_dev = batch_size // n_dev

    out = {}
    for k, v in batch.items():
        if k == "batch_size":
            continue
        if hasattr(v, "shape"):  # accept numpy and jax arrays alike
            v = np.asarray(v)
        else:
            continue
        if k in ("voxels", "voxel_coords", "voxel_num_points", "voxel_valid"):
            v = v.reshape((n_dev, v.shape[0] // n_dev) + v.shape[1:])
            if k == "voxel_coords":
                v = v.copy()
                col0 = v[..., 0]
                v[..., 0] = np.where(col0 >= 0, col0 % per_dev, col0)
        elif v.ndim >= 1 and v.shape[0] == batch_size:
            v = v.reshape((n_dev, per_dev) + v.shape[1:])
        out[k] = v
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in out.items()}


def make_sharded_train_step(model, tx, mesh: Mesh):
    """Build a jitted, shard_map'ped train step.

    The returned function has signature
    ``(params, batch_stats, opt_state, sharded_batch, rng) →
    (params, batch_stats, opt_state, loss, tb_dict)``.
    """
    data_spec = P("data")
    rep = P()

    def per_device_step(params, batch_stats, opt_state, batch, rng):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)  # drop dev axis
        rng = jax.random.fold_in(rng[0], jax.lax.axis_index("data"))

        def loss_fn(p):
            from ..models.model_utils.syncbn import sync_bn

            # SyncBN: batch-norm statistics psum over the data axis during
            # this trace (≙ ref train.py:118-119 convert_sync_batchnorm)
            with sync_bn("data"):
                out, updates = model.apply(
                    {"params": p, "batch_stats": batch_stats}, batch,
                    train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"],
                )
            return out["loss"], (out["tb_dict"], updates.get("batch_stats", {}))

        (loss, (tb, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        grads = jax.lax.pmean(grads, "data")  # ≙ DDP allreduce
        loss = jax.lax.pmean(loss, "data")
        tb = jax.lax.pmean(tb, "data")
        new_bs = jax.lax.pmean(new_bs, "data")  # ≙ SyncBN stats

        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, new_bs, opt_state, loss, tb

    shmapped = jax.shard_map(
        per_device_step,
        mesh=mesh,
        in_specs=(rep, rep, rep, data_spec, data_spec),
        out_specs=(rep, rep, rep, rep, rep),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, batch_stats, opt_state, batch, rng):
        # rng is per-step; broadcast one key per device via a leading axis
        rngs = jnp.broadcast_to(rng[None], (mesh.devices.size,) + rng.shape)
        return shmapped(params, batch_stats, opt_state, batch, rngs)

    return step


def make_sharded_eval_step(model, mesh: Mesh):
    data_spec = P("data")
    rep = P()

    def per_device(params, batch_stats, batch):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch, train=False,
        )
        return (
            out["final_boxes"][None],
            out["final_scores"][None],
            out["final_labels"][None],
            out["final_mask"][None],
        )

    shmapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(rep, rep, data_spec),
        out_specs=(data_spec, data_spec, data_spec, data_spec),
        check_vma=False,
    )
    return jax.jit(shmapped)
