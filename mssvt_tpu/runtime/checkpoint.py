"""Checkpointing with rotation + auto-resume (orbax).

Rebuild of ref tools/train_utils/train_utils.py:131-180 and the load paths of
detector3d_template.py:330-411: saves {params, batch_stats, opt_state, step,
epoch} pytrees, keeps the newest ``max_keep`` checkpoints, supports
weights-only partial load (shape-tolerant) and full resume.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir, max_keep: int = 30, logger=None):
        self.ckpt_dir = Path(ckpt_dir).resolve()
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.logger = logger or logging.getLogger(__name__)
        self.manager = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_keep, create=True
            ),
        )

    def save(self, step: int, state: dict):
        """state: {'params', 'batch_stats', 'opt_state', 'epoch', 'it'}."""
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None) -> dict:
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.ckpt_dir}")
        if template is not None:
            return self.manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self.manager.restore(step)

    def all_steps(self):
        return sorted(self.manager.all_steps())


def partial_load_params(restored_params, init_params, logger=None):
    """Shape-tolerant weights-only load (ref: detector3d_template.py:330-359).

    Copies every leaf from `restored_params` into `init_params` whose path
    exists and whose shape matches; everything else keeps its fresh init.
    """
    logger = logger or logging.getLogger(__name__)
    flat_restored = dict(jax.tree_util.tree_flatten_with_path(restored_params)[0])
    flat_init, treedef = jax.tree_util.tree_flatten_with_path(init_params)

    out = []
    n_loaded = 0
    for path, leaf in flat_init:
        if path in flat_restored and np.shape(flat_restored[path]) == np.shape(leaf):
            out.append(flat_restored[path])
            n_loaded += 1
        else:
            logger.info(f"partial load: keeping fresh init for {path}")
            out.append(leaf)
    logger.info(f"partial load: {n_loaded}/{len(flat_init)} tensors restored")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(init_params), out
    )
