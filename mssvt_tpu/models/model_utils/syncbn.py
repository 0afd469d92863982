"""SyncBN context: cross-device batch-norm statistics under data parallelism.

The reference converts every BatchNorm to SyncBN when training distributed
(ref: tools/train.py:118-119 ``convert_sync_batchnorm``). The TPU-native
equivalent: BatchNorm layers compute their batch statistics with collectives
over the data-parallel axis. ``make_sharded_train_step`` wraps the training
``model.apply`` in :func:`sync_bn`, so every BN constructed during that
trace binds ``axis_name`` to the mesh axis; unsharded traces (tests, eval,
single-chip benchmarks) see ``None`` and stay local.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

_AXIS: Optional[str] = None


def bn_axis() -> Optional[str]:
    """The axis name BatchNorm layers should sync over (None = local)."""
    return _AXIS


@contextmanager
def sync_bn(axis: Optional[str]):
    global _AXIS
    prev = _AXIS
    _AXIS = axis
    try:
        yield
    finally:
        _AXIS = prev
