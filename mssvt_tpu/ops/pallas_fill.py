"""Capacity-compaction kernel for window gather buffers (Pallas/TPU).

Input: the *box table* ``box`` of shape (num_windows, K) — for each window,
the voxel row occupying each of its K gather-table cells (-1 = empty), laid
out in the reference's traversal order (Chebyshev-sorted offset tables,
ref: pcdet/ops/mssvt/src/ms_sparse_attention_gpu.cu:227-347). Output: the
fixed-capacity fill buffer (num_windows, cap) holding ``(vox_row << kbits) | k``
packed entries in nearest-first order — hit #r of a window lands in slot r,
hits beyond ``cap`` are dropped, exactly the CUDA kernel's semantics.

Why a kernel: the fill is a per-window stream compaction. The XLA formulation
needs candidate-sized scatters + rank gathers (~4 x 810k descriptor-bound ops,
~47 ms/frame at Waymo scale); here ranks come from one MXU dot against a
static strictly-lower-triangular matrix and the compaction runs as a
predicated select/max loop over VMEM-resident tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fill_kernel(box_ref, lt_ref, buf_ref, *, cap, kbits):
    box = box_ref[:]                      # (R, Kp) int32, -1 = empty
    occ = box >= 0
    kp = box.shape[1]
    # exclusive rank of each hit within its row, in table order: one MXU dot
    # with the static strictly-lower-triangular ones matrix
    rank = jax.lax.dot(
        occ.astype(jnp.float32), lt_ref[:],
        preferred_element_type=jnp.float32,
    )  # (R, Kp) float, exact for counts < 2^24
    rank = rank.astype(jnp.int32)

    k_iota = jax.lax.broadcasted_iota(jnp.int32, box.shape, 1)
    packed = jnp.where(occ, (box << kbits) | k_iota, -1)

    # predicated fill: slot j takes the (unique) entry with rank == j;
    # rows are VMEM-resident so each step is a cheap select + lane reduction.
    # Early-exit on the tile's densest window.
    tile_max = jnp.max(jnp.sum(occ.astype(jnp.int32), axis=1))
    buf_ref[:] = jnp.full(buf_ref.shape, -1, jnp.int32)
    for j in range(cap):
        @pl.when(j < tile_max)
        def _():
            sel = occ & (rank == j)
            buf_ref[:, j] = jnp.max(jnp.where(sel, packed, -1), axis=1)


@functools.partial(
    jax.jit, static_argnames=("cap", "kbits", "row_block", "interpret")
)
def fill_capacity_buffer(
    box: jnp.ndarray,   # (NW, K) int32 voxel rows in table order, -1 empty
    cap: int,
    kbits: int,
    row_block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Nearest-first capacity fill. Returns (NW, cap) int32 packed
    ``(vox_row << kbits) | table_k``, -1 for empty slots."""
    nw, k = box.shape
    assert k < (1 << kbits), (k, kbits)
    kp = (-(-k // 128)) * 128  # pad table axis to the lane width
    if kp != k:
        box = jnp.pad(box, ((0, 0), (0, kp - k)), constant_values=-1)
    pad_rows = (-nw) % row_block
    if pad_rows:
        box = jnp.pad(box, ((0, pad_rows), (0, 0)), constant_values=-1)
    nwp = nw + pad_rows

    # dot(occ, M)[r, k] = sum_{k'} occ[r, k'] * M[k', k] — exclusive rank
    # needs M[k', k] = 1 iff k' < k, i.e. strictly UPPER triangular ones
    lt = jnp.asarray(np.triu(np.ones((kp, kp), np.float32), k=1))
    kernel = functools.partial(_fill_kernel, cap=cap, kbits=kbits)
    out = pl.pallas_call(
        kernel,
        grid=(nwp // row_block,),
        in_specs=[
            pl.BlockSpec((row_block, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, cap), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nwp, cap), jnp.int32),
        interpret=interpret,
    )(box, lt)
    return out[:nw]


def fill_capacity_buffer_xla(box: jnp.ndarray, cap: int, kbits: int):
    """XLA fallback with identical semantics (CPU tests / non-TPU)."""
    nw, k = box.shape
    occ = box >= 0
    rank = jnp.cumsum(occ.astype(jnp.int32), axis=1) - occ.astype(jnp.int32)
    k_iota = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), box.shape)
    packed = jnp.where(occ, (box << kbits) | k_iota, -1)
    keep = occ & (rank < cap)
    ar = jnp.arange(nw * k, dtype=jnp.int32)
    dest = jnp.where(keep.reshape(-1),
                     (jnp.arange(nw, dtype=jnp.int32)[:, None] * cap
                      + rank).reshape(-1),
                     nw * cap + ar)
    return jnp.full((nw * cap,), -1, jnp.int32).at[dest].set(
        packed.reshape(-1), mode="drop", unique_indices=True
    ).reshape(nw, cap)
