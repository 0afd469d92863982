"""Farthest-point sampling as a row-tiled Pallas TPU kernel.

Replaces the ``lax.fori_loop`` XLA form of
:func:`mssvt_tpu.ops.sampling.farthest_point_sample_planes` on TPU.
Reference semantics: pointnet2_batch ``farthest_point_sampling_kernel``
(ref: pcdet/ops/pointnet2/pointnet2_batch/src/sampling_gpu.cu:101-185) —
first pick is index 0, min-dist caches start at 1e10, argmax ties resolve
to the lowest index.

Why a kernel: the XLA loop re-reads and re-writes the full (B, N) min-dist
and coordinate planes from HBM on every one of the ``npoint-1`` sequential
iterations (~7 GB of traffic at Waymo scale, ~9 ms/frame measured by
ablation). Here each grid step loads a (ROWS, N) tile of the three
coordinate planes into VMEM once and runs the whole sequential loop
on-chip; HBM sees each plane exactly once in each direction.

Kernel shape rules (see memory: mosaic-pallas-pitfalls): full-width 2D ops
only — selection is a one-hot masked reduction, the argmax is a max +
iota-min pair, and the output indices accumulate into a (ROWS, npoint)
register tile via one-hot writes instead of dynamic lane stores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(x_ref, y_ref, z_ref, o_ref, *, npoint):
    x = x_ref[:].astype(jnp.float32)  # (R, N)
    y = y_ref[:].astype(jnp.float32)
    z = z_ref[:].astype(jnp.float32)
    r, n = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    ocol = jax.lax.broadcasted_iota(jnp.int32, (r, npoint), 1)

    def body(i, carry):
        min_dist, last, out = carry
        sel = (col == last).astype(jnp.float32)  # (R, N) one-hot of last pick
        lx = jnp.sum(x * sel, axis=1, keepdims=True)  # (R, 1)
        ly = jnp.sum(y * sel, axis=1, keepdims=True)
        lz = jnp.sum(z * sel, axis=1, keepdims=True)
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        min_dist = jnp.minimum(min_dist, d)
        # argmax with lowest-index tie-break: max, then min index attaining it
        m = jnp.max(min_dist, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(min_dist == m, col, n), axis=1,
                      keepdims=True).astype(jnp.int32)  # (R, 1)
        out = jnp.where(ocol == i, nxt, out)
        return min_dist, nxt, out

    out0 = jnp.zeros((r, npoint), jnp.int32)  # slot 0 = index 0
    init = (jnp.full((r, n), 1e10, jnp.float32),
            jnp.zeros((r, 1), jnp.int32), out0)
    _, _, out = jax.lax.fori_loop(1, npoint, body, init)
    o_ref[:] = out


def _fps_kernel_t(x_ref, y_ref, z_ref, o_ref, *, npoint):
    """Transposed layout: windows ride the LANE axis ((N, W) blocks), so the
    per-iteration min-dist reductions run along SUBLANES (8-deep) instead of
    the 128-wide lane axis."""
    x = x_ref[:].astype(jnp.float32)  # (N, W)
    y = y_ref[:].astype(jnp.float32)
    z = z_ref[:].astype(jnp.float32)
    n, wcols = x.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (n, wcols), 0)
    orow = jax.lax.broadcasted_iota(jnp.int32, (npoint, wcols), 0)

    def body(i, carry):
        min_dist, last, out = carry
        sel = (row == last).astype(jnp.float32)  # (N, W) one-hot per column
        lx = jnp.sum(x * sel, axis=0, keepdims=True)  # (1, W)
        ly = jnp.sum(y * sel, axis=0, keepdims=True)
        lz = jnp.sum(z * sel, axis=0, keepdims=True)
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        min_dist = jnp.minimum(min_dist, d)
        m = jnp.max(min_dist, axis=0, keepdims=True)
        nxt = jnp.min(jnp.where(min_dist == m, row, n), axis=0,
                      keepdims=True).astype(jnp.int32)  # (1, W)
        out = jnp.where(orow == i, nxt, out)
        return min_dist, nxt, out

    out0 = jnp.zeros((npoint, wcols), jnp.int32)
    init = (jnp.full((n, wcols), 1e10, jnp.float32),
            jnp.zeros((1, wcols), jnp.int32), out0)
    _, _, out = jax.lax.fori_loop(1, npoint, body, init)
    o_ref[:] = out


def _fps_kernel_t_sel(*refs, npoint, naux, col_block=0, nw_half=0):
    """Transposed FPS that ALSO emits the selected values of every input
    plane (coords + aux planes, e.g. buffer indices as exact f32).

    The per-iteration one-hot reduction ``sum(plane * sel)`` is the pick's
    plane value — already computed for x/y/z to update distances — so
    emitting selections costs one select per plane per iteration and
    removes the callers' post-FPS (B, npoint) take_along_axis gathers
    (element-descriptor-rate bound on TPU). Iteration i's reduction is the
    coords of the PREVIOUS pick (slot i-1); slot npoint-1 gets one extra
    reduction after the loop.

    With ``nw_half`` the input columns are two stacked halves (win1 buffers
    at [0, nw_half), win2 at [nw_half, 2*nw_half)), each with a live-window
    PREFIX given by the scalar-prefetched count: column blocks past the
    prefix in either half skip the sequential loop entirely and emit zeros.
    """
    if nw_half:
        nv_ref, *refs = refs
        c0 = pl.program_id(0) * col_block
        nv = nv_ref[0]
        dead = jnp.logical_or(
            jnp.logical_and(c0 >= nv, c0 + col_block <= nw_half),
            c0 >= nw_half + nv)

        @pl.when(dead)
        def _skip():
            for ref in refs[3 + naux:]:
                ref[:] = jnp.zeros_like(ref)

        @pl.when(jnp.logical_not(dead))
        def _run():
            _fps_t_sel_body(refs, npoint, naux)
        return
    _fps_t_sel_body(refs, npoint, naux)


def _fps_t_sel_body(refs, npoint, naux):
    planes = [r[:].astype(jnp.float32) for r in refs[:3 + naux]]  # (N, W)
    o_ref = refs[3 + naux]
    sel_refs = refs[4 + naux:]
    x, y, z = planes[:3]
    n, wcols = x.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (n, wcols), 0)
    orow = jax.lax.broadcasted_iota(jnp.int32, (npoint, wcols), 0)

    def body(i, carry):
        min_dist, last, out, sels = carry
        sel = (row == last).astype(jnp.float32)  # (N, W) one-hot per column
        picks = [jnp.sum(p * sel, axis=0, keepdims=True) for p in planes]
        lx, ly, lz = picks[:3]
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        min_dist = jnp.minimum(min_dist, d)
        m = jnp.max(min_dist, axis=0, keepdims=True)
        nxt = jnp.min(jnp.where(min_dist == m, row, n), axis=0,
                      keepdims=True).astype(jnp.int32)  # (1, W)
        out = jnp.where(orow == i, nxt, out)
        sels = tuple(jnp.where(orow == (i - 1), pk, s)
                     for pk, s in zip(picks, sels))
        return min_dist, nxt, out, sels

    out0 = jnp.zeros((npoint, wcols), jnp.int32)
    sels0 = tuple(jnp.zeros((npoint, wcols), jnp.float32)
                  for _ in planes)
    init = (jnp.full((n, wcols), 1e10, jnp.float32),
            jnp.zeros((1, wcols), jnp.int32), out0, sels0)
    _, last, out, sels = jax.lax.fori_loop(1, npoint, body, init)
    # final pick's values (slot npoint-1) need one more one-hot reduction
    fsel = (row == last).astype(jnp.float32)
    o_ref[:] = out
    for ref, p, s in zip(sel_refs, planes, sels):
        pk = jnp.sum(p * fsel, axis=0, keepdims=True)
        ref[:] = jnp.where(orow == (npoint - 1), pk, s)


@functools.partial(
    jax.jit, static_argnames=("npoint", "col_block", "interpret", "nw_half"))
def farthest_point_sample_planes_pallas_t_sel(
    x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, aux,
    npoint: int, col_block: int = 128, interpret: bool = False,
    num_valid: jnp.ndarray = None, nw_half: int = 0,
):
    """Transposed-layout FPS returning ``(idx (B, npoint) int32, selected
    planes)`` — selections of (x, y, z, *aux) at the picks, each (B,
    npoint) f32. Aux planes must be f32-exact (|v| < 2**24).

    ``num_valid``/``nw_half``: the rows are two stacked nw_half-row halves,
    each with a live prefix of num_valid rows — fully-dead column blocks
    skip the sequential loop and their input DMAs (tail routing)."""
    b, n = x.shape
    pad = (-b) % col_block
    planes = [x, y, z] + list(aux)
    tp = [jnp.pad(p.astype(jnp.float32), ((0, pad), (0, 0))).T
          for p in planes]
    bp = b + pad
    naux = len(aux)
    nplanes = 3 + naux
    has_nv = num_valid is not None and nw_half
    kernel = functools.partial(
        _fps_kernel_t_sel, npoint=npoint, naux=naux,
        col_block=(col_block if has_nv else 0),
        nw_half=(int(nw_half) if has_nv else 0))
    out_shape = tuple(
        [jax.ShapeDtypeStruct((npoint, bp), jnp.int32)]
        + [jax.ShapeDtypeStruct((npoint, bp), jnp.float32)] * nplanes)
    if has_nv:
        nwh = int(nw_half)

        def _col(i, nv):
            c0 = i * col_block
            dead = jnp.logical_or(
                jnp.logical_and(c0 >= nv[0], c0 + col_block <= nwh),
                c0 >= nwh + nv[0])
            return (0, jnp.where(dead, 0, i))

        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bp // col_block,),
                in_specs=[pl.BlockSpec((n, col_block), _col,
                                       memory_space=pltpu.VMEM)] * nplanes,
                out_specs=tuple(
                    [pl.BlockSpec((npoint, col_block),
                                  lambda i, nv: (0, i),
                                  memory_space=pltpu.VMEM)] * (1 + nplanes)),
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(jnp.asarray(num_valid, jnp.int32).reshape(1), *tp)
    else:
        outs = pl.pallas_call(
            kernel,
            grid=(bp // col_block,),
            in_specs=[pl.BlockSpec((n, col_block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)] * nplanes,
            out_specs=tuple(
                [pl.BlockSpec((npoint, col_block), lambda i: (0, i),
                              memory_space=pltpu.VMEM)] * (1 + nplanes)),
            out_shape=out_shape,
            interpret=interpret,
        )(*tp)
    idx = outs[0].T[:b]
    sels = tuple(o.T[:b] for o in outs[1:])
    return idx, sels


@functools.partial(
    jax.jit, static_argnames=("npoint", "col_block", "interpret"))
def farthest_point_sample_planes_pallas_t(
    x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, npoint: int,
    col_block: int = 512, interpret: bool = False,
) -> jnp.ndarray:
    """Transposed-layout FPS: (B, N) planes -> (B, npoint) indices, with the
    window axis tiled along lanes."""
    b, n = x.shape
    pad = (-b) % col_block
    xt = jnp.pad(x, ((0, pad), (0, 0))).T  # (N, BP)
    yt = jnp.pad(y, ((0, pad), (0, 0))).T
    zt = jnp.pad(z, ((0, pad), (0, 0))).T
    bp = b + pad
    kernel = functools.partial(_fps_kernel_t, npoint=npoint)
    out = pl.pallas_call(
        kernel,
        grid=(bp // col_block,),
        in_specs=[
            pl.BlockSpec((n, col_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, col_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, col_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((npoint, col_block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npoint, bp), jnp.int32),
        interpret=interpret,
    )(xt.astype(jnp.float32), yt.astype(jnp.float32), zt.astype(jnp.float32))
    return out.T[:b]


@functools.partial(
    jax.jit, static_argnames=("npoint", "row_block", "interpret"))
def farthest_point_sample_planes_pallas(
    x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, npoint: int,
    row_block: int = 256, interpret: bool = False,
) -> jnp.ndarray:
    """(B, N) coordinate planes -> (B, npoint) int32 FPS indices."""
    b, n = x.shape
    pad = (-b) % row_block
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        y = jnp.pad(y, ((0, pad), (0, 0)))
        z = jnp.pad(z, ((0, pad), (0, 0)))
    bp = b + pad
    kernel = functools.partial(_fps_kernel, npoint=npoint)
    out = pl.pallas_call(
        kernel,
        grid=(bp // row_block,),
        in_specs=[
            pl.BlockSpec((row_block, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_block, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_block, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, npoint), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, npoint), jnp.int32),
        interpret=interpret,
    )(x.astype(jnp.float32), y.astype(jnp.float32), z.astype(jnp.float32))
    return out[:b]
