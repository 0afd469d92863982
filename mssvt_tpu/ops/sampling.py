"""Point sampling / grouping / interpolation ops (TPU-native pointnet2 core).

Replaces the pointnet2_batch CUDA kernels the MsSVT backbone depends on
(ref: pcdet/ops/pointnet2/pointnet2_batch/src/):

- ``farthest_point_sampling_kernel`` (sampling_gpu.cu:101-185) →
  :func:`farthest_point_sample`: the same sequential min-dist/argmax loop,
  vectorized over the "batch" axis (here: windows) with ``lax.fori_loop``.
- ``group_points_kernel_fast`` / the mssvt ``group_features_kernel_stack``
  (group_features_gpu.cu:15-106) → :func:`group_features`: one
  ``jnp.take`` with -1→zero masking. The backward pass is XLA scatter-add —
  deterministic, unlike the reference's float atomicAdd (:46).
- ``three_nn_kernel_fast`` / ``three_interpolate``
  (interpolate_gpu.cu:16-127) → :func:`three_nn` /
  :func:`three_interpolate`: a batched distance matrix + ``lax.top_k``.

Channel-last layout throughout ((..., n, C) rather than (..., C, n)) — the
natural layout for TPU matmuls.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Iterative farthest point sampling.

    Semantics match the reference kernel (sampling_gpu.cu:101-185): the first
    selected index is always 0, min-distance caches start at 1e10, and ties in
    the argmax resolve to the lowest index (deterministic here; the CUDA tree
    reduction's tie-break depends on thread striding).

    Args:
        xyz: (B, N, 3) float coordinates. Padding rows should be zeros — the
            caller masks repeats of index 0 afterwards, exactly like the
            reference (ref: mssvt_backbone.py:248-252).
        npoint: static number of samples.

    Returns:
        (B, npoint) int32 indices into N.
    """
    b, n, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    ar = jnp.arange(n, dtype=jnp.int32)

    def body(i, carry):
        min_dist, last, out = carry
        # one-hot select instead of take_along_axis: a per-iteration gather
        # inside the sequential loop is launch-overhead bound on TPU; the
        # masked reduction is pure VPU work
        sel = (ar[None, :] == last[:, None]).astype(xyz.dtype)  # (B, N)
        last_xyz = jnp.einsum("bn,bnc->bc", sel, xyz)[:, None, :]  # (B,1,3)
        d = jnp.sum((xyz - last_xyz) ** 2, axis=-1)  # (B, N)
        min_dist = jnp.minimum(min_dist, d)
        nxt = jnp.argmax(min_dist, axis=1).astype(jnp.int32)
        out = out.at[:, i].set(nxt)
        return min_dist, nxt, out

    out = jnp.zeros((b, npoint), jnp.int32)  # slot 0 = index 0
    init = (jnp.full((b, n), 1e10, jnp.float32), jnp.zeros((b,), jnp.int32), out)
    _, _, out = jax.lax.fori_loop(1, npoint, body, init)
    return out


def farthest_point_sample_planes(x: jnp.ndarray, y: jnp.ndarray,
                                 z: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """:func:`farthest_point_sample` on component planes.

    Identical semantics/arithmetic, but coordinates arrive as three (B, N)
    arrays instead of (B, N, 3): every elementwise op in the sequential loop
    then runs at full lane width. A trailing length-3 axis puts 3 of 128
    lanes to work and measured ~5x slower at Waymo scale.

    On TPU this routes to a row-tiled Pallas kernel that runs the whole
    sequential loop in VMEM (the XLA loop pays ``npoint-1`` full HBM sweeps
    of the planes — ~9 ms/frame at Waymo scale; see ops/pallas_fps.py).
    """
    mode = os.environ.get("MSSVT_PALLAS", "auto")
    if mode == "interpret" or (
        mode not in ("off", "xla_fill") and jax.default_backend() == "tpu"
    ):
        # transposed layout: windows on LANES, so the per-iteration
        # reductions run along sublanes — microbenched 0.4ms vs 6.5ms for
        # the row layout at Waymo scale (48000x96), identical picks
        from .pallas_fps import farthest_point_sample_planes_pallas_t

        return farthest_point_sample_planes_pallas_t(
            x, y, z, npoint, col_block=128, interpret=(mode == "interpret"))
    b, n = x.shape
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    z = z.astype(jnp.float32)
    ar = jnp.arange(n, dtype=jnp.int32)

    def body(i, carry):
        min_dist, last, out = carry
        sel = (ar[None, :] == last[:, None]).astype(jnp.float32)  # (B, N)
        lx = jnp.einsum("bn,bn->b", sel, x)[:, None]
        ly = jnp.einsum("bn,bn->b", sel, y)[:, None]
        lz = jnp.einsum("bn,bn->b", sel, z)[:, None]
        d = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        min_dist = jnp.minimum(min_dist, d)
        nxt = jnp.argmax(min_dist, axis=1).astype(jnp.int32)
        out = out.at[:, i].set(nxt)
        return min_dist, nxt, out

    out = jnp.zeros((b, npoint), jnp.int32)  # slot 0 = index 0
    init = (jnp.full((b, n), 1e10, jnp.float32), jnp.zeros((b,), jnp.int32), out)
    _, _, out = jax.lax.fori_loop(1, npoint, body, init)
    return out


def farthest_point_sample_planes_select(x, y, z, aux, npoint: int,
                                        num_valid=None, nw_half: int = 0):
    """FPS that also returns the selected values of (x, y, z, *aux) at the
    picks, each (B, npoint) f32.

    On the Pallas path the selections fall out of the kernel's per-iteration
    one-hot reductions (no extra HBM traffic); elsewhere they are plain
    ``take_along_axis`` gathers of the same planes — bit-identical values
    (the kernel's ``sum(plane * one_hot)`` has exactly one nonzero term).
    Aux planes must be f32-exact (|v| < 2**24), e.g. buffer row indices.
    """
    # Selections are values of integer-derived planes: the pre-select form
    # (int-buffer take_along) carried no gradient path, and the kernel has
    # no autodiff rules — stop_gradient on the INPUTS keeps value_and_grad
    # from linearizing through the kernel, preserving those exact semantics.
    x, y, z = (jax.lax.stop_gradient(p) for p in (x, y, z))
    aux = tuple(jax.lax.stop_gradient(p) for p in aux)
    mode = os.environ.get("MSSVT_PALLAS", "auto")
    if mode == "interpret" or (
        mode not in ("off", "xla_fill") and jax.default_backend() == "tpu"
    ):
        from .pallas_fps import farthest_point_sample_planes_pallas_t_sel

        return farthest_point_sample_planes_pallas_t_sel(
            x, y, z, tuple(aux), npoint, col_block=128,
            interpret=(mode == "interpret"),
            num_valid=num_valid, nw_half=nw_half)
    idx = farthest_point_sample_planes(x, y, z, npoint)
    sels = tuple(
        jnp.take_along_axis(p.astype(jnp.float32), idx, axis=1)
        for p in (x, y, z, *aux))
    return idx, sels


def three_nn_planes(ux, uy, uz, kx, ky, kz):
    """:func:`three_nn` on component planes ((B, n) x3 vs (B, m) x3)."""
    u2 = ux * ux + uy * uy + uz * uz  # (B, n)
    k2 = kx * kx + ky * ky + kz * kz  # (B, m)
    cross = (
        jnp.einsum("bn,bm->bnm", ux, kx, preferred_element_type=jnp.float32)
        + jnp.einsum("bn,bm->bnm", uy, ky, preferred_element_type=jnp.float32)
        + jnp.einsum("bn,bm->bnm", uz, kz, preferred_element_type=jnp.float32)
    )
    d2 = jnp.maximum(u2[:, :, None] + k2[:, None, :] - 2.0 * cross, 0.0)
    m = kx.shape[1]
    k_eff = min(3, m)
    picked_d, picked_i = [], []
    work = d2
    mar = jnp.arange(m)
    for _ in range(k_eff):
        i_k = jnp.argmin(work, axis=-1)
        d_k = jnp.min(work, axis=-1)
        picked_i.append(i_k)
        picked_d.append(d_k)
        work = jnp.where(mar == i_k[..., None], jnp.inf, work)
    neg = -jnp.stack(picked_d, axis=-1)
    idx = jnp.stack(picked_i, axis=-1)
    if k_eff < 3:
        pad = 3 - k_eff
        neg = jnp.concatenate(
            [neg, jnp.full(neg.shape[:-1] + (pad,), -1e38, neg.dtype)], axis=-1
        )
        idx = jnp.concatenate(
            [idx, jnp.zeros(idx.shape[:-1] + (pad,), idx.dtype)], axis=-1
        )
    return -neg, idx.astype(jnp.int32)


def three_interp_weights_planes(ux, uy, uz, kx, ky, kz, dtype=jnp.float32):
    """Dense 3-NN inverse-distance interpolation matrix from planes.

    Fuses :func:`three_nn_planes` + the weight normalization +
    :func:`three_interpolate`'s one-hot expansion into one (B, n, m)
    row-sparse matrix W (rows sum to 1 over the 3 picked columns), so the
    caller's whole interpolation is ``W @ features``. Same first-min
    tie-break as ``three_nn_planes``.

    The output is written directly in the caller's compute ``dtype``
    (bf16 on the bench path — halves the einsum's W3 read bytes).

    Distance form: the einsum/expansion d2 (u² + k² − 2uk) is kept
    deliberately — XLA recomputes it into each argmin sweep instead of
    materializing the (B, n, m) tensor. A broadcasted-difference rewrite
    intended to "avoid materialization" was A/B-probed 2026-08-20 and
    EXPLODED bytes 25.4 → 219 GB/frame (XLA materializes every masked
    copy of the diff form); see git history.

    Weight form parity: the reference's batch ``three_nn`` wrapper returns
    ``torch.sqrt(dist2)`` (pointnet2_batch/pointnet2_utils.py:98) and the
    MsSVT block weights are ``1 / clamp(sqrt(d2), min=1e-10)``
    (ref: mssvt_backbone.py:304-307) — inverse L2 distance, NOT inverse
    squared distance.
    """
    u2 = ux * ux + uy * uy + uz * uz  # (B, n)
    k2 = kx * kx + ky * ky + kz * kz  # (B, m)
    cross = (
        jnp.einsum("bn,bm->bnm", ux, kx, preferred_element_type=jnp.float32)
        + jnp.einsum("bn,bm->bnm", uy, ky, preferred_element_type=jnp.float32)
        + jnp.einsum("bn,bm->bnm", uz, kz, preferred_element_type=jnp.float32)
    )
    d2 = jnp.maximum(u2[:, :, None] + k2[:, None, :] - 2.0 * cross, 0.0)
    m = kx.shape[1]
    k_eff = min(3, m)
    lane = jnp.arange(m)
    # one-pass top-3 is the default (A/B 2026-08-21: sync 43.2 -> 43.0,
    # bytes 22.8 -> 22.5 GB/frame; exact parity incl. index tie-breaks);
    # MSSVT_W3=iter restores the three-sweep form
    if k_eff == 3 and os.environ.get("MSSVT_W3", "reduce") == "reduce":
        picked = _top3_lex_reduce(d2)
    else:
        work = d2
        picked = []
        for _ in range(k_eff):
            d_k = jnp.min(work, axis=-1, keepdims=True)  # (B, n, 1)
            i_k = jnp.argmin(work, axis=-1)[..., None]  # ties → lowest index
            picked.append((i_k, d_k))
            work = jnp.where(lane == i_k, jnp.inf, work)
    w3 = jnp.zeros(d2.shape, dtype)
    wsum = jnp.zeros(d2.shape[:2] + (1,), d2.dtype)
    weights = []
    for i_k, d_k in picked:
        wgt = 1.0 / jnp.clip(jnp.sqrt(d_k), 1e-10, None)
        weights.append((i_k, wgt))
        wsum = wsum + wgt
    for i_k, wgt in weights:
        w3 = w3 + jnp.where(lane == i_k, wgt / wsum, 0.0).astype(dtype)
    return w3


def _top3_lex_reduce(d2: jnp.ndarray):
    """Top-3 smallest (distance, index) of ``d2`` along the last axis in ONE
    variadic ``lax.reduce`` pass (vs three masked argmin sweeps, each of
    which re-reads/recomputes the whole distance tensor).

    Lexicographic (d, i) order with all indices distinct is total, so the
    sorted-triple merge identities hold exactly and the result equals the
    iterated lowest-index-tie-break argmin. Returns [(i1, d1), (i2, d2),
    (i3, d3)] with the trailing keepdims axis, like the iterative path.
    """
    b, n, m = d2.shape
    iota = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (b, n, m))
    inf = jnp.full_like(d2, jnp.inf)
    imax = jnp.full_like(iota, jnp.iinfo(jnp.int32).max)

    def lex_lt(x, ix, y, iy):
        return (x < y) | ((x == y) & (ix < iy))

    def comb(a, bb):
        a1, i1, a2, i2, a3, i3 = a
        b1, j1, b2, j2, b3, j3 = bb

        def sel(c, x, ix, y, iy):
            return jnp.where(c, x, y), jnp.where(c, ix, iy)

        c11 = lex_lt(a1, i1, b1, j1)
        lo1, li1 = sel(c11, a1, i1, b1, j1)        # rank 1
        hi1, hj1 = sel(c11, b1, j1, a1, i1)        # max(a1, b1)
        c22 = lex_lt(a2, i2, b2, j2)
        lo2, li2 = sel(c22, a2, i2, b2, j2)        # min(a2, b2)
        cr2 = lex_lt(hi1, hj1, lo2, li2)
        r2, ri2 = sel(cr2, hi1, hj1, lo2, li2)     # rank 2
        # rank 3 = min(max(a1,b2), max(a2,b1), min(a3,b3))
        cx = lex_lt(a1, i1, b2, j2)
        x1, xi1 = sel(cx, b2, j2, a1, i1)
        cy = lex_lt(a2, i2, b1, j1)
        y1, yi1 = sel(cy, b1, j1, a2, i2)
        cz = lex_lt(a3, i3, b3, j3)
        z1, zi1 = sel(cz, a3, i3, b3, j3)
        cxy = lex_lt(x1, xi1, y1, yi1)
        xy, xyi = sel(cxy, x1, xi1, y1, yi1)
        cr3 = lex_lt(xy, xyi, z1, zi1)
        r3, ri3 = sel(cr3, xy, xyi, z1, zi1)
        return lo1, li1, r2, ri2, r3, ri3

    init = (jnp.asarray(jnp.inf, d2.dtype), jnp.asarray(jnp.iinfo(jnp.int32).max),
            jnp.asarray(jnp.inf, d2.dtype), jnp.asarray(jnp.iinfo(jnp.int32).max),
            jnp.asarray(jnp.inf, d2.dtype), jnp.asarray(jnp.iinfo(jnp.int32).max))
    d1, i1, d2_, i2, d3, i3 = jax.lax.reduce(
        (d2, iota, inf, imax, inf, imax), init, comb, (2,))
    return [(i1[..., None], d1[..., None]),
            (i2[..., None], d2_[..., None]),
            (i3[..., None], d3[..., None])]


def farthest_point_sample_masked(xyz: jnp.ndarray, valid: jnp.ndarray,
                                 npoint: int) -> jnp.ndarray:
    """FPS that never selects invalid rows (until valid ones run out).

    Like :func:`farthest_point_sample` but padding-aware: invalid rows carry
    min-dist -1 so the argmax always prefers valid points; the first pick is
    the first valid index. When a sample has fewer than `npoint` valid rows
    the tail repeats invalid indices — callers mask with ``valid[idx]``.

    Returns (B, npoint) int32.
    """
    b, n, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    first = jnp.argmax(valid, axis=1).astype(jnp.int32)  # first valid row

    def body(i, carry):
        min_dist, last, out = carry
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)
        d = jnp.sum((xyz - last_xyz) ** 2, axis=-1)
        min_dist = jnp.minimum(min_dist, jnp.where(valid, d, -1.0))
        nxt = jnp.argmax(min_dist, axis=1).astype(jnp.int32)
        out = out.at[:, i].set(nxt)
        return min_dist, nxt, out

    out = jnp.zeros((b, npoint), jnp.int32).at[:, 0].set(first)
    init = (jnp.where(valid, 1e10, -1.0).astype(jnp.float32), first, out)
    _, _, out = jax.lax.fori_loop(1, npoint, body, init)
    return out


def sample_points_with_roi(points_xyz: jnp.ndarray, points_valid: jnp.ndarray,
                           rois: jnp.ndarray, roi_valid: jnp.ndarray,
                           sample_radius: float) -> jnp.ndarray:
    """ROI-filtered point validity (ref: voxel_set_abstraction.py:78-121
    ``sample_points_with_roi``): a point stays eligible iff its distance to
    the nearest valid ROI center is below ``sample_radius`` plus that ROI's
    half-diagonal. Returns the refined (B, N) validity mask; if a sample has
    no valid ROI, the original mask is kept (reference falls back to all
    points when rois are absent).
    """
    centers = rois[..., :3]  # (B, R, 3)
    half_diag = jnp.linalg.norm(rois[..., 3:6], axis=-1) / 2  # (B, R)
    d = jnp.linalg.norm(
        points_xyz[:, :, None, :] - centers[:, None, :, :], axis=-1
    )  # (B, N, R)
    near = d < (half_diag[:, None, :] + sample_radius)
    near = near & roi_valid[:, None, :]
    has_roi = jnp.any(roi_valid, axis=-1, keepdims=True)  # (B, 1)
    keep = jnp.where(has_roi, jnp.any(near, axis=-1), True)
    return points_valid & keep


def sector_fps(points_xyz: jnp.ndarray, points_valid: jnp.ndarray,
               npoint: int, num_sectors: int) -> jnp.ndarray:
    """Sectorized FPS (ref: voxel_set_abstraction.py:45-75 ``sector_fps``).

    Splits points into azimuth sectors about the sensor origin and FPS-samples
    each sector independently, then cuts the union back to ``npoint`` with a
    final FPS pass. Static-shape deviation from the reference: sector quotas
    are equal (ceil(npoint/num_sectors)) instead of proportional to sector
    population — the final FPS pass restores spatial uniformity.

    Returns (B, npoint) int32 indices into N.
    """
    b, n, _ = points_xyz.shape
    if num_sectors <= 1:
        return farthest_point_sample_masked(points_xyz, points_valid, npoint)
    quota = -(-npoint // num_sectors)  # ceil
    az = jnp.arctan2(points_xyz[..., 1], points_xyz[..., 0])  # (-pi, pi]
    sector = jnp.clip(
        ((az + jnp.pi) / (2 * jnp.pi) * num_sectors).astype(jnp.int32),
        0, num_sectors - 1,
    )
    cand_list = []
    cand_valid = []
    for s in range(num_sectors):
        v = points_valid & (sector == s)
        idx = farthest_point_sample_masked(points_xyz, v, quota)  # (B, quota)
        cand_list.append(idx)
        cand_valid.append(jnp.take_along_axis(v, idx, axis=1))
    cand = jnp.concatenate(cand_list, axis=1)          # (B, S*quota)
    cvalid = jnp.concatenate(cand_valid, axis=1)
    cxyz = gather_along_batch(points_xyz, cand)        # (B, S*quota, 3)
    final = farthest_point_sample_masked(cxyz, cvalid, npoint)
    return jnp.take_along_axis(cand, final, axis=1)


def gather_along_batch(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather (B, N, ...) values by (B, M) indices → (B, M, ...).

    Equivalent of ``gather_operation`` (sampling_gpu.cu:15) in channel-last
    layout. Small source axes (window gather buffers, <= 256 slots) go
    through a one-hot contraction — batched take_along_axis lowers to a
    row-rate-bound gather (~50 ms/frame across the MsSVT blocks) while the
    one-hot matmul is ~free on the MXU/VPU.
    """
    n = values.shape[1]
    if n <= 256 and jnp.issubdtype(values.dtype, jnp.floating):
        onehot = jax.nn.one_hot(idx, n, dtype=values.dtype)  # (B, M, N)
        return jnp.einsum("bmn,bn...->bm...", onehot, values)
    extra = values.ndim - 2
    ix = idx.reshape(idx.shape + (1,) * extra)
    return jnp.take_along_axis(values, ix, axis=1)


def group_features(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather flat (V, C) features by (..., nsample) global rows; -1 → zeros.

    Equivalent of the mssvt ``grouping_operation``
    (ref: mssvt_ops.py:136-192 + group_features_gpu.cu:15-44) except indices
    are global rows (the batch offset is already folded in by the sorted-key
    index) and output is channel-last (..., nsample, C). Gradients flow to
    `features` via XLA scatter-add — deterministic, replacing the reference's
    atomicAdd backward (group_features_gpu.cu:46-106).

    Contract: idx must lie in [-1, V). -1 yields a zero row; out-of-range
    positive indices (idx >= V) clamp to the appended pad row and ALSO yield
    zeros (not the last real row, as a clip-based gather would).
    """
    # Invalid rows are masked by the gather itself: route idx<0 to a dedicated
    # zero row appended past the feature table. The previous full-width
    # `where` re-streamed the gathered (...,nsample,C) array through HBM
    # (~14 ms/step across the MsSVT blocks, xplane-measured); the pad row is
    # one (1,C) concat that XLA CSEs across calls on the same features.
    v = features.shape[0]
    padded = jnp.concatenate([features, jnp.zeros_like(features[:1])], axis=0)
    # mode="clip": jnp.take's default fill mode materializes a SECOND
    # full-output select sweep after the gather (xplane: 6 ms/step across
    # the block-0 buffers alone). Indices are already routed into [0, v]
    # by the where (and idx > v clamps to the same zero pad row), so the
    # clip gather is bit-identical without the sweep.
    return jnp.take(padded, jnp.where(idx >= 0, idx, v), axis=0, mode="clip")


def _int_ct(a):
    """Cotangent for an integer-dtype primal (JAX's float0 convention)."""
    import numpy as _np

    return _np.zeros(a.shape, jax.dtypes.float0)


@jax.custom_vjp
def group_features_paired(features, ind, win_row, slot, inv_valid):
    """:func:`group_features` whose BACKWARD is a row gather, not a scatter.

    Requires the partial-permutation property the win1 buffers satisfy by
    construction (``gather_window_voxels(return_inverse=True)``):

        ind[w, s] == v  <=>  inv_valid[v] & win_row[v] == w & slot[v] == s

    i.e. every voxel occupies at most ONE (window, slot) address. Under it,
    the VJP of the gather — mathematically a scatter-add of the output
    cotangent at ``ind`` — has at most one contribution per feature row, so
    it can be computed as ``dx[v] = g[win_row[v], slot[v]]`` (zero where
    ``inv_valid`` is False): one (V, C) row gather. XLA row scatters execute
    at ~72 ns/descriptor on v5e vs ~1.9 ns for row gathers (xplane-measured,
    README); at Waymo scale the win1 buffer is NW*cap ≈ 4.6M descriptors per
    block, making the scatter-add VJP the dominant train-step cost.

    Replaces the reference backward's atomicAdd scatter
    (ref: group_features_gpu.cu:46-106) — and is deterministic.
    """
    return group_features(features, ind)


def _gfp_fwd(features, ind, win_row, slot, inv_valid):
    out = group_features(features, ind)
    # zero-size dtype token: residuals must be JAX types
    return out, (ind, win_row, slot, inv_valid,
                 jnp.zeros((0,), features.dtype))


def _gfp_bwd(res, g):
    ind, win_row, slot, inv_valid, f_tok = res
    f_dtype = f_tok.dtype
    nw, cap = ind.shape
    c = g.shape[-1]
    pos = jnp.clip(win_row * cap + slot, 0, nw * cap - 1)
    rows = jnp.take(g.reshape(-1, c), pos, axis=0, mode="clip")
    dx = jnp.where(inv_valid[:, None], rows, 0).astype(f_dtype)
    return (dx, _int_ct(ind), _int_ct(win_row), _int_ct(slot),
            _int_ct(inv_valid))


group_features_paired.defvjp(_gfp_fwd, _gfp_bwd)


@jax.custom_vjp
def writeback_inverse_paired(upd_fea, shortcut, ind, win_row, slot, inv_valid):
    """Inverse write-back whose BACKWARD is also a row gather.

    Forward: each voxel row-gathers its updated feature from its
    (window, slot) address; voxels in no live slot keep ``shortcut``
    (≡ the reference's per-batch scatter loop, ref: mssvt_backbone.py:313-336,
    where the clone base means untouched rows keep the original features).

    Backward (same partial-permutation property as
    :func:`group_features_paired`):
        d_upd[w, s]  = gy[ind[w, s]]        (0 where ind < 0)   — a gather
        d_shortcut[v] = gy[v] * ~inv_valid[v]
    The plain formulation's VJP is a (V,)-descriptor row scatter into the
    (NW*cap, C) buffer; this form replaces it with an (NW*cap,)-row gather.
    """
    nw_b, n1b, c = upd_fea.shape
    pos = jnp.clip(win_row * n1b + slot, 0, nw_b * n1b - 1)
    rows = jnp.take(upd_fea.reshape(-1, c), pos, axis=0, mode="clip")
    return jnp.where(inv_valid[:, None], rows.astype(shortcut.dtype), shortcut)


def _wbp_fwd(upd_fea, shortcut, ind, win_row, slot, inv_valid):
    out = writeback_inverse_paired(upd_fea, shortcut, ind, win_row, slot,
                                   inv_valid)
    return out, (ind, win_row, slot, inv_valid,
                 jnp.zeros((0,) + upd_fea.shape, upd_fea.dtype),
                 jnp.zeros((0,), shortcut.dtype))


def _wbp_bwd(res, gy):
    ind, win_row, slot, inv_valid, u_tok, s_tok = res
    u_dtype, s_dtype = u_tok.dtype, s_tok.dtype
    nw_b, n1b, c = u_tok.shape[1:]
    v = gy.shape[0]
    gpad = jnp.concatenate([gy, jnp.zeros_like(gy[:1])], axis=0)
    d_upd = jnp.take(gpad, jnp.where(ind >= 0, ind, v), axis=0,
                     mode="clip").astype(u_dtype)
    d_short = jnp.where(inv_valid[:, None], 0, gy).astype(s_dtype)
    return (d_upd, d_short, _int_ct(ind), _int_ct(win_row), _int_ct(slot),
            _int_ct(inv_valid))


writeback_inverse_paired.defvjp(_wbp_fwd, _wbp_bwd)


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray, known_valid=None):
    """3 nearest neighbors by squared euclidean distance.

    Equivalent of ``three_nn_kernel_fast`` (interpolate_gpu.cu:16-57):
    returns *squared* distances, ascending, ties to the lower index.

    Args:
        unknown: (B, n, 3); known: (B, m, 3).
        known_valid: optional (B, m) bool; invalid candidates are pushed to
            +inf distance (the reference has no mask — callers there rely on
            zero-padded coords, which we also support by passing None).

    Returns:
        dist2 (B, n, 3) float32, idx (B, n, 3) int32.
    """
    # |u - k|^2 = |u|^2 + |k|^2 - 2 u.k — batched matmul form: the (B, n, m)
    # cross term rides the MXU and the (B, n, m, 3) broadcast intermediate
    # (which dominated HBM traffic at Waymo scale) never materializes
    u2 = jnp.sum(unknown * unknown, axis=-1)  # (B, n)
    k2 = jnp.sum(known * known, axis=-1)  # (B, m)
    cross = jnp.einsum(
        "bnc,bmc->bnm", unknown, known, preferred_element_type=jnp.float32
    )
    d2 = jnp.maximum(u2[:, :, None] + k2[:, None, :] - 2.0 * cross, 0.0)
    if known_valid is not None:
        d2 = jnp.where(known_valid[:, None, :], d2, jnp.inf)
    m = known.shape[1]
    k_eff = min(3, m)
    # 3 iterative masked argmins instead of top_k: lax.top_k lowers to a
    # full sort on TPU (~13 ms/frame at window scale); three VPU reduction
    # passes are ~free and give the same ascending-with-low-index-ties order
    picked_d, picked_i = [], []
    work = d2
    mar = jnp.arange(m)
    for _ in range(k_eff):
        i_k = jnp.argmin(work, axis=-1)  # ties → lowest index
        d_k = jnp.min(work, axis=-1)
        picked_i.append(i_k)
        picked_d.append(d_k)
        work = jnp.where(mar == i_k[..., None], jnp.inf, work)
    neg = -jnp.stack(picked_d, axis=-1)
    idx = jnp.stack(picked_i, axis=-1)
    if k_eff < 3:
        # fewer than 3 candidates: pad like the CUDA kernel's untouched slots
        # (index 0, huge distance — interpolate weight ~0 after normalization;
        # 1e38 not the CUDA kernel's 1e40, which overflows the f32 cast)
        pad = 3 - k_eff
        neg = jnp.concatenate(
            [neg, jnp.full(neg.shape[:-1] + (pad,), -1e38, neg.dtype)], axis=-1
        )
        idx = jnp.concatenate(
            [idx, jnp.zeros(idx.shape[:-1] + (pad,), idx.dtype)], axis=-1
        )
    return -neg, idx.astype(jnp.int32)


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray):
    """Weighted sum of 3 neighbor features.

    Equivalent of ``three_interpolate_kernel_fast`` (interpolate_gpu.cu:84-107)
    in channel-last layout: features (B, m, C), idx/weight (B, n, 3) →
    (B, n, C).

    Implementation: the 3 gathers collapse into one dense (B, n, m) weight
    matrix (m is small — per-window query counts) and a single batched
    matmul on the MXU; the general-gather lowering this replaces was ~50x
    slower at Waymo scale (24000 windows).
    """
    m = features.shape[1]
    onehot = jax.nn.one_hot(idx, m, dtype=features.dtype)  # (B, n, 3, m)
    w = jnp.einsum("bnk,bnkm->bnm", weight.astype(features.dtype), onehot)
    return jnp.einsum(
        "bnm,bmc->bnc", w, features,
        preferred_element_type=features.dtype,
    )
