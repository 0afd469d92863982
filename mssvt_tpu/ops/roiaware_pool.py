"""RoI-aware 3D grid pooling (TPU-native roiaware_pool3d).

Rebuild of ref pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:111-261
(``roiaware_pool3d_launcher``: points → per-RoI (Gx, Gy, Gz) voxel grid with
max or avg pooling) used by PartA2's RoI head. The CUDA kernel assigns each
point to its cell with atomics; here each (roi, point) pair computes its cell
and a single scatter-max / scatter-add builds the grids — deterministic,
differentiable (XLA scatter gradients).
"""

from __future__ import annotations

import jax.numpy as jnp


def roiaware_pool3d(points_xyz, point_features, points_valid, rois, roi_valid,
                    grid_size: int, pool: str = "max"):
    """Pool point features into per-RoI 3D grids.

    Args:
        points_xyz: (B, N, 3); point_features: (B, N, C);
        points_valid: (B, N) bool; rois: (B, R, 7); roi_valid: (B, R) bool.
        grid_size: G (grid is G^3, canonical box frame).
        pool: "max" or "avg".

    Returns:
        pooled: (B, R, G, G, G, C) float32 (zeros where empty).
        empty: (B, R, G, G, G) bool.
    """
    assert pool in ("max", "avg"), pool
    b, n, _ = points_xyz.shape
    r = rois.shape[1]
    g = int(grid_size)
    c = point_features.shape[-1]

    # canonical frame: rotate into each roi (B, R, N, 3)
    local = points_xyz[:, None, :, :] - rois[:, :, None, :3]
    h = rois[..., 6][:, :, None]
    cos, sin = jnp.cos(-h), jnp.sin(-h)
    lx = local[..., 0] * cos - local[..., 1] * sin
    ly = local[..., 0] * sin + local[..., 1] * cos
    lz = local[..., 2]
    dims = rois[:, :, None, 3:6]
    # cell index in [0, G) per axis; reference offsets z by +dz/2 (boxes are
    # center-z here; ref kernel uses bottom-z — our boxes carry center z)
    ux = (lx / dims[..., 0] + 0.5) * g
    uy = (ly / dims[..., 1] + 0.5) * g
    uz = (lz / dims[..., 2] + 0.5) * g
    inside = (
        (ux >= 0) & (ux < g) & (uy >= 0) & (uy < g) & (uz >= 0) & (uz < g)
        & points_valid[:, None, :] & roi_valid[:, :, None]
    )
    cx = jnp.clip(ux.astype(jnp.int32), 0, g - 1)
    cy = jnp.clip(uy.astype(jnp.int32), 0, g - 1)
    cz = jnp.clip(uz.astype(jnp.int32), 0, g - 1)
    cell = (cx * g + cy) * g + cz  # (B, R, N)

    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    ridx = jnp.arange(r, dtype=jnp.int32)[None, :, None]
    flat = (bidx * r + ridx) * (g ** 3) + cell  # (B, R, N)
    n_cells = b * r * g ** 3
    dest = jnp.where(inside, flat, n_cells).reshape(-1)

    feats = jnp.broadcast_to(
        point_features[:, None, :, :], (b, r, n, c)).reshape(-1, c)
    if pool == "max":
        pooled = jnp.full((n_cells + 1, c), -jnp.inf, feats.dtype).at[dest].max(
            feats, mode="drop")
        cnt = jnp.zeros((n_cells + 1,), jnp.int32).at[dest].add(1, mode="drop")
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
    else:
        ssum = jnp.zeros((n_cells + 1, c), feats.dtype).at[dest].add(
            feats, mode="drop")
        cnt = jnp.zeros((n_cells + 1,), jnp.int32).at[dest].add(1, mode="drop")
        pooled = ssum / jnp.clip(cnt, 1, None)[:, None]
    pooled = pooled[:n_cells].reshape(b, r, g, g, g, c).astype(jnp.float32)
    empty = (cnt[:n_cells] == 0).reshape(b, r, g, g, g)
    return pooled * (~empty)[..., None], empty
