"""Golden tests for the sparse conv engine vs a dense numpy conv oracle."""

import jax.numpy as jnp
import numpy as np

from mssvt_tpu.core.index import build_index
from mssvt_tpu.ops.sparse_conv import (
    build_strided_neighbor_table,
    build_subm_neighbor_table,
    downsample_output_sites,
    subm_conv_apply,
)

SHAPE = (8, 7, 6)  # x, y, z


def _make_sparse(rng, n=40, batch=2):
    seen, rows = set(), []
    while len(rows) < n:
        c = (int(rng.integers(0, batch)), int(rng.integers(0, SHAPE[2])),
             int(rng.integers(0, SHAPE[1])), int(rng.integers(0, SHAPE[0])))
        if c in seen:
            continue
        seen.add(c)
        rows.append(c)
    coords = np.array(rows, np.int32)
    cap = 64
    pad = np.full((cap, 4), -1, np.int32)
    pad[:n] = coords
    valid = np.arange(cap) < n
    feats = rng.normal(size=(cap, 3)).astype(np.float32) * valid[:, None]
    return pad, valid, feats, n


def _dense_grid(coords, valid, feats, batch=2):
    g = np.zeros((batch, SHAPE[2], SHAPE[1], SHAPE[0], feats.shape[1]), np.float32)
    for c, v, f in zip(coords, valid, feats):
        if v:
            g[c[0], c[1], c[2], c[3]] = f
    return g


def _dense_conv(grid, w, stride=(1, 1, 1), padding=(1, 1, 1)):
    """w: (K, Cin, Cout) with K = kz*ky*kx row-major (z, y, x) offsets."""
    b, nz, ny, nx, cin = grid.shape
    kz = ky = kx = round(len(w) ** (1 / 3))
    cout = w.shape[2]
    pz, py, px = padding[2], padding[1], padding[0]
    sz, sy, sx = stride[2], stride[1], stride[0]
    oz = (nz + 2 * pz - kz) // sz + 1
    oy = (ny + 2 * py - ky) // sy + 1
    ox = (nx + 2 * px - kx) // sx + 1
    padded = np.zeros((b, nz + 2 * pz, ny + 2 * py, nx + 2 * px, cin), np.float32)
    padded[:, pz:pz + nz, py:py + ny, px:px + nx] = grid
    out = np.zeros((b, oz, oy, ox, cout), np.float32)
    k = 0
    for dz in range(kz):
        for dy in range(ky):
            for dx in range(kx):
                sub = padded[:, dz:dz + oz * sz:sz, dy:dy + oy * sy:sy,
                             dx:dx + ox * sx:sx]
                out += sub @ w[k]
                k += 1
    return out


def test_subm_conv_matches_dense(rng):
    coords, valid, feats, n = _make_sparse(rng)
    idx = build_index(jnp.asarray(coords), jnp.asarray(valid), SHAPE)
    rows = build_subm_neighbor_table(
        jnp.asarray(coords), jnp.asarray(valid), idx, SHAPE
    )
    w = rng.normal(size=(27, 3, 4)).astype(np.float32)
    out = np.asarray(subm_conv_apply(jnp.asarray(feats), rows, jnp.asarray(w)))

    dense = _dense_conv(_dense_grid(coords, valid, feats), w)
    for i in range(n):
        b, z, y, x = coords[i]
        np.testing.assert_allclose(out[i], dense[b, z, y, x], rtol=2e-4, atol=1e-5)


def test_strided_conv_matches_dense(rng):
    coords, valid, feats, n = _make_sparse(rng)
    idx = build_index(jnp.asarray(coords), jnp.asarray(valid), SHAPE)
    ks, st, pd = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    out_coords, out_valid, out_shape = downsample_output_sites(
        jnp.asarray(coords), jnp.asarray(valid), SHAPE, ks, st, pd, max_out=64
    )
    rows = build_strided_neighbor_table(
        jnp.asarray(coords), jnp.asarray(valid), idx, SHAPE,
        out_coords, out_valid, ks, st, pd,
    )
    w = rng.normal(size=(27, 3, 4)).astype(np.float32)
    out = np.asarray(subm_conv_apply(jnp.asarray(feats), rows, jnp.asarray(w)))

    dense = _dense_conv(_dense_grid(coords, valid, feats), w, st, pd)
    oc = np.asarray(out_coords)
    ov = np.asarray(out_valid)
    assert (int(out_shape[0]), int(out_shape[1]), int(out_shape[2])) == (
        dense.shape[3], dense.shape[2], dense.shape[1]
    )
    for i in np.flatnonzero(ov):
        b, z, y, x = oc[i]
        np.testing.assert_allclose(out[i], dense[b, z, y, x], rtol=2e-4, atol=1e-5)

    # output-site completeness: every nonzero dense output cell that has any
    # occupied input in its window must be in the site set
    nz = np.argwhere(np.abs(dense).sum(-1) > 1e-6)
    sites = {tuple(c) for c in oc[ov]}
    for b, z, y, x in nz:
        assert (b, z, y, x) in sites, f"missing output site {(b, z, y, x)}"
