"""Golden tests for FPS / grouping / 3-NN interpolation."""

import jax
import jax.numpy as jnp
import numpy as np

from mssvt_tpu.ops.sampling import (
    farthest_point_sample,
    gather_along_batch,
    group_features,
    three_interpolate,
    three_nn,
)


def _fps_oracle(xyz, npoint):
    """Sequential numpy FPS matching sampling_gpu.cu:101-185 semantics."""
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), np.int32)
    for bi in range(b):
        dist = np.full(n, 1e10, np.float64)
        last = 0
        for j in range(1, npoint):
            d = ((xyz[bi] - xyz[bi, last]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            last = int(np.argmax(dist))
            out[bi, j] = last
    return out


def test_fps_matches_oracle(rng):
    xyz = rng.normal(size=(4, 30, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), 8))
    np.testing.assert_array_equal(got, _fps_oracle(xyz.astype(np.float64), 8))


def test_fps_zero_padding_behaviour(rng):
    # padded (all-zero) rows collapse onto index 0's location; after real
    # points are exhausted FPS revisits distance-0 points — callers mask
    # fps_idx == 0 at position > 0 (ref: mssvt_backbone.py:248-252).
    xyz = np.zeros((1, 10, 3), np.float32)
    xyz[0, :3] = [[0, 0, 0], [1, 0, 0], [0, 2, 0]]
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), 6))
    assert got[0, 0] == 0
    assert set(got[0, :3]) == {0, 1, 2}
    assert (got[0, 3:] == 0).all()  # exhausted -> argmax of all-zero dists = 0


def test_group_features(rng):
    feats = rng.normal(size=(20, 5)).astype(np.float32)
    idx = np.array([[0, 3, -1], [19, -1, -1]], np.int32)
    out = np.asarray(group_features(jnp.asarray(feats), jnp.asarray(idx)))
    np.testing.assert_allclose(out[0, 0], feats[0])
    np.testing.assert_allclose(out[0, 1], feats[3])
    assert (out[0, 2] == 0).all() and (out[1, 1:] == 0).all()
    np.testing.assert_allclose(out[1, 0], feats[19])


def test_group_features_grad_is_scatter_add(rng):
    feats = rng.normal(size=(6, 2)).astype(np.float32)
    idx = jnp.asarray([[0, 0, 2, -1]], jnp.int32)

    def f(x):
        return group_features(x, idx).sum()

    g = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    expect = np.zeros_like(feats)
    expect[0] = 2.0  # row 0 gathered twice
    expect[2] = 1.0
    np.testing.assert_allclose(g, expect)


def test_three_nn_and_interpolate(rng):
    known = rng.normal(size=(2, 7, 3)).astype(np.float32)
    unknown = rng.normal(size=(2, 5, 3)).astype(np.float32)
    d2, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
    d2, idx = np.asarray(d2), np.asarray(idx)

    # oracle: full sort per query
    diff = unknown[:, :, None] - known[:, None]
    full = (diff ** 2).sum(-1)
    order = np.argsort(full, axis=-1, kind="stable")[..., :3]
    np.testing.assert_array_equal(idx, order)
    np.testing.assert_allclose(d2, np.take_along_axis(full, order, -1), rtol=1e-5)

    # inverse-distance interpolation matches manual computation
    feats = rng.normal(size=(2, 7, 4)).astype(np.float32)
    w = 1.0 / np.clip(d2, 1e-10, None)
    w = w / w.sum(-1, keepdims=True)
    out = np.asarray(
        three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))
    )
    expect = (feats[np.arange(2)[:, None, None], idx] * w[..., None]).sum(2)
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_gather_along_batch(rng):
    vals = rng.normal(size=(3, 8, 2)).astype(np.float32)
    idx = np.array([[0, 7], [3, 3], [1, 0]], np.int32)
    out = np.asarray(gather_along_batch(jnp.asarray(vals), jnp.asarray(idx)))
    for b in range(3):
        np.testing.assert_allclose(out[b], vals[b, idx[b]])


def test_three_interp_weights_planes_matches_chain():
    """Dense-W3 interpolation == three_nn_planes + weights + three_interpolate."""
    import numpy as np
    from mssvt_tpu.ops.sampling import (
        three_interp_weights_planes, three_interpolate, three_nn_planes)

    rng = np.random.default_rng(7)
    b, n, m, c = 5, 11, 9, 4
    ux, uy, uz = (jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
                  for _ in range(3))
    kx, ky, kz = (jnp.asarray(rng.standard_normal((b, m)).astype(np.float32))
                  for _ in range(3))
    feats = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32))

    d2, idx3 = three_nn_planes(ux, uy, uz, kx, ky, kz)
    # inverse L2-distance weights (the reference's three_nn wrapper sqrt's
    # the kernel's squared output; ref: mssvt_backbone.py:304-307)
    w = 1.0 / jnp.clip(jnp.sqrt(d2), 1e-10, None)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    want = three_interpolate(feats, idx3, w)

    w3 = three_interp_weights_planes(ux, uy, uz, kx, ky, kz)
    got = jnp.einsum("bnm,bmc->bnc", w3, feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # rows are stochastic over the 3 picks
    np.testing.assert_allclose(np.asarray(jnp.sum(w3, axis=-1)), 1.0,
                               rtol=1e-5)


def test_group_features_paired_grad_matches_scatter_add():
    """The inverse-map custom VJP == the plain gather's scatter-add VJP on a
    synthetic partial permutation (every feature row in at most one slot)."""
    import numpy as np
    import jax
    from mssvt_tpu.ops.sampling import group_features, group_features_paired

    rng = np.random.default_rng(3)
    v, c, nw, cap = 23, 5, 4, 7
    x = jnp.asarray(rng.standard_normal((v, c)).astype(np.float32))

    # random partial permutation: assign 18 of 23 rows to distinct slots
    rows = rng.permutation(v)[:18]
    slots = rng.permutation(nw * cap)[:18]
    ind = np.full((nw, cap), -1, np.int32)
    win_row = np.zeros(v, np.int32)
    slot = np.zeros(v, np.int32)
    valid = np.zeros(v, bool)
    for r, s in zip(rows, slots):
        ind[s // cap, s % cap] = r
        win_row[r], slot[r], valid[r] = s // cap, s % cap, True
    ind, win_row, slot, valid = map(jnp.asarray, (ind, win_row, slot, valid))

    # forwards agree
    np.testing.assert_array_equal(
        np.asarray(group_features_paired(x, ind, win_row, slot, valid)),
        np.asarray(group_features(x, ind)))

    # grads agree with the scatter-add VJP under an arbitrary cotangent
    ct = jnp.asarray(rng.standard_normal((nw, cap, c)).astype(np.float32))
    g_plain = jax.grad(lambda f: jnp.vdot(group_features(f, ind), ct))(x)
    g_pair = jax.grad(lambda f: jnp.vdot(
        group_features_paired(f, ind, win_row, slot, valid), ct))(x)
    np.testing.assert_allclose(np.asarray(g_pair), np.asarray(g_plain),
                               atol=1e-6)


def test_writeback_inverse_paired_grad_matches_plain():
    """Custom-VJP write-back == the plain take/where formulation, values and
    gradients (both upd_fea and shortcut)."""
    import numpy as np
    import jax
    from mssvt_tpu.ops.sampling import writeback_inverse_paired

    rng = np.random.default_rng(4)
    v, c, nw, cap = 19, 4, 3, 6
    rows = rng.permutation(v)[:12]
    slots = rng.permutation(nw * cap)[:12]
    ind = np.full((nw, cap), -1, np.int32)
    win_row = np.zeros(v, np.int32)
    slot = np.zeros(v, np.int32)
    valid = np.zeros(v, bool)
    for r, s in zip(rows, slots):
        ind[s // cap, s % cap] = r
        win_row[r], slot[r], valid[r] = s // cap, s % cap, True
    ind, win_row, slot, valid = map(jnp.asarray, (ind, win_row, slot, valid))

    upd = jnp.asarray(rng.standard_normal((nw, cap, c)).astype(np.float32))
    short = jnp.asarray(rng.standard_normal((v, c)).astype(np.float32))

    def plain(u, s):
        pos = jnp.clip(win_row * cap + slot, 0, nw * cap - 1)
        r = jnp.take(u.reshape(-1, c), pos, axis=0, mode="clip")
        return jnp.where(valid[:, None], r, s)

    def paired(u, s):
        return writeback_inverse_paired(u, s, ind, win_row, slot, valid)

    np.testing.assert_allclose(np.asarray(paired(upd, short)),
                               np.asarray(plain(upd, short)), atol=0)

    ct = jnp.asarray(rng.standard_normal((v, c)).astype(np.float32))
    for argnum in (0, 1):
        g_plain = jax.grad(
            lambda *a: jnp.vdot(plain(*a), ct), argnums=argnum)(upd, short)
        g_pair = jax.grad(
            lambda *a: jnp.vdot(paired(*a), ct), argnums=argnum)(upd, short)
        np.testing.assert_allclose(np.asarray(g_pair), np.asarray(g_plain),
                                   atol=1e-6, err_msg=f"argnum {argnum}")
