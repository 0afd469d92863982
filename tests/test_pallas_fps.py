"""Parity: Pallas FPS kernel vs the XLA fori_loop reference implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

import mssvt_tpu.ops.sampling as sampling
from mssvt_tpu.ops.pallas_fps import farthest_point_sample_planes_pallas


def _xla_reference(x, y, z, npoint, monkeypatch_env):
    # force the non-Pallas branch of the dispatcher
    monkeypatch_env.setenv("MSSVT_PALLAS", "off")
    return np.asarray(sampling.farthest_point_sample_planes(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), npoint))


@pytest.mark.parametrize("b,n,npoint", [(7, 96, 32), (300, 64, 16), (4, 8, 8)])
def test_fps_kernel_matches_xla_loop(b, n, npoint, monkeypatch):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, n)).astype(np.float32) * 4
    y = rng.normal(size=(b, n)).astype(np.float32) * 4
    z = rng.normal(size=(b, n)).astype(np.float32) * 4
    # zero-padding tail rows, like the real gather buffers
    x[:, n - n // 4:] = 0
    y[:, n - n // 4:] = 0
    z[:, n - n // 4:] = 0

    want = _xla_reference(x, y, z, npoint, monkeypatch)
    got = np.asarray(farthest_point_sample_planes_pallas(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), npoint,
        interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("b,n,npoint", [(7, 96, 32), (300, 64, 16)])
def test_fps_transposed_kernel_matches_xla_loop(b, n, npoint, monkeypatch):
    from mssvt_tpu.ops.pallas_fps import farthest_point_sample_planes_pallas_t

    rng = np.random.default_rng(2)
    x = rng.normal(size=(b, n)).astype(np.float32) * 4
    y = rng.normal(size=(b, n)).astype(np.float32) * 4
    z = rng.normal(size=(b, n)).astype(np.float32) * 4
    x[:, n - n // 4:] = 0
    y[:, n - n // 4:] = 0
    z[:, n - n // 4:] = 0
    want = _xla_reference(x, y, z, npoint, monkeypatch)
    got = np.asarray(farthest_point_sample_planes_pallas_t(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), npoint,
        col_block=64, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_dispatcher_interpret_routes_to_kernel(monkeypatch):
    rng = np.random.default_rng(1)
    x, y, z = (rng.normal(size=(5, 48)).astype(np.float32) for _ in range(3))
    monkeypatch.setenv("MSSVT_PALLAS", "off")
    want = np.asarray(sampling.farthest_point_sample_planes(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), 12))
    monkeypatch.setenv("MSSVT_PALLAS", "interpret")
    got = np.asarray(sampling.farthest_point_sample_planes(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), 12))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("b,n,npoint", [(7, 96, 32), (130, 64, 16)])
def test_fps_select_kernel_matches_take_along(b, n, npoint, monkeypatch):
    """The _sel kernel's selected planes == take_along_axis of the picks
    (one-hot reductions have exactly one nonzero term — bit-exact)."""
    from mssvt_tpu.ops.pallas_fps import (
        farthest_point_sample_planes_pallas_t_sel)

    rng = np.random.default_rng(3)
    x, y, z = (rng.normal(size=(b, n)).astype(np.float32) * 4
               for _ in range(3))
    x[:, n - n // 4:] = 0
    y[:, n - n // 4:] = 0
    z[:, n - n // 4:] = 0
    ind = rng.integers(-1, 9000, size=(b, n)).astype(np.int32)

    want_idx = _xla_reference(x, y, z, npoint, monkeypatch)
    got_idx, sels = farthest_point_sample_planes_pallas_t_sel(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
        (jnp.asarray(ind),), npoint, col_block=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)
    for plane, sel in zip((x, y, z, ind.astype(np.float32)), sels):
        np.testing.assert_array_equal(
            np.asarray(sel), np.take_along_axis(plane, want_idx, axis=1))


def test_fps_select_dispatcher_fallback_matches(monkeypatch):
    rng = np.random.default_rng(4)
    x, y, z = (rng.normal(size=(5, 48)).astype(np.float32) for _ in range(3))
    ind = rng.integers(-1, 500, size=(5, 48)).astype(np.int32)
    monkeypatch.setenv("MSSVT_PALLAS", "off")
    idx0, sels0 = sampling.farthest_point_sample_planes_select(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
        (jnp.asarray(ind),), 12)
    monkeypatch.setenv("MSSVT_PALLAS", "interpret")
    idx1, sels1 = sampling.farthest_point_sample_planes_select(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
        (jnp.asarray(ind),), 12)
    np.testing.assert_array_equal(np.asarray(idx0), np.asarray(idx1))
    for a, b2 in zip(sels0, sels1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))


def test_fps_select_no_grad_path(monkeypatch):
    """value_and_grad through the select API must not require a kernel
    transpose rule (selections are stop_gradient'ed on both routes)."""
    import jax

    rng = np.random.default_rng(5)
    x, y, z = (jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
               for _ in range(3))
    monkeypatch.setenv("MSSVT_PALLAS", "interpret")

    def loss(xv):
        _, sels = sampling.farthest_point_sample_planes_select(
            xv, y, z, (), 8)
        return sum(jnp.sum(s) for s in sels)

    val, g = jax.value_and_grad(loss)(x)
    assert np.isfinite(float(val))
    np.testing.assert_array_equal(np.asarray(g), 0.0)
