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
