"""Parity: draw_gaussians_dense == scatter-max draw_gaussians.

The dense form (ops evaluated at every pixel + per-class max over boxes)
replaces the scatter-max on the train path when the (B, M, H, W) sweep fits
(center_head.py assign_targets); both implement the reference's
``draw_gaussian_to_heatmap`` (ref: centernet_utils.py:47-69).
"""

import jax.numpy as jnp
import numpy as np

from mssvt_tpu.models.model_utils.centernet import (
    draw_gaussians,
    draw_gaussians_dense,
)


def _random_case(rng, b, m, ncls, h, w, max_radius):
    centers = jnp.asarray(
        rng.uniform(-3.0, max(h, w) + 3.0, size=(b, m, 2)).astype(np.float32))
    radii = jnp.asarray(rng.integers(1, max_radius + 4, size=(b, m)),
                        jnp.int32)  # some exceed max_radius: both must clip
    class_ids = jnp.asarray(rng.integers(0, ncls, size=(b, m)), jnp.int32)
    valid = jnp.asarray(rng.random((b, m)) > 0.25)
    return centers, radii, class_ids, valid


def test_dense_matches_scatter_max():
    rng = np.random.default_rng(0)
    for seed in range(3):
        b, m, ncls, h, w, mr = 2, 17, 3, 24, 20, 6
        centers, radii, cls, valid = _random_case(rng, b, m, ncls, h, w, mr)
        a = draw_gaussians((b, ncls, h, w), centers, radii, cls, valid, mr)
        d = draw_gaussians_dense((b, ncls, h, w), centers, radii, cls, valid,
                                 mr)
        np.testing.assert_allclose(np.asarray(d), np.asarray(a), atol=1e-6)


def test_dense_overlap_takes_max():
    # two same-class boxes at the same center with different radii: every
    # pixel must be the max of the two gaussians
    b, m, ncls, h, w, mr = 1, 2, 1, 15, 15, 7
    centers = jnp.asarray([[[7.0, 7.0], [7.0, 7.0]]])
    radii = jnp.asarray([[2, 6]], jnp.int32)
    cls = jnp.zeros((1, 2), jnp.int32)
    valid = jnp.ones((1, 2), bool)
    a = draw_gaussians((b, ncls, h, w), centers, radii, cls, valid, mr)
    d = draw_gaussians_dense((b, ncls, h, w), centers, radii, cls, valid, mr)
    np.testing.assert_allclose(np.asarray(d), np.asarray(a), atol=1e-6)
    assert float(a[0, 0, 7, 7]) == 1.0


def test_all_invalid_is_zero():
    b, m, ncls, h, w, mr = 1, 4, 2, 10, 10, 4
    rng = np.random.default_rng(1)
    centers, radii, cls, _ = _random_case(rng, b, m, ncls, h, w, mr)
    valid = jnp.zeros((b, m), bool)
    d = draw_gaussians_dense((b, ncls, h, w), centers, radii, cls, valid, mr)
    assert float(jnp.abs(d).max()) == 0.0
