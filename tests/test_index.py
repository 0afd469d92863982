"""Golden tests for the sorted-key voxel index (hash-table equivalent)."""

import jax.numpy as jnp
import numpy as np

from mssvt_tpu.core.index import (
    INVALID_KEY,
    build_index,
    delinearize_key,
    linearize_coords,
    lookup,
    unique_compact,
)

SHAPE = (16, 12, 8)  # (x_max, y_max, z_max)


def _rand_coords(rng, n, batch=2, unique=True):
    """Random unique (b,z,y,x) coords inside SHAPE."""
    x_max, y_max, z_max = SHAPE
    seen = set()
    rows = []
    while len(rows) < n:
        c = (
            int(rng.integers(0, batch)),
            int(rng.integers(0, z_max)),
            int(rng.integers(0, y_max)),
            int(rng.integers(0, x_max)),
        )
        if unique and c in seen:
            continue
        seen.add(c)
        rows.append(c)
    return np.array(rows, np.int32)


def test_linearize_roundtrip(rng):
    coords = _rand_coords(rng, 50)
    keys = linearize_coords(jnp.asarray(coords), SHAPE)
    back = delinearize_key(keys, SHAPE)
    np.testing.assert_array_equal(np.asarray(back), coords)


def test_linearize_matches_reference_formula(rng):
    # key = b*(X*Y*Z) + x*Y*Z + y*Z + z, matching ms_sparse_attention_gpu.cu:93
    coords = _rand_coords(rng, 20)
    x_max, y_max, z_max = SHAPE
    b, z, y, x = coords.T
    expect = ((b.astype(np.int64) * x_max + x) * y_max + y) * z_max + z
    keys = np.asarray(linearize_coords(jnp.asarray(coords), SHAPE))
    np.testing.assert_array_equal(keys, expect.astype(np.int32))


def test_out_of_bounds_and_padding_are_invalid():
    coords = jnp.asarray(
        [[0, 0, 0, 16], [0, 8, 0, 0], [0, 0, 12, 0], [0, -1, 0, 0], [-1, 0, 0, 0]],
        jnp.int32,
    )
    keys = linearize_coords(coords, SHAPE)
    assert bool(jnp.all(keys == INVALID_KEY))


def test_build_and_lookup(rng):
    n_valid, cap = 40, 64
    coords = np.full((cap, 4), -1, np.int32)
    coords[:n_valid] = _rand_coords(rng, n_valid)
    valid = np.arange(cap) < n_valid
    idx = build_index(jnp.asarray(coords), jnp.asarray(valid), SHAPE)

    # every valid voxel must be found at its own row
    keys = linearize_coords(jnp.asarray(coords), SHAPE, jnp.asarray(valid))
    rows = np.asarray(lookup(idx, keys))
    np.testing.assert_array_equal(rows[:n_valid], np.arange(n_valid))
    # padded queries must miss
    assert (rows[n_valid:] == -1).all()

    # random absent coords must miss
    absent = _rand_coords(rng, 30)
    present = {tuple(c) for c in coords[:n_valid]}
    absent = np.array([c for c in absent if tuple(c) not in present], np.int32)
    miss = np.asarray(lookup(idx, linearize_coords(jnp.asarray(absent), SHAPE)))
    assert (miss == -1).all()


def test_unique_compact(rng):
    keys = np.array([7, 3, 3, 9, 7, 7, 1, INVALID_KEY, INVALID_KEY], np.int32)
    out_keys, out_valid, num = unique_compact(jnp.asarray(keys), capacity=8)
    np.testing.assert_array_equal(np.asarray(out_keys)[:4], [1, 3, 7, 9])
    assert int(num) == 4
    assert np.asarray(out_valid).sum() == 4


def test_unique_compact_truncates():
    keys = jnp.asarray(np.arange(10, dtype=np.int32))
    out_keys, out_valid, num = unique_compact(keys, capacity=4)
    np.testing.assert_array_equal(np.asarray(out_keys), [0, 1, 2, 3])
    assert int(num) == 10  # count reports pre-truncation uniques
    assert np.asarray(out_valid).all()
