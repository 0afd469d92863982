"""Golden tests for window partition + mixed-scale gather.

The oracle is a from-scratch numpy simulator of the CUDA kernel *behavior*
(ref: ms_sparse_attention_gpu.cu:117-350): serial probe over the offset
tables, fixed-capacity fill, -1 index / 0 coord padding.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mssvt_tpu.core.index import build_index
from mssvt_tpu.ops.window import (
    build_query_tables,
    gather_window_voxels,
    window_partition,
)

SHAPE = (12, 12, 8)  # x, y, z
WIN1 = (3, 3, 4)
WIN2 = (5, 5, 4)


def make_voxels(rng, n, batch=2, shape=SHAPE):
    x_max, y_max, z_max = shape
    seen, rows = set(), []
    while len(rows) < n:
        c = (
            int(rng.integers(0, batch)),
            int(rng.integers(0, z_max)),
            int(rng.integers(0, y_max)),
            int(rng.integers(0, x_max)),
        )
        if c in seen:
            continue
        seen.add(c)
        rows.append(c)
    return np.array(rows, np.int32)


def test_query_tables_single_scale():
    t = build_query_tables(WIN1)
    assert t.single_scale
    assert t.offsets.shape == (np.prod(WIN1), 3)
    # Chebyshev-sorted: distances must be non-decreasing
    cheb = np.abs(t.offsets).max(axis=1)
    assert (np.diff(cheb) >= 0).all()
    # offsets are exactly the centered window cells
    center = np.array(WIN1) // 2
    cells = {tuple(c) for c in t.offsets + center}
    assert cells == {
        (x, y, z) for x in range(WIN1[0]) for y in range(WIN1[1]) for z in range(WIN1[2])
    }


def test_query_tables_two_scale_partition():
    t = build_query_tables(WIN1, WIN2)
    assert not t.single_scale
    assert t.offsets.shape == (np.prod(WIN2), 3)
    elig = t.eligibility
    # odd/even are disjoint and both inside win1
    assert not (elig[:, 0] & elig[:, 1]).any()
    assert (elig[:, 0] <= elig[:, 2]).all() and (elig[:, 1] <= elig[:, 2]).all()
    # win2 covers everything
    assert elig[:, 3].all()
    # parity definitions (python modulo on negatives), ref mssvt_backbone.py:102-103
    for off, e in zip(t.offsets, elig):
        if e[0]:
            assert off[0] % 2 == 1 and off[1] % 2 == 1
        if e[1]:
            assert off[0] % 2 == 0 and off[1] % 2 == 0
    # win1 membership bound: [-(w//2), w//2 + (1 - w%2)] per dim
    lo = np.array([-(w // 2) for w in WIN1])
    hi = np.array([w // 2 + (1 - w % 2) for w in WIN1])
    in1 = ((t.offsets >= lo) & (t.offsets <= hi)).all(axis=1)
    np.testing.assert_array_equal(in1, elig[:, 2])
    # counts add up
    assert t.num_odd == elig[:, 0].sum()
    assert t.num_even == elig[:, 1].sum()


def test_window_partition_dedup(rng):
    coords = make_voxels(rng, 60)
    cap = 128
    pad = np.full((cap, 4), -1, np.int32)
    pad[:60] = coords
    valid = np.arange(cap) < 60
    win_coords, win_valid, win_grid, num = window_partition(
        jnp.asarray(pad), jnp.asarray(valid), SHAPE, WIN1, max_windows=64,
        batch_size=2,
    )
    # sort-based fallback must agree with the dense path
    wc2, wv2, _, num2 = window_partition(
        jnp.asarray(pad), jnp.asarray(valid), SHAPE, WIN1, max_windows=64,
    )
    np.testing.assert_array_equal(np.asarray(win_coords), np.asarray(wc2))
    assert int(num) == int(num2)
    win_coords, win_valid = np.asarray(win_coords), np.asarray(win_valid)
    assert win_grid == (SHAPE[0] // WIN1[0], SHAPE[1] // WIN1[1], SHAPE[2] // WIN1[2])

    expect = {
        (b, z // WIN1[2], y // WIN1[1], x // WIN1[0]) for b, z, y, x in coords
    }
    got = {tuple(c) for c in win_coords[win_valid]}
    assert got == expect
    assert int(num) == len(expect)
    # invalid rows are all -1
    assert (win_coords[~win_valid] == -1).all()


def _oracle_gather(voxels, win_coords, tables, caps, shape, win1):
    """Numpy simulator of the CUDA fill semantics."""
    vmap = {tuple(v): i for i, v in enumerate(voxels)}  # (b,z,y,x) -> global row
    nw = len(win_coords)
    out = {
        name: (
            np.full((nw, caps[name]), -1, np.int64),
            np.zeros((nw, caps[name], 3), np.int64),
        )
        for name in caps
    }
    buf_names = ["odd", "even", "win1", "win2"] if len(caps) == 4 else ["win1"]
    for w, wc in enumerate(win_coords):
        b = wc[0]
        counts = {name: 0 for name in caps}
        center = np.array([wc[3], wc[2], wc[1]]) * np.array(win1) + np.array(win1) // 2
        for k, off in enumerate(tables.offsets):
            cand = center + off
            if not all(0 <= cand[d] < shape[d] for d in range(3)):
                continue
            row = vmap.get((b, cand[2], cand[1], cand[0]))
            if row is None:
                continue
            for j, name in enumerate(buf_names):
                if not tables.eligibility[k, j if len(caps) == 4 else 2]:
                    continue
                if counts[name] < caps[name]:
                    out[name][0][w, counts[name]] = row
                    out[name][1][w, counts[name]] = off
                    counts[name] += 1
    return out


@pytest.mark.parametrize("two_scale", [False, True])
@pytest.mark.parametrize("dense", [False, True])
def test_gather_matches_oracle(rng, two_scale, dense):
    bs = 2 if dense else None  # dense O(1)-table path vs generic sort path
    n = 70
    voxels = make_voxels(rng, n)
    cap_v = 96
    pad = np.full((cap_v, 4), -1, np.int32)
    pad[:n] = voxels
    valid = np.arange(cap_v) < n
    index = build_index(jnp.asarray(pad), jnp.asarray(valid), SHAPE)

    max_windows = 48
    win_coords, win_valid, _, _ = window_partition(
        jnp.asarray(pad), jnp.asarray(valid), SHAPE, WIN1, max_windows
    )

    if two_scale:
        tables = build_query_tables(WIN1, WIN2)
        caps = {"odd": tables.num_odd, "even": tables.num_even, "win1": 20, "win2": 40}
        got = gather_window_voxels(
            win_coords, win_valid, jnp.asarray(pad), jnp.asarray(valid),
            SHAPE, WIN1, tables, max_num_win1=20, max_num_win2=40,
            batch_size=bs,
        )
    else:
        tables = build_query_tables(WIN1)
        caps = {"win1": 16}
        got = gather_window_voxels(
            win_coords, win_valid, jnp.asarray(pad), jnp.asarray(valid),
            SHAPE, WIN1, tables, max_num_win1=16, batch_size=bs,
        )

    wc = np.asarray(win_coords)[np.asarray(win_valid)]
    oracle = _oracle_gather(voxels, wc, tables, caps, SHAPE, WIN1)

    wvalid = np.asarray(win_valid)
    for name in caps:
        ind = np.asarray(got[name]["ind"])[wvalid]
        coord = np.asarray(got[name]["coord"])[wvalid]
        np.testing.assert_array_equal(ind, oracle[name][0], err_msg=f"{name} ind")
        np.testing.assert_array_equal(coord, oracle[name][1], err_msg=f"{name} coord")
        # mask marks empties
        np.testing.assert_array_equal(
            np.asarray(got[name]["mask"])[wvalid], oracle[name][0] < 0
        )
    # invalid windows gather nothing
    for name in caps:
        assert (np.asarray(got[name]["ind"])[~wvalid] == -1).all()


@pytest.mark.parametrize("fill_mode", ["xla_fill", "interpret"])
@pytest.mark.parametrize("two_scale", [False, True])
def test_own_cell_gather_matches_oracle(rng, monkeypatch, two_scale, fill_mode):
    """The neighbor-row (own-cell) fast path reproduces the CUDA fill
    semantics exactly (both the XLA fallback fill and the Pallas kernel via
    the interpreter)."""
    monkeypatch.setenv("MSSVT_PALLAS", fill_mode)
    n = 70
    voxels = make_voxels(rng, n)
    cap_v = 96
    pad = np.full((cap_v, 4), -1, np.int32)
    pad[:n] = voxels
    valid = np.arange(cap_v) < n

    max_windows = 48
    win_coords, win_valid, _, _ = window_partition(
        jnp.asarray(pad), jnp.asarray(valid), SHAPE, WIN1, max_windows,
        batch_size=2,
    )

    if two_scale:
        tables = build_query_tables(WIN1, WIN2)
        caps = {"odd": tables.num_odd, "even": tables.num_even,
                "win1": 20, "win2": 40}
        got = gather_window_voxels(
            win_coords, win_valid, jnp.asarray(pad), jnp.asarray(valid),
            SHAPE, WIN1, tables, max_num_win1=20, max_num_win2=40,
            batch_size=2, return_inverse=True,
        )
    else:
        tables = build_query_tables(WIN1)
        caps = {"win1": 16}
        got = gather_window_voxels(
            win_coords, win_valid, jnp.asarray(pad), jnp.asarray(valid),
            SHAPE, WIN1, tables, max_num_win1=16, batch_size=2,
        )

    wc = np.asarray(win_coords)[np.asarray(win_valid)]
    oracle = _oracle_gather(voxels, wc, tables, caps, SHAPE, WIN1)

    wvalid = np.asarray(win_valid)
    for name in caps:
        ind = np.asarray(got[name]["ind"])[wvalid]
        coord = np.asarray(got[name]["coord"])[wvalid]
        np.testing.assert_array_equal(ind, oracle[name][0], err_msg=f"{name} ind")
        np.testing.assert_array_equal(coord, oracle[name][1], err_msg=f"{name} coord")
        np.testing.assert_array_equal(
            np.asarray(got[name]["mask"])[wvalid], oracle[name][0] < 0)
        assert (np.asarray(got[name]["ind"])[~wvalid] == -1).all()

    if two_scale:
        # inverse map: for every live win1 slot (w, j) holding voxel v,
        # inv[v] == (w, j); voxels in no live slot are invalid
        ind1 = np.asarray(got["win1"]["ind"])
        inv_w = np.asarray(got["inv_win1"]["win_row"])
        inv_s = np.asarray(got["inv_win1"]["slot"])
        inv_v = np.asarray(got["inv_win1"]["valid"])
        seen = set()
        for w in range(ind1.shape[0]):
            for j in range(ind1.shape[1]):
                vrow = ind1[w, j]
                if vrow < 0:
                    continue
                assert inv_v[vrow], (w, j, vrow)
                assert inv_w[vrow] == w and inv_s[vrow] == j
                seen.add(vrow)
        for vrow in range(cap_v):
            if vrow not in seen:
                assert not inv_v[vrow]


@pytest.mark.parametrize("two_scale", [False, True])
def test_inverse_map_old_path(rng, two_scale):
    """The candidate-scatter (fallback) path returns the same inverse map."""
    if not two_scale:
        pytest.skip("inverse only defined for the two-scale derivable path")
    n = 70
    voxels = make_voxels(rng, n)
    cap_v = 96
    pad = np.full((cap_v, 4), -1, np.int32)
    pad[:n] = voxels
    valid = np.arange(cap_v) < n
    win_coords, win_valid, _, _ = window_partition(
        jnp.asarray(pad), jnp.asarray(valid), SHAPE, WIN1, 48, batch_size=2)
    tables = build_query_tables(WIN1, WIN2)
    got = gather_window_voxels(
        win_coords, win_valid, jnp.asarray(pad), jnp.asarray(valid),
        SHAPE, WIN1, tables, max_num_win1=20, max_num_win2=40,
        batch_size=2, return_inverse=True,
    )
    ind1 = np.asarray(got["win1"]["ind"])
    inv_w = np.asarray(got["inv_win1"]["win_row"])
    inv_s = np.asarray(got["inv_win1"]["slot"])
    inv_v = np.asarray(got["inv_win1"]["valid"])
    for w in range(ind1.shape[0]):
        for j in range(ind1.shape[1]):
            vrow = ind1[w, j]
            if vrow >= 0:
                assert inv_v[vrow] and inv_w[vrow] == w and inv_s[vrow] == j


def test_even_derive_shift_matches_gather(rng, monkeypatch):
    """The barrel-shift even-run extraction (_barrel_shift_left bit-sweeps)
    returns byte-identical buffers to the take_along_axis form, including
    with an even cap BELOW the table's even count (truncation)."""
    monkeypatch.setenv("MSSVT_PALLAS", "xla_fill")
    n = 70
    voxels = make_voxels(rng, n)
    cap_v = 96
    pad = np.full((cap_v, 4), -1, np.int32)
    pad[:n] = voxels
    valid = np.arange(cap_v) < n
    win_coords, win_valid, _, _ = window_partition(
        jnp.asarray(pad), jnp.asarray(valid), SHAPE, WIN1, 48, batch_size=2)
    tables = build_query_tables(WIN1, WIN2)

    outs = {}
    for mode in ("shift", "gather"):
        monkeypatch.setenv("MSSVT_EVEN_DERIVE", mode)
        outs[mode] = gather_window_voxels(
            win_coords, win_valid, jnp.asarray(pad), jnp.asarray(valid),
            SHAPE, WIN1, tables, max_num_win1=20, max_num_win2=40,
            max_num_even=max(2, tables.num_even - 3),  # truncating cap
            batch_size=2,
        )
    for field in ("ind", "coord", "coordp", "mask", "start"):
        np.testing.assert_array_equal(
            np.asarray(outs["shift"]["even"][field]),
            np.asarray(outs["gather"]["even"][field]), err_msg=field)
