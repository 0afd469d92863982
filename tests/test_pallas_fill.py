"""Fill-kernel parity: Pallas (interpret) vs the XLA oracle.

Covers both in-kernel algorithms (log-shift bit-plane left-pack and the
slot-select loop), the permutation fold (``order``), and the own-slab /
counts extras, against ``fill_capacity_buffer_xla`` whose semantics mirror
the reference CUDA fill (ms_sparse_attention_gpu.cu:227-347: nearest-first,
capacity-capped, -1/zero padding).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mssvt_tpu.ops.pallas_fill import (
    fill_capacity_buffer,
    fill_capacity_buffer_xla,
)

CASES = [
    # (nw, k, cap, with_order, with_slab)
    (40, 648, 96, False, False),
    (7, 16, 16, True, False),
    (130, 300, 48, False, False),
    (40, 648, 96, True, True),      # the hot block-path configuration shape
    (64, 72, 48, True, False),
    (3, 1000, 100, False, False),
    (16, 648, 96, True, True),
    (5, 129, 64, True, True),       # dense occupancy exercises full packing
]


@pytest.mark.parametrize("algo", ["logshift", "slots"])
@pytest.mark.parametrize("case", CASES, ids=[f"nw{c[0]}k{c[1]}" for c in CASES])
def test_fill_matches_xla_oracle(monkeypatch, algo, case):
    monkeypatch.setenv("MSSVT_FILL_ALGO", algo)
    nw, k, cap, with_order, with_slab = case
    rng = np.random.default_rng(hash(case) % 2**31)
    occp = rng.uniform(0.02, 0.95)
    box = np.where(
        rng.random((nw, k)) < occp,
        rng.integers(0, 16_000_000, (nw, k)), -1
    ).astype(np.int32)
    offs = rng.integers(0, 2**15, (k,)).astype(np.int32)
    order = rng.permutation(k).astype(np.int64) if with_order else None
    own_slab = elig = None
    if with_slab:
        own_slab = (10, min(72, k - 10))
        elig = rng.integers(0, 2, (k, 3)).astype(np.float32)

    got = fill_capacity_buffer(jnp.asarray(box), offs, cap, interpret=True,
                               order=order, own_slab=own_slab, elig=elig)
    want = fill_capacity_buffer_xla(jnp.asarray(box), offs, cap, order=order,
                                    own_slab=own_slab, elig=elig)
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=f"output {i} ({algo})")
