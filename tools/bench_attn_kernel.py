"""Microbenchmark the assembled window-attention kernel in isolation.

Block-0 shapes of the reconstructed mssvt.yaml bench scene (the 16 ms/step
top item of the r5 trace): nw=96000, n1cap=48, nk1=nk2=32, nq=32, D=128,
q_prefix + ref-compat pad rows, full live prefix. Compiling just the kernel
takes ~1 min instead of the ~6 min full-model server compile, so in-kernel
variants (MSSVT_ATTN_VARIANT, MSSVT_ATTN_WB, ...) A/B in minutes.

Usage: python tools/bench_attn_kernel.py [--nw 96000] [--nv N] [--iters 30]

``--nv`` sets the live-window prefix for the data-dependent tail skip.
The default matches the bench scene's measured block-0 occupancy (53,937
of the 96,000 capacity — the in-model kernel runs ~0.56x the full-capacity
cost because tail supertiles skip). Pass --nv equal to --nw for the
worst case.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = 4  # kernel invocations per jitted call — amortizes the ~40-55 ms
#           axon dispatch round-trip that would otherwise swamp the kernel.
#           MUST equal n_bufs: XLA CSE merges pure pallas calls on identical
#           inputs (verified in the optimized HLO), so extra reps over
#           repeated buffers execute zero kernels and deflate ms/kernel.


def main():
    nw = int(sys.argv[sys.argv.index("--nw") + 1]) if "--nw" in sys.argv else 96000
    nv_n = int(sys.argv[sys.argv.index("--nv") + 1]) if "--nv" in sys.argv else 53937
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 30
    n1cap, nk1, nk2, nq, d = 48, 32, 32, 32, 128
    num_heads = (2, 2)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    from mssvt_tpu.ops.pallas_attention import fused_window_attention_assembled

    n_bufs = REPS  # distinct win1 buffers so reps neither CSE nor add sweeps
    base = jnp.asarray(
        rng.standard_normal((nw, n1cap, d)).astype(np.float32), bf)
    win1s = [jax.block_until_ready(jnp.roll(base, 17 * r, axis=0))
             for r in range(n_bufs)]
    del base
    k2 = jnp.asarray(rng.standard_normal((nw, nk2, d)), bf)
    fps1 = jnp.asarray(rng.integers(0, n1cap, (nw, nk1)), jnp.int32)
    km1 = jnp.asarray(rng.random((nw, nk1)) < 0.1)
    q_ext = jnp.zeros((nw, 1, d), bf)
    q_keep = jnp.asarray(rng.random((nw, nq)) < 0.9, jnp.float32)
    k_rel = tuple(jnp.asarray(rng.standard_normal((nw, nk1 + nk2)),
                              jnp.float32) for _ in range(3))
    q_rel = tuple(jnp.asarray(rng.standard_normal((nw, nq)), jnp.float32)
                  for _ in range(3))
    pos_base = jnp.asarray(rng.standard_normal((nw, d)), bf)
    pos_w = jnp.asarray(rng.standard_normal((3, d)), bf)
    proj = tuple(
        jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
        for s in [(d, d), (d,), (d, d), (d,), (d, d), (d,), (d, d), (d,)])
    bias = jnp.asarray(np.where(rng.random((nw, nk1 + nk2)) < 0.1, -100.0, 0.0),
                       jnp.float32)
    pad_row = jnp.asarray(rng.standard_normal((nw, d)), bf)
    nv = jnp.asarray(min(nv_n, nw), jnp.int32)

    @jax.jit
    def run(win1s, k2):
        acc = 0.0
        for r in range(REPS):
            out = fused_window_attention_assembled(
                win1s[r % n_bufs], k2, fps1, km1, q_ext, q_keep,
                k_rel, q_rel, pos_base, pos_w, proj, bias,
                num_heads=num_heads, scale=0.125,
                q_prefix=True, nq=nq, pad_row=pad_row, num_valid=nv)
            # cheap checksum: a row-strided slice keeps the call live without
            # a full-output reduction sweep
            acc = acc + jnp.abs(out[::512].astype(jnp.float32)).sum()
        return acc

    t0 = time.time()
    s0 = float(run(win1s, k2))
    print(f"compile+first: {time.time() - t0:.1f}s mean={s0 / REPS:.4f}")
    t0 = time.time()
    sink = 0.0
    for i in range(iters):
        sink += float(run(win1s, k2))
    dt = (time.time() - t0) / iters / REPS * 1000
    print(f"steady: {dt:.2f} ms/kernel (nw={nw}, sink={sink:.3f})")


if __name__ == "__main__":
    main()
