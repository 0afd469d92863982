"""Microbenchmark the assembled window-attention kernel in isolation.

Block-0 shapes of the reconstructed mssvt.yaml bench scene (the 16 ms/step
top item of the r5 trace): nw=96000, n1cap=48, nk1=nk2=32, nq=32, D=128,
q_prefix + ref-compat pad rows, full live prefix. Compiling just the kernel
takes ~1 min instead of the ~6 min full-model server compile, so in-kernel
variants (MSSVT_ATTN_VARIANT, MSSVT_ATTN_WB, ...) A/B in minutes.

Usage: python tools/bench_attn_kernel.py [--nw 96000] [--iters 30]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    nw = int(sys.argv[sys.argv.index("--nw") + 1]) if "--nw" in sys.argv else 96000
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 30
    n1cap, nk1, nk2, nq, d = 48, 32, 32, 32, 128
    num_heads = (2, 2)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    from mssvt_tpu.ops.pallas_attention import fused_window_attention_assembled

    win1 = jnp.asarray(rng.standard_normal((nw, n1cap, d)), bf)
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
    nv = jnp.asarray(nw, jnp.int32)

    @jax.jit
    def run(win1, k2):
        return fused_window_attention_assembled(
            win1, k2, fps1, km1, q_ext, q_keep, k_rel, q_rel, pos_base,
            pos_w, proj, bias, num_heads=num_heads, scale=0.125,
            q_prefix=True, nq=nq, pad_row=pad_row, num_valid=nv)

    t0 = time.time()
    out = run(win1, k2)
    s0 = float(jnp.abs(out).mean())
    print(f"compile+first: {time.time() - t0:.1f}s mean={s0:.4f}")
    t0 = time.time()
    sink = 0.0
    for i in range(iters):
        sink += float(jnp.abs(run(win1, k2)).mean())
    dt = (time.time() - t0) / iters * 1000
    print(f"steady: {dt:.2f} ms/call (nw={nw}, sink={sink:.3f})")


if __name__ == "__main__":
    main()
