"""Multi-host code paths, tested deterministically without multiple hosts:

- the filesystem part-file merge used by distributed eval
  (runtime/eval_utils.py merge_result_parts ≙ ref common_utils.py:199-220)
- the Waymo Hungarian matcher vs brute-force optimal assignment on random
  mini-scenes (datasets/waymo_eval.py _match_frame)
- a 2-process jax.distributed CPU smoke for the "jax" launcher init
  (parallel/mesh.py init_distributed)
"""

import itertools
import os
import pickle
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest


def _fake_part(n_frames, seed, t_eval):
    rng = np.random.default_rng(seed)
    det, gt = [], []
    recall = {0.3: 0, 0.5: 0, 0.7: 0}
    gt_total = 0
    for _ in range(n_frames):
        nd, ng = rng.integers(1, 5), rng.integers(1, 4)
        det.append({
            "boxes": rng.normal(size=(nd, 7)).astype(np.float32),
            "scores": rng.random(nd).astype(np.float32),
            "labels": rng.integers(1, 4, nd),
        })
        gt.append({
            "boxes": rng.normal(size=(ng, 7)).astype(np.float32),
            "labels": rng.integers(1, 4, ng),
        })
        gt_total += ng
        for t in recall:
            recall[t] += int(rng.integers(0, ng + 1))
    return {"det": det, "gt": gt, "recall": recall,
            "gt_total": gt_total, "n": n_frames, "t": t_eval}


def test_merge_result_parts(tmp_path):
    from mssvt_tpu.runtime.eval_utils import merge_result_parts

    parts = [_fake_part(3, seed=0, t_eval=1.5),
             _fake_part(2, seed=1, t_eval=2.5),
             _fake_part(4, seed=2, t_eval=0.5)]
    for rank, p in enumerate(parts):
        with open(tmp_path / f"part_{rank}.pkl", "wb") as f:
            pickle.dump(p, f)

    det, gt, recall, gt_total, n, t_total = merge_result_parts(
        tmp_path, (0.3, 0.5, 0.7))

    assert n == 3 + 2 + 4
    assert len(det) == n and len(gt) == n
    # rank order preserved (part_0 frames first)
    np.testing.assert_array_equal(det[0]["boxes"], parts[0]["det"][0]["boxes"])
    np.testing.assert_array_equal(det[3]["boxes"], parts[1]["det"][0]["boxes"])
    np.testing.assert_array_equal(det[5]["boxes"], parts[2]["det"][0]["boxes"])
    assert gt_total == sum(p["gt_total"] for p in parts)
    for t in (0.3, 0.5, 0.7):
        assert recall[t] == sum(p["recall"][t] for p in parts)
    # wall-clock is the max across concurrent ranks, not the sum
    assert t_total == 2.5


def _brute_force_total(gated):
    """Optimal assignment total by permutation enumeration (<=8 x 8)."""
    n, m = gated.shape
    k = min(n, m)
    best = 0.0
    rows = range(n)
    for pr in itertools.permutations(rows, k):
        tot = sum(gated[r, c] for c, r in enumerate(pr))
        best = max(best, tot)
    # also consider assigning columns to a subset when m < n handled above;
    # when n < m choose which columns: permute columns instead
    if n < m:
        best = 0.0
        for pc in itertools.permutations(range(m), n):
            tot = sum(gated[r, c] for r, c in enumerate(pc))
            best = max(best, tot)
    return best


@pytest.mark.parametrize("seed", range(8))
def test_hungarian_matcher_is_optimal(seed):
    """_match_frame's total gated IoU equals the brute-force optimum, every
    match clears the gate, and assignments are one-to-one."""
    from mssvt_tpu.datasets.waymo_eval import (_boxes_iou3d_numpy,
                                               _match_frame)

    rng = np.random.default_rng(seed)
    nd, ng = rng.integers(1, 7), rng.integers(1, 7)
    mk = lambda k: np.concatenate([  # noqa: E731
        rng.uniform(-6, 6, (k, 2)), rng.uniform(-1, 1, (k, 1)),
        rng.uniform(1.5, 5, (k, 3)), rng.uniform(-np.pi, np.pi, (k, 1)),
    ], axis=1)
    pred, gt = mk(nd), mk(ng)
    thresh = 0.05

    pi, gi, iou = _match_frame(pred, gt, thresh)
    assert len(pi) == len(set(pi)) and len(gi) == len(set(gi))  # one-to-one
    assert np.all(iou >= thresh)

    full = _boxes_iou3d_numpy(pred, gt)
    gated = np.where(full >= thresh, full, 0.0)
    got_total = gated[pi, gi].sum()
    want_total = _brute_force_total(gated)
    np.testing.assert_allclose(got_total, want_total, atol=1e-9)


@pytest.mark.slow
def test_two_process_jax_distributed_smoke(tmp_path):
    """init_distributed('jax') across two real CPU processes: both ranks see
    the full device count and a psum over the data mesh agrees."""
    script = textwrap.dedent("""
        import os, sys
        os.environ.pop("JAX_PLATFORMS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
        from mssvt_tpu.parallel.mesh import init_distributed
        rank = int(sys.argv[1])
        r, w = init_distributed(
            "jax", coordinator="127.0.0.1:%s" % sys.argv[2],
            num_processes=2, process_id=rank)
        assert (r, w) == (rank, 2), (r, w)
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        val = multihost_utils.process_allgather(jnp.asarray([rank + 1.0]))
        total = float(val.sum())
        assert total == 3.0, total
        print("RANK%d_OK" % rank)
    """)
    sc = tmp_path / "smoke.py"
    sc.write_text(script)
    port = 12345 + (os.getpid() % 1000)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(sc), str(r), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
    ) for r in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-2000:]}"
        assert f"RANK{r}_OK" in out
