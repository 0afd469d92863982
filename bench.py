"""End-to-end inference benchmark on the flagship MsSVT model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Scenario: Waymo-scale synthetic frames (grid 480x480x32 @ 0.32m voxels,
~80k occupied voxels each) through the full reconstructed mssvt.yaml stack
(MeanVFE → 5-block MixedScaleSparseTransformer → HeightCompression →
BaseBEVBackbone → CenterHead decode + rotated NMS) with the bf16 compute
policy from the config.

Protocol: batch 4 (sec_per_example semantics, matching the reference's
batched eval metric, ref: tools/eval_utils/eval_utils.py:79-80), rotating
DISTINCT scenes between iterations, host readback of the outputs each
iteration (on the axon platform block_until_ready can return early), and an
output-variance assert against caching. fps = batch / time_per_step.
Run with --batch1 for the single-frame latency variant.

vs_baseline: the reference publishes no numbers (BASELINE.md), so instead of
a guessed anchor the bench DERIVES an A100 SPEED-OF-LIGHT bound from the
measured per-frame cost of this very graph (XLA cost analysis):

    a100_sol_fps = min(2039 GB/s / bytes_per_frame, 312 TFLOP/s / flops_per_frame)

(A100-80GB-SXM peaks; our graph's bytes are a LOWER bound on what the
fp32 eager PyTorch reference moves — fp32 doubles the activation bytes and
eager kernels materialize intermediates XLA fuses away — so a100_sol_fps
OVERSTATES any real A100 run and vs_baseline = fps / a100_sol_fps is a
certified LOWER bound on the true ratio.) Full derivation: BASELINE.md.
When cost analysis is unavailable on the tunnel, falls back to the
2026-08-19 measured constants recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

A100_PEAK_BW = 2039e9      # A100-80GB-SXM HBM2e bytes/s
A100_PEAK_FLOPS = 312e12   # A100 dense bf16/fp16 FLOP/s
# fallback per-frame graph cost (XLA cost analysis, bench.py 2026-08-19,
# batch 4, 90k voxels/frame — see BASELINE.md "derived A100 bound")
FALLBACK_FLOPS_PER_FRAME = 174.5e9
FALLBACK_BYTES_PER_FRAME = 25.8e9


def a100_speed_of_light_fps(fl_frame=None, by_frame=None):
    fl = fl_frame or FALLBACK_FLOPS_PER_FRAME
    by = by_frame or FALLBACK_BYTES_PER_FRAME
    return min(A100_PEAK_BW / by, A100_PEAK_FLOPS / fl)


# Realistic-A100 band bracketing the reference's throughput (BASELINE.md
# "realistic band"): the LOW end is the OpenPCDet-family literature
# sec_per_example range on Waymo-scale transformer detectors (0.07-0.12 s
# => 8-15 fps, upper end generous to the reference); the HIGH end is the
# fp32 roofline of this very graph with eager-PyTorch bytes (fp32 doubles
# activation bytes; 2039 GB/s / (2 x bytes/frame) ~= 40 fps) — an
# unreachable-but-defensible ceiling. vs_baseline (the certified SOL lower
# bound) and this band together BRACKET the true vs-A100 ratio.
A100_REALISTIC_FPS_BAND = (8.0, 15.0)


def make_waymo_scale_scene(max_voxels, grid, seed=0, batch=1):
    """~80k occupied voxels PER FRAME with LiDAR-like radial density falloff.

    ``max_voxels`` is the total (all-batch) static capacity; frames are
    concatenated with their batch index in coord column 0.
    """
    rng = np.random.default_rng(seed)
    per = max_voxels // batch
    parts = []
    for b in range(batch):
        n_target = 80_000
        # radial distribution: denser near sensor (center of xy grid)
        r = np.abs(rng.normal(0, 0.35, n_target * 2)) * grid[0] / 2
        theta = rng.uniform(0, 2 * np.pi, n_target * 2)
        x = (grid[0] / 2 + r * np.cos(theta)).astype(np.int64)
        y = (grid[1] / 2 + r * np.sin(theta)).astype(np.int64)
        z = np.clip(rng.geometric(0.25, n_target * 2) - 1, 0, grid[2] - 1)
        ok = (x >= 0) & (x < grid[0]) & (y >= 0) & (y < grid[1])
        coords = np.unique(
            np.stack([np.full_like(x[ok], b), z[ok], y[ok], x[ok]], 1), axis=0
        )[:per].astype(np.int32)
        parts.append(coords)
    coords = np.concatenate(parts, axis=0)
    n = len(coords)
    pad = np.full((max_voxels, 4), -1, np.int32)
    pad[:n] = coords
    valid = np.arange(max_voxels) < n
    voxels = rng.normal(size=(max_voxels, 5, 5)).astype(np.float32) * valid[:, None, None]
    num_points = np.minimum(rng.poisson(3, max_voxels) + 1, 5).astype(np.float32) * valid
    return {
        "voxels": voxels,
        "voxel_num_points": num_points,
        "voxel_coords": pad,
        "voxel_valid": valid,
    }, n


def add_synth_gt(batch, batch_size, seed=0, max_gt=64):
    """Synthetic GT boxes for the train-step benchmark (B, M, 8)."""
    rng = np.random.default_rng(1000 + seed)
    gt = np.zeros((batch_size, max_gt, 8), np.float32)
    for b in range(batch_size):
        n = rng.integers(20, max_gt)
        gt[b, :n, 0] = rng.uniform(-70, 70, n)
        gt[b, :n, 1] = rng.uniform(-70, 70, n)
        gt[b, :n, 2] = rng.uniform(-1, 2, n)
        gt[b, :n, 3] = rng.uniform(1.5, 6, n)
        gt[b, :n, 4] = rng.uniform(1.0, 3, n)
        gt[b, :n, 5] = rng.uniform(1.0, 3, n)
        gt[b, :n, 6] = rng.uniform(-np.pi, np.pi, n)
        gt[b, :n, 7] = rng.integers(1, 4, n)
    batch["gt_boxes"] = gt
    return batch


def init_variables_small(cfg, big_model, batch_size, train, seed=0):
    """Initialize parameters by tracing a MINIATURE model instance.

    Every parameter shape in the stack depends only on channel widths
    (convs, denses, norms) — never on BEV extent or voxel capacity — so init
    compiles a 48x48-BEV / 2k-voxel instance instead of the 90k-voxel Waymo
    graph, removing one full-scale server-side compile from the cold path
    (the r3 driver measured 621 s compile+first-run on a cold cache; the
    init program was a third of it). Structure is verified against
    ``jax.eval_shape`` of the BIG model's init (trace-only, no compile);
    on any mismatch falls back to the big init.
    """
    import jax

    from mssvt_tpu.models import build_network

    # keep z (the compress chain fixes the BEV depth); 96x96 BEV keeps the
    # post-stride heatmap >= the head's top-K (48x48 left 144 < K=500)
    grid_s = (96, 96, 32)
    mv = 2_000 * batch_size
    small = build_network(
        model_cfg=cfg.MODEL, num_class=3,
        class_names=["Vehicle", "Pedestrian", "Cyclist"],
        grid_size=grid_s, voxel_size=(0.32, 0.32, 0.1875),
        point_cloud_range=(-15.36, -15.36, -2.0, 15.36, 15.36, 4.0),
        batch_size=batch_size, max_voxels=mv, max_points_per_voxel=5,
    )
    b_small, _ = make_waymo_scale_scene(mv, grid_s, seed=seed,
                                        batch=batch_size)
    rngs = {"params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1)}
    if train:
        b_small = add_synth_gt(b_small, batch_size, seed=seed)
    variables = jax.jit(
        lambda k0, k1, b: small.init({"params": k0, "dropout": k1}, b,
                                     train=train)
    )(rngs["params"], rngs["dropout"], b_small)
    return variables


def check_variables_shape(variables, big_model, big_batch, train):
    """Trace-only structural check: small-instance init == big init shapes."""
    import jax

    want = jax.eval_shape(
        lambda k0, k1, b: big_model.init({"params": k0, "dropout": k1}, b,
                                         train=train),
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), big_batch)
    got = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), variables)
    want = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), want)
    return got == want


def run_train(cfg, model, scenes, batch_size, emit_json=True, n_iter=12):
    """Full optimizer step (fwd + bwd + adam_onecycle update) at Waymo scale.

    The fused attention kernel runs under value_and_grad via its custom VJP;
    DropPath/dropout are live (train=True). Matches the reference's primary
    workload (ref: tools/train.py + train_utils.py:23-90 per-iter body).

    With ``emit_json=False`` (the default bench invocation's train tail),
    returns the measurements as a dict instead of printing its own JSON line
    so the driver's single parsed line carries both inference AND training.
    """
    import jax
    import jax.numpy as jnp

    from mssvt_tpu.parallel.mesh import make_mesh, make_sharded_train_step, shard_batch_for_mesh
    from mssvt_tpu.runtime.optimization import build_optimizer

    mesh = make_mesh(1)
    sharded = [shard_batch_for_mesh(s, mesh, batch_size) for s in scenes]
    one_dev = jax.tree_util.tree_map(lambda x: x[0], sharded[0])

    t0 = time.time()
    variables = init_variables_small(cfg, model, batch_size, train=True)
    if not check_variables_shape(variables, model, one_dev, train=True):
        print("# small-instance init mismatch — falling back to big init",
              file=sys.stderr)
        variables = jax.jit(
            lambda k0, k1, b: model.init({"params": k0, "dropout": k1}, b,
                                         train=True)
        )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), one_dev)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    print(f"# train init: {time.time() - t0:.1f}s", file=sys.stderr)

    tx, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1000,
                            steps_per_epoch=100)
    opt_state = tx.init(params)
    step = make_sharded_train_step(model, tx, mesh)

    t0 = time.time()
    params, batch_stats, opt_state, loss, _ = step(
        params, batch_stats, opt_state, sharded[0], jax.random.PRNGKey(2))
    l0 = float(np.asarray(loss))
    t_train_compile = time.time() - t0
    print(f"# train compile+first step: {t_train_compile:.1f}s "
          f"(loss={l0:.3f})", file=sys.stderr)
    assert np.isfinite(l0), f"non-finite train loss {l0}"
    for s in sharded[1:]:
        params, batch_stats, opt_state, loss, _ = step(
            params, batch_stats, opt_state, s, jax.random.PRNGKey(3))
    float(np.asarray(loss))

    # --profile [dir]: xplane trace around a few steady train steps (same
    # guard as the inference path — the axon tunnel may not support tracing)
    if "--profile" in sys.argv:
        ai = sys.argv.index("--profile")
        tdir = (sys.argv[ai + 1] if len(sys.argv) > ai + 1
                and not sys.argv[ai + 1].startswith("-")
                else "/tmp/mssvt_train_trace")
        try:
            jax.profiler.start_trace(tdir)
            for i in range(2):
                params, batch_stats, opt_state, loss, _ = step(
                    params, batch_stats, opt_state, sharded[i % len(sharded)],
                    jax.random.PRNGKey(100 + i))
                float(np.asarray(loss))
            jax.profiler.stop_trace()
            print(f"# train profiler trace written to {tdir}", file=sys.stderr)
        except Exception as e:
            print(f"# train profiler trace failed: {e}", file=sys.stderr)

    t0 = time.time()
    sink = 0.0
    for i in range(n_iter):
        params, batch_stats, opt_state, loss, _ = step(
            params, batch_stats, opt_state, sharded[i % len(sharded)],
            jax.random.PRNGKey(10 + i))
        sink += float(np.asarray(loss))  # host readback forces completion
    dt = (time.time() - t0) / n_iter
    print(f"# train steady-state: {dt * 1000:.1f} ms/step at batch "
          f"{batch_size} ({dt * 1000 / batch_size:.1f} ms/frame, "
          f"sink={sink:.3f})", file=sys.stderr)
    metrics = {
        "train_ms_per_step": round(dt * 1000, 1),
        "train_ms_per_frame": round(dt * 1000 / batch_size, 1),
        "train_compile_s": round(t_train_compile, 1),
    }
    if emit_json:
        print(json.dumps({
            "metric": "train_step_ms_single_chip_batch%d" % batch_size,
            "value": round(dt * 1000, 1),
            "unit": "ms/step",
            # train fps over the derived A100 inference speed-of-light bound
            # — a floor, not a claim (BASELINE.md)
            "vs_baseline": round(
                (batch_size / dt) / a100_speed_of_light_fps(), 3),
        }))
    return metrics


def main():
    import jax

    t_main0 = time.time()

    # Repo-local persistent compile cache. The heavyweight cost on the axon
    # platform is the SERVER-side TPU binary compile on first execution
    # (~180-240 s for the full model, measured 2026-08-19); a persistent-cache
    # hit skips it entirely (12.5 s compile+first-run). Repo-local so it
    # survives /tmp cleanup between sessions.
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mssvt_tpu.config import cfg_from_yaml_file
    from mssvt_tpu.models import build_network
    from mssvt_tpu.utils.edict import EasyDict

    cfg = EasyDict()
    cfg_from_yaml_file(
        str(Path(__file__).parent / "tools/cfgs/waymo_models/mssvt.yaml"), cfg
    )
    if "--fp32" in sys.argv:
        cfg.MODEL.pop("DTYPE", None)
        print("# fp32 override", file=sys.stderr)

    grid = (480, 480, 32)
    voxel_size = (0.32, 0.32, 0.1875)
    pc_range = (-76.8, -76.8, -2.0, 76.8, 76.8, 4.0)
    batch_size = 1 if "--batch1" in sys.argv else 4
    if "--batch" in sys.argv:  # e.g. --batch 8: deeper dispatch amortization
        batch_size = int(sys.argv[sys.argv.index("--batch") + 1])
    max_voxels = 90_000 * batch_size

    model = build_network(
        model_cfg=cfg.MODEL, num_class=3,
        class_names=["Vehicle", "Pedestrian", "Cyclist"],
        grid_size=grid, voxel_size=voxel_size, point_cloud_range=pc_range,
        batch_size=batch_size, max_voxels=max_voxels, max_points_per_voxel=5,
    )

    train_mode = "--train" in sys.argv

    # several distinct scenes: guards against any result caching in the
    # device tunnel and against XLA folding repeated identical inputs.
    # Host copies are kept for the train tail: run_train's
    # shard_batch_for_mesh owns the (single) device placement, and feeding
    # it device arrays would round-trip ~175 MB/scene through the tunnel.
    scenes = []
    scenes_host = []
    for seed in range(4):
        b, n_vox = make_waymo_scale_scene(
            max_voxels, grid, seed=seed, batch=batch_size)
        if train_mode:
            b = add_synth_gt(b, batch_size, seed=seed)
        scenes_host.append(b)
        scenes.append({k: jax.device_put(v) for k, v in b.items()})
    batch = scenes[0]

    if train_mode:
        print(f"# train scene: {n_vox} voxels, batch {batch_size}",
              file=sys.stderr)
        run_train(cfg, model, scenes_host, batch_size)
        return

    print(f"# scene: {n_vox} voxels total, batch {batch_size}, grid {grid}",
          file=sys.stderr)
    t0 = time.time()
    variables = init_variables_small(cfg, model, batch_size, train=False)
    if not check_variables_shape(variables, model, batch, train=False):
        print("# small-instance init mismatch — falling back to big init",
              file=sys.stderr)
        variables = jax.jit(
            lambda k0, k1, b: model.init({"params": k0, "dropout": k1}, b,
                                         train=False)
        )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), batch)
    print(f"# init: {time.time() - t0:.1f}s", file=sys.stderr)

    def infer(variables, batch):
        out = model.apply(variables, batch, train=False)
        return out["final_boxes"], out["final_scores"], out["final_mask"]

    # explicit lower+compile so XLA cost analysis (FLOPs, HBM bytes) is
    # available for the MFU/roofline report below
    t0 = time.time()
    infer_c = jax.jit(infer).lower(variables, batch).compile()
    t_compile = time.time() - t0
    infer = infer_c  # all subsequent calls go through the compiled object
    cost = None
    try:
        ca = infer_c.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        cost = {
            "flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception as e:  # cost analysis is best-effort on the tunnel
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)

    # warm with HOST READBACKS: on the axon platform block_until_ready can
    # return before queued work completes, which silently pushes compile +
    # warmup executions into the timed region (measured 20x inflation)
    t0 = time.time()
    float(np.asarray(infer_c(variables, batch)[1]).sum())
    t_first = t_compile + (time.time() - t0)
    print(f"# compile+first run: {t_first:.1f}s "
          f"(xla compile {t_compile:.1f}s)", file=sys.stderr)
    if t_first > 60.0:
        print("# WARNING: compile+first run exceeded the 60 s budget — "
              "persistent cache cold (server-side TPU compile ran); "
              "re-run to verify the warm path", file=sys.stderr)
    for s in scenes:  # warm every distinct input once
        float(np.asarray(infer(variables, s)[1]).sum())

    # --profile [dir]: capture a jax profiler trace (xplane) around a few
    # steady-state iterations — the TPU-native analog of the reference's
    # wall-clock meters (SURVEY.md §5 tracing). Guarded: the axon tunnel
    # may not support device tracing; the bench number is unaffected.
    if "--profile" in sys.argv:
        import jax as _jax
        ai = sys.argv.index("--profile")
        tdir = (sys.argv[ai + 1] if len(sys.argv) > ai + 1
                and not sys.argv[ai + 1].startswith("-")
                else "/tmp/mssvt_trace")
        try:
            _jax.profiler.start_trace(tdir)
            for i in range(3):
                float(np.asarray(infer(variables, scenes[i % len(scenes)])[1]).sum())
            _jax.profiler.stop_trace()
            print(f"# profiler trace written to {tdir}", file=sys.stderr)
        except Exception as e:  # tracing is best-effort on the tunnel
            print(f"# profiler trace failed: {e}", file=sys.stderr)

    # Steady-state protocol: depth-2 software pipeline. Dispatch of step i
    # overlaps the device executing step i-1, so the host→device dispatch
    # round-trip (measured ~14 ms/frame at batch 4 through the axon tunnel —
    # an empty jitted graph costs that much per call) stops serializing with
    # compute. Every frame is still computed and its outputs copied back to
    # the host inside the timed window (the drain loop), so nothing can be
    # skipped or cached: this measures true sustained frames/sec, the same
    # quantity the reference's sec_per_example reports over a whole eval
    # epoch (ref: tools/eval_utils/eval_utils.py:79-80, where dataloader
    # prefetch likewise overlaps GPU dispatch). --sync restores the fully
    # serialized one-in-flight variant (reported on stderr either way).
    n_iter = 20
    t0 = time.time()
    sink = 0.0
    iters = []
    for i in range(n_iter):
        ti = time.time()
        out = infer(variables, scenes[i % len(scenes)])
        # device→host readback: block_until_ready alone can return early on
        # the experimental axon platform; a host copy cannot be faked
        sink += float(np.asarray(out[1]).sum())
        iters.append(time.time() - ti)
    dt_sync = (time.time() - t0) / n_iter / batch_size
    # the dispatch+readback RTT through the axon tunnel jitters run-to-run
    # (~+-1.5 ms/frame on this protocol); the per-iteration median resists
    # spikes and is the more comparable cross-run sync figure
    dt_sync_med = float(np.median(iters)) / batch_size
    print(f"# sync steady-state: {dt_sync * 1000:.2f} ms/frame at batch "
          f"{batch_size} (median {dt_sync_med * 1000:.2f}, sink={sink:.3f})",
          file=sys.stderr)

    if "--sync" in sys.argv:
        dt = dt_sync
    else:
        n_iter = 40
        depth = int(os.environ.get("MSSVT_BENCH_DEPTH", "2"))
        inflight = []
        t0 = time.time()
        sink = 0.0
        for i in range(n_iter):
            inflight.append(infer(variables, scenes[i % len(scenes)])[1])
            if len(inflight) >= depth:
                sink += float(np.asarray(inflight.pop(0)).sum())
        while inflight:  # drain: all n_iter results land on the host
            sink += float(np.asarray(inflight.pop(0)).sum())
        dt = (time.time() - t0) / n_iter / batch_size
        print(f"# pipelined steady-state: {dt * 1000:.2f} ms/frame at batch "
              f"{batch_size} (sink={sink:.3f})", file=sys.stderr)
    fps = 1.0 / dt
    # sanity: outputs must differ across scenes (no caching/DCE)
    o0 = np.asarray(infer(variables, scenes[0])[1])
    o1 = np.asarray(infer(variables, scenes[1])[1])
    assert not np.allclose(o0, o1), "identical outputs across scenes — measurement invalid"

    # --- FLOP / MFU / roofline accounting (XLA cost analysis). v5e peak:
    # 197 TFLOP/s bf16 per chip, 819 GB/s HBM. MFU uses the bf16 peak (the
    # model runs the bf16 compute policy); the arithmetic-intensity line says
    # which wall the steady state sits against.
    mfu = None
    if cost and cost["flops"] > 0:
        peak_flops = 197e12 if "--fp32" not in sys.argv else 98.5e12
        peak_bw = 819e9
        fl_frame = cost["flops"] / batch_size
        by_frame = cost["bytes"] / batch_size
        mfu = fl_frame / (dt * peak_flops)
        hbm_util = by_frame / (dt * peak_bw)
        ai = cost["flops"] / max(cost["bytes"], 1.0)
        ridge = peak_flops / peak_bw
        bound = "HBM-bound" if ai < ridge else "compute-bound"
        print(f"# cost: {fl_frame / 1e9:.1f} GFLOP/frame, "
              f"{by_frame / 1e9:.2f} GB/frame, AI={ai:.0f} flop/byte "
              f"(ridge {ridge:.0f}) -> {bound}", file=sys.stderr)
        print(f"# mfu: {mfu * 100:.1f}% of bf16 peak, "
              f"hbm: {hbm_util * 100:.1f}% of 819 GB/s at "
              f"{dt * 1000:.2f} ms/frame", file=sys.stderr)

    sol = a100_speed_of_light_fps(
        cost["flops"] / batch_size if cost and cost["flops"] > 0 else None,
        cost["bytes"] / batch_size if cost and cost["bytes"] > 0 else None)
    lo, hi = A100_REALISTIC_FPS_BAND
    print(f"# a100 speed-of-light bound: {sol:.1f} fps -> vs_baseline "
          f"{fps / sol:.3f} is a LOWER bound on the true ratio (BASELINE.md)",
          file=sys.stderr)
    print(f"# a100 realistic band: {lo:.0f}-{hi:.0f} fps -> "
          f"{fps / hi:.2f}-{fps / lo:.2f}x realistic A100 (BASELINE.md)",
          file=sys.stderr)
    out = {
        "metric": "e2e_inference_fps_single_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        # fps over the DERIVED A100 speed-of-light bound — a certified lower
        # bound on the true vs-A100 ratio (the old 10-fps literature guess
        # put 21.5 fps at 2.15x; the real A100 number requires running the
        # PyTorch reference, unavailable in this environment — BASELINE.md)
        "vs_baseline": round(fps / sol, 3),
        "a100_sol_fps_bound": round(sol, 1),
        # fps over the documented realistic-A100 band (8-15 fps, BASELINE.md)
        # — the other end of the bracket
        "vs_baseline_realistic_band": [round(fps / hi, 2), round(fps / lo, 2)],
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
        out["sync_ms_per_frame"] = round(dt_sync * 1000, 2)
        out["sync_ms_per_frame_median"] = round(dt_sync_med * 1000, 2)

    # --- training tail (default ON; --no-train skips): the reference's
    # PRIMARY workload is training (ref: tools/train.py:60), so the driver's
    # single parsed JSON line carries the train step time too. Runs after
    # the inference report is fully computed; any failure (e.g. HBM pressure
    # from the resident inference executable) degrades to inference-only.
    # Budget guard: the axon server-side compile is high-variance (measured
    # 168-1100 s cold across r4/r5) and the train executable's persistent-
    # cache state is independent of the inference one, so its cost cannot be
    # predicted — instead the tail runs under a SIGALRM watchdog sized to
    # the remaining budget: a runaway train compile aborts the tail and the
    # inference JSON still ships. MSSVT_BENCH_BUDGET_S=0 disables the guard.
    budget_s = float(os.environ.get("MSSVT_BENCH_BUDGET_S", "1500"))
    remaining = budget_s - (time.time() - t_main0) if budget_s > 0 else 0.0
    if budget_s > 0 and remaining < 120.0:
        print(f"# train tail skipped: only {remaining:.0f}s of the "
              f"{budget_s:.0f}s budget left (cold-compile protection)",
              file=sys.stderr)
    elif "--no-train" not in sys.argv and "--batch1" not in sys.argv:
        import signal

        def _timeout(signum, frame):
            raise TimeoutError("train tail exceeded the remaining budget")

        old = None
        try:
            del infer, infer_c, variables, o0, o1  # free HBM for the train step
            for i, s in enumerate(scenes_host):
                s.update(add_synth_gt({}, batch_size, seed=i))
            if budget_s > 0 and hasattr(signal, "SIGALRM"):
                old = signal.signal(signal.SIGALRM, _timeout)
                signal.alarm(int(remaining))
            tm = run_train(cfg, model, scenes_host, batch_size,
                           emit_json=False, n_iter=6)
            out.update(tm)
        except Exception as e:  # noqa: BLE001 — degrade, don't lose the line
            print(f"# train tail failed: {e}", file=sys.stderr)
        finally:
            if old is not None:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
