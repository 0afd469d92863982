"""Surgical e2e ablation harness: attribute ms/frame to pipeline mechanisms.

Methodology (the TPU-native replacement for the reference's wall-clock
meters, ref: tools/train_utils/train_utils.py:19-21,65-79): run the exact
bench.py inference protocol, but with ONE mechanism stubbed by a
shape-faithful, value-independent stand-in (``zeros_like`` of the real
output). Because the stub's outputs do not depend on its inputs, XLA
dead-code-eliminates the mechanism AND everything that only feeds it, so

    cost(mechanism chain) ~= ms(full) - ms(ablated)

Deltas therefore attribute *chains*, not isolated ops: successive cut
points (late -> early in the block) difference into per-segment costs.

Cut points (in each MsSVT block, late to early):
  block      entire MsSVTBlock becomes identity (windowing, gather, FPS,
             attention, interp, writeback, FFN all removed)
  ffn        fused residual+LN+FFN tail removed (writeback still live)
  writeback  inverse write-back removed (attention/interp output unused ->
             attention chain also DCE'd; difference vs `attn` isolates it)
  interp     dense-W3 3-NN interpolation removed (attention still live via
             zeros-matmul? no: w3 is the only consumer of attn_fea ->
             removes interp + attention math; difference vs `attn` = interp)
  attn       MixedScaleAttention returns zeros (QKV, softmax, projections,
             pos-MLP removed; gather buffers stay live via metric planes)
  fps        FPS key selection returns slot-0 picks (the sequential loop
             removed; key feature gathers still execute on zero indices)
  gather     gather_window_voxels returns zeros (fill kernel + derive +
             inverse-map chain removed; window_partition stays live)
  compress   both MsSVTCompressBlocks become identity (they change voxel
             resolution, so this also changes later blocks' working set --
             read as "the compress stages + their downstream effect")
  bev2d      BaseBEVBackbone = identity conv-free passthrough
  head       CenterHead decode+NMS removed (raw zeros predictions)

Env A/Bs (variants, not removals) are run with --env NAME=VAL, e.g.
  --env MSSVT_ATTN_VARIANT=...   attention kernel core variants

Usage:
  python tools/ablate_e2e.py --ablate none          # baseline
  python tools/ablate_e2e.py --ablate fps
  python tools/ablate_e2e.py --all                  # the whole ladder
Each configuration prints one JSON line {"ablate", "ms_per_frame"}.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _zeros_like_tree(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def _near_zero_like_tree(tree, anchor):
    """Shape-faithful ~zero stand-ins that stay DATA-DEPENDENT.

    A constant-zeros stub lets XLA constant-fold every downstream consumer
    too (measured: the train 'attn' cut collapsed the whole step to
    33 ms/frame), which overstates the chain. Scaling a live scalar by 1e-30
    keeps consumers in the graph while contributing nothing numerically.
    """
    import jax
    import jax.numpy as jnp

    eps = anchor.reshape(-1)[0].astype(jnp.float32) * 1e-30

    def mk(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x) + eps.astype(x.dtype)
        return jnp.zeros_like(x)
    return jax.tree_util.tree_map(mk, tree)


@contextlib.contextmanager
def _patched(obj, name, new):
    old = getattr(obj, name)
    setattr(obj, name, new)
    try:
        yield
    finally:
        setattr(obj, name, old)


def _make_ablation(name):
    """Return a contextmanager applying the named ablation."""
    import jax.numpy as jnp

    import mssvt_tpu.models.backbones_3d.mssvt as M
    from mssvt_tpu.models.model_utils import attention as A

    if name == "none":
        return contextlib.nullcontext()

    if name == "block":
        return _patched(M.MsSVTBlock, "__call__",
                        lambda self, sp, deterministic=True: sp)

    if name == "compress":
        # identity would keep full-resolution voxels and break downstream
        # static shapes; instead keep the real window partition (coords and
        # the new grid) but zero the output features, DCE-ing the compress
        # blocks' gather/attention/FFN compute
        orig = M.MsSVTCompressBlock.__call__

        def stub(self, sp, deterministic=True):
            out = orig(self, sp, deterministic=deterministic)
            return out.with_features(_near_zero_like_tree(
                jnp.zeros_like(out.features), sp.features))
        return _patched(M.MsSVTCompressBlock, "__call__", stub)

    if name == "ffn":
        # also disable the unfused tail by patching fused_residual_ffn AND
        # forcing the fused branch off is unnecessary: the fused branch is
        # the live one at eval; stub it to identity
        return _patched(M, "fused_residual_ffn",
                        lambda x, *a, **k: x)

    if name == "writeback":
        return _patched(M, "_writeback_inverse",
                        lambda upd_fea, inv, shortcut, **kw: shortcut)

    if name == "interp":
        real = M.three_interp_weights_planes
        return _patched(
            M, "three_interp_weights_planes",
            lambda *a, **k: _near_zero_like_tree(
                _zeros_like_tree(real(*a, **k)), a[0]))

    if name == "attn":
        def stub(self, query=None, keys=None, query_mask=None,
                 key_masks=None, deterministic=True, assembled=None):
            if assembled is not None:
                b = assembled["win1_fea"].shape[0]
                out = jnp.zeros((b, int(assembled["nq"]), self.embed_dim),
                                self.dtype)
                return _near_zero_like_tree(out, assembled["win1_fea"])
            return _near_zero_like_tree(jnp.zeros_like(query), query)
        return _patched(A.MixedScaleAttention, "__call__", stub)

    if name == "fps":
        def stub(x, y, z, aux, npoint, **kw):
            b, n = x.shape
            fps = jnp.zeros((b, npoint), jnp.int32)
            sel = (x[:, :npoint], y[:, :npoint], z[:, :npoint],
                   aux[0][:, :npoint].astype(jnp.float32))
            return fps, tuple(_zeros_like_tree(s) for s in sel)
        return _patched(M, "farthest_point_sample_planes_select", stub)

    if name == "gather":
        real = M.gather_window_voxels

        def stub(*a, **k):
            out = real(*a, **k)
            # coords (a[2]) keep the int buffers data-dependent via eps on
            # float leaves only; int index buffers stay zero (slot 0)
            return {kk: _zeros_like_tree(vv) for kk, vv in out.items()}
        return _patched(M, "gather_window_voxels", stub)

    if name == "bev2d":
        from mssvt_tpu.models.backbones_2d import base_bev_backbone as BB
        real = BB.BaseBEVBackbone.__call__

        def stub(self, x, train=False):
            return _near_zero_like_tree(
                _zeros_like_tree(real(self, x, train=train)), x)
        return _patched(BB.BaseBEVBackbone, "__call__", stub)

    if name == "head":
        from mssvt_tpu.models.dense_heads import center_head as CH
        real = CH.CenterHead.__call__

        def stub(self, *a, **k):
            return _near_zero_like_tree(_zeros_like_tree(real(self, *a, **k)),
                                        a[0])
        return _patched(CH.CenterHead, "__call__", stub)

    raise SystemExit(f"unknown ablation {name!r}")


ALL = ["none", "block", "ffn", "writeback", "interp", "attn", "fps",
       "gather", "compress", "bev2d", "head"]


def measure(ablate, batch_size=4, n_iter=12, tiny=False, train=False):
    import jax

    from mssvt_tpu.config import cfg_from_yaml_file
    from mssvt_tpu.models import build_network
    from mssvt_tpu.utils.edict import EasyDict

    import bench

    cfg = EasyDict()
    cfg_from_yaml_file(
        str(Path(__file__).parent / "cfgs/waymo_models/mssvt.yaml"), cfg)
    grid = (96, 96, 32) if tiny else (480, 480, 32)
    max_voxels = (2_000 if tiny else 90_000) * batch_size
    model = build_network(
        model_cfg=cfg.MODEL, num_class=3,
        class_names=["Vehicle", "Pedestrian", "Cyclist"],
        grid_size=grid, voxel_size=(0.32, 0.32, 0.1875),
        point_cloud_range=(-76.8, -76.8, -2.0, 76.8, 76.8, 4.0),
        batch_size=batch_size, max_voxels=max_voxels, max_points_per_voxel=5,
    )
    scenes = []
    for seed in range(2):
        b, _ = bench.make_waymo_scale_scene(
            max_voxels, grid, seed=seed, batch=batch_size)
        if train:
            b = bench.add_synth_gt(b, batch_size, seed=seed)
        scenes.append({k: jax.device_put(v) for k, v in b.items()})

    if train:
        import jax.numpy as jnp

        from mssvt_tpu.parallel.mesh import (
            make_mesh, make_sharded_train_step, shard_batch_for_mesh)
        from mssvt_tpu.runtime.optimization import build_optimizer

        mesh = make_mesh(1)
        host_scenes = [
            {k: np.asarray(v) for k, v in s.items()} for s in scenes]
        sharded = [shard_batch_for_mesh(s, mesh, batch_size)
                   for s in host_scenes]
        one_dev = jax.tree_util.tree_map(lambda x: x[0], sharded[0])
        with _make_ablation(ablate):
            variables = jax.jit(
                lambda k0, k1, b: model.init(
                    {"params": k0, "dropout": k1}, b, train=True)
            )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), one_dev)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
            tx, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1000,
                                    steps_per_epoch=100)
            opt_state = tx.init(params)
            step = make_sharded_train_step(model, tx, mesh)
            t0 = time.time()
            for i, s in enumerate(sharded):
                params, batch_stats, opt_state, loss, _ = step(
                    params, batch_stats, opt_state, s, jax.random.PRNGKey(i))
                float(np.asarray(loss))
            print(f"# [{ablate}] train compile+warm: {time.time() - t0:.1f}s",
                  file=sys.stderr)
            t0 = time.time()
            for i in range(n_iter):
                params, batch_stats, opt_state, loss, _ = step(
                    params, batch_stats, opt_state,
                    sharded[i % len(sharded)], jax.random.PRNGKey(10 + i))
                float(np.asarray(loss))
            ms = (time.time() - t0) / n_iter / batch_size * 1000
        print(json.dumps({"ablate": ablate, "train_ms_per_frame": round(ms, 2)}),
              flush=True)
        return ms

    with _make_ablation(ablate):
        variables = jax.jit(
            lambda k0, k1, b: model.init(
                {"params": k0, "dropout": k1}, b, train=False)
        )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), scenes[0])

        @jax.jit
        def infer(variables, batch):
            out = model.apply(variables, batch, train=False)
            return out["final_boxes"], out["final_scores"], out["final_mask"]

        t0 = time.time()
        for s in scenes:
            float(np.asarray(infer(variables, s)[1]).sum())
        print(f"# [{ablate}] compile+warm: {time.time() - t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        for i in range(n_iter):
            float(np.asarray(infer(variables, scenes[i % len(scenes)])[1]).sum())
        ms = (time.time() - t0) / n_iter / batch_size * 1000
    print(json.dumps({"ablate": ablate, "ms_per_frame": round(ms, 2)}),
          flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ablate", default="none", choices=ALL)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--env", action="append", default=[],
                    help="NAME=VAL env A/B (applied before JAX work)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--tiny", action="store_true", help="small grid smoke (CPU)")
    ap.add_argument("--train", action="store_true", help="ablate the TRAIN step (fwd+bwd+optimizer)")
    args = ap.parse_args()

    import os
    for kv in args.env:
        k, _, v = kv.partition("=")
        os.environ[k] = v

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.all:
        results = {}
        for name in ALL:
            results[name] = measure(name, args.batch, args.iters, args.tiny, args.train)
        base = results["none"]
        print("# --- attribution (ms/frame deltas vs full) ---",
              file=sys.stderr)
        for name in ALL[1:]:
            print(f"# {name:>10}: {base - results[name]:+7.2f}",
                  file=sys.stderr)
    else:
        measure(args.ablate, args.batch, args.iters, args.tiny, args.train)


if __name__ == "__main__":
    main()
