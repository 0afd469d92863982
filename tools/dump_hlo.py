"""Dump the optimized HLO of the bench inference program and map the
xplane-hot fusion names back to source operations.

Usage:
  PYTHONPATH=.:/root/.axon_site python tools/dump_hlo.py [--out /tmp/mssvt.hlo]
  grep 'fusion.13 ' /tmp/mssvt.hlo   # then read the fused computation

The op names in the xplane trace ("fusion.13", "iota_reduce_fusion.2", ...)
are the HLO instruction names of the optimized module; their metadata
(op_name=...) carries the JAX source path, which attributes device time to
framework mechanisms.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    out_path = "/tmp/mssvt.hlo"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from mssvt_tpu.config import cfg_from_yaml_file
    from mssvt_tpu.models import build_network
    from mssvt_tpu.utils.edict import EasyDict

    import bench

    cfg = EasyDict()
    cfg_from_yaml_file(
        str(Path(__file__).parent / "cfgs/waymo_models/mssvt.yaml"), cfg)
    grid = (480, 480, 32)
    batch_size = 4
    max_voxels = 90_000 * batch_size
    model = build_network(
        model_cfg=cfg.MODEL, num_class=3,
        class_names=["Vehicle", "Pedestrian", "Cyclist"],
        grid_size=grid, voxel_size=(0.32, 0.32, 0.1875),
        point_cloud_range=(-76.8, -76.8, -2.0, 76.8, 76.8, 4.0),
        batch_size=batch_size, max_voxels=max_voxels, max_points_per_voxel=5,
    )
    b, _ = bench.make_waymo_scale_scene(max_voxels, grid, seed=0,
                                        batch=batch_size)
    batch = {k: jax.device_put(v) for k, v in b.items()}
    variables = jax.eval_shape(
        lambda k0, k1, bb: model.init({"params": k0, "dropout": k1}, bb,
                                      train=False),
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), batch)
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables)

    def infer(variables, batch):
        out = model.apply(variables, batch, train=False)
        return out["final_boxes"], out["final_scores"], out["final_mask"]

    compiled = jax.jit(infer).lower(variables, batch).compile()
    txt = compiled.as_text()
    Path(out_path).write_text(txt)
    print(f"# wrote {len(txt) / 1e6:.1f} MB to {out_path}", file=sys.stderr)

    # quick map: top-level fusion name -> op_name metadata of its root
    names = sys.argv[sys.argv.index("--map") + 1].split(",") \
        if "--map" in sys.argv else []
    for nm in names:
        pat = re.compile(rf"%?{re.escape(nm)} = .*")
        for line in txt.splitlines():
            m = pat.search(line)
            if m:
                print(f"\n=== {nm}: {line.strip()[:400]}")
                break


if __name__ == "__main__":
    main()
