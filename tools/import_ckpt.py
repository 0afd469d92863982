"""Import a reference PyTorch checkpoint into the TPU rebuild's format.

Converts the reference's ``checkpoint_state`` dict (ref:
tools/train_utils/train_utils.py:146-180 — ``{epoch, it, model_state,
version}`` saved with ``torch.save``) into the flax/orbax checkpoint layout
this repo trains and evaluates from, via the name-map + layout transforms in
``mssvt_tpu/runtime/torch_import.py``. Shape-tolerant like the reference's
own loader (ref: pcdet/models/detectors/detector3d_template.py:330-411).

Usage:
    python tools/import_ckpt.py --cfg_file tools/cfgs/waymo_models/mssvt.yaml \
        --ckpt /path/to/checkpoint_epoch_30.pth --out output/imported_mssvt

The resulting directory is a CheckpointManager root; point tools/test.py at
it with --ckpt_dir to evaluate the imported weights.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np


def derive_grid(data_cfg):
    """Grid size from the voxelize processor config (no dataset files needed)."""
    pc_range = np.asarray(data_cfg.POINT_CLOUD_RANGE, np.float64)
    vox = None
    max_pts = 5
    max_vox = 90000
    for p in data_cfg.DATA_PROCESSOR:
        if p.NAME == "transform_points_to_voxels":
            vox = np.asarray(p.VOXEL_SIZE, np.float64)
            max_pts = int(p.get("MAX_POINTS_PER_VOXEL", 5))
            mnv = p.get("MAX_NUMBER_OF_VOXELS", 90000)
            max_vox = int(mnv["test"] if isinstance(mnv, dict) else mnv)
    assert vox is not None, "no transform_points_to_voxels processor in config"
    grid = np.round((pc_range[3:] - pc_range[:3]) / vox).astype(np.int64)
    return tuple(int(g) for g in grid), tuple(vox), tuple(pc_range), max_pts, max_vox


def synth_batch(grid, max_voxels, max_pts, num_feats=5, seed=0):
    rng = np.random.default_rng(seed)
    n = min(max_voxels // 2, 4096)
    coords = np.unique(np.stack([
        np.zeros(n, np.int64),
        rng.integers(0, grid[2], n),
        rng.integers(0, grid[1], n),
        rng.integers(0, grid[0], n),
    ], 1), axis=0)
    pad = np.full((max_voxels, 4), -1, np.int32)
    pad[:len(coords)] = coords
    valid = np.arange(max_voxels) < len(coords)
    gt = np.zeros((1, 8, 8), np.float32)
    gt[0, :4] = [[4, 4, 0.5, 2, 1, 1, 0.3, 1]] * 4
    return {
        "voxels": rng.normal(size=(max_voxels, max_pts, num_feats)).astype(
            np.float32) * valid[:, None, None],
        "voxel_num_points": np.full((max_voxels,), 2.0, np.float32) * valid,
        "voxel_coords": pad,
        "voxel_valid": valid,
        "gt_boxes": gt,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True,
                        help="reference .pth checkpoint")
    parser.add_argument("--out", type=str, required=True,
                        help="output CheckpointManager directory")
    parser.add_argument("--step", type=int, default=0,
                        help="step number to save under (default: ref epoch)")
    parser.add_argument("--set", dest="set_cfgs", default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import jax
    import torch

    from mssvt_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    from mssvt_tpu.models import build_network
    from mssvt_tpu.runtime.checkpoint import CheckpointManager
    from mssvt_tpu.runtime.torch_import import convert_state_dict

    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)

    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    model_state = {
        k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        for k, v in ckpt["model_state"].items()
    }
    epoch = int(ckpt.get("epoch", 0) or 0)
    print(f"==> loaded {len(model_state)} tensors from {args.ckpt} "
          f"(epoch {epoch}, version {ckpt.get('version')})")

    grid, vox, pc_range, max_pts, max_vox = derive_grid(cfg.DATA_CONFIG)
    model = build_network(
        model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
        class_names=cfg.CLASS_NAMES, grid_size=grid, voxel_size=vox,
        point_cloud_range=pc_range, batch_size=1, max_voxels=max_vox,
        max_points_per_voxel=max_pts,
    )
    batch = synth_batch(grid, max_vox, max_pts)
    variables = jax.jit(
        lambda k0, k1, b: model.init({"params": k0, "dropout": k1}, b,
                                     train=True)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), batch)
    variables = jax.device_get(variables)

    # z-depth of the final sparse tensor (each compress block divides z by
    # its window z) for the BEV channel-order permutation
    depth = grid[2]
    for p in cfg.MODEL.BACKBONE_3D.PARAMS:
        if p["name"].endswith("CompressBlock"):
            depth //= int(p["window_size"][0][2])
    new_vars, report = convert_state_dict(model_state, dict(variables),
                                          bev_depth=depth)
    print(f"==> loaded {len(report['loaded'])} leaves; "
          f"{len(report['missing'])} kept init; "
          f"{len(report['shape_mismatch'])} shape mismatches; "
          f"{len(report['unused'])} torch keys unused")
    for k in report["shape_mismatch"]:
        print("   SHAPE:", k)
    for k in report["missing"]:
        print("   INIT :", k)
    for k in report["unused"]:
        print("   UNUSED:", k)

    mgr = CheckpointManager(args.out)
    step = args.step or epoch
    mgr.save(step, {
        "params": new_vars.get("params", {}),
        "batch_stats": new_vars.get("batch_stats", {}),
        "opt_state": {},
        "accumulated_iter": int(ckpt.get("it", 0) or 0),
    })
    print(f"==> saved step {step} to {args.out}")


if __name__ == "__main__":
    main()
