"""Static HBM-byte attribution from the optimized HLO of the bench model.

The xplane profiler can hang on the axon tunnel, so this is the robust
byte-side analog of tools/profile_top_ops.py: compile the exact bench
entry (same config / shapes / dtype policy), dump the optimized HLO text,
and charge every top-level instruction the bytes of its materialized
operands + output.  Post-fusion, the top-level instructions of the entry
computation ARE the HBM-resident buffer reads/writes (fusion internals
live in registers/VMEM), so summing operand+result bytes per instruction
is a faithful static model of HBM traffic — the same quantity XLA's own
aggregate `bytes accessed` cost analysis reports, but per op and
groupable by source mechanism (jax source metadata).

Usage:
  python tools/hlo_bytes.py [--train] [--n 30] [--group]

Groups by the op_name metadata prefix (the jax name-stack), which maps
1:1 onto model mechanisms (block0/attention, group_features, center_head,
...).  Reference analog: the per-op CUDA timing tables the reference
builds by hand with torch.profiler (SURVEY.md §5).
"""

from __future__ import annotations

import collections
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of one shape string like f32[4,480,480,64] or a tuple."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_META_RE = re.compile(r'op_name="([^"]*)"')


def parse_instr(ln: str):
    """Parse one scheduled-HLO instruction line.

    Returns (name, shape_str, opkind, args_str) or None.  Shapes carry
    layout/tiling annotations (``f32[4,128]{1,0:T(8,128)}``) and tuple
    shapes contain spaces, so this is a small scanner, not one regex.
    """
    s = ln.lstrip()
    if s.startswith("ROOT "):
        s = s[5:]
    if not s.startswith("%"):
        return None
    eq = s.find(" = ")
    if eq < 0:
        return None
    name = s[1:eq].strip()
    rest = s[eq + 3:]
    if rest.startswith("("):  # tuple shape: scan to matching paren
        depth = 0
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
        shape = rest[:i + 1]
        rest = rest[i + 1:].lstrip()
    else:
        sp = rest.find(" ")
        shape = rest[:sp]
        rest = rest[sp + 1:]
    par = rest.find("(")
    if par < 0:
        return None
    opkind = rest[:par].strip()
    depth = 0
    args = ""
    for i in range(par, len(rest)):
        ch = rest[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                args = rest[par + 1:i]
                break
    return name, shape, opkind, args


def analyze(hlo_text: str, group: bool, top_n: int):
    # Per-instruction bytes: output shape + operand shapes.  Operand shapes
    # aren't on the use line in HLO text, so build a def table first.
    def_shape: dict[str, str] = {}
    lines = hlo_text.splitlines()
    in_entry = False
    entry_lines = []
    for ln in lines:
        p = parse_instr(ln)
        if p:
            def_shape[p[0]] = p[1]
        if ln.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if ln.startswith("}"):
                in_entry = False
            elif "%" in ln and " = " in ln:
                entry_lines.append(ln)

    per_key = collections.Counter()
    per_key_count = collections.Counter()
    total = 0
    opnd_re = re.compile(r"%([\w.\-]+)")
    for ln in entry_lines:
        p = parse_instr(ln)
        if not p:
            continue
        name, out_shape, opkind, args = p
        if opkind in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast"):
            continue
        b = shape_bytes(out_shape)
        for tok in set(opnd_re.findall(args)):  # dedupe: same buffer read twice counts once
            if tok in def_shape:
                b += shape_bytes(def_shape[tok])
        meta = _META_RE.search(ln)
        key = meta.group(1) if meta else f"<{opkind}>"
        if group:
            # collapse the jit(...)/ prefix and keep the leading 3 segments
            key = re.sub(r"^jit\([^)]*\)/", "", key)
            key = "/".join(key.split("/")[:3])
        per_key[key] += b
        per_key_count[key] += 1
        total += b

    print(f"total materialized bytes (static, per step): "
          f"{total / 1e9:.2f} GB")
    for key, b in per_key.most_common(top_n):
        print(f"{b / 1e9:8.3f} GB  x{per_key_count[key]:<4d} {key}")


def main():
    group = "--group" in sys.argv
    top_n = 30
    if "--n" in sys.argv:
        top_n = int(sys.argv[sys.argv.index("--n") + 1])
    if "--hlo" in sys.argv:  # analyze a pre-dumped HLO text file
        path = sys.argv[sys.argv.index("--hlo") + 1]
        analyze(open(path).read(), group, top_n)
        return

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    import numpy as np  # noqa: F401
    import bench
    from mssvt_tpu.config import cfg_from_yaml_file
    from mssvt_tpu.models import build_network
    from mssvt_tpu.utils.edict import EasyDict

    cfg = EasyDict()
    cfg_from_yaml_file(
        str(Path(__file__).resolve().parent / "cfgs/waymo_models/mssvt.yaml"),
        cfg)
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
    train_mode = "--train" in sys.argv
    if train_mode:
        b = bench.add_synth_gt(b, batch_size, seed=0)
    variables = bench.init_variables_small(cfg, model, batch_size,
                                           train=train_mode)

    if train_mode:
        from mssvt_tpu.parallel.mesh import (
            make_mesh, make_sharded_train_step, shard_batch_for_mesh)
        from mssvt_tpu.runtime.optimization import build_optimizer
        mesh = make_mesh(1)
        sharded = shard_batch_for_mesh(b, mesh, batch_size)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1000,
                                steps_per_epoch=100)
        opt_state = tx.init(params)
        step = make_sharded_train_step(model, tx, mesh)
        lowered = step.lower(params, batch_stats, opt_state, sharded,
                             jax.random.PRNGKey(2))
    else:
        def infer(variables, batch):
            out = model.apply(variables, batch, train=False)
            return (out["final_boxes"], out["final_scores"],
                    out["final_mask"])
        lowered = jax.jit(infer).lower(variables, b)

    compiled = lowered.compile()
    hlo = compiled.as_text()
    analyze(hlo, group, top_n)


if __name__ == "__main__":
    main()
