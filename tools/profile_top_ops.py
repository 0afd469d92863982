"""Aggregate a jax profiler trace (vm.trace.json.gz) into top-op cost tables.

Usage:
  python tools/profile_top_ops.py /tmp/xplane_r2 [--n 40] [--group]

Sums wall-duration per op name on the TPU device tracks (pid whose name
contains 'TPU'), prints the top-N ops by total time and, with --group,
collapses XLA fusion names to their leading op kind so whole mechanism
families (fusion, dynamic-update-slice, gather, ...) can be compared.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_events(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--group", action="store_true")
    ap.add_argument("--match", default=None, help="only ops whose name matches this regex")
    args = ap.parse_args()

    events = load_events(args.trace_dir)

    # Identify device pids: process_name metadata containing TPU/device.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if re.search(r"TPU|/device", n, re.I)}

    # Thread names per (pid, tid): device pids also carry 'XLA Modules' /
    # 'Steps' lines whose events ENCLOSE the op events, so summing every line
    # double/triple-counts. Only the 'XLA Ops' line holds per-op durations.
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    op_tids = {k for k, n in tid_names.items()
               if k[0] in dev_pids and re.search(r"XLA Ops", n, re.I)}
    if not op_tids:  # older trace format: fall back to excluding known wrappers
        op_tids = {k for k, n in tid_names.items()
                   if k[0] in dev_pids
                   and not re.search(r"Module|Steps|Framework|Source", n, re.I)}

    totals = collections.Counter()
    counts = collections.Counter()
    total_device = 0.0  # unfiltered device-op total (all ops, pre --match)
    total_matched = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        total_device += dur
        if args.match and not re.search(args.match, name):
            continue
        key = name
        if args.group:
            key = re.sub(r"[.\d]+$", "", name)
            key = key.split("(")[0]
        totals[key] += dur
        counts[key] += 1
        total_matched += dur

    print(f"# device pids: { {p: pid_names[p] for p in dev_pids} }")
    print(f"# op lines: { {k: tid_names[k] for k in sorted(op_tids)} }")
    print(f"# total device-op time: {total_device:.1f} ms")
    if args.match:
        print(f"# matched device-op time: {total_matched:.1f} ms "
              f"across {sum(counts.values())} events")
    width = max((len(k[:160]) for k, _ in totals.most_common(args.n)), default=10)
    for name, ms in totals.most_common(args.n):
        print(f"{ms:10.2f} ms  x{counts[name]:<5d} {name[:160]:<{width}}")


if __name__ == "__main__":
    main()
