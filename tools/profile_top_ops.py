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
import sys


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

    # Thread names so we can skip host-side threads inside device pids.
    totals = collections.Counter()
    counts = collections.Counter()
    total_span = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        if args.match and not re.search(args.match, name):
            continue
        key = name
        if args.group:
            key = re.sub(r"[.\d]+$", "", name)
            key = key.split("(")[0]
        totals[key] += dur
        counts[key] += 1
        total_span += dur

    print(f"# device pids: { {p: pid_names[p] for p in dev_pids} }")
    print(f"# total device-op time: {total_span:.1f} ms across {sum(counts.values())} events")
    width = max((len(k) for k, _ in totals.most_common(args.n)), default=10)
    for name, ms in totals.most_common(args.n):
        print(f"{ms:10.2f} ms  x{counts[name]:<5d} {name[:160]}")


if __name__ == "__main__":
    main()
