#!/usr/bin/env python
"""Aggregate a jax.profiler device trace into a per-op time table.

Usage:
  python scripts/parse_trace.py <trace_dir_or_file> [--top 30] [--group]

Reads the newest `*.trace.json.gz` under the given directory (the layout
`jax.profiler.trace` writes: plugins/profile/<ts>/*.trace.json.gz), keeps
TensorCore op events, and prints total-duration-ranked rows. --group folds
XLA's numbered fusion suffixes (fusion.123 -> fusion) for a coarser view.

This is the measurement tool behind the per-op roofline table in
DESIGN.md §9 (works without tensorboard; see memory: trust in-program traces
over tunnel-noisy microbenchmarks).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    cands = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not cands:
        raise SystemExit(f"no *.trace.json.gz under {path}")
    return cands[-1]


def load_events(path: str):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # pid -> process name (TensorCore ops live on the device process)
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
    return events, pnames


def device_pids(pnames):
    pids = {pid for pid, name in pnames.items()
            if "TPU" in name or "/device" in name.lower()
            or "tensorcore" in name.lower()}
    return pids or set(pnames)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--group", action="store_true",
                    help="fold numeric suffixes (fusion.123 -> fusion)")
    ap.add_argument("--steps", type=int, default=0,
                    help="divide totals by this step count (per-step ms)")
    args = ap.parse_args()

    path = find_trace(args.path)
    print(f"# {path}", file=sys.stderr)
    events, pnames = load_events(path)
    pids = device_pids(pnames)

    tot = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        name = e.get("name", "")
        if args.group:
            name = re.sub(r"\.[0-9]+$", "", name)
        tot[name] += e.get("dur", 0)  # microseconds
        cnt[name] += 1
    grand = sum(tot.values())
    div = args.steps or 1
    print(f"{'total_ms':>10s} {'per_step':>9s} {'count':>7s} {'%':>6s}  name")
    for name, us in tot.most_common(args.top):
        print(f"{us / 1e3:10.2f} {us / 1e3 / div:9.3f} {cnt[name]:7d} "
              f"{100 * us / max(grand, 1):6.2f}  {name[:110]}")
    print(f"{grand / 1e3:10.2f} {'':9s} {sum(cnt.values()):7d} {100.0:6.1f}  "
          f"TOTAL (device-op time)")


if __name__ == "__main__":
    main()
