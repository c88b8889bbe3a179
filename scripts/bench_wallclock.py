#!/usr/bin/env python
"""Variance-controlled north-star wallclock: median-of-N hot CLI runs.

The headline "200-generation StyleGAN2_ffhq_d search wallclock" varies
run-to-run with the axon server's executable-cache state (BASELINE.md
round-3 note: ~39-105 s). This protocol controls that state explicitly:

1. ONE pre-warm run (discarded) populates the persistent XLA compile cache
   and the server-side executable cache, so every timed run is "hot".
2. N timed runs (default 5) of the EXACT CLI invocation the claim is about
   (run.py --config StyleGAN2_ffhq_d, full-size weights, 200 generations).
3. Report the MEDIAN total wallclock with min/max spread, plus the median
   steady-state search rate (which excludes the one-time setup/init cost).

Usage:
  python scripts/bench_wallclock.py [--runs 5] [--generations 200]
                                    [--config StyleGAN2_ffhq_d] [--tiny]

Prints one JSON line: {"median_s", "min_s", "max_s", "runs", "rate_gen_s",
"per_run_s", ...}.
"""

import argparse
import json
import os
import re
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(args, idx: int) -> dict:
    with tempfile.TemporaryDirectory(prefix=f"wallclock{idx}_") as tmp:
        argv = [sys.executable, os.path.join(REPO, "run.py"),
                "--config", args.config,
                "--target", "the face of a man with brown eyes",
                "--generations", str(args.generations),
                "--save-each", str(args.save_each),
                "--tmp-folder", tmp, "--verbose"]
        if args.tiny:
            argv.append("--tiny")
        else:
            argv += ["--weights", "random:0"]
        r = subprocess.run(argv, capture_output=True, text=True,
                           timeout=3600)
        if r.returncode != 0:
            raise RuntimeError(f"run {idx} rc {r.returncode}: "
                               f"{r.stderr[-800:]}")
        out = r.stdout
    total = re.search(r"wallclock: total=([0-9.]+)s", out)
    rate = re.findall(r"rate: ([0-9.]+) gen/s", out)
    if not total:
        raise RuntimeError(f"run {idx}: no wallclock line in output:\n"
                           f"{out[-800:]}")
    # per-phase attribution from the CLI's verbose breakdown line, e.g.
    # "wallclock: total=206.6s imports=0.2s setup=15.3s init(gen0)=190.1s
    #  search+dumps=18.2s final_artifacts=2.7s" — init(gen0) is the axon
    # server's executable load, not client compute (BASELINE.md round-3
    # attribution), so the report must separate it from the search rate.
    phases = {k: float(v) for k, v in
              re.findall(r" ([\w+()]+)=([0-9.]+)s", out) if k != "total"}
    return {"total_s": float(total.group(1)),
            "rate_gen_s": float(rate[-1]) if rate else None,
            "phases": phases}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--runs", type=int, default=5)
    p.add_argument("--generations", type=int, default=200)
    p.add_argument("--save-each", type=int, default=50)
    p.add_argument("--config", default="StyleGAN2_ffhq_d")
    p.add_argument("--tiny", action="store_true",
                   help="tiny models (protocol smoke test, not the claim)")
    args = p.parse_args()

    print(f"# pre-warm (discarded): {args.config} "
          f"{args.generations} gens", file=sys.stderr)
    run_once(args, -1)

    results = []
    for i in range(args.runs):
        r = run_once(args, i)
        results.append(r)
        print(f"# run {i}: total {r['total_s']:.1f}s  "
              f"rate {r['rate_gen_s']} gen/s  phases {r['phases']}",
              file=sys.stderr)

    totals = sorted(r["total_s"] for r in results)
    rates = sorted(r["rate_gen_s"] for r in results if r["rate_gen_s"])
    n = len(totals)
    median = statistics.median(totals)
    out = {
        "metric": (f"wallclock_200gen ({args.config}, "
                   f"{args.generations} gens, median of {n} hot runs)"),
        "median_s": round(median, 2),
        "min_s": round(totals[0], 2),
        "max_s": round(totals[-1], 2),
        "spread_pct": round(100 * (totals[-1] - totals[0]) / median, 1),
        "median_rate_gen_s": (round(statistics.median(rates), 3)
                              if rates else None),
        "per_run_s": [round(t, 2) for t in totals],
        "median_phase_s": {
            k: round(statistics.median(r["phases"].get(k, 0.0)
                                       for r in results), 2)
            for k in results[0]["phases"]},
        "runs": n,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
