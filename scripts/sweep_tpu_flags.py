#!/usr/bin/env python
"""Screen libtpu compiler flags against the flagship bench (A/B harness).

Round 5 found the first compiler-level win against the flagship plateau by
sweeping `--xla_tpu_scoped_vmem_limit_kib` (DESIGN.md §9: +3.6% flagship,
+1.7-7.5% across the bench matrix; now the `tune_tpu_compiler()` default).
This script generalizes that experiment: it runs `bench.py` as a subprocess
once per ARM, where an arm = the shipped default tuning plus ONE candidate
flag, and reports rate + exactness fingerprint per arm.

Methodology (matches the scoped-VMEM sweep write-up):
  - every arm keeps the shipped 64 MiB scoped-VMEM default (we are searching
    for flags that COMPOSE with it, not replacements);
  - `--runs N` bench invocations per arm, interleaved round-robin across arms
    so slow tunnel drift hits every arm equally; each invocation itself takes
    best-of-3 timed passes (bench.py BENCH_REPEATS), and the arm statistic is
    the MEDIAN of its invocations;
  - BENCH_CHECKSUM=1: bench.py appends the final population fitness sum; an
    arm whose checksum differs from baseline changed the math (fusion /
    scheduling flags must be semantics-preserving) and is marked REJECTED
    regardless of speed;
  - an arm whose subprocess fails (e.g. the flag does not exist in the
    server-side libtpu behind the axon tunnel) is marked FAILED and skipped.

Candidate flags are real names extracted from the installed libtpu binary
(`strings libtpu.so`); numerics-affecting flags (bf16 math modes, excess
precision, `allow_*_numerical_diff`) are deliberately excluded.

Usage:
    python scripts/sweep_tpu_flags.py                 # default screen
    python scripts/sweep_tpu_flags.py --runs 4 "--flags=--xla_tpu_foo=true"
      (use the = form: argparse rejects a space-separated value that
       itself starts with --)
    BENCH_CONFIG=DeepMindBigGAN512 python scripts/sweep_tpu_flags.py ...

Prints one JSON line per arm as results land, then a final summary table.
"""

import argparse
import json
import os
import subprocess
import sys
import statistics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Screening set: scheduler / fusion / VMEM levers plausibly relevant to a
# single-chip conv-pair-bound workload (DESIGN.md §9 roofline: hot rows are
# fused conv PAIRS at 45-96% of combined roofline). All bool flags; value
# flags go through --flags.
DEFAULT_CANDIDATES = [
    "--xla_tpu_use_aggressive_scheduling=true",
    "--xla_tpu_enable_experimental_fusion_cost_model=true",
    "--xla_tpu_use_bundle_aware_cost_model_for_fusions=true",
    "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true",
    "--xla_tpu_enable_all_experimental_scheduler_features=true",
    "--xla_tpu_enable_vmem_to_vmem_dmas=true",
    "--xla_tpu_dot_dot_fusion_duplicated=true",
    "--xla_tpu_enable_multi_level_nested_loop_fusion=true",
    "--xla_tpu_rwb_fusion=false",
    "--xla_tpu_scavenge_vmem_for_fusions=true",
    "--xla_tpu_enable_latency_hiding_scheduler=true",
]


def run_bench(extra_flags, env_extra=None, timeout=1200):
    """One bench.py invocation with LIBTPU_INIT_ARGS = shipped default + extra.

    Returns the parsed JSON dict, or {"error": ...}.
    """
    env = dict(os.environ)
    # the shipped default; tune_tpu_compiler() respects a pre-set flag, so
    # spell it out explicitly and append the candidate
    args = "--xla_tpu_scoped_vmem_limit_kib=65536"
    if extra_flags:
        args += " " + " ".join(extra_flags)
    env["LIBTPU_INIT_ARGS"] = args
    env["BENCH_CHECKSUM"] = "1"
    env.update(env_extra or {})
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    line = None
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and '"metric"' in ln:
            line = ln
    if proc.returncode != 0 or line is None:
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-8:]
        return {"error": f"rc={proc.returncode}", "tail": tail}
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2,
                    help="bench invocations per arm (median reported)")
    ap.add_argument("--flags", action="append", default=[],
                    help="extra candidate flag arm (repeatable); replaces the "
                         "default screen set when given with --no-defaults")
    ap.add_argument("--no-defaults", action="store_true",
                    help="screen only --flags arms (plus baseline)")
    ap.add_argument("--out", default=None, help="write results JSON here")
    args = ap.parse_args()

    candidates = ([] if args.no_defaults else list(DEFAULT_CANDIDATES))
    candidates += args.flags
    arms = [("baseline", [])] + [(f, [f]) for f in candidates]
    results = {name: [] for name, _ in arms}
    checks = {}

    # round-robin: run i of every arm before run i+1 of any arm, so tunnel
    # drift is shared across arms rather than aliased onto one
    for i in range(args.runs):
        for name, flags in arms:
            if any("error" in r for r in results[name]):
                continue  # arm already failed; don't pay its compile again
            r = run_bench(flags)
            results[name].append(r)
            if "error" in r:
                print(json.dumps({"arm": name, "run": i, **r}), flush=True)
            else:
                print(json.dumps({"arm": name, "run": i,
                                  "value": r["value"],
                                  "checksum_F": r.get("checksum_F")}),
                      flush=True)

    base_ck = next((r.get("checksum_F") for r in results["baseline"]
                    if "error" not in r), None)
    summary = []
    base_med = None
    for name, _ in arms:
        rs = [r for r in results[name] if "error" not in r]
        if not rs:
            summary.append({"arm": name, "status": "FAILED"})
            continue
        med = statistics.median(r["value"] for r in rs)
        cks = {r.get("checksum_F") for r in rs}
        exact = (cks == {base_ck}) if base_ck is not None else None
        if name == "baseline":
            base_med = med
        row = {"arm": name, "median": round(med, 1),
               "spread": [round(min(r["value"] for r in rs), 1),
                          round(max(r["value"] for r in rs), 1)],
               "n": len(rs), "exact": exact}
        if base_med and name != "baseline":
            row["vs_baseline_pct"] = round(100.0 * (med / base_med - 1.0), 2)
            if exact is False:
                row["status"] = "REJECTED(numerics)"
        summary.append(row)

    print("\n=== sweep summary ===")
    for row in summary:
        print(json.dumps(row))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "raw": results}, f, indent=1)


if __name__ == "__main__":
    main()
