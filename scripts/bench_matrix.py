#!/usr/bin/env python
"""Run the standard benchmark matrix and emit one consolidated JSON table.

Each row is a `bench.py` invocation (same process isolation the driver
uses) over the workloads recorded in BASELINE.md: the flagship
StyleGAN2_ffhq_d at pop 16/32/64, both BigGAN configs, GPT-2 img2txt, the
multi-search batched serving points, and (with --int8) the quantized
variants. Use it to regenerate the BASELINE.md table apples-to-apples
after perf work.

  python scripts/bench_matrix.py [--rows flagship16,flagship64,...]
                                 [--int8] [--out /tmp/bench_matrix.json]

Each run inherits the persistent compile cache, so a repeated matrix is
fast; the first pass after a code edit pays the XLA compiles row by row.
"""

import argparse
import json
import os
import subprocess
import sys

ROWS = {
    # name: env overrides for bench.py
    "flagship16": {},
    "flagship32": {"BENCH_POP": "32", "BENCH_MICROBATCH": "32"},
    "flagship64": {"BENCH_POP": "64"},
    "biggan256": {"BENCH_CONFIG": "DeepMindBigGAN256", "BENCH_POP": "64"},
    "biggan512": {"BENCH_CONFIG": "DeepMindBigGAN512", "BENCH_POP": "256"},
    "gpt2": {"BENCH_CONFIG": "GPT2"},
    "batched_k4": {"BENCH_TARGETS": "4"},
    "batched_k8": {"BENCH_TARGETS": "8"},
    "batched_k16_mb8": {"BENCH_TARGETS": "16", "BENCH_SEARCH_MB": "8"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default=",".join(ROWS),
                    help="comma-separated row names (default: all)")
    ap.add_argument("--int8", action="store_true",
                    help="additionally run each row with BENCH_QUANT=int8")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench = os.path.join(here, "bench.py")
    rows = [r.strip() for r in args.rows.split(",") if r.strip()]
    unknown = [r for r in rows if r not in ROWS]
    if unknown:
        sys.exit(f"unknown rows: {unknown}; known: {list(ROWS)}")

    table = {}
    variants = [("bf16", {})] + ([("int8", {"BENCH_QUANT": "int8"})]
                                 if args.int8 else [])
    for name in rows:
        for vname, venv in variants:
            if name == "gpt2" and vname == "int8":
                continue  # no eligible convs (DESIGN.md §10)
            # drop any ambient BENCH_* so exported knobs can't leak into
            # rows that don't pin them (the table must be reproducible)
            env = {k: v for k, v in os.environ.items()
                   if not k.startswith("BENCH_")}
            env.update(ROWS[name])
            env.update(venv)
            proc = subprocess.run([sys.executable, bench], env=env,
                                  capture_output=True, text=True)
            line = next((l for l in reversed(proc.stdout.splitlines())
                         if l.startswith("{")), None)
            key = name if vname == "bf16" else f"{name}_{vname}"
            if proc.returncode or line is None:
                table[key] = {"error": proc.returncode,
                              "tail": proc.stderr.splitlines()[-3:]}
            else:
                table[key] = json.loads(line)
            v = table[key].get("value")
            print(f"{key}: {v if v is not None else table[key]}",
                  flush=True)

    out = json.dumps(table, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
        print(f"wrote {args.out}")
    else:
        print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
