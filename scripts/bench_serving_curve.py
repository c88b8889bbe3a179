#!/usr/bin/env python
"""Serving convergence curve (DESIGN.md §12): useful candidates/s/chip vs
request length, with repeats.

Each 20-generation request carries one unavoidable generation-0 admission
evaluation, so the raw useful-rate ceiling at request length L is
steady * L/(L+1) (DESIGN.md §12 ceiling math). This script MEASURES the
approach to the steady state instead of arguing it from one point: the
same churn workload (R requests through K slots) at several request
lengths, >= 3 repeats each, median +/- spread, and the ratio to both the
L-adjusted ceiling and the K=8 steady state.

  python scripts/bench_serving_curve.py            # 20/40/100 gens x 3
  CURVE_GENS=20,40,100 CURVE_REPEATS=3 CURVE_STEADY=428.9 \
      python scripts/bench_serving_curve.py
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    from clip_glass_tpu.core.backend import (enable_compile_cache,
                                             tune_tpu_compiler)
    enable_compile_cache()
    tune_tpu_compiler()

    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.serving import SearchServer, ServerStats

    name = os.environ.get("SERVE_CONFIG", "StyleGAN2_ffhq_d")
    slots = int(os.environ.get("SERVE_SLOTS", "8"))
    chunk = int(os.environ.get("SERVE_CHUNK", "10"))
    n_req = int(os.environ.get("SERVE_REQUESTS", str(3 * slots)))
    pop = int(os.environ.get("SERVE_POP", "16"))
    gens = [int(g) for g in
            os.environ.get("CURVE_GENS", "20,40,100").split(",")]
    repeats = int(os.environ.get("CURVE_REPEATS", "3"))
    # K=8 multi-search steady state on this workload (DESIGN.md §11 table,
    # measured under the round-5 scoped-VMEM default — §9)
    steady = float(os.environ.get("CURVE_STEADY", "428.9"))

    config = get_config(name).replace(
        target="the face of a man with brown eyes", weights="random:0",
        pop_size=pop, compute_dtype="bfloat16")
    problem = GenerationProblem(config)
    server = SearchServer(problem, n_slots=slots, chunk=chunk,
                          key=jax.random.PRNGKey(0))

    # warmup: one full cycle through every slot (compiles + fills caches)
    for i in range(slots):
        server.submit(f"warmup prompt {i}", n_gen=chunk)
    server.run()
    float(np.asarray(server.state.F).sum())   # tunnel-safe fence

    n_chips = jax.device_count()
    rows = []
    for n_gen in gens:
        rates = []
        for rep in range(repeats):
            server.stats = ServerStats()
            t0 = time.perf_counter()
            for i in range(n_req):
                server.submit(f"a portrait, length {n_gen} rep {rep} "
                              f"variant {i}", n_gen=n_gen)
            server.run()
            float(np.asarray(server.state.F).sum())
            dt = time.perf_counter() - t0
            s = server.stats
            rate = s.useful_evals / dt / n_chips
            rates.append(rate)
            print(f"  gens={n_gen} rep={rep}: {rate:.1f} useful cand/s "
                  f"(incl admission "
                  f"{(s.useful_evals + s.admission_evals) / dt / n_chips:.1f},"
                  f" occupancy {s.occupancy:.3f}, wall {dt:.1f}s)",
                  file=sys.stderr, flush=True)
        med = statistics.median(rates)
        ceiling = steady * n_gen / (n_gen + 1)
        rows.append({
            "gens_per_request": n_gen,
            "repeats": repeats,
            "median_useful_cand_s": round(med, 1),
            "min": round(min(rates), 1),
            "max": round(max(rates), 1),
            "ceiling_adjusted": round(ceiling, 1),
            "pct_of_adjusted_ceiling": round(100 * med / ceiling, 1),
            "pct_of_steady": round(100 * med / steady, 1),
        })

    out = {
        "metric": (f"serving convergence curve ({name}, pop={pop}, "
                   f"{slots} slots x chunk {chunk}, {n_req} requests "
                   f"per point)"),
        "steady_state_cand_s": steady,
        "points": rows,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
