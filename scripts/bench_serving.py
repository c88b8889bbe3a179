#!/usr/bin/env python
"""Measure the continuous-batching server (serving.SearchServer) under
churn on the flagship workload: R requests streamed through K resident
slots, aggregate useful candidates/s (and raw including idle-slot
padding). At full occupancy this should match the K-batched rate of
DESIGN.md §11 — the server dispatches the same compiled program; this
script verifies that equivalence end-to-end and prices the churn
overhead (admission scatters + harvest device_gets + occupancy).

  SERVE_SLOTS=8 SERVE_REQUESTS=24 python scripts/bench_serving.py
  SERVE_QUANT=int8 python scripts/bench_serving.py
"""

import json
import os
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
    n_gen = int(os.environ.get("SERVE_GENS", str(2 * chunk)))
    pop = int(os.environ.get("SERVE_POP", "16"))

    config = get_config(name).replace(
        target="the face of a man with brown eyes", weights="random:0",
        pop_size=pop, compute_dtype="bfloat16")
    if os.environ.get("SERVE_QUANT"):
        config = config.replace(quantize=os.environ["SERVE_QUANT"])
    smb = os.environ.get("SERVE_SEARCH_MB")
    problem = GenerationProblem(config)
    server = SearchServer(problem, n_slots=slots, chunk=chunk,
                          key=jax.random.PRNGKey(0),
                          search_microbatch=int(smb) if smb else None)

    # warmup: one full cycle through every slot (compiles + fills caches)
    for i in range(slots):
        server.submit(f"warmup prompt {i}", n_gen=chunk)
    server.run()
    float(np.asarray(server.state.F).sum())   # tunnel-safe fence

    server.stats = ServerStats()
    t0 = time.perf_counter()
    for i in range(n_req):
        server.submit(f"a portrait, variant {i}", n_gen=n_gen)
    server.run()
    float(np.asarray(server.state.F).sum())
    dt = time.perf_counter() - t0

    s = server.stats
    n_chips = jax.device_count()
    out = {
        "metric": (f"served_candidates_per_sec_per_chip ({name}, pop={pop}, "
                   f"{slots} slots x chunk {chunk}, {n_req} requests x "
                   f"{n_gen} gens streamed)"),
        "value": round(s.useful_evals / dt / n_chips, 1),
        "unit": "candidates/s/chip",
        "raw_incl_padding": round(s.total_evals / dt / n_chips, 1),
        # each admitted request also scores its initial population (the
        # GA's generation-0 fitness) — real served work that steady-state
        # rates amortize away; counted separately for comparability
        "incl_admission_evals": round(
            (s.useful_evals + s.admission_evals) / dt / n_chips, 1),
        "occupancy": round(s.occupancy, 4),
        "completed": s.completed,
        "dispatches": s.ticks,
        "wall_s": round(dt, 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
