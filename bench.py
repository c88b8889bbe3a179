#!/usr/bin/env python
"""Benchmark: candidates scored per second per chip on the flagship workload.

Workload = the BASELINE.md north-star: StyleGAN2_ffhq_d fitness generations —
full-size config-f synthesis at 1024px + CLIP ViT-B/32 scoring +
discriminator hinge, pop 16 (reference config.py:85-86), as complete NSGA-II
generation steps (selection, SBX/PM variation, dedup, evaluation, survival)
running as one jitted program per generation on the TPU.

Baseline: the reference PyTorch fitness pass measured on this host
(baseline_measured.json; no CUDA device exists in this environment, so the
single-GPU reference number is unapproachable here — the recorded baseline is
the same math on this host's CPU, 1 thread = 1 core).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time


def main():
    import jax

    # persistent compile cache: repeated bench runs skip the big compiles
    from clip_glass_tpu.core.backend import (enable_compile_cache,
                                             tune_tpu_compiler)
    enable_compile_cache()
    tune_tpu_compiler()  # scoped-VMEM default (measured +3.6% flagship)

    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.evolve.algorithm import GAState
    from clip_glass_tpu.fitness.problem import GenerationProblem

    name = os.environ.get("BENCH_CONFIG", "StyleGAN2_ffhq_d")
    config = get_config(name)
    pop = int(os.environ.get("BENCH_POP", str(config.pop_size
                                              if name != "StyleGAN2_ffhq_d" else 16)))
    gens = int(os.environ.get("BENCH_GENS", "10"))
    warmup = 2

    target = ("examples/gpt2_images/dog.jpeg" if config.task == "img2txt"
              else "the face of a man with brown eyes")
    config = config.replace(target=target, weights="random:0", pop_size=pop,
                            compute_dtype="bfloat16")
    # BENCH_QUANT=int8: opt-in int8 quantized fitness (ops/quant.py). The
    # default bench stays bf16 — the reference-exact arithmetic.
    if os.environ.get("BENCH_QUANT"):
        config = config.replace(quantize=os.environ["BENCH_QUANT"])
        if os.environ.get("BENCH_QUANT_MIN_CH"):
            config = config.replace(
                quantize_min_ch=int(os.environ["BENCH_QUANT_MIN_CH"]))
    # population microbatching: pops beyond the single-chip activation
    # budget evaluate in on-device chunks (lax.map), like the reference's
    # minibatch loops (reference models.py:108-118, config.py:86)
    mb = os.environ.get("BENCH_MICROBATCH")
    # pop 32 fits single-batch at 1024px since the s2d domain removed the
    # full-resolution intermediates; 32 is also the fastest measured chunk
    safe = {"StyleGAN2": 32, "DeepMindBigGAN512": 32}.get(
        "StyleGAN2" if name.startswith("StyleGAN2") else name)
    if mb:
        config = config.replace(eval_microbatch=int(mb))
    elif safe and pop > safe:
        config = config.replace(eval_microbatch=safe)
    problem = GenerationProblem(config)
    # BENCH_TARGETS=K: run K independent searches batched into one program
    # (evolve/batched.py, one target per search) and report aggregate
    # candidates/s — the multi-tenant serving configuration
    n_targets = int(os.environ.get("BENCH_TARGETS", "1"))
    if n_targets > 1:
        from clip_glass_tpu.evolve.batched import make_batched
        if config.task == "img2txt":
            targets = [target] * n_targets
        else:
            targets = [f"{target}, variant {i}" for i in range(n_targets)]
        smb = os.environ.get("BENCH_SEARCH_MB")
        algorithm = make_batched(
            problem, targets,
            search_microbatch=int(smb) if smb else None)
    else:
        algorithm = problem.make_algorithm()

    key = jax.random.PRNGKey(0)
    state = algorithm.init(key)
    jax.block_until_ready(state.F)

    import numpy as np

    ctx = algorithm.ctx
    step = (algorithm.step_fn() if algorithm.host_eval
            else jax.jit(algorithm.step_fn(), donate_argnums=0))

    # Dispatch granularity. The production driver (evolve.minimize, used by
    # the CLI) advances generations in save_each-sized chunks, each chunk ONE
    # jitted lax.fori_loop dispatch — per-generation host dispatch is not on
    # the production path. Default: measure the same chunked execution
    # (BENCH_CHUNK generations per dispatch, = gens). BENCH_CHUNK=1 restores
    # per-step dispatch (always used under BENCH_PROFILE/BENCH_DUMP_HLO so
    # trace rows and the HLO dump stay per-step).
    chunk = int(os.environ.get("BENCH_CHUNK", str(gens)))
    if os.environ.get("BENCH_PROFILE") or os.environ.get("BENCH_DUMP_HLO"):
        chunk = 1
    use_chunks = chunk > 1 and not algorithm.host_eval
    if use_chunks:
        run_chunk = algorithm._jit_chunk
        for _ in range(warmup):
            state = run_chunk(state, ctx, chunk)
    else:
        for _ in range(warmup):
            state = step(state, ctx)
    # NOTE: block_until_ready does NOT synchronize on the tunneled axon
    # backend; host materialization is the only reliable fence.
    float(np.asarray(state.F).sum())

    # BENCH_DUMP_HLO=<file>: write the compiled step's HLO text (the
    # persistent cache makes this cheap after warmup) for
    # scripts/parse_trace.py --hlo fusion attribution
    dump_hlo = os.environ.get("BENCH_DUMP_HLO")
    if dump_hlo and not algorithm.host_eval:
        with open(dump_hlo, "w") as f:
            f.write(step.lower(state, ctx).compile().as_text())

    # BENCH_PROFILE=<dir>: wrap the timed region in a jax.profiler device
    # trace (parse with scripts/parse_trace.py --steps <gens>)
    prof_dir = os.environ.get("BENCH_PROFILE")
    if prof_dir:
        jax.profiler.start_trace(prof_dir)

    # Tunnel throughput varies +-15% run-to-run (host<->device transfer
    # interference); device step time does not. Repeat the timed pass
    # (BENCH_REPEATS, default 3; 1 under profiling so the trace stays one
    # pass) and report the FASTEST — the standard throughput convention
    # for excluding external interference from a steady-state measurement.
    repeats = 1 if prof_dir else max(1, int(os.environ.get("BENCH_REPEATS", "3")))
    dt = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        if use_chunks:
            done = 0
            while done < gens:
                n = min(chunk, gens - done)
                state = run_chunk(state, ctx, n)
                done += n
        else:
            for _ in range(gens):
                state = step(state, ctx)
        # the dataflow chain through `state` forces all `gens` steps
        float(np.asarray(state.F).sum())
        dt = min(dt, time.perf_counter() - t0)
    if prof_dir:
        jax.profiler.stop_trace()

    n_chips = jax.device_count()
    cand_per_sec_per_chip = pop * n_targets * gens / dt / n_chips

    baseline = None
    bl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "baseline_measured.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            baseline = json.load(f).get("candidates_per_sec")

    desc = (f"{name}, pop={pop}, full "
            f"{'NSGA-II' if config.algorithm == 'nsga2' else 'GA'} generations")
    if n_targets > 1:
        desc += f", {n_targets} searches batched"
    out = {
        "metric": f"candidates_scored_per_sec_per_chip ({desc})",
        "value": round(cand_per_sec_per_chip, 4),
        "unit": "candidates/s/chip",
        "vs_baseline": round(cand_per_sec_per_chip / baseline, 2) if baseline else None,
    }

    # model-FLOPs accounting + MFU (core/flops.py: algorithmic work of the
    # reference-defined fitness only — execution-domain overheads count
    # against utilization, never for it)
    from clip_glass_tpu.core import flops as flops_mod
    fpc = flops_mod.fitness_flops_per_candidate(
        config, problem.generator.model_cfg, problem.generator.clip_cfg)
    kind = jax.devices()[0].device_kind
    peak = flops_mod.chip_peak_flops(kind)
    out["model_gflops_per_candidate"] = round(fpc / 1e9, 2)
    out["model_tflops_per_sec_per_chip"] = round(
        fpc * cand_per_sec_per_chip / 1e12, 2)
    out["device_kind"] = kind
    if peak:
        out["mfu"] = round(fpc * cand_per_sec_per_chip / peak, 4)

    # BENCH_CHECKSUM=1: append the final population fitness as an exactness
    # fingerprint. Compiler-flag sweeps (scripts/sweep_tpu_flags.py) compare
    # this across arms — a scheduling/fusion flag that changes the NSGA-II
    # trajectory is NOT semantics-preserving and must not become a default.
    if os.environ.get("BENCH_CHECKSUM"):
        f_final = np.asarray(state.F, dtype=np.float64)
        out["checksum_F"] = f"{float(f_final.sum()):.17g}"

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
