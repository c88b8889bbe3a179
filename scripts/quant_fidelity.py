#!/usr/bin/env python
"""Fitness fidelity of the int8 quantized mode (ops/quant.py) vs bf16.

Evaluates the SAME populations under the exact (bf16) and quantized (int8)
fitness and reports, per objective:
  - value error statistics (max / mean absolute difference),
  - Spearman rank correlation (the GA consumes fitness only through
    comparisons, so rank fidelity is the quantity that matters),
  - top-k selection overlap (k = pop/2, the survival cut), and
  - for NSGA-II configs, the overlap of the (mu+lambda) survival selection
    the two fitness versions induce on a combined parent+offspring pool.

Defaults exercise the flagship StyleGAN2_ffhq_d at full size with random
weights (identical arithmetic/FLOPs to pretrained); pass --weights to
measure on real checkpoints.

Usage:
  python scripts/quant_fidelity.py [--config StyleGAN2_ffhq_d] [--pops 4]
                                   [--pop-size 16] [--weights random:0]

Promotion gate (DESIGN.md §10): `--gate` runs ALL four criteria and emits
ONE JSON verdict line on stdout (progress goes to stderr) — per-criterion
PASS/FAIL against the recorded thresholds, or BLOCKED when the run is on
random weights (the criteria are distribution-sensitive; only pretrained
checkpoints can decide promotion — each BLOCKED criterion still reports
its measured value and what it WOULD decide). A user with real weights
runs exactly:

  python scripts/quant_fidelity.py --gate --weights path/to/ckpt \
      [--gate-seeds 5] [--generations 200]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# DESIGN.md §10 promotion-gate thresholds
GATE = {
    "rank_spearman_min": 0.90,       # criterion 1, min over >=4 pops
    "topk_overlap_min": 0.85,        # criterion 2 (survival cut, top pop/2)
    "survival_overlap_min": 0.85,    # criterion 2 (NSGA-II mu+lambda)
    "ab_min_seeds": 5,               # criterion 3, seeds x 200 generations
    "ab_seed_spread_factor": 1.5,    # criterion 3, worst single seed
    "saturation_ratio_max": 1.0,     # criterion 4, fresh absmax / scale
}


def spearman(a, b):
    import numpy as np
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    den = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / den) if den else 1.0


# --------------------------------------------------------------- collectors
#
# Each collector measures one DESIGN.md §10 gate input and returns plain
# floats/lists; `gate_verdict` below is a pure function of those, so the
# threshold logic is unit-testable without a TPU run.

def collect_fidelity(cfg, pops, pb_kwargs=None, log=print):
    """Criteria 1-2 inputs: per-population Spearman / top-k overlap of every
    objective under exact vs int8 fitness, plus the NSGA-II (mu+lambda)
    survival-selection overlap for 2-objective configs."""
    import jax
    import numpy as np
    from clip_glass_tpu.evolve.algorithm import operators_for_config
    from clip_glass_tpu.fitness.problem import GenerationProblem

    kw = pb_kwargs or {}
    pb_f = GenerationProblem(cfg, **kw)
    pb_q = GenerationProblem(cfg.replace(quantize="int8"), **kw)
    ev_f = jax.jit(lambda X, c: pb_f.eval_fn()(X, c))
    ev_q = jax.jit(lambda X, c: pb_q.eval_fn()(X, c))
    sample = operators_for_config(cfg).sample

    key = jax.random.PRNGKey(42)
    Fs, Qs = [], []
    for i in range(pops):
        key, ks = jax.random.split(key)
        X = sample(ks, cfg.pop_size)
        Fs.append(np.asarray(ev_f(X, pb_f.generator.bundle)))
        Qs.append(np.asarray(ev_q(X, pb_q.generator.bundle)))
        log(f"  fidelity pop {i + 1}/{pops} evaluated")
    F = np.concatenate(Fs)  # [pops*pop, n_obj]
    Q = np.concatenate(Qs)

    n_obj = F.shape[1]
    k = cfg.pop_size // 2
    objectives = []
    for j in range(n_obj):
        d = np.abs(F[:, j] - Q[:, j])
        objectives.append({
            "max_abs_d": float(d.max()),
            "mean_abs_d": float(d.mean()),
            "spearman_per_pop": [spearman(f[:, j], q[:, j])
                                 for f, q in zip(Fs, Qs)],
            "topk_per_pop": [
                len(set(np.argsort(f[:, j])[:k]) & set(np.argsort(q[:, j])[:k]))
                / k for f, q in zip(Fs, Qs)],
        })

    survival = None
    if n_obj == 2:
        # survival overlap: which of the 2*pop pool members the rank+crowding
        # selection keeps, under each fitness version (X = pool indices)
        from clip_glass_tpu.evolve.survival import nsga2_survival
        import jax.numpy as jnp
        survival = []
        sel = jax.jit(lambda idx, f, n: nsga2_survival(idx, f, n)[0],
                      static_argnums=2)
        for f, q in zip(Fs, Qs):
            n = f.shape[0]
            pool_f = np.concatenate([f, f + 0.01 * np.abs(f) + 1e-4])
            pool_q = np.concatenate([q, q + 0.01 * np.abs(q) + 1e-4])
            idx = jnp.arange(2 * n)[:, None]
            kf = np.asarray(sel(idx, jnp.asarray(pool_f), n)).ravel()
            kq = np.asarray(sel(idx, jnp.asarray(pool_q), n)).ravel()
            survival.append(len(set(kf.tolist()) & set(kq.tolist())) / n)

    return {"pops": pops, "pop_size": cfg.pop_size, "k": k, "n_obj": n_obj,
            "objectives": objectives, "survival_overlap_per_pop": survival}


def collect_ab(cfg, seeds, n_gen, pb_kwargs=None, log=print):
    """Criterion 3 input: full searches under exact vs quantized fitness,
    one per seed; returns each run's best final F[:, 0] (minimized -sim).
    The GA consumes fitness only through comparisons, so the
    decision-relevant question is whether the quantized search CONVERGES
    to an equally good optimum — not whether intermediate values match."""
    import jax
    from clip_glass_tpu.evolve.algorithm import minimize
    from clip_glass_tpu.fitness.problem import GenerationProblem

    kw = pb_kwargs or {}
    log(f"search-outcome A/B: {cfg.name} pop {cfg.pop_size}, "
        f"{n_gen} generations x {len(seeds)} seeds")
    best = {"bf16": [], "int8": []}
    for mode, c in (("bf16", cfg), ("int8", cfg.replace(quantize="int8"))):
        algo = GenerationProblem(c, **kw).make_algorithm()
        for seed in seeds:
            res = minimize(algo, n_gen=n_gen, key=jax.random.PRNGKey(seed),
                           save_each=n_gen)
            b = float(res.pop_F[:, 0].min())
            best[mode].append(b)
            log(f"  {mode} seed {seed}: best sim {-b:.4f}")
    return best


def collect_saturation(cfg, pb_kwargs=None, fresh_seed=20260819, log=print):
    """Criterion 4 input: re-record each eligible conv's input absmax on a
    FRESH population (a seed the calibration never saw) and compare to the
    calibrated static scales (which already include quantize_margin).
    max_ratio <= 1 means no eligible call site saturates off-calibration."""
    import jax
    import numpy as np
    from clip_glass_tpu.evolve.algorithm import operators_for_config
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.ops import quant

    kw = pb_kwargs or {}
    pb_q = GenerationProblem(cfg.replace(quantize="int8"), **kw)
    gen = pb_q.generator
    scales = gen._quant_scales
    if scales is None:
        log("  saturation: no eligible conv call sites (structural no-op)")
        return {"eligible_sites": 0, "max_ratio": 0.0, "mean_ratio": 0.0}

    n = cfg.eval_microbatch or cfg.pop_size
    sample = operators_for_config(cfg).sample

    def fresh_absmax(k, bundle):
        ks, ke = jax.random.split(k)
        X0 = sample(ks, n)
        with quant.calibration(cfg.quantize_min_ch) as records:
            F = gen._eval_batch_raw(X0, bundle, ke)
        return F, list(records)

    _, recs = jax.jit(fresh_absmax)(jax.random.PRNGKey(fresh_seed),
                                    gen.bundle)
    fresh = np.asarray(jax.device_get(recs), np.float64)
    base = np.asarray(scales, np.float64)
    # scale == 0 marks a dead/degenerate calibration site that runs float
    # (ops/quant.py conv_hook) — it cannot saturate
    ratios = np.where(base > 0, fresh / np.maximum(base, 1e-30), 0.0)
    log(f"  saturation: {len(base)} call sites, fresh/scale max "
        f"{ratios.max():.4f} mean {ratios.mean():.4f}")
    return {"eligible_sites": int(len(base)),
            "max_ratio": float(ratios.max()),
            "mean_ratio": float(ratios.mean())}


# ------------------------------------------------------------ gate verdict

def gate_verdict(meas, pretrained):
    """Pure DESIGN.md §10 threshold logic: measurements -> verdict dict.

    pretrained=False (random weights) marks every criterion BLOCKED —
    the criteria are distribution-sensitive, so random-weight numbers
    cannot decide promotion — but each still carries its measured value
    and what it WOULD decide, so nothing silently passes."""
    import numpy as np

    t = GATE
    crits = []

    def crit(name, measured, threshold, ok, detail=""):
        c = {"criterion": name, "measured": measured, "threshold": threshold,
             "would": "PASS" if ok else "FAIL",
             "status": ("PASS" if ok else "FAIL") if pretrained
             else "BLOCKED"}
        if not pretrained:
            c["note"] = ("pretrained checkpoint required — criteria are "
                         "distribution-sensitive (DESIGN.md §10)")
        if detail:
            c["detail"] = detail
        crits.append(c)

    # 1. rank fidelity: similarity-objective Spearman >= 0.90 PER population
    sp = meas["fidelity"]["objectives"][0]["spearman_per_pop"]
    v = float(min(sp))
    detail = f"min over {len(sp)} pops (mean {float(np.mean(sp)):.4f})"
    ok = v >= t["rank_spearman_min"]
    if len(sp) < 4:
        ok = False
        detail += "; gate requires >= 4 independent pops"
    crit("rank_fidelity", round(v, 4), t["rank_spearman_min"], ok, detail)

    # 2. selection fidelity: survival-cut overlap, + NSGA-II mu+lambda
    topk = float(np.mean(meas["fidelity"]["objectives"][0]["topk_per_pop"]))
    surv = meas["fidelity"]["survival_overlap_per_pop"]
    measured = {"topk_overlap": round(topk, 4)}
    threshold = {"topk_overlap": t["topk_overlap_min"]}
    ok = topk >= t["topk_overlap_min"]
    if surv is not None:
        sv = float(np.mean(surv))
        measured["survival_overlap"] = round(sv, 4)
        threshold["survival_overlap"] = t["survival_overlap_min"]
        ok = ok and sv >= t["survival_overlap_min"]
    crit("selection_fidelity", measured, threshold, ok,
         f"top-{meas['fidelity']['k']} cut"
         + ("" if surv is None else " + NSGA-II (mu+lambda) survival"))

    # 3. outcome A/B: mean delta within the bf16 seed spread; worst seed
    #    within 1.5x of it
    b = np.asarray(meas["ab"]["bf16"], np.float64)  # best F (minimized -sim)
    q = np.asarray(meas["ab"]["int8"], np.float64)
    spread = float(b.max() - b.min())
    delta_sim = b - q  # positive = int8 converged to a BETTER similarity
    worst = float(np.maximum(0.0, -delta_sim).max())
    mean_d = float(delta_sim.mean())
    ok = abs(mean_d) <= spread and worst <= t["ab_seed_spread_factor"] * spread
    detail = f"{len(b)} seeds"
    if len(b) < t["ab_min_seeds"]:
        ok = False
        detail += f"; gate requires >= {t['ab_min_seeds']} seeds"
    crit("outcome_ab",
         {"mean_delta_sim": round(mean_d, 5),
          "worst_seed_regression": round(worst, 5),
          "bf16_seed_spread": round(spread, 5)},
         {"abs_mean_delta_max": round(spread, 5),
          "worst_regression_max": round(
              t["ab_seed_spread_factor"] * spread, 5)},
         ok, detail)

    # 4. calibration stability: no eligible conv saturates on a fresh pop
    sat = meas["saturation"]
    if sat["eligible_sites"] == 0:
        crit("calibration_saturation", 0.0, t["saturation_ratio_max"], True,
             "no eligible conv call sites — int8 is a structural no-op "
             "for this config")
    else:
        crit("calibration_saturation", round(sat["max_ratio"], 4),
             t["saturation_ratio_max"],
             sat["max_ratio"] <= t["saturation_ratio_max"],
             f"{sat['eligible_sites']} call sites, fresh-population "
             f"absmax / calibrated scale")

    overall = ("BLOCKED" if not pretrained
               else "PASS" if all(c["status"] == "PASS" for c in crits)
               else "FAIL")
    return {"gate": "int8-promotion", "pretrained": pretrained,
            "overall": overall, "criteria": crits}


def run_gate(cfg, args, pb_kwargs=None, log=None):
    """Collect all four §10 measurements and print ONE JSON verdict line."""
    if log is None:
        def log(*a, **k):
            print(*a, file=sys.stderr, **k)
    pretrained = not str(cfg.weights).startswith("random")
    log(f"int8 promotion gate: config={cfg.name} weights={cfg.weights} "
        f"pretrained={pretrained}")
    meas = {
        "fidelity": collect_fidelity(cfg, args.pops, pb_kwargs, log=log),
        "ab": collect_ab(cfg, list(range(args.gate_seeds)), args.generations,
                         pb_kwargs, log=log),
        "saturation": collect_saturation(cfg, pb_kwargs, log=log),
    }
    verdict = gate_verdict(meas, pretrained)
    verdict["config"] = cfg.name
    verdict["weights"] = str(cfg.weights)
    print(json.dumps(verdict))
    return verdict


# ----------------------------------------------------------------- reports

def search_ab(cfg, seeds, n_gen):
    import numpy as np
    best = collect_ab(cfg, seeds, n_gen)
    db = np.asarray(best["int8"]) - np.asarray(best["bf16"])
    print(f"  best-sim delta int8-vs-bf16 per seed (positive = int8 "
          f"better): {np.array2string(-db, precision=4)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="StyleGAN2_ffhq_d")
    ap.add_argument("--pops", type=int, default=4,
                    help="number of independent populations to evaluate")
    ap.add_argument("--pop-size", type=int, default=16)
    ap.add_argument("--weights", default="random:0")
    ap.add_argument("--min-ch", type=int, default=None,
                    help="override quantize_min_ch")
    ap.add_argument("--search-ab", type=int, default=0, metavar="N_SEEDS",
                    help="instead of value/rank fidelity, run full-search "
                         "outcome A/Bs over this many seeds")
    ap.add_argument("--generations", type=int, default=200)
    ap.add_argument("--gate", action="store_true",
                    help="run ALL four DESIGN.md §10 promotion criteria and "
                         "emit one JSON verdict line (PASS/FAIL per "
                         "criterion; BLOCKED on random weights)")
    ap.add_argument("--gate-seeds", type=int, default=5,
                    help="A/B seeds for the --gate outcome criterion")
    args = ap.parse_args()

    import numpy as np

    from clip_glass_tpu.core.backend import (enable_compile_cache,
                                             tune_tpu_compiler)
    enable_compile_cache()
    tune_tpu_compiler()
    from clip_glass_tpu.config import get_config

    cfg = get_config(args.config).replace(
        target="the face of a man with brown eyes", weights=args.weights,
        pop_size=args.pop_size, compute_dtype="bfloat16")
    if args.min_ch is not None:
        cfg = cfg.replace(quantize_min_ch=args.min_ch)
    if args.gate:
        return run_gate(cfg, args)
    if args.search_ab:
        return search_ab(cfg, list(range(args.search_ab)), args.generations)

    fid = collect_fidelity(cfg, args.pops, log=lambda *a, **k: None)
    print(f"config={cfg.name} pop_size={cfg.pop_size} pops={args.pops} "
          f"min_ch={cfg.quantize_min_ch} margin={cfg.quantize_margin}")
    names = ["-cosine_sim", "D_hinge"][:fid["n_obj"]]
    for j, nm in enumerate(names):
        o = fid["objectives"][j]
        print(f"  obj[{j}] {nm:12s}: max|d|={o['max_abs_d']:.5f} "
              f"mean|d|={o['mean_abs_d']:.5f} "
              f"spearman={float(np.mean(o['spearman_per_pop'])):.4f} "
              f"top-{fid['k']} overlap="
              f"{float(np.mean(o['topk_per_pop'])):.3f}")
    if fid["survival_overlap_per_pop"] is not None:
        print(f"  NSGA-II survival selection overlap: "
              f"{float(np.mean(fid['survival_overlap_per_pop'])):.3f}")


if __name__ == "__main__":
    main()
