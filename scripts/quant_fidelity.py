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
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def spearman(a, b):
    import numpy as np
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    den = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / den) if den else 1.0


def search_ab(cfg, seeds, n_gen):
    """Search-OUTCOME A/B: full searches under exact vs quantized fitness,
    one per seed; reports each run's best final similarity. The GA consumes
    fitness only through comparisons, so the decision-relevant question is
    whether the quantized search CONVERGES to an equally good optimum —
    not whether intermediate values match."""
    import jax
    from clip_glass_tpu.evolve.algorithm import minimize
    from clip_glass_tpu.fitness.problem import GenerationProblem

    print(f"search-outcome A/B: {cfg.name} pop {cfg.pop_size}, "
          f"{n_gen} generations x {len(seeds)} seeds")
    best = {"bf16": [], "int8": []}
    for mode, c in (("bf16", cfg), ("int8", cfg.replace(quantize="int8"))):
        algo = GenerationProblem(c).make_algorithm()
        for seed in seeds:
            res = minimize(algo, n_gen=n_gen, key=jax.random.PRNGKey(seed),
                           save_each=n_gen)
            b = float(res.pop_F[:, 0].min())
            best[mode].append(b)
            print(f"  {mode} seed {seed}: best sim {-b:.4f}")
    import numpy as np
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
    args = ap.parse_args()

    import jax
    import numpy as np

    from clip_glass_tpu.core.backend import enable_compile_cache
    enable_compile_cache()
    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.evolve.algorithm import operators_for_config
    from clip_glass_tpu.fitness.problem import GenerationProblem

    cfg = get_config(args.config).replace(
        target="the face of a man with brown eyes", weights=args.weights,
        pop_size=args.pop_size, compute_dtype="bfloat16")
    if args.min_ch is not None:
        cfg = cfg.replace(quantize_min_ch=args.min_ch)
    if args.search_ab:
        return search_ab(cfg, list(range(args.search_ab)), args.generations)

    pb_f = GenerationProblem(cfg)
    pb_q = GenerationProblem(cfg.replace(quantize="int8"))
    ev_f = jax.jit(lambda X, c: pb_f.eval_fn()(X, c))
    ev_q = jax.jit(lambda X, c: pb_q.eval_fn()(X, c))
    sample = operators_for_config(cfg).sample

    key = jax.random.PRNGKey(42)
    Fs, Qs = [], []
    for i in range(args.pops):
        key, ks = jax.random.split(key)
        X = sample(ks, cfg.pop_size)
        Fs.append(np.asarray(ev_f(X, pb_f.generator.bundle)))
        Qs.append(np.asarray(ev_q(X, pb_q.generator.bundle)))
    F = np.concatenate(Fs)  # [pops*pop, n_obj]
    Q = np.concatenate(Qs)

    n_obj = F.shape[1]
    print(f"config={cfg.name} pop_size={cfg.pop_size} pops={args.pops} "
          f"min_ch={cfg.quantize_min_ch} margin={cfg.quantize_margin}")
    names = ["-cosine_sim", "D_hinge"][:n_obj]
    for j, nm in enumerate(names):
        d = np.abs(F[:, j] - Q[:, j])
        rho = np.mean([spearman(f[:, j], q[:, j]) for f, q in zip(Fs, Qs)])
        k = cfg.pop_size // 2
        topk = np.mean([
            len(set(np.argsort(f[:, j])[:k]) & set(np.argsort(q[:, j])[:k]))
            / k for f, q in zip(Fs, Qs)])
        print(f"  obj[{j}] {nm:12s}: max|d|={d.max():.5f} "
              f"mean|d|={d.mean():.5f} spearman={rho:.4f} "
              f"top-{k} overlap={topk:.3f}")

    if n_obj == 2:
        # survival overlap: which of the 2*pop pool members the rank+crowding
        # selection keeps, under each fitness version (X = pool indices)
        from clip_glass_tpu.evolve.survival import nsga2_survival
        import jax.numpy as jnp
        overlaps = []
        sel = jax.jit(lambda idx, f, n: nsga2_survival(idx, f, n)[0],
                      static_argnums=2)
        for f, q in zip(Fs, Qs):
            n = f.shape[0]
            pool_f = np.concatenate([f, f + 0.01 * np.abs(f) + 1e-4])
            pool_q = np.concatenate([q, q + 0.01 * np.abs(q) + 1e-4])
            idx = jnp.arange(2 * n)[:, None]
            kf = np.asarray(sel(idx, jnp.asarray(pool_f), n)).ravel()
            kq = np.asarray(sel(idx, jnp.asarray(pool_q), n)).ravel()
            overlaps.append(len(set(kf.tolist()) & set(kq.tolist())) / n)
        print(f"  NSGA-II survival selection overlap: "
              f"{float(np.mean(overlaps)):.3f}")


if __name__ == "__main__":
    main()
