#!/usr/bin/env python
"""Programmatic API example: run a CLIP-guided latent search without the CLI.

The reference's workflow (reference run.py:53-125) decomposed into the
framework's own API surface: config registry -> GenerationProblem ->
on-device algorithm -> minimize -> decision -> artifact rendering. The same
calls drive any of the 9 configs; `--weights random:<seed>` style values let
it run checkpoint-free (as here), converted checkpoints slot in via
`Config.replace(weights=...)` (see scripts/download_weights.sh).

Run (CPU or TPU):
  python examples/api_search.py [--tiny]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="tiny random-weight models (seconds on CPU)")
    ap.add_argument("--out", default="./tmp_api_example")
    args = ap.parse_args()

    import jax
    import numpy as np

    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.evolve.algorithm import minimize
    from clip_glass_tpu.evolve.decision import pick
    from clip_glass_tpu.fitness.problem import GenerationProblem

    # 1. configure (reference config.py registry; overrides via replace)
    config = get_config("StyleGAN2_ffhq_d").replace(
        target="the face of a man with brown eyes", weights="random:0",
        pop_size=8)
    clip_cfg = model_cfg = None
    if args.tiny:
        from clip_glass_tpu.models.clip import model as clip_model
        from clip_glass_tpu.models.stylegan2 import model as sg2
        config = config.replace(dim_z=32, n_var=32)
        clip_cfg, model_cfg = clip_model.TINY, sg2.TINY

    # 2. build the fitness problem (loads/initializes CLIP + G + D) and the
    #    on-device NSGA-II
    problem = GenerationProblem(config, clip_cfg=clip_cfg, model_cfg=model_cfg)
    algorithm = problem.make_algorithm()

    # 3. search: each save_each-sized chunk is ONE jitted dispatch; the
    #    population never leaves HBM between generations
    res = minimize(algorithm, n_gen=8, key=jax.random.PRNGKey(0),
                   save_each=4, verbose=True)
    print(f"final population F (shape {res.pop_F.shape}): "
          f"best similarity {-res.pop_F[:, 0].min():.4f}")  # F0 = -cosine

    # 4. multi-criteria decision (reference run.py:103-113) + render —
    #    restrict to the rank-0 Pareto front first, like the CLI/reference
    #    (pseudo-weights normalizes within the set it is given, so feeding
    #    the full population could pick a dominated individual)
    from clip_glass_tpu.evolve.nds import non_dominated_rank
    front = np.asarray(non_dominated_rank(jax.numpy.asarray(res.pop_F))) == 0
    X_opt, F_opt = res.pop_X[front], res.pop_F[front]
    idx = pick(F_opt, (0, 1))
    X_best = np.atleast_2d(X_opt[idx])
    images = problem.generator.generate(jax.numpy.asarray(X_best))
    os.makedirs(args.out, exist_ok=True)
    problem.generator.save(images, os.path.join(args.out, "best.jpg"))
    print(f"wrote {args.out}/best.jpg")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
