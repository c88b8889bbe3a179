#!/usr/bin/env python
"""Search-dynamics A/B: on-device engine vs a host pymoo-0.4.2-style loop.

The rebuild's GA/NSGA-II runs fully on-device with two documented departures
from the reference's pymoo loop (reference run.py:59-76):
  1. duplicate offspring are RESAMPLED from the init distribution instead of
     pymoo's re-mate-until-full retry loop (evolve/algorithm.py);
  2. StyleGAN2 noise is drawn once per search instead of per evaluation
     (the reference redraws, fitness/generator.py).
This script measures whether those change SEARCH TRAJECTORY QUALITY: N
seeded searches per engine on the TINY ffhq models, best-so-far CLIP
fitness per generation, compared as mean +/- sd across seeds with a
Welch z per generation. The host loop is built from the transcribed pymoo
oracles (tests/pymoo_oracle.py: tournaments, SBX/PM, FitnessSurvival /
RankAndCrowdingSurvival, re-mate dedup) and shares the SAME jitted fitness.

Usage: python scripts/search_dynamics_ab.py [--seeds 8] [--gens 30]
Writes a markdown table to stdout (recorded in DESIGN.md).
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def host_minimize(eval_np, config, seed, n_gen, use_nsga2):
    """pymoo-0.4.2-style host loop from the transcribed oracles: tournament
    selection (random permutation pairs), SBX + PM, re-mate duplicate
    elimination (pymoo Mating.do retry, up to 100 iterations), (mu+lambda)
    FitnessSurvival or RankAndCrowdingSurvival."""
    import pymoo_oracle as po

    rng = np.random.default_rng(seed)
    pop_size = config.pop_size
    n_var = config.n_var
    xl, xu = config.xl, config.xu

    X = rng.standard_normal((pop_size, n_var))  # NormalRandomSampling
    F = eval_np(X)
    if use_nsga2:
        _, rank, crowd = po.rank_and_crowding_survival(F, pop_size)
    best = [F[:, 0].min()]

    def pairs_from_perms(n_pick):
        n_random = n_pick * 2
        n_perms = math.ceil(n_random / pop_size)
        perm = np.concatenate([rng.permutation(pop_size)
                               for _ in range(n_perms)])[:n_random]
        return perm.reshape(n_pick, 2)

    def mate(n_off):
        off = np.empty((0, n_var))
        for _ in range(100):  # pymoo Mating.do retry loop
            need = n_off - len(off)
            if need <= 0:
                break
            n_mat = math.ceil(need / 2)
            P = pairs_from_perms(n_mat)
            tie = rng.random(n_mat) < 0.5
            if use_nsga2:
                S = po.tournament_nsga2(F, crowd, P, tie)
                P2 = pairs_from_perms(n_mat)
                S2 = po.tournament_nsga2(F, crowd, P2,
                                         rng.random(n_mat) < 0.5)
            else:
                S = po.tournament_ga(F, P, tie)
                P2 = pairs_from_perms(n_mat)
                S2 = po.tournament_ga(F, P2, rng.random(n_mat) < 0.5)
            x1, x2 = X[S], X[S2]
            m = len(x1)
            o1, o2 = po.sbx(x1, x2, xl, xu, 3.0, 1.0, 0.5,
                            rng.random((m, 1)), rng.random((m, n_var)),
                            rng.random((m, n_var)), rng.random((m, n_var)))
            cand = np.concatenate([o1, o2])[:need]
            cand = po.polynomial_mutation(cand, xl, xu, 3.0, 0.5,
                                          rng.random(cand.shape),
                                          rng.random(cand.shape))
            # DefaultDuplicateElimination vs current pop + accepted offspring
            ref = np.concatenate([X, off])
            keep = []
            for i, c in enumerate(cand):
                pool = np.concatenate([ref, cand[:i]])
                if not np.any(np.all(np.abs(pool - c) <= 1e-16, axis=1)):
                    keep.append(i)
            off = np.concatenate([off, cand[keep]])
        return off[:n_off]

    for _ in range(n_gen):
        off = mate(pop_size)
        F_off = eval_np(off)
        X_all = np.concatenate([X, off])
        F_all = np.concatenate([F, F_off])
        if use_nsga2:
            I, rank_all, crowd_all = po.rank_and_crowding_survival(
                F_all, pop_size)
            X, F = X_all[I], F_all[I]
            _, rank, crowd = po.rank_and_crowding_survival(F, pop_size)
        else:
            I = po.fitness_survival(F_all, pop_size)
            X, F = X_all[I], F_all[I]
        best.append(F[:, 0].min())
    return np.asarray(best)


def device_minimize(problem, algorithm, seed, n_gen, eval_fn=None):
    import jax
    from clip_glass_tpu.evolve.algorithm import minimize

    res = minimize(algorithm, n_gen=n_gen, key=jax.random.PRNGKey(seed),
                   save_each=1_000_000,
                   callback=None)
    return res


def run(seeds, gens):
    import jax
    import jax.numpy as jnp

    from clip_glass_tpu.config import get_config
    from clip_glass_tpu.evolve.algorithm import make_algorithm
    from clip_glass_tpu.fitness import latent as latent_mod
    from clip_glass_tpu.fitness.generator import biggan_norm
    from clip_glass_tpu.fitness.problem import GenerationProblem
    from clip_glass_tpu.models.clip import model as clip_model
    from clip_glass_tpu.models.stylegan2 import model as sg2

    rows = []
    for name, use_nsga2 in [("StyleGAN2_ffhq_nod", False),
                            ("StyleGAN2_ffhq_d", True)]:
        config = get_config(name).replace(
            target="a red flower", weights="random:0", pop_size=8,
            dim_z=32, n_var=32, compute_dtype="float32")
        problem = GenerationProblem(config, clip_cfg=clip_model.TINY,
                                    model_cfg=sg2.TINY)
        gen = problem.generator
        # random-init noise_scale is 0 (trained checkpoints learn it); bump
        # it so the fixed-vs-fresh-noise ablation actually injects noise
        for b in gen.g_params["synthesis"]["blocks"]:
            for l in b["layers"]:
                l["noise_scale"] = jnp.asarray(0.3, jnp.float32)
        ctx = gen.bundle
        evalj = jax.jit(lambda X, k=None: gen.eval_population(
            jnp.asarray(X, jnp.float32), ctx, jax.random.PRNGKey(0)))

        def eval_np(X):
            return np.asarray(evalj(X), np.float64)

        # fresh-noise fitness (the reference's semantics: noise redrawn per
        # evaluation, reference NoiseInjectionWrapper excluded from ckpts)
        def eval_fresh(X, ctx, key):
            (z,) = latent_mod.decode_stylegan2(X)
            imgs = biggan_norm(sg2.generator_apply(
                ctx["g"], z, gen.model_cfg, noise="random", noise_key=key,
                policy=gen.policy))
            sim = gen.clip_similarity(imgs, ctx)
            if config.n_obj == 2:
                d = gen.discriminate(imgs, ctx)
                hinge = jax.nn.relu(1.0 - d[:, 0])
                return jnp.stack([-sim, hinge], 1).astype(jnp.float32)
            return (-sim[:, None]).astype(jnp.float32)

        curves = {"device": [], "host": [], "fresh-noise": []}
        for s in range(seeds):
            # (a) on-device engine
            algo = problem.make_algorithm()
            from clip_glass_tpu.evolve.algorithm import minimize
            hist = []
            state = algo.init(jax.random.PRNGKey(s))
            hist.append(float(np.asarray(state.F)[:, 0].min()))
            step = jax.jit(algo.step_fn())
            for _ in range(gens):
                state = step(state, algo.ctx)
                hist.append(float(np.asarray(state.F)[:, 0].min()))
            curves["device"].append(hist)

            # (b) host pymoo-style loop, same jitted fitness
            curves["host"].append(host_minimize(
                eval_np, config, seed=s, n_gen=gens, use_nsga2=use_nsga2))

            # (c) on-device engine, fresh noise per evaluation
            algo_f = make_algorithm(config, jax.jit(eval_fresh), ctx=ctx)
            state = algo_f.init(jax.random.PRNGKey(s))
            histf = [float(np.asarray(state.F)[:, 0].min())]
            stepf = jax.jit(algo_f.step_fn())
            for _ in range(gens):
                state = stepf(state, algo_f.ctx)
                histf.append(float(np.asarray(state.F)[:, 0].min()))
            curves["fresh-noise"].append(histf)

        C = {k: np.asarray(v) for k, v in curves.items()}
        # Welch z of device vs host per generation
        md, mh = C["device"].mean(0), C["host"].mean(0)
        sd, sh = C["device"].std(0, ddof=1), C["host"].std(0, ddof=1)
        z = np.abs(md - mh) / np.sqrt(sd ** 2 / seeds + sh ** 2 / seeds + 1e-12)
        mf = C["fresh-noise"].mean(0)
        sf = C["fresh-noise"].std(0, ddof=1)
        zf = np.abs(md - mf) / np.sqrt(sd ** 2 / seeds + sf ** 2 / seeds + 1e-12)
        rows.append((name, md, sd, mh, sh, z, mf, sf, zf))

    print(f"\n## Search-dynamics A/B ({seeds} seeds, {gens} generations, "
          f"TINY models, pop 8)\n")
    print("| config | gen | device best F0 (mean+/-sd) | host-pymoo "
          "(mean+/-sd) | Welch z | fresh-noise (mean+/-sd) | z vs device |")
    print("|---|---|---|---|---|---|---|")
    for name, md, sd, mh, sh, z, mf, sf, zf in rows:
        for g in [0, gens // 4, gens // 2, gens]:
            print(f"| {name} | {g} | {md[g]:+.4f}+/-{sd[g]:.4f} "
                  f"| {mh[g]:+.4f}+/-{sh[g]:.4f} | {z[g]:.2f} "
                  f"| {mf[g]:+.4f}+/-{sf[g]:.4f} | {zf[g]:.2f} |")
        print(f"| {name} | max-z over all gens |  |  | {z.max():.2f} |  "
              f"| {zf.max():.2f} |")
    print("\nWelch z < ~2 => statistically indistinguishable at the "
          "per-generation level for this seed count.")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--gens", type=int, default=30)
    a = ap.parse_args()
    run(a.seeds, a.gens)
