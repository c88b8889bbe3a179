"""GA / NSGA-II generation step + search driver, fully on-device.

The reference iterates pymoo on the host, crossing host<->device twice per
generation (reference problem.py:14-29, latent.py:38). Here one generation —
tournament selection, crossover, mutation, duplicate elimination, fitness
evaluation, survival — is a single jitted function over HBM-resident state,
and `minimize` runs `save_each`-generation chunks under `lax.fori_loop` so a
whole chunk is one dispatch. The fitness evaluator is injected as
`eval_fn(X, ctx)` ([pop, n_var] -> [pop, n_obj]); `ctx` is the parameter
bundle (CLIP + generator + discriminator weights, target features) threaded
through the jit boundary explicitly — closing over it would embed hundreds
of MB of weights as program constants.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from clip_glass_tpu.parallel.distributed import fetch
from clip_glass_tpu.evolve import crossover as xo
from clip_glass_tpu.evolve import mutation as mut
from clip_glass_tpu.evolve import sampling as smp
from clip_glass_tpu.evolve.nds import crowding_distance, non_dominated_rank
from clip_glass_tpu.evolve.selection import tournament_ga, tournament_nsga2
from clip_glass_tpu.evolve.survival import fitness_survival, nsga2_survival


class GAState(NamedTuple):
    X: jnp.ndarray      # [pop, n_var] genomes (float32; bools as 0/1, ints rounded)
    F: jnp.ndarray      # [pop, n_obj] fitness
    key: jnp.ndarray    # PRNG key
    gen: jnp.ndarray    # generation counter (int32 scalar)


class Operators(NamedTuple):
    """Per-config operator closures (reference get_operators, operators.py:37-81)."""
    sample: Callable    # (key, n) -> X
    cross: Callable     # (key, x1, x2) -> (o1, o2)
    mutate: Callable    # (key, X) -> X


def operators_for_config(config) -> Operators:
    """Build the reference's per-family operator set (reference operators.py:37-81)."""
    name = config.name
    if name.startswith("DeepMindBigGAN"):
        real_mask = jnp.concatenate([
            jnp.ones((config.dim_z,), bool),
            jnp.zeros((config.num_classes,), bool)])
        return Operators(
            sample=lambda key, n: smp.mixed_biggan_sampling(
                key, n, config.dim_z, config.num_classes, bool_prob=5 / 1000),
            cross=lambda key, x1, x2: xo.mixed_crossover(
                key, x1, x2, real_mask, config.xl, config.xu,
                eta=3.0, real_prob=1.0, bool_prob=0.2),
            mutate=lambda key, x: mut.mixed_mutation(
                key, x, real_mask, config.xl, config.xu,
                eta=3.0, real_prob=0.5, bool_prob=10 / 1000),
        )
    if name.startswith("StyleGAN2"):
        return Operators(
            sample=lambda key, n: smp.normal_sampling(key, n, config.n_var),
            cross=lambda key, x1, x2: xo.sbx(
                key, x1, x2, config.xl, config.xu, eta=3.0, prob=1.0),
            mutate=lambda key, x: mut.polynomial_mutation(
                key, x, config.xl, config.xu, eta=3.0, prob=0.5),
        )
    if name == "GPT2":
        return Operators(
            sample=lambda key, n: smp.int_random_sampling(
                key, n, config.n_var, config.xl, config.xu),
            cross=lambda key, x1, x2: xo.sbx(
                key, x1, x2, config.xl, config.xu, eta=3.0, prob=1.0,
                round_int=True),
            mutate=lambda key, x: mut.polynomial_mutation(
                key, x, config.xl, config.xu, eta=3.0, prob=0.5,
                round_int=True),
        )
    raise ValueError(f"no operators for config {name!r}")


def resample_duplicates(key, off: jnp.ndarray, pop_X: jnp.ndarray,
                        sample: Callable, eps: float = 1e-16) -> jnp.ndarray:
    """Duplicate elimination with fixed shapes.

    The reference (run.py:65, pymoo eliminate_duplicates=True) discards
    duplicate offspring and re-mates until the brood is full — a data-
    dependent retry loop. The on-device equivalent replaces any offspring
    identical to a current member or an earlier sibling with a fresh sample
    from the init distribution, preserving the intent (no wasted duplicate
    evaluations, restored diversity) at fixed cost.
    """
    n = off.shape[0]
    dup_vs_pop = jnp.any(
        jnp.all(jnp.abs(off[:, None, :] - pop_X[None, :, :]) <= eps, axis=-1), axis=1)
    eq_sib = jnp.all(jnp.abs(off[:, None, :] - off[None, :, :]) <= eps, axis=-1)
    earlier = jnp.tril(jnp.ones((n, n), bool), k=-1)
    dup_vs_sib = jnp.any(eq_sib & earlier, axis=1)
    dup = dup_vs_pop | dup_vs_sib
    fresh = sample(key, n)
    return jnp.where(dup[:, None], fresh, off)


def make_step_halves(ops: Operators, pop_size: int,
                     algorithm: str = "ga") -> tuple:
    """The two jittable halves of a generation step, exposed separately so
    host-staged evaluation can run BETWEEN them — per search (make_step's
    host_eval branch) or vmapped across a whole search batch
    (evolve/batched.py's batched host eval):

      vary(state) -> (offspring, k_eval, key)
      survive(state, offspring, F_offspring, key) -> next state
    """
    if pop_size % 2:
        raise ValueError("pop_size must be even")
    n_matings = pop_size // 2
    is_nsga2 = algorithm == "nsga2"

    def _vary(state: GAState):
        key, k_sel, k_x, k_m, k_d, k_eval = jax.random.split(state.key, 6)
        if is_nsga2:
            rank = non_dominated_rank(state.F)
            crowd = crowding_distance(state.F, rank)
            pairs = tournament_nsga2(k_sel, state.F, crowd, n_matings)
        else:
            pairs = tournament_ga(k_sel, state.F, n_matings)
        x1 = state.X[pairs[:, 0]]
        x2 = state.X[pairs[:, 1]]
        o1, o2 = ops.cross(k_x, x1, x2)
        off = jnp.concatenate([o1, o2], axis=0)
        off = ops.mutate(k_m, off)
        off = resample_duplicates(k_d, off, state.X, ops.sample)
        return off, k_eval, key

    def _survive(state: GAState, off, F_off, key) -> GAState:
        X_all = jnp.concatenate([state.X, off], axis=0)
        F_all = jnp.concatenate([state.F, F_off], axis=0)
        if is_nsga2:
            X_new, F_new, _, _ = nsga2_survival(X_all, F_all, pop_size)
        else:
            X_new, F_new = fitness_survival(X_all, F_all, pop_size)
        return GAState(X_new, F_new, key, state.gen + 1)

    return _vary, _survive


def make_step(ops: Operators, eval_fn: Callable, pop_size: int,
              algorithm: str = "ga", host_eval: bool = False) -> Callable:
    """One generation: mating -> variation -> dedup -> eval -> survival.
    `step(state, ctx)`; ctx is forwarded to eval_fn.

    host_eval=False: the whole step is jittable (eval_fn must be traceable).
    host_eval=True: eval_fn runs on the host between two jitted halves —
    required for the img2txt BPE round trip on backends without
    pure_callback support (core/backend.py).
    """
    _vary, _survive = make_step_halves(ops, pop_size, algorithm)

    if not host_eval:
        def step(state: GAState, ctx=None) -> GAState:
            off, k_eval, key = _vary(state)
            return _survive(state, off, eval_fn(off, ctx, k_eval), key)
        return step

    vary_jit = jax.jit(_vary)
    survive_jit = jax.jit(_survive)

    def step(state: GAState, ctx=None) -> GAState:
        off, k_eval, key = vary_jit(state)
        F_off = eval_fn(off, ctx, k_eval)
        return survive_jit(state, off, F_off, key)

    return step


def make_algorithm(config, eval_fn: Callable, ctx=None,
                   host_eval: bool = False) -> "Algorithm":
    """eval_fn: (X, ctx, key) -> F (key: per-generation randomness
    for stochastic fitness, e.g. GPT-2 sampling or random noise modes)."""
    ops = operators_for_config(config)
    return Algorithm(ops=ops, eval_fn=eval_fn, pop_size=config.pop_size,
                     algorithm=config.algorithm, ctx=ctx, host_eval=host_eval)


@dataclasses.dataclass
class Result:
    """pymoo-shaped result (reference run.py:79-96): optimum X/F plus the
    final population; G/CV are identically zero (reference problem.py:29)."""
    X: object
    F: object
    G: object
    CV: object
    pop_X: object
    pop_F: object
    state: GAState


@dataclasses.dataclass
class Algorithm:
    ops: Operators
    eval_fn: Callable          # (X, ctx, key) -> F
    pop_size: int
    algorithm: str = "ga"
    ctx: object = None         # parameter bundle, threaded through jit
    host_eval: bool = False    # eval_fn runs on host between jitted halves

    def init(self, key) -> GAState:
        if self.host_eval:
            k_init, k_eval, key = jax.random.split(key, 3)
            X0 = jax.jit(self.ops.sample, static_argnums=1)(k_init, self.pop_size)
            F0 = self.eval_fn(X0, self.ctx, k_eval)
            return GAState(X0, F0, key, jnp.int32(0))

        # one jitted program: sampling + first evaluation; ctx enters as an
        # ARGUMENT so weights are jit inputs, never baked-in constants
        @jax.jit
        def _init(key, ctx):
            k_init, k_eval, key = jax.random.split(key, 3)
            X0 = self.ops.sample(k_init, self.pop_size)
            F0 = self.eval_fn(X0, ctx, k_eval)
            return GAState(X0, F0, key, jnp.int32(0))

        return _init(key, self.ctx)

    def step_fn(self) -> Callable:
        return make_step(self.ops, self.eval_fn, self.pop_size,
                         self.algorithm, host_eval=self.host_eval)

    @functools.cached_property
    def _jit_chunk(self):
        return make_jit_chunk(self.step_fn(), self.host_eval)


def make_jit_chunk(step: Callable, host_eval: bool) -> Callable:
    """`run_chunk(state, ctx, n_gens)`: advance n_gens generations as ONE
    jitted lax.fori_loop dispatch (host_eval: a host loop of staged steps).
    Shared by Algorithm and evolve.batched.BatchedAlgorithm."""
    if host_eval:
        def run_chunk(state: GAState, ctx, n_gens: int) -> GAState:
            for _ in range(n_gens):
                state = step(state, ctx)
            return state
        return run_chunk

    @functools.partial(jax.jit, static_argnames="n_gens", donate_argnums=0)
    def run_chunk(state: GAState, ctx, n_gens: int) -> GAState:
        return lax.fori_loop(0, n_gens, lambda _, s: step(s, ctx), state)

    return run_chunk


def extract_result(pop_X, pop_F, algorithm_name: str, state: GAState) -> "Result":
    """pymoo-shaped Result from a final population (reference run.py:79-96):
    the optimum is the rank-0 front for NSGA-II, the single best row for GA;
    G/CV identically zero (reference problem.py:29). Shared by `minimize`
    and `evolve.batched.minimize_batched`."""
    import numpy as np
    if algorithm_name == "nsga2":
        rank = jax.device_get(non_dominated_rank(jnp.asarray(pop_F)))
        opt = rank == 0
        X_opt, F_opt = pop_X[opt], pop_F[opt]
    else:
        best = pop_F[:, 0].argmin()
        X_opt, F_opt = pop_X[best], pop_F[best]
    n_opt = 1 if X_opt.ndim == 1 else X_opt.shape[0]
    return Result(X=X_opt, F=F_opt, G=np.zeros((n_opt,)),
                  CV=np.zeros((n_opt, 1)), pop_X=pop_X, pop_F=pop_F,
                  state=state)


def minimize(algorithm: Algorithm, n_gen: int, key,
             callback: Optional[Callable] = None, save_each: int = 50,
             verbose: bool = False, state: Optional[GAState] = None) -> Result:
    """Run the search (reference run.py:70-76 `minimize`).

    Generations advance in `save_each`-sized chunks, each chunk one jitted
    `lax.fori_loop` dispatch; `callback(state)` fires between chunks, matching
    the reference's save cadence (reference run.py:29-51) without pulling the
    population to the host in between.
    """
    if state is None:
        state = algorithm.init(key)
    run_chunk = algorithm._jit_chunk
    done = 0
    while done < n_gen:
        chunk = min(save_each, n_gen - done)
        state = run_chunk(state, algorithm.ctx, chunk)
        done += chunk
        if verbose:
            F = fetch(state.F)  # process_allgather when the mesh spans hosts
            print(f"gen {int(state.gen):5d}  best={F.min(0)}  mean={F.mean(0)}")
        if callback is not None:
            callback(state)

    return extract_result(fetch(state.X), fetch(state.F),
                          algorithm.algorithm, state)
