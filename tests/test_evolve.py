"""Evolutionary engine tests: operator math properties (Deb's SBX/PM
formulations as used by pymoo 0.4.2 — the reference's engine, reference
operators.py:37-81), NSGA-II machinery vs a plain-numpy oracle, and
end-to-end convergence on analytic problems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_glass_tpu.config import get_config
from clip_glass_tpu.evolve import crossover as xo
from clip_glass_tpu.evolve import mutation as mut
from clip_glass_tpu.evolve import sampling as smp
from clip_glass_tpu.evolve.algorithm import (
    GAState,
    Algorithm,
    make_step,
    minimize,
    operators_for_config,
    resample_duplicates,
)
from clip_glass_tpu.evolve.nds import crowding_distance, domination_matrix, non_dominated_rank
from clip_glass_tpu.evolve.survival import fitness_survival, nsga2_survival

KEY = jax.random.PRNGKey(0)


# ---------- sampling ----------

def test_truncnorm_bounds_and_shape():
    x = smp.truncnorm_sampling(KEY, 1000, 8)
    assert x.shape == (1000, 8)
    assert float(x.min()) >= -2.0 and float(x.max()) <= 2.0
    assert abs(float(x.mean())) < 0.05


def test_binary_sampling_rate():
    x = smp.binary_sampling(KEY, 2000, 100, prob=5 / 1000)
    assert set(np.unique(np.asarray(x))) <= {0.0, 1.0}
    assert abs(float(x.mean()) - 5 / 1000) < 2e-3


def test_int_sampling_range():
    x = smp.int_random_sampling(KEY, 500, 20, 0, 50256)
    xi = np.asarray(x)
    assert (xi == np.rint(xi)).all()
    assert xi.min() >= 0 and xi.max() <= 50256


# ---------- crossover ----------

def test_sbx_children_within_bounds():
    k1, k2, k3 = jax.random.split(KEY, 3)
    x1 = jax.random.uniform(k1, (512, 16), minval=-10, maxval=10)
    x2 = jax.random.uniform(k2, (512, 16), minval=-10, maxval=10)
    c1, c2 = xo.sbx(k3, x1, x2, -10.0, 10.0, eta=3.0, prob=1.0)
    assert float(jnp.max(jnp.abs(jnp.concatenate([c1, c2])))) <= 10.0


def test_sbx_mean_preserving_in_unbounded_limit():
    # With bounds far away both children share the same spread factor
    # (alpha -> 2), making SBX symmetric about the parent mean — the classic
    # Deb formulation property.
    k1, k2, k3 = jax.random.split(KEY, 3)
    x1 = jax.random.uniform(k1, (256, 8), minval=-1, maxval=1)
    x2 = jax.random.uniform(k2, (256, 8), minval=-1, maxval=1)
    c1, c2 = xo.sbx(k3, x1, x2, -1e7, 1e7, eta=3.0, prob=1.0)
    np.testing.assert_allclose(np.asarray(c1 + c2), np.asarray(x1 + x2),
                               rtol=0, atol=1e-2)


def test_sbx_respects_mating_prob_zero():
    k1, k2, k3 = jax.random.split(KEY, 3)
    x1 = jax.random.normal(k1, (64, 8))
    x2 = jax.random.normal(k2, (64, 8))
    c1, c2 = xo.sbx(k3, x1, x2, -10.0, 10.0, prob=0.0)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(x1))
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(x2))


def test_sbx_equal_parents_unchanged():
    x = jnp.ones((8, 4)) * 0.3
    c1, c2 = xo.sbx(KEY, x, x, -1.0, 1.0)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(x))


def test_hux_swaps_exactly_half_of_differing_bits():
    k = jax.random.PRNGKey(3)
    x1 = jnp.zeros((200, 40))
    x2 = jnp.ones((200, 40))
    o1, o2 = xo.hux(k, x1, x2, prob=1.0)
    n_swapped = np.asarray((o1 != x1).sum(axis=1))
    assert (n_swapped == 20).all()  # ceil(40/2)
    # children complementary: bits conserved
    np.testing.assert_array_equal(np.asarray(o1 + o2), np.ones((200, 40)))


def test_hux_odd_diff_count():
    x1 = jnp.zeros((100, 7))
    x2 = jnp.ones((100, 7))
    o1, _ = xo.hux(jax.random.PRNGKey(4), x1, x2, prob=1.0)
    assert (np.asarray((o1 != x1).sum(axis=1)) == 4).all()  # ceil(7/2)


# ---------- mutation ----------

def test_pm_bounds_and_rate():
    x = jnp.zeros((2000, 10))
    y = mut.polynomial_mutation(KEY, x, -1.0, 1.0, eta=3.0, prob=0.5)
    ya = np.asarray(y)
    assert ya.min() >= -1.0 and ya.max() <= 1.0
    rate = (ya != 0).mean()
    assert abs(rate - 0.5) < 0.05


def test_pm_prob_zero_identity():
    x = jax.random.normal(KEY, (32, 6))
    y = mut.polynomial_mutation(jax.random.PRNGKey(1), x, -10.0, 10.0, prob=0.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_bitflip_rate():
    x = jnp.zeros((1000, 1000))
    y = mut.bitflip_mutation(KEY, x, 10 / 1000)
    assert abs(float(y.mean()) - 0.01) < 2e-3


def test_int_pm_stays_integer():
    x = jnp.asarray(np.random.default_rng(0).integers(0, 50256, (64, 20)), jnp.float32)
    y = mut.polynomial_mutation(KEY, x, 0.0, 50256.0, eta=3.0, prob=0.5, round_int=True)
    ya = np.asarray(y)
    assert (ya == np.rint(ya)).all()
    assert ya.min() >= 0 and ya.max() <= 50256


# ---------- NDS / crowding vs numpy oracle ----------

def _np_nds_ranks(F):
    n = len(F)
    D = np.zeros((n, n), bool)
    for i in range(n):
        for j in range(n):
            D[i, j] = np.all(F[i] <= F[j]) and np.any(F[i] < F[j])
    rank = np.full(n, -1)
    front = 0
    while (rank < 0).any():
        un = rank < 0
        cur = un & ~np.array([np.any(D[un, j]) for j in range(n)])
        rank[cur] = front
        front += 1
    return rank


def _np_crowding(F, rank):
    n, m = F.shape
    crowd = np.zeros(n)
    for fr in np.unique(rank):
        idx = np.where(rank == fr)[0]
        Ff = F[idx]
        if len(idx) <= 2:
            crowd[idx] = np.inf
            continue
        d = np.zeros(len(idx))
        for j in range(m):
            order = np.argsort(Ff[:, j], kind="mergesort")
            fs = Ff[order, j]
            norm = fs[-1] - fs[0]
            gaps = np.empty(len(idx))
            if norm == 0:
                gaps[:] = 0.0
            else:
                gaps[0] = np.inf
                gaps[-1] = np.inf
                gaps[1:-1] = ((fs[2:] - fs[1:-1]) + (fs[1:-1] - fs[:-2])) / norm
            d[order] += gaps
        crowd[idx] = d / m
    return crowd


def test_nds_rank_matches_numpy_oracle(rng):
    F = jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32))
    got = np.asarray(non_dominated_rank(F))
    want = _np_nds_ranks(np.asarray(F))
    np.testing.assert_array_equal(got, want)


def test_nds_rank_three_objectives(rng):
    F = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(non_dominated_rank(F)),
                                  _np_nds_ranks(np.asarray(F)))


def test_nds_chain_lengths_equal_peeling(rng):
    """The default log-depth max-plus ranking == the direct peeling
    transcription, across sizes (incl. the n<=2 special case), objective
    counts, duplicated rows, and a fully-ordered chain (worst-case depth)."""
    from clip_glass_tpu.evolve.nds import _rank_by_chain_lengths, _rank_by_peeling

    cases = [rng.normal(size=(n, m)).astype(np.float32)
             for n, m in [(1, 2), (2, 2), (3, 2), (32, 2), (33, 3), (64, 2)]]
    dup = rng.normal(size=(12, 2)).astype(np.float32)
    cases.append(np.repeat(dup, 3, axis=0))                 # many exact duplicates
    chain = np.arange(24, dtype=np.float32)[:, None] * np.ones((1, 2), np.float32)
    cases.append(chain)                                      # 24 singleton fronts
    for F in cases:
        F = jnp.asarray(F)
        np.testing.assert_array_equal(np.asarray(_rank_by_chain_lengths(F)),
                                      np.asarray(_rank_by_peeling(F)))


def test_crowding_matches_numpy_oracle(rng):
    F = jnp.asarray(rng.normal(size=(48, 2)).astype(np.float32))
    rank = non_dominated_rank(F)
    got = np.asarray(crowding_distance(F, rank))
    want = _np_crowding(np.asarray(F), np.asarray(rank))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_domination_matrix_simple():
    F = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [1.0, 0.0]])
    D = np.asarray(domination_matrix(F))
    assert D[0, 1] and D[0, 2] and D[0, 3]
    assert not D[2, 3] and not D[3, 2]
    assert not D.diagonal().any()


# ---------- survival ----------

def test_fitness_survival_keeps_best():
    X = jnp.arange(20, dtype=jnp.float32)[:, None]
    F = X.copy()
    Xs, Fs = fitness_survival(X, F, 8)
    np.testing.assert_array_equal(np.asarray(Fs[:, 0]), np.arange(8))


def test_nsga2_survival_front_then_crowding(rng):
    F = jnp.asarray(rng.normal(size=(32, 2)).astype(np.float32))
    X = jnp.arange(32, dtype=jnp.float32)[:, None]
    Xs, Fs, rank_s, crowd_s = nsga2_survival(X, F, 16)
    full_rank = np.asarray(non_dominated_rank(F))
    kept = np.asarray(Xs[:, 0]).astype(int)
    max_kept_rank = full_rank[kept].max()
    dropped = np.setdiff1d(np.arange(32), kept)
    # no dropped individual has strictly better rank than a kept one
    assert (full_rank[dropped] >= max_kept_rank).all()


# ---------- dedup ----------

def test_resample_duplicates():
    pop = jnp.asarray(np.random.default_rng(1).normal(size=(8, 4)).astype(np.float32))
    off = jnp.concatenate([pop[:2], pop[2:4] + 1.0, pop[:1] + 1.0, pop[:1] + 1.0,
                           pop[4:6] + 3.0])
    out = resample_duplicates(KEY, off, pop, lambda k, n: smp.normal_sampling(k, n, 4))
    outa, offa = np.asarray(out), np.asarray(off)
    assert not (outa[0] == offa[0]).all()          # dup of pop -> resampled
    assert not (outa[1] == offa[1]).all()
    assert (outa[2:4] == offa[2:4]).all()          # unique -> untouched
    assert (outa[4] == offa[4]).all()              # first of twin pair kept
    assert not (outa[5] == offa[5]).all()          # second twin resampled


# ---------- end-to-end convergence ----------

def test_ga_minimizes_sphere():
    cfg = get_config("StyleGAN2_ffhq_nod").replace(pop_size=32, n_var=16)
    ops = operators_for_config(cfg)

    def eval_fn(X, ctx=None, key=None):
        return jnp.sum(X ** 2, axis=1, keepdims=True)

    algo = Algorithm(ops=ops, eval_fn=eval_fn, pop_size=32, algorithm="ga")
    res = minimize(algo, n_gen=60, key=jax.random.PRNGKey(7), save_each=60)
    assert res.pop_F.min() < 8.0  # 16-dim N(0,1) init has E[f]=16
    assert res.F.shape == (1,)


def test_nsga2_finds_pareto_front():
    # Schaffer problem F1: f1 = x^2, f2 = (x-2)^2, pareto set x in [0, 2]
    cfg = get_config("StyleGAN2_ffhq_d").replace(pop_size=32, n_var=8)
    ops = operators_for_config(cfg)

    def eval_fn(X, ctx=None, key=None):
        x = X[:, 0]
        return jnp.stack([x ** 2, (x - 2.0) ** 2], axis=1)

    algo = Algorithm(ops=ops, eval_fn=eval_fn, pop_size=32, algorithm="nsga2")
    res = minimize(algo, n_gen=40, key=jax.random.PRNGKey(9), save_each=40)
    x_front = res.X[:, 0]
    assert res.X.ndim == 2
    assert (x_front > -0.5).all() and (x_front < 2.5).all()
    # front should cover a spread, not collapse to one point
    assert x_front.max() - x_front.min() > 0.5


def test_step_is_jittable_and_improves():
    cfg = get_config("DeepMindBigGAN256").replace(pop_size=16)
    ops = operators_for_config(cfg)

    def eval_fn(X, ctx=None, key=None):
        z = X[:, :128]
        return jnp.sum((z - 0.5) ** 2, axis=1, keepdims=True)

    step = jax.jit(make_step(ops, eval_fn, 16, "ga"))
    key = jax.random.PRNGKey(0)
    X0 = ops.sample(key, 16)
    state = GAState(X0, eval_fn(X0), key, jnp.int32(0))
    f0 = float(state.F.min())
    for _ in range(30):
        state = step(state)
    assert float(state.F.min()) < f0
    assert int(state.gen) == 30
