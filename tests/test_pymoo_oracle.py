"""Element-level agreement of evolve/* with transcribed pymoo 0.4.2 oracles
(tests/pymoo_oracle.py) under MATCHED randomness: each test re-derives the
exact uniforms the on-device op draws (same key-split order) and feeds them
to the numpy transcription, so operator outputs are compared element-wise —
SURVEY.md hard part #4 ("validate against recorded traces") covered by
construction instead of a recorded pymoo session.

Reference wiring under test: operators.py:37-81 (per-family operator sets),
run.py:59-76 (GA/NSGA-II tournaments + survival).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pymoo_oracle as po
from clip_glass_tpu.evolve import crossover as xo
from clip_glass_tpu.evolve import mutation as mut
from clip_glass_tpu.evolve import nds
from clip_glass_tpu.evolve import selection as sel
from clip_glass_tpu.evolve import survival as srv

M, NVAR = 12, 9
XL, XU = -3.0, 4.0


def _u(key, shape):
    return np.asarray(jax.random.uniform(key, shape), np.float64)


@pytest.fixture
def parents(rng):
    x1 = rng.uniform(XL, XU, size=(M, NVAR)).astype(np.float32)
    x2 = rng.uniform(XL, XU, size=(M, NVAR)).astype(np.float32)
    x2[0] = x1[0]          # equal-parent row: 1e-14 skip must fire
    x2[1, :4] = x1[1, :4]  # partially equal genes
    return x1, x2


@pytest.mark.parametrize("prob,ppv", [(1.0, 0.5), (0.9, 0.5), (0.3, 1.0)])
def test_sbx_matches_pymoo(parents, prob, ppv):
    x1, x2 = parents
    key = jax.random.PRNGKey(11)
    o1, o2 = xo.sbx(key, jnp.asarray(x1), jnp.asarray(x2), XL, XU,
                    eta=3.0, prob=prob, prob_per_variable=ppv)

    # re-derive the op's uniforms (same split order as evolve/crossover.sbx)
    k_mate, k_var, k_beta, k_swap = jax.random.split(key, 4)
    e1, e2 = po.sbx(x1, x2, XL, XU, 3.0, prob, ppv,
                    _u(k_mate, (M, 1)), _u(k_var, (M, NVAR)),
                    _u(k_beta, (M, NVAR)), _u(k_swap, (M, NVAR)))
    np.testing.assert_allclose(np.asarray(o1), e1, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(o2), e2, rtol=2e-5, atol=2e-5)


def test_sbx_int_rounds_like_pymoo(parents):
    x1, x2 = np.rint(parents[0]), np.rint(parents[1])
    key = jax.random.PRNGKey(5)
    o1, o2 = xo.sbx(key, jnp.asarray(x1), jnp.asarray(x2), XL, XU,
                    eta=3.0, prob=1.0, round_int=True)
    k_mate, k_var, k_beta, k_swap = jax.random.split(key, 4)
    e1, e2 = po.sbx(x1, x2, XL, XU, 3.0, 1.0, 0.5,
                    _u(k_mate, (M, 1)), _u(k_var, (M, NVAR)),
                    _u(k_beta, (M, NVAR)), _u(k_swap, (M, NVAR)))
    np.testing.assert_array_equal(np.asarray(o1), np.rint(e1))
    np.testing.assert_array_equal(np.asarray(o2), np.rint(e2))


def test_hux_matches_pymoo(rng):
    x1 = (rng.random((M, NVAR)) < 0.5).astype(np.float32)
    x2 = (rng.random((M, NVAR)) < 0.5).astype(np.float32)
    key = jax.random.PRNGKey(7)
    o1, o2 = xo.hux(key, jnp.asarray(x1), jnp.asarray(x2), prob=0.6)
    k_mate, k_score = jax.random.split(key)
    e1, e2 = po.hux(x1, x2, 0.6, _u(k_mate, (M, 1)), _u(k_score, (M, NVAR)))
    np.testing.assert_array_equal(np.asarray(o1), e1)
    np.testing.assert_array_equal(np.asarray(o2), e2)


@pytest.mark.parametrize("prob", [0.5, 1.0])
def test_polynomial_mutation_matches_pymoo(rng, prob):
    x = rng.uniform(XL, XU, size=(M, NVAR)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    out = mut.polynomial_mutation(key, jnp.asarray(x), XL, XU, eta=3.0,
                                  prob=prob)
    k_do, k_rand = jax.random.split(key)
    want = po.polynomial_mutation(x, XL, XU, 3.0, prob,
                                  _u(k_do, (M, NVAR)), _u(k_rand, (M, NVAR)))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-5, atol=2e-5)


def test_bitflip_matches_pymoo(rng):
    x = (rng.random((M, NVAR)) < 0.5).astype(np.float32)
    key = jax.random.PRNGKey(9)
    out = mut.bitflip_mutation(key, jnp.asarray(x), prob=0.3)
    want = po.bitflip_mutation(x, 0.3, _u(key, (M, NVAR)))
    np.testing.assert_array_equal(np.asarray(out), want)


def test_mixed_ops_match_pymoo(rng):
    """BigGAN mixed-variable masking (reference operators.py:38-64): SBX/PM
    on the real genes, HUX/bitflip on the bool genes."""
    n_real, n_bool = 5, 7
    n = n_real + n_bool
    mask = np.concatenate([np.ones(n_real, bool), np.zeros(n_bool, bool)])
    x1 = np.concatenate([rng.uniform(-2, 2, (M, n_real)),
                         (rng.random((M, n_bool)) < 0.5)], 1).astype(np.float32)
    x2 = np.concatenate([rng.uniform(-2, 2, (M, n_real)),
                         (rng.random((M, n_bool)) < 0.5)], 1).astype(np.float32)

    key = jax.random.PRNGKey(21)
    o1, o2 = xo.mixed_crossover(key, jnp.asarray(x1), jnp.asarray(x2),
                                jnp.asarray(mask), -2.0, 2.0,
                                eta=3.0, real_prob=1.0, bool_prob=0.2)
    k1, k2 = jax.random.split(key)
    km, kv, kb, ks = jax.random.split(k1, 4)
    r1, r2 = po.sbx(x1, x2, -2.0, 2.0, 3.0, 1.0, 0.5,
                    _u(km, (M, 1)), _u(kv, (M, n)), _u(kb, (M, n)),
                    _u(ks, (M, n)))
    km2, ksc = jax.random.split(k2)
    b1, b2 = po.hux(x1, x2, 0.2, _u(km2, (M, 1)), _u(ksc, (M, n)))
    e1 = np.where(mask, r1, b1)
    e2 = np.where(mask, r2, b2)
    np.testing.assert_allclose(np.asarray(o1), e1, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(o2), e2, rtol=2e-5, atol=2e-5)

    key = jax.random.PRNGKey(22)
    om = mut.mixed_mutation(key, jnp.asarray(x1), jnp.asarray(mask),
                            -2.0, 2.0, eta=3.0, real_prob=0.5,
                            bool_prob=0.01)
    k1, k2 = jax.random.split(key)
    kd, kr = jax.random.split(k1)
    rm = po.polynomial_mutation(x1, -2.0, 2.0, 3.0, 0.5,
                                _u(kd, (M, n)), _u(kr, (M, n)))
    bm = po.bitflip_mutation(x1, 0.01, _u(k2, (M, n)))
    em = np.where(mask, rm, bm)
    np.testing.assert_allclose(np.asarray(om), em, rtol=2e-5, atol=2e-5)


# ------------------------------------------------------------ selection

def test_tournament_ga_matches_pymoo(rng):
    n_pop, n_select = 10, 5
    F = rng.normal(size=(n_pop, 1)).astype(np.float32)
    F[3] = F[7]  # fitness tie -> random winner branch
    key = jax.random.PRNGKey(13)
    got = np.asarray(sel.tournament_ga(key, jnp.asarray(F), n_select))

    k_pairs, k_tie = jax.random.split(key)
    pairs = np.asarray(sel._permutation_pairs(k_pairs, n_pop, n_select * 2))
    tie = np.asarray(jax.random.bernoulli(k_tie, 0.5, (n_select * 2,)))
    want = po.tournament_ga(F, pairs, tie).reshape(n_select, 2)
    np.testing.assert_array_equal(got, want)


def test_tournament_nsga2_matches_pymoo(rng):
    n_pop, n_select = 12, 6
    F = rng.normal(size=(n_pop, 2)).astype(np.float32)
    rank = nds.non_dominated_rank(jnp.asarray(F))
    crowd = np.asarray(nds.crowding_distance(jnp.asarray(F), rank))
    key = jax.random.PRNGKey(17)
    got = np.asarray(sel.tournament_nsga2(key, jnp.asarray(F),
                                          jnp.asarray(crowd), n_select))

    k_pairs, k_tie = jax.random.split(key)
    pairs = np.asarray(sel._permutation_pairs(k_pairs, n_pop, n_select * 2))
    tie = np.asarray(jax.random.bernoulli(k_tie, 0.5, (n_select * 2,)))
    want = po.tournament_nsga2(F, crowd, pairs, tie).reshape(n_select, 2)
    np.testing.assert_array_equal(got, want)


# ------------------------------------------------------------ survival

def test_crowding_matches_pymoo_including_duplicates(rng):
    """The crowding formula incl. pymoo's zero-gap inheritance quirk:
    duplicated objective values inherit the adjacent distinct gaps."""
    F = rng.normal(size=(14, 2)).astype(np.float64)
    F[5] = F[9]          # exact duplicate pair
    F[2, 0] = F[11, 0]   # duplicate in one objective only
    fronts = po.fast_non_dominated_sort(F)
    rank = np.asarray(nds.non_dominated_rank(jnp.asarray(F)))
    for k, front in enumerate(fronts):
        np.testing.assert_array_equal(rank[front], k)
    got = np.asarray(nds.crowding_distance(jnp.asarray(F),
                                           jnp.asarray(rank)))
    for front in fronts:
        want = po.calc_crowding_distance(F[front])
        np.testing.assert_allclose(got[front], want, rtol=1e-5, atol=1e-6)


def test_fitness_survival_matches_pymoo(rng):
    n, keep = 16, 8
    F = rng.normal(size=(n, 1)).astype(np.float32)
    F[2] = F[6]  # stable-order tie
    X = rng.normal(size=(n, 4)).astype(np.float32)
    Xk, Fk = srv.fitness_survival(jnp.asarray(X), jnp.asarray(F), keep)
    I = po.fitness_survival(F, keep)
    np.testing.assert_array_equal(np.asarray(Xk), X[I])
    np.testing.assert_array_equal(np.asarray(Fk), F[I])


def test_nsga2_survival_matches_pymoo(rng):
    """RankAndCrowdingSurvival selects the same individuals (whole fronts +
    crowding-descending split of the overflow front). Equal-crowding ties in
    the splitting front are pymoo-randomized vs index-ordered here, so the
    test uses tie-free data and compares the selected SET and the
    (rank, crowding) values."""
    n, keep = 20, 10
    F = rng.normal(size=(n, 2)).astype(np.float64)
    X = np.arange(n, dtype=np.float32)[:, None] * np.ones((1, 3), np.float32)
    Xk, Fk, rk, ck = srv.nsga2_survival(jnp.asarray(X), jnp.asarray(F), keep)
    I, rank, crowd = po.rank_and_crowding_survival(F, keep)

    got_ids = sorted(np.asarray(Xk)[:, 0].astype(int).tolist())
    # inf-crowding ties among front boundaries: both implementations must
    # still pick the same set when crowding values are distinct or +-inf
    # counts leave no freedom; rng data with n=2*keep satisfies that here.
    assert got_ids == sorted(I.tolist())
    got_rank = {int(i): int(r) for i, r in
                zip(np.asarray(Xk)[:, 0].astype(int), np.asarray(rk))}
    for i in I:
        assert got_rank[int(i)] == int(rank[i])