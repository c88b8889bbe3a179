"""Test-local pure-numpy transcription of pymoo 0.4.2's operators.

The reference's evolutionary engine IS pymoo 0.4.2 (reference run.py:59-76,
operators.py:37-81); the package is not installed here, so this module
transcribes its public operator code — SimulatedBinaryCrossover._do,
PolynomialMutation._do, HalfUniformCrossover._do, BinaryBitflipMutation._do,
comp_by_cv_and_fitness, NSGA2's binary_tournament, FitnessSurvival,
calc_crowding_distance (incl. the zero-gap inheritance loops) and
RankAndCrowdingSurvival — as numpy functions with INJECTED randomness, so
tests can feed the exact uniforms the on-device evolve/* ops draw and assert
element-level agreement (SURVEY.md hard part #4).

Transcription notes:
- pymoo draws some uniforms only for masked subsets (e.g. PolynomialMutation
  draws `rand` for the mutated entries as a flat array). Entries are iid, so
  the dense-draw here is distributionally identical; with injected dense
  uniforms the FORMULAS are element-level comparable.
- HalfUniformCrossover picks the swapped subset via a random permutation of
  the differing indices; here the choice is injected as a score matrix
  (lowest-scoring differing indices swap) — the same uniform subset law.
"""

import math

import numpy as np


# ------------------------------------------------------------ crossover

def sbx(x1, x2, xl, xu, eta, prob, prob_per_variable,
        mate_u, var_u, rand, swap_u):
    """SimulatedBinaryCrossover (pymoo 0.4.2 simulated_binary_crossover.py)
    plus Crossover.do's per-mating gate. All arrays float64 numpy."""
    x1 = np.asarray(x1, np.float64)
    x2 = np.asarray(x2, np.float64)
    m, n_var = x1.shape
    xl = np.broadcast_to(np.asarray(xl, np.float64), (n_var,))
    xu = np.broadcast_to(np.asarray(xu, np.float64), (n_var,))

    do_crossover = np.full((m, n_var), True)
    do_crossover[var_u > prob_per_variable] = False
    do_crossover[np.abs(x1 - x2) <= 1.0e-14] = False

    y1 = np.minimum(x1, x2)
    y2 = np.maximum(x1, x2)

    def calc_betaq(beta):
        alpha = 2.0 - np.power(beta, -(eta + 1.0))
        mask, mask_not = (rand <= (1.0 / alpha)), (rand > (1.0 / alpha))
        betaq = np.zeros(mask.shape)
        betaq[mask] = (np.power((rand * alpha), (1.0 / (eta + 1.0))))[mask]
        betaq[mask_not] = (np.power((1.0 / (2.0 - rand * alpha)),
                                    (1.0 / (eta + 1.0))))[mask_not]
        return betaq

    delta = (y2 - y1)
    delta[delta < 1.0e-10] = 1.0e-10

    beta = 1.0 + (2.0 * (y1 - xl) / delta)
    betaq = calc_betaq(beta)
    c1 = 0.5 * ((y1 + y2) - betaq * delta)

    beta = 1.0 + (2.0 * (xu - y2) / delta)
    betaq = calc_betaq(beta)
    c2 = 0.5 * ((y1 + y2) + betaq * delta)

    b = swap_u <= 0.5
    val = np.copy(c1[b])
    c1[b] = c2[b]
    c2[b] = val

    # repair_out_of_bounds
    c1 = np.clip(c1, xl, xu)
    c2 = np.clip(c2, xl, xu)

    o1 = np.copy(x1)
    o2 = np.copy(x2)
    o1[do_crossover] = c1[do_crossover]
    o2[do_crossover] = c2[do_crossover]

    # Crossover.do per-mating gate
    keep = (mate_u[:, 0] < prob)
    o1[~keep] = x1[~keep]
    o2[~keep] = x2[~keep]
    return o1, o2


def hux(x1, x2, prob, mate_u, score):
    """HalfUniformCrossover: swap ceil(n_diff/2) differing bits, subset
    chosen uniformly (injected via `score`: lowest-scoring differing
    positions swap)."""
    x1 = np.asarray(x1)
    x2 = np.asarray(x2)
    o1, o2 = np.copy(x1), np.copy(x2)
    m = x1.shape[0]
    for i in range(m):
        if not (mate_u[i, 0] < prob):
            continue
        I = np.where(x1[i] != x2[i])[0]
        n = math.ceil(len(I) / 2)
        if n > 0:
            _I = I[np.argsort(score[i, I], kind="mergesort")[:n]]
            o1[i, _I] = x2[i, _I]
            o2[i, _I] = x1[i, _I]
    return o1, o2


# ------------------------------------------------------------ mutation

def polynomial_mutation(x, xl, xu, eta, prob, do_u, rand):
    """PolynomialMutation._do (pymoo 0.4.2 polynomial_mutation.py), dense
    randomness (see module notes)."""
    X = np.asarray(x, np.float64)
    n, n_var = X.shape
    xl = np.broadcast_to(np.asarray(xl, np.float64), (n_var,))
    xu = np.broadcast_to(np.asarray(xu, np.float64), (n_var,))
    Y = np.copy(X)

    do_mutation = do_u < prob

    delta1 = (X - xl) / (xu - xl)
    delta2 = (xu - X) / (xu - xl)
    mut_pow = 1.0 / (eta + 1.0)

    mask = rand <= 0.5
    deltaq = np.zeros(X.shape)

    xy = 1.0 - delta1
    val = 2.0 * rand + (1.0 - 2.0 * rand) * (np.power(xy, (eta + 1.0)))
    d = np.power(val, mut_pow) - 1.0
    deltaq[mask] = d[mask]

    xy = 1.0 - delta2
    val = 2.0 * (1.0 - rand) + 2.0 * (rand - 0.5) * (np.power(xy, (eta + 1.0)))
    d = 1.0 - (np.power(val, mut_pow))
    deltaq[~mask] = d[~mask]

    _Y = X + deltaq * (xu - xl)
    _Y[_Y < xl] = np.broadcast_to(xl, _Y.shape)[_Y < xl]
    _Y[_Y > xu] = np.broadcast_to(xu, _Y.shape)[_Y > xu]
    Y[do_mutation] = _Y[do_mutation]
    return Y


def bitflip_mutation(x, prob, u):
    """BinaryBitflipMutation._do."""
    X = np.asarray(x)
    _X = np.copy(X)
    flip = u < prob
    _X[flip] = 1.0 - X[flip]
    return _X


# ------------------------------------------------------------ selection

def tournament_ga(F, pairs, tie_coin):
    """comp_by_cv_and_fitness with CV == 0 everywhere (reference
    problem.py:29): smaller F wins, random if equal."""
    S = np.empty(pairs.shape[0], np.int64)
    f = np.asarray(F)[:, 0]
    for i, (a, b) in enumerate(pairs):
        if f[a] < f[b]:
            S[i] = a
        elif f[b] < f[a]:
            S[i] = b
        else:
            S[i] = a if tie_coin[i] else b
    return S


def _dominates(fa, fb):
    return bool(np.all(fa <= fb) and np.any(fa < fb))


def tournament_nsga2(F, crowding, pairs, tie_coin):
    """NSGA2 binary_tournament (pymoo nsga2.py): dominance, then larger
    crowding, then random."""
    F = np.asarray(F)
    S = np.empty(pairs.shape[0], np.int64)
    for i, (a, b) in enumerate(pairs):
        if _dominates(F[a], F[b]):
            S[i] = a
        elif _dominates(F[b], F[a]):
            S[i] = b
        elif crowding[a] > crowding[b]:
            S[i] = a
        elif crowding[b] > crowding[a]:
            S[i] = b
        else:
            S[i] = a if tie_coin[i] else b
    return S


# ------------------------------------------------------------ survival

def fast_non_dominated_sort(F):
    """NonDominatedSorting (front peeling); returns list of index arrays."""
    F = np.asarray(F)
    n = F.shape[0]
    remaining = np.ones(n, bool)
    fronts = []
    while remaining.any():
        idx = np.where(remaining)[0]
        current = []
        for i in idx:
            if not any(_dominates(F[j], F[i]) for j in idx if j != i):
                current.append(i)
        fronts.append(np.asarray(current))
        remaining[np.asarray(current)] = False
    return fronts


def calc_crowding_distance(F):
    """pymoo 0.4.2 calc_crowding_distance, verbatim (incl. the zero-gap
    inheritance loops and the /n_obj mean)."""
    F = np.asarray(F, np.float64)
    infinity = np.inf
    n_points, n_obj = F.shape
    if n_points <= 2:
        return np.full(n_points, infinity)

    I = np.argsort(F, axis=0, kind="mergesort")
    F = F[I, np.arange(n_obj)]

    dist = (np.concatenate([F, np.full((1, n_obj), infinity)])
            - np.concatenate([np.full((1, n_obj), -infinity), F]))

    index_dist_is_zero = np.where(dist == 0)
    dist_to_last = np.copy(dist)
    for i, j in zip(*index_dist_is_zero):
        dist_to_last[i, j] = dist_to_last[i - 1, j]
    dist_to_next = np.copy(dist)
    for i, j in reversed(list(zip(*index_dist_is_zero))):
        dist_to_next[i, j] = dist_to_next[i + 1, j]

    norm = np.max(F, axis=0) - np.min(F, axis=0)
    norm[norm == 0] = np.nan
    dist_to_last, dist_to_next = dist_to_last[:-1] / norm, dist_to_next[1:] / norm
    dist_to_last[np.isnan(dist_to_last)] = 0.0
    dist_to_next[np.isnan(dist_to_next)] = 0.0

    J = np.argsort(I, axis=0)
    return np.sum(dist_to_last[J, np.arange(n_obj)]
                  + dist_to_next[J, np.arange(n_obj)], axis=1) / n_obj


def fitness_survival(F, n_survive):
    """FitnessSurvival: indices of the n_survive smallest F[:, 0]
    (stable mergesort, like pymoo)."""
    return np.argsort(np.asarray(F)[:, 0], kind="mergesort")[:n_survive]


def rank_and_crowding_survival(F, n_survive):
    """RankAndCrowdingSurvival: whole fronts until overflow; the splitting
    front by descending crowding. Tie order within equal crowding is
    pymoo-randomized (randomized_argsort); here ties break by index —
    tests use tie-free crowding for element-level comparison. Returns
    (surviving indices, rank per individual, crowding per individual)."""
    fronts = fast_non_dominated_sort(F)
    n = len(F)
    rank = np.empty(n, np.int64)
    crowding = np.empty(n, np.float64)
    survivors = []
    for k, front in enumerate(fronts):
        cd = calc_crowding_distance(np.asarray(F)[front])
        rank[front] = k
        crowding[front] = cd
        if len(survivors) + len(front) > n_survive:
            I = np.argsort(-cd, kind="mergesort")[:n_survive - len(survivors)]
            survivors.extend(front[I])
            break
        survivors.extend(front)
    return np.asarray(survivors), rank, crowding
