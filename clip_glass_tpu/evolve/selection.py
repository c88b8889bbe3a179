"""Tournament parent selection, on-device (pymoo TournamentSelection).

pymoo draws candidate indices as concatenated random permutations of the
population (so each individual enters ~equally many tournaments), reshaped to
[n_select * n_parents, pressure]; reproduced here with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from clip_glass_tpu.evolve.nds import domination_matrix


def _permutation_pairs(key, n_pop: int, n_pick: int):
    """[n_pick, 2] candidate index pairs from tiled random permutations."""
    n_random = n_pick * 2
    n_perms = -(-n_random // n_pop)
    keys = jax.random.split(key, n_perms)
    perms = jnp.concatenate([jax.random.permutation(k, n_pop) for k in keys])
    return perms[:n_random].reshape(n_pick, 2)


def tournament_ga(key, F: jnp.ndarray, n_select: int) -> jnp.ndarray:
    """Binary tournament by fitness (pymoo comp_by_cv_and_fitness; constraints
    are identically zero in every reference config — reference problem.py:29 —
    so the CV branch never fires). Returns [n_select, 2] parent index pairs."""
    k_pairs, k_tie = jax.random.split(key)
    f = F[:, 0]
    cand = _permutation_pairs(k_pairs, f.shape[0], n_select * 2)
    a, b = cand[:, 0], cand[:, 1]
    tie_coin = jax.random.bernoulli(k_tie, 0.5, a.shape)
    winner = jnp.where(f[a] < f[b], a,
                       jnp.where(f[b] < f[a], b, jnp.where(tie_coin, a, b)))
    return winner.reshape(n_select, 2)


def tournament_nsga2(key, F: jnp.ndarray, crowding: jnp.ndarray,
                     n_select: int) -> jnp.ndarray:
    """NSGA-II binary tournament: dominance, then larger crowding, then random
    (pymoo binary_tournament). Returns [n_select, 2] parent index pairs."""
    k_pairs, k_tie = jax.random.split(key)
    n = F.shape[0]
    D = domination_matrix(F)
    cand = _permutation_pairs(k_pairs, n, n_select * 2)
    a, b = cand[:, 0], cand[:, 1]
    a_dom = D[a, b]
    b_dom = D[b, a]
    cd_a, cd_b = crowding[a], crowding[b]
    tie_coin = jax.random.bernoulli(k_tie, 0.5, a.shape)
    by_crowd = jnp.where(cd_a > cd_b, a,
                         jnp.where(cd_b > cd_a, b, jnp.where(tie_coin, a, b)))
    winner = jnp.where(a_dom, a, jnp.where(b_dom, b, by_crowd))
    return winner.reshape(n_select, 2)
