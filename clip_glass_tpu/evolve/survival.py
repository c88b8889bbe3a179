"""Survival (environmental selection), on-device.

GA: elitist (mu+lambda) fitness survival — keep the best `pop_size` of the
merged parent+offspring population (pymoo FitnessSurvival).
NSGA-II: rank-and-crowding survival — whole fronts until overflow, the
splitting front by descending crowding (pymoo RankAndCrowdingSurvival).
Both reduce to a single lexicographic sort with fixed shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from clip_glass_tpu.evolve.nds import crowding_distance, non_dominated_rank


def fitness_survival(X: jnp.ndarray, F: jnp.ndarray, pop_size: int):
    """Keep the `pop_size` individuals with smallest scalar fitness."""
    order = jnp.argsort(F[:, 0], stable=True)
    keep = order[:pop_size]
    return X[keep], F[keep]


def nsga2_survival(X: jnp.ndarray, F: jnp.ndarray, pop_size: int):
    """Rank + crowding survival; also returns survivors' rank and crowding
    (reused by the next generation's tournament)."""
    rank = non_dominated_rank(F)
    crowd = crowding_distance(F, rank)
    # sort by (rank asc, crowding desc); -crowd with inf -> -inf sorts first
    order = jnp.lexsort((-crowd, rank))
    keep = order[:pop_size]
    return X[keep], F[keep], rank[keep], crowd[keep]
