"""Crossover operators, on-device (replacing pymoo's host-side numpy ops used
at reference operators.py:54-58, 69, 76).

Implements Deb's simulated binary crossover (SBX) with pymoo-0.4.2 semantics
(per-variable application prob 0.5, per-mating prob, 1e-14 equal-parent skip,
per-variable child swap, bound clipping, optional integer rounding) and
half-uniform crossover (HUX) with the exact "swap ceil(n_diff/2) differing
bits" rule, expressed with fixed shapes so it jits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1.0e-14


def sbx(key, x1: jnp.ndarray, x2: jnp.ndarray, xl, xu, eta: float = 3.0,
        prob: float = 1.0, prob_per_variable: float = 0.5,
        round_int: bool = False):
    """Simulated binary crossover on parent matrices [m, n_var] -> two children.

    `prob` gates whole matings; `prob_per_variable` gates genes within a
    mating (pymoo SimulatedBinaryCrossover defaults).
    """
    m, n_var = x1.shape
    xl = jnp.broadcast_to(jnp.asarray(xl, jnp.float32), (n_var,))
    xu = jnp.broadcast_to(jnp.asarray(xu, jnp.float32), (n_var,))
    k_mate, k_var, k_beta, k_swap = jax.random.split(key, 4)

    do_mating = jax.random.uniform(k_mate, (m, 1)) < prob
    do_var = jax.random.uniform(k_var, (m, n_var)) < prob_per_variable
    distinct = jnp.abs(x1 - x2) > _EPS
    cross = do_mating & do_var & distinct

    y1 = jnp.minimum(x1, x2)
    y2 = jnp.maximum(x1, x2)
    # pymoo floors the spread at 1e-10 and uses the FLOORED value both as the
    # beta denominator and in the betaq*delta products (near-equal genes are
    # masked out by `distinct` anyway)
    delta = jnp.maximum(y2 - y1, 1.0e-10)
    rand = jax.random.uniform(k_beta, (m, n_var))

    def betaq(beta):
        alpha = 2.0 - jnp.power(beta, -(eta + 1.0))
        lo = jnp.power(rand * alpha, 1.0 / (eta + 1.0))
        hi = jnp.power(1.0 / (2.0 - rand * alpha), 1.0 / (eta + 1.0))
        return jnp.where(rand <= 1.0 / alpha, lo, hi)

    beta1 = 1.0 + 2.0 * (y1 - xl) / delta
    c1 = 0.5 * ((y1 + y2) - betaq(beta1) * delta)
    beta2 = 1.0 + 2.0 * (xu - y2) / delta
    c2 = 0.5 * ((y1 + y2) + betaq(beta2) * delta)

    swap = jax.random.uniform(k_swap, (m, n_var)) <= 0.5
    c1s = jnp.where(swap, c2, c1)
    c2s = jnp.where(swap, c1, c2)

    c1s = jnp.clip(c1s, xl, xu)
    c2s = jnp.clip(c2s, xl, xu)
    o1 = jnp.where(cross, c1s, x1)
    o2 = jnp.where(cross, c2s, x2)
    if round_int:
        o1, o2 = jnp.rint(o1), jnp.rint(o2)
    return o1, o2


def hux(key, x1: jnp.ndarray, x2: jnp.ndarray, prob: float = 0.2):
    """Half-uniform crossover on 0/1 genomes: swap exactly ceil(n_diff/2) of
    the differing bits, chosen uniformly (pymoo HalfUniformCrossover).

    Fixed-shape formulation: give each differing position a random score and
    swap those whose rank among differing positions is < ceil(n_diff/2).
    """
    m, n_var = x1.shape
    k_mate, k_score = jax.random.split(key)
    do_mating = jax.random.uniform(k_mate, (m, 1)) < prob

    diff = x1 != x2
    n_diff = jnp.sum(diff, axis=1, keepdims=True)
    n_swap = jnp.ceil(n_diff / 2.0)
    score = jax.random.uniform(k_score, (m, n_var))
    score = jnp.where(diff, score, jnp.inf)
    # rank of each position among this row's scores (differing ones first)
    order = jnp.argsort(score, axis=1)
    rank = jnp.argsort(order, axis=1)
    swap = diff & (rank < n_swap) & do_mating

    o1 = jnp.where(swap, x2, x1)
    o2 = jnp.where(swap, x1, x2)
    return o1, o2


def mixed_crossover(key, x1, x2, real_mask: jnp.ndarray, xl, xu,
                    eta: float = 3.0, real_prob: float = 1.0,
                    bool_prob: float = 0.2):
    """BigGAN mixed-genome crossover: SBX on real genes, HUX on bool genes,
    combined by the per-gene mask (reference operators.py:54-58)."""
    k1, k2 = jax.random.split(key)
    r1, r2 = sbx(k1, x1, x2, xl, xu, eta=eta, prob=real_prob)
    b1, b2 = hux(k2, x1, x2, prob=bool_prob)
    o1 = jnp.where(real_mask, r1, b1)
    o2 = jnp.where(real_mask, r2, b2)
    return o1, o2
