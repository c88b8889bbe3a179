"""Mutation operators, on-device (pymoo equivalents used at reference
operators.py:60-64, 70, 77).

Polynomial mutation follows Deb's bounded formulation exactly as in
pymoo 0.4.2 (delta1/delta2 split at rand 0.5, eta+1 powers, bound clamp);
bitflip toggles 0/1 genes with per-gene probability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def polynomial_mutation(key, x: jnp.ndarray, xl, xu, eta: float = 3.0,
                        prob: float = 0.5, round_int: bool = False) -> jnp.ndarray:
    n, n_var = x.shape
    xl = jnp.broadcast_to(jnp.asarray(xl, jnp.float32), (n_var,))
    xu = jnp.broadcast_to(jnp.asarray(xu, jnp.float32), (n_var,))
    k_do, k_rand = jax.random.split(key)
    do_mut = jax.random.uniform(k_do, (n, n_var)) < prob

    span = xu - xl
    delta1 = (x - xl) / span
    delta2 = (xu - x) / span
    mut_pow = 1.0 / (eta + 1.0)
    rand = jax.random.uniform(k_rand, (n, n_var))

    # rand <= 0.5 branch
    xy1 = 1.0 - delta1
    val1 = 2.0 * rand + (1.0 - 2.0 * rand) * jnp.power(xy1, eta + 1.0)
    d1 = jnp.power(val1, mut_pow) - 1.0
    # rand > 0.5 branch
    xy2 = 1.0 - delta2
    val2 = 2.0 * (1.0 - rand) + 2.0 * (rand - 0.5) * jnp.power(xy2, eta + 1.0)
    d2 = 1.0 - jnp.power(val2, mut_pow)

    deltaq = jnp.where(rand <= 0.5, d1, d2)
    y = jnp.clip(x + deltaq * span, xl, xu)
    out = jnp.where(do_mut, y, x)
    if round_int:
        out = jnp.rint(out)
    return out


def bitflip_mutation(key, x: jnp.ndarray, prob: float) -> jnp.ndarray:
    """Flip 0/1 genes with probability `prob` (pymoo BinaryBitflipMutation;
    reference uses prob=10/1000, operators.py:63)."""
    flip = jax.random.uniform(key, x.shape) < prob
    return jnp.where(flip, 1.0 - x, x)


def mixed_mutation(key, x: jnp.ndarray, real_mask: jnp.ndarray, xl, xu,
                   eta: float = 3.0, real_prob: float = 0.5,
                   bool_prob: float = 10 / 1000) -> jnp.ndarray:
    """BigGAN mixed-genome mutation: PM on reals, bitflip on bools
    (reference operators.py:60-64)."""
    k1, k2 = jax.random.split(key)
    r = polynomial_mutation(k1, x, xl, xu, eta=eta, prob=real_prob)
    b = bitflip_mutation(k2, x, bool_prob)
    return jnp.where(real_mask, r, b)
