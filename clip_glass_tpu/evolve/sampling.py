"""Population initialization — on-device equivalents of the reference's
sampling operators (reference operators.py:9-34 and pymoo's int_random).

All samplers are pure (key -> [n, n_var] float32 genome matrix) and jittable;
genomes live in HBM for the whole search. Boolean genes are stored as 0/1
float32; integer genes as rounded float32 (decoded by fitness/latent.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def truncnorm_sampling(key, n: int, n_var: int) -> jnp.ndarray:
    """truncnorm.rvs(-2, 2) (reference operators.py:14-15, latent.py:9)."""
    return jax.random.truncated_normal(key, -2.0, 2.0, (n, n_var), jnp.float32)


def normal_sampling(key, n: int, n_var: int, mu: float = 0.0, std: float = 1.0) -> jnp.ndarray:
    """N(mu, std) (reference operators.py:17-25)."""
    return mu + std * jax.random.normal(key, (n, n_var), jnp.float32)


def binary_sampling(key, n: int, n_var: int, prob: float = 0.5) -> jnp.ndarray:
    """Bernoulli(prob) as 0/1 floats (reference operators.py:27-34)."""
    return jax.random.bernoulli(key, prob, (n, n_var)).astype(jnp.float32)


def int_random_sampling(key, n: int, n_var: int, xl, xu) -> jnp.ndarray:
    """Uniform integers in [xl, xu] (pymoo "int_random", reference operators.py:75)."""
    lo = jnp.asarray(xl, jnp.int32)
    hi = jnp.asarray(xu, jnp.int32)
    vals = jax.random.randint(key, (n, n_var), lo, hi + 1)
    return vals.astype(jnp.float32)


def mixed_biggan_sampling(key, n: int, dim_z: int = 128, num_classes: int = 1000,
                          bool_prob: float = 5 / 1000) -> jnp.ndarray:
    """BigGAN mixed genome: truncnorm reals ++ sparse Bernoulli class bits
    (reference operators.py:44-52)."""
    kz, kc = jax.random.split(key)
    z = truncnorm_sampling(kz, n, dim_z)
    c = binary_sampling(kc, n, num_classes, bool_prob)
    return jnp.concatenate([z, c], axis=1)
