"""Genome decoding per model family (reference latent.py:4-59).

The reference wraps these in per-call nn.Module "latent spaces" that move
numpy populations to the device (reference latent.py:16-18, 37-38) — the
host<->device crossing the TPU rebuild eliminates. Here decode is a pure
jittable function applied to the HBM-resident genome matrix inside the
fitness program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def decode_biggan(x: jnp.ndarray, dim_z: int = 128):
    """[pop, dim_z + classes] -> (z clipped to [-2,2], softmax class vector)
    (reference latent.py:20-24)."""
    z = jnp.clip(x[:, :dim_z], -2.0, 2.0)
    class_vector = jax.nn.softmax(x[:, dim_z:], axis=1)
    return z, class_vector


def decode_stylegan2(x: jnp.ndarray):
    """Identity (reference latent.py:40-41)."""
    return (x,)


def decode_gpt2(x: jnp.ndarray):
    """Float genome -> int32 token ids (reference latent.py:55-56 casts
    through python int; genomes are kept integral by the int operators)."""
    return (jnp.asarray(jnp.rint(x), jnp.int32),)
