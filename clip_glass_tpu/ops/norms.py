"""Normalization ops.

LayerNorm always computes statistics in fp32 regardless of input dtype,
mirroring the reference's fp16-safe LayerNorm (reference clip/model.py:150-158)
— on TPU this keeps bf16 activations from losing the fitness signal while the
surrounding matmuls stay on the MXU in bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x, scale, bias, eps: float = 1e-5):
    orig_dtype = x.dtype
    x32 = jnp.asarray(x, jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * jnp.asarray(scale, jnp.float32) + jnp.asarray(bias, jnp.float32)
    return jnp.asarray(y, orig_dtype)


def l2_normalize(x, axis: int = -1, eps: float = 0.0):
    n = jnp.linalg.norm(jnp.asarray(x, jnp.float32), axis=axis, keepdims=True)
    return jnp.asarray(x / jnp.maximum(n, eps) if eps else x / n, x.dtype)
