"""Fused bias + activation + gain.

Behavioral reference: stylegan2/modules.py:227-300 (BiasActivationWrapper) and
the activation gain table at stylegan2/modules.py:7-55 (lrelu gain = sqrt(2)).
XLA fuses this chain into the producing conv/matmul; it exists as a named op
so every layer applies bias/act identically and so the Pallas build can swap
in a fused kernel.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def bias_act(x, bias=None, act: str = "linear", gain: float = None,
             alpha: float = 0.2):
    """x: [..., C] channel-last. act in {'linear', 'lrelu'}."""
    if bias is not None:
        x = x + jnp.asarray(bias, x.dtype)
    if act == "lrelu":
        x = jax.nn.leaky_relu(x, alpha)
        if gain is None:
            gain = SQRT2
    if gain is not None and gain != 1.0:
        x = x * jnp.asarray(gain, x.dtype)
    return x


def minibatch_std(x, group_size: int = 4, eps: float = 1e-8):
    """Minibatch-std extra channel (reference stylegan2/modules.py:679-750).
    x: [B, H, W, C] -> [B, H, W, C+1]; stats in fp32."""
    B, H, W, C = x.shape
    g = group_size if group_size and group_size > 0 else B
    y = jnp.asarray(x, jnp.float32).reshape(g, B // g, H, W, C)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + eps)
    y = jnp.mean(y.reshape(B // g, -1), axis=-1)      # [B/g]
    # torch .repeat tiles the [B/g] vector g times; batch b -> y[b mod B/g]
    y = jnp.tile(y, g).astype(x.dtype)                # [B]
    y = jnp.broadcast_to(y[:, None, None, None], (B, H, W, 1))
    return jnp.concatenate([x, y], axis=-1)
