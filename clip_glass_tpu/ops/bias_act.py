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


def minibatch_std(x, group_size: int = 4, eps: float = 1e-8,
                  center_input: bool = True):
    """Minibatch-std extra channel (reference stylegan2/modules.py:679-750).
    x: [B, H, W, C] -> [B, H, W, C+1]; stats in fp32.

    `center_input=True` reproduces a reference quirk that is load-bearing for
    discriminator parity: in fp32 eval, `y = input.view(...).float()` aliases
    the input storage (``.float()`` is a no-op on fp32), so the in-place
    ``y -= y.mean(dim=0)`` at stylegan2/modules.py:728 CENTERS THE INPUT by
    its group mean before the cat at modules.py:745. CLIP-GLaSS evaluates D
    in fp32 (reference problem.py:22), so its hinge objective sees the
    centered features; set center_input=False for the textbook (fp16-path)
    behavior.
    """
    B, H, W, C = x.shape
    g = group_size if group_size and group_size > 0 else B
    y = jnp.asarray(x, jnp.float32).reshape(g, B // g, H, W, C)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    s = jnp.mean(jnp.square(y), axis=0)
    s = jnp.sqrt(s + eps)
    s = jnp.mean(s.reshape(B // g, -1), axis=-1)      # [B/g]
    # torch .repeat tiles the [B/g] vector g times; batch b -> s[b mod B/g]
    s = jnp.tile(s, g).astype(x.dtype)                # [B]
    s = jnp.broadcast_to(s[:, None, None, None], (B, H, W, 1))
    if center_input:
        x = y.reshape(B, H, W, C).astype(x.dtype)
    return jnp.concatenate([x, s], axis=-1)
