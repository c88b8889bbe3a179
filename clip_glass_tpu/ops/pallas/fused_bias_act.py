"""Pallas TPU kernel: fused noise-injection + bias + leaky-relu + gain.

The per-layer epilogue of every StyleGAN2 synthesis conv
(NoiseInjectionWrapper + BiasActivationWrapper, reference
stylegan2/modules.py:227-456): out = lrelu(x + ns * noise + bias) * sqrt(2).
One VMEM pass instead of three elementwise HBM round trips when XLA's fusion
is interrupted by the surrounding convs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_glass_tpu.ops.pallas import interpret_mode

SQRT2 = math.sqrt(2.0)


def _kernel(x_ref, n_ref, ns_ref, b_ref, o_ref, *, alpha, gain):
    x = x_ref[0]
    x = x + ns_ref[0, 0] * n_ref[0][:, :, None] + b_ref[0][None, None, :]
    x = jnp.where(x >= 0, x, alpha * x)
    o_ref[0] = (x * gain).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("alpha", "gain", "block_h"))
def noise_bias_lrelu_pallas(x, noise, noise_scale, bias,
                            alpha: float = 0.2, gain: float = SQRT2,
                            block_h: int = 32):
    """x: [B, H, W, C]; noise: [H, W] (shared over batch/channels);
    noise_scale: scalar; bias: [C]."""
    B, H, W, C = x.shape
    hb = min(block_h, H)
    while H % hb:
        hb -= 1
    ns = jnp.reshape(noise_scale.astype(jnp.float32), (1, 1))
    b2 = bias.astype(jnp.float32)[None, :]
    n3 = noise.astype(jnp.float32)[None]
    kern = functools.partial(_kernel, alpha=alpha, gain=gain)
    return pl.pallas_call(
        kern,
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((1, hb, W, C), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, W), lambda b, h: (0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, W, C), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret_mode(),
    )(x, n3, ns, b2)
