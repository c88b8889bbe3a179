"""Pallas TPU kernel: fused modulated 1x1 convolution.

The 1x1 modulated convs (every ToRGB layer, reference stylegan2/models.py
to_data_layers; style projections) are batched matmuls with per-sample
input-channel scales and optional per-sample output demodulation:

    y[b, p, o] = (sum_i x[b, p, i] * s[b, i] * w[i, o]) * d[b, o] + bias[o]

This kernel fuses the style scale, the MXU matmul, the demodulation scale
and the bias into ONE pass over VMEM — the lax path materializes x*s and
y*d as separate HBM round trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_glass_tpu.ops.pallas import interpret_mode


def _kernel(x_ref, s_ref, w_ref, d_ref, b_ref, o_ref):
    # x: [1, T, I]; s: [1, 1, I]; w: [I, O]; d/b: [1, 1, O]; o: [1, T, O]
    xs = x_ref[0] * s_ref[0]
    y = jnp.dot(xs, w_ref[:, :], preferred_element_type=jnp.float32)
    y = y * d_ref[0] + b_ref[0]
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t",))
def modulated_matmul_pallas(x, style, w, demod, bias, block_t: int = 512):
    """x: [B, P, I]; style: [B, I]; w: [I, O]; demod: [B, O] (pass ones for
    no demodulation); bias: [O]. Returns [B, P, O]."""
    B, P, I = x.shape
    O = w.shape[1]
    tb = min(block_t, P)
    while P % tb:
        tb -= 1
    bias3 = jnp.broadcast_to(bias[None, None, :], (B, 1, O)).astype(jnp.float32)
    out = pl.pallas_call(
        _kernel,
        grid=(B, P // tb),
        in_specs=[
            pl.BlockSpec((1, tb, I), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, I), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I, O), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, O), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, O), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, O), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, O), x.dtype),
        interpret=interpret_mode(),
    )(x, style[:, None, :].astype(jnp.float32), w,
      demod[:, None, :].astype(jnp.float32), bias3)
    return out
