"""Pallas TPU kernel: 2x FIR upsampling (upfirdn2d, 4-tap separable).

Replaces the dilated-depthwise-conv formulation (ops/upfirdn.upsample2x) on
TPU with a polyphase stencil: zero-stuffing + 4-tap FIR reduces to TWO 2-tap
combinations per axis —

    out[2m]   = k1 * x[m-1] + k3 * x[m]
    out[2m+1] = k0 * x[m-1] + k2 * x[m]

so the kernel does 8 multiply-adds per output pixel on the VPU and writes
the interleaved result directly; no zero-stuffed intermediate ever exists.

Tiling: grid over (batch, row-blocks); each program sees full-width rows
(so the column stencil needs no cross-block halo) of the current and
previous input row (two aligned input views, so the row stencil needs no
overlapping blocks either); channels ride the 128-lane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_glass_tpu.ops.pallas import interpret_mode


def _kernel(xa_ref, xb_ref, o00, o01, o10, o11, *, k0, k1, k2, k3):
    # xa: x[m-1] rows; xb: x[m] rows; both [1, HB, W+1, C] with a left halo
    # col. Outputs: 4 polyphase planes [1, HB, W, C] (out[2m+r, 2n+c]); the
    # interleave to [2H, 2W] is one XLA transpose+reshape outside (Mosaic
    # cannot lower in-register row interleaves for these shapes).
    a = xa_ref[0]
    b = xb_ref[0]
    outs = ((o00, o01), (o10, o11))
    for r, (kr0, kr1) in enumerate(((k1, k3), (k0, k2))):
        v = kr0 * a + kr1 * b           # [HB, W+1, C]
        va = v[:, :-1, :]
        vb = v[:, 1:, :]
        outs[r][0][0] = k1 * va + k3 * vb
        outs[r][1][0] = k0 * va + k2 * vb


@functools.partial(jax.jit, static_argnames=("filter_taps", "gain", "block_h"))
def upsample2x_pallas(x: jnp.ndarray, filter_taps=(1, 3, 3, 1),
                      gain: float = 1.0, block_h: int = 4) -> jnp.ndarray:
    """x: [B, H, W, C] -> [B, 2H, 2W, C]; matches ops/upfirdn.upsample2x."""
    assert len(filter_taps) == 4, "polyphase kernel is specialized to 4 taps"
    B, H, W, C = x.shape
    k1d = np.asarray(filter_taps, np.float64)
    # separable 1-D factor: normalized taps * 2 per axis (total gain 4) * sqrt(gain)
    k1d = k1d / k1d.sum() * 2.0 * (gain ** 0.5)
    k0, k1, k2, k3 = (float(v) for v in k1d)

    hb = min(block_h, H)
    while H % hb:
        hb -= 1
    xp = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))  # top/left halo
    xa = xp[:, :-1]   # rows m-1 (left-padded cols), [B, H, W+1, C]
    xb = xp[:, 1:]    # rows m

    kern = functools.partial(_kernel, k0=k0, k1=k1, k2=k2, k3=k3)
    spec_in = pl.BlockSpec((1, hb, W + 1, C), lambda b, h: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, hb, W, C), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, H, W, C), x.dtype)
    p00, p01, p10, p11 = pl.pallas_call(
        kern,
        grid=(B, H // hb),
        in_specs=[spec_in, spec_in],
        out_specs=(spec_out, spec_out, spec_out, spec_out),
        out_shape=(shape, shape, shape, shape),
        interpret=interpret_mode(),
    )(xa, xb)
    # interleave the 4 phases: [B, H, W, C] x 4 -> [B, 2H, 2W, C]
    rows = jnp.stack([jnp.stack([p00, p01], axis=3),
                      jnp.stack([p10, p11], axis=3)], axis=2)
    return rows.reshape(B, 2 * H, 2 * W, C)
