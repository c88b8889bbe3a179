"""Pallas TPU kernel: the offset-lattice [2,2] space-to-depth conv.

The s2d execution domain's workhorse op (ops/s2d.py s2d_modulated_conv2d /
s2d_conv2d between OPPOSITE lattices) is a stride-1 conv with a [2, 2, 4C,
4C] phase-composed kernel — e.g. config-f's 512/1024-level G layer convs and
the D conv0s. XLA emits these at only ~20-40% of their compute roofline at
the production shapes (measured: [2,2,128,128] @ 16x256x256 runs 3.3 ms vs
a 0.7 ms bound — DESIGN.md §9 round-3 table), and an optimization-barrier
split (conv out of the elementwise fusion) measures SLOWER overall, so the
gap is the conv emitter itself, not the fusion.

This kernel computes the [2,2] conv as FOUR shifted MXU matmuls over a
row-tiled VMEM window. The per-sample style (input-channel scale) and
demodulation (output-channel scale) of the modulated-conv formulation are
folded into PER-SAMPLE kernels outside the kernel — exactly the reference's
weight-modulation form, stylegan2/modules.py:920-967:
K_b = K * style[b][:, None] * demod[b][None, :] (a [B,2,2,C,C] einsum, tiny
next to the conv), so the kernel itself is a pure conv per batch row.

Semantics (cell-level, per spatial dim):  y[v] = sum_{a in 0,1} K[a] @
x[v + a - pad0],  pad0 in {0, 1}:
- pad0=1 (lattice 0 -> -1): n_out = n_in + 1, top/left halo;
- pad0=0 (lattice -1 -> 0): n_out = n_in - 1, bottom/right halo.
Out-of-range x rows/cols are zero (the fold's zero phantoms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_glass_tpu.ops.pallas import interpret_mode


def _kernel(k_ref, xa_ref, xn_ref, o_ref, *, pad0: int,
            tile_v: int, n_in: int, n_out: int):
    t = pl.program_id(1)
    xa = xa_ref[0]                      # (TV, n_in, C) current row block
    xn = xn_ref[0]                      # (TV, n_in, C) neighbor row block

    if pad0 == 1:
        # halo row ABOVE the block: last row of block t-1 (zeros at t=0)
        last = jax.lax.slice_in_dim(xn, tile_v - 1, tile_v, axis=0)
        prev = jnp.where(t == 0, jnp.zeros_like(last), last)
        xr = jnp.concatenate([prev, xa], axis=0)         # (TV+1, n_in, C)
    else:
        # halo row BELOW: first row of block t+1 (zeros past the end)
        first = jax.lax.slice_in_dim(xn, 0, 1, axis=0)
        nxt = jnp.where((t + 1) * tile_v >= n_in,
                        jnp.zeros_like(first), first)
        xr = jnp.concatenate([xa, nxt], axis=0)          # (TV+1, n_in, C)

    # col halo: one zero col on each side, windows [b : b + n_out]
    xp = jnp.pad(xr, ((0, 0), (pad0, 1 - pad0 + (n_out - n_in)), (0, 0)))

    # rows of xr beyond the real input are tile padding garbage: mask them
    # (they feed REAL outputs only at the ragged last tile's bottom edge)
    gvalid = (jax.lax.broadcasted_iota(jnp.int32, (tile_v + 1, 1, 1), 0)
              + t * tile_v - pad0) < n_in
    xp = jnp.where(gvalid, xp, jnp.zeros_like(xp))

    C = o_ref.shape[-1]
    acc = jnp.zeros((tile_v * n_out, C), jnp.float32)
    for a in range(2):
        for b in range(2):
            xt = xp[a:a + tile_v, b:b + n_out, :].reshape(-1, C)
            acc += jnp.dot(xt, k_ref[0, a, b],
                           preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(tile_v, n_out, C).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pad0", "tile_v"))
def s2d_conv2x2_pallas(x, K, style, demod, *, pad0: int, tile_v: int = 16):
    """x: [B, n, n, C] s2d tensor; K: [2, 2, C, C] folded kernel;
    style/demod: [B, C] per-sample channel scales (phase-tiled; ones for
    unmodulated). Returns [B, n_out, n_out, C] with n_out = n + 1 (pad0=1)
    or n - 1 (pad0=0)."""
    B, n, _, C = x.shape
    n_out = n + 1 if pad0 == 1 else n - 1
    nt = pl.cdiv(n_out, tile_v)

    # per-sample weight modulation (reference modules.py:920-967): fold the
    # input-channel style and output-channel demod scales into the kernel
    Kb = (jnp.asarray(K, jnp.float32)[None]
          * style.astype(jnp.float32)[:, None, None, :, None]
          * demod.astype(jnp.float32)[:, None, None, None, :])

    x_blocks = pl.cdiv(n, tile_v)  # x's own block count (may differ from nt)

    # x block indices are CLAMPED into range: the ragged last output tile
    # would otherwise request a block wholly past x's extent (a TPU fault);
    # the in-kernel gvalid mask (driven by the LOGICAL t) zeroes whatever
    # rows the clamped reads bring in beyond the real input.
    def current(b, t):
        return (b, jnp.minimum(t, x_blocks - 1), 0, 0)

    def neighbor(b, t):
        if pad0 == 1:
            return (b, jnp.clip(t - 1, 0, x_blocks - 1), 0, 0)
        return (b, jnp.minimum(t + 1, x_blocks - 1), 0, 0)

    kern = functools.partial(_kernel, pad0=pad0, tile_v=tile_v,
                             n_in=n, n_out=n_out)
    return pl.pallas_call(
        kern,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 2, 2, C, C), lambda b, t: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v, n, C), current,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v, n, C), neighbor,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_v, n_out, C),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_out, n_out, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(Kb.astype(x.dtype), x, x)
