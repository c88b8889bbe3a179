"""Pallas kernels vs their lax reference formulations (interpret mode on CPU
— the same kernel code compiles on TPU)."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_glass_tpu.ops import upfirdn
from clip_glass_tpu.ops import modulated_conv as mc
from clip_glass_tpu.ops.bias_act import bias_act
from clip_glass_tpu.ops.pallas.fused_bias_act import noise_bias_lrelu_pallas
from clip_glass_tpu.ops.pallas.modulated_matmul import modulated_matmul_pallas
from clip_glass_tpu.ops.pallas.s2d_conv2x2 import s2d_conv2x2_pallas
from clip_glass_tpu.ops.pallas.upfirdn2d import upsample2x_pallas


def test_upsample2x_pallas_matches_lax(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    want = np.asarray(upfirdn.upsample2x(x))
    got = np.asarray(upsample2x_pallas(x))
    assert got.shape == want.shape == (2, 16, 16, 16)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample2x_pallas_blocked_rows(rng):
    x = jnp.asarray(rng.normal(size=(1, 32, 8, 8)).astype(np.float32))
    want = np.asarray(upfirdn.upsample2x(x))
    got = np.asarray(upsample2x_pallas(x, block_h=8))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_modulated_matmul_pallas_matches_lax(rng):
    B, H, W, I, O = 2, 4, 4, 8, 12
    x = jnp.asarray(rng.normal(size=(B, H, W, I)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(1, 1, I, O)).astype(np.float32))
    style = jnp.asarray(rng.normal(size=(B, I)).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))

    want = np.asarray(mc.modulated_conv2d(x, w1, style, demodulate=True)
                      + bias[None, None, None, :])
    demod = mc.demod_coef(w1, style)
    got = np.asarray(modulated_matmul_pallas(
        x.reshape(B, H * W, I), style, w1[0, 0], demod, bias
    ).reshape(B, H, W, O))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dispatch_flag_routes_to_pallas(rng, monkeypatch):
    monkeypatch.setenv("CLIP_GLASS_PALLAS", "1")
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8)).astype(np.float32))
    got = np.asarray(upfirdn.upsample2x(x))
    monkeypatch.setenv("CLIP_GLASS_PALLAS", "0")
    want = np.asarray(upfirdn.upsample2x(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad0", [1, 0])
@pytest.mark.parametrize("modulated", [True, False])
def test_s2d_conv2x2_pallas_matches_lax_fold(rng, pad0, modulated):
    """The pallas [2,2] offset-lattice conv == the lax fold path
    (s2d_modulated_conv2d / s2d_conv2d between opposite lattices),
    including the ragged last row tile and the zero phantom halos."""
    from clip_glass_tpu.ops import s2d as s2d_ops

    B, C = 2, 8           # original channels; s2d carries 4C
    n_full = 24           # full-res extent
    k = 3
    w = jnp.asarray(rng.normal(size=(k, k, C, C)).astype(np.float32)) * 0.3
    if pad0 == 1:
        in_off, out_off = 0, -1
        x_plain = jnp.asarray(
            rng.normal(size=(B, n_full, n_full, C)).astype(np.float32))
        x = s2d_ops.s2d(x_plain)
    else:
        in_off, out_off = -1, 0
        x_plain = jnp.asarray(
            rng.normal(size=(B, n_full, n_full, C)).astype(np.float32))
        x = s2d_ops.mask_phantoms(
            s2d_ops.shift_to_m1(s2d_ops.s2d(x_plain)))

    style = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32)) * 0.5 + 1.0
    if modulated:
        want = s2d_ops.s2d_modulated_conv2d(x, w, style, demodulate=True,
                                            in_off=in_off, out_off=out_off)
        d = mc.demod_coef(w, style)
    else:
        xs = x * s2d_ops.tile_channels(style)[:, None, None, :]
        want = s2d_ops.s2d_conv2d(xs, w, in_off, out_off)
        d = jnp.ones((B, C), jnp.float32)

    Kp, kpad0 = s2d_ops.s2d_same_kernel(w, in_off, out_off)
    assert Kp.shape[0] == 2 and kpad0 == pad0
    got = s2d_conv2x2_pallas(
        x, Kp, s2d_ops.tile_channels(style), s2d_ops.tile_channels(d),
        pad0=pad0, tile_v=4)  # tile 4 over 13/11 rows: ragged last tile
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_noise_bias_lrelu_pallas_matches_lax(rng):
    B, H, W, C = 2, 8, 8, 16
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    ns = jnp.asarray(0.7, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    want = np.asarray(bias_act(x + ns * noise[None, :, :, None], bias, act="lrelu"))
    got = np.asarray(noise_bias_lrelu_pallas(x, noise, ns, bias))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
