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


def test_noise_bias_lrelu_pallas_matches_lax(rng):
    B, H, W, C = 2, 8, 8, 16
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    ns = jnp.asarray(0.7, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    want = np.asarray(bias_act(x + ns * noise[None, :, :, None], bias, act="lrelu"))
    got = np.asarray(noise_bias_lrelu_pallas(x, noise, ns, bias))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
