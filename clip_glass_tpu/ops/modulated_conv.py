"""StyleGAN2 modulated/demodulated convolution, TPU-native.

Behavioral reference: stylegan2/modules.py:920-967 (ConvLayer.forward_mod) and
1089-1139 (fused ConvUpLayer._process). The reference materializes per-sample
kernels (weight * style, then demodulation) and runs a grouped conv with the
batch folded into groups — a CUDA-friendly trick that is hostile to the MXU.

Here the same arithmetic is re-associated into standard batched convs:

    conv(x, w * s[b]) == conv(x * s[b], w)           (linearity in channels)
    demod d[b,o] depends only on (w, s[b]), and commutes with the depthwise
    FIR filter, so it is applied to the conv OUTPUT.

so every sample shares one kernel and XLA sees an ordinary convolution:
  y = conv(x * s) -> y * d        (plain 3x3 / 1x1)
  y = FIR(convT(x * s)) -> y * d  (fused 2x upsample, pad_once layout)

Float differences vs the reference are reduction-order only (gated in
tests/test_stylegan2_parity.py).
"""

from __future__ import annotations


import jax.numpy as jnp
from jax import lax

from clip_glass_tpu.ops.upfirdn import fir, setup_filter_kernel

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NHWC", "HWIO", "NHWC"))


def _conv(x, w, *, stride=1, pad0=0, pad1=0, lhs_dilation=1):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad0, pad1), (pad0, pad1)),
        lhs_dilation=(lhs_dilation, lhs_dilation),
        dimension_numbers=_DN)


def style_from_latent(latent, style_w, style_b):
    """Per-sample channel scales: dense(latent) with bias_init=1 semantics
    (reference stylegan2/modules.py:874-890 — the +1 lives in the bias)."""
    return latent @ style_w + style_b


def demod_coef(w, style, eps: float = 1e-8):
    """d[b,o] = rsqrt(sum_{i,k}(w[k,i,o] * s[b,i])^2 + eps)."""
    w32 = jnp.asarray(w, jnp.float32)
    w2 = jnp.sum(w32 * w32, axis=(0, 1))            # [I, O]
    s2 = jnp.square(jnp.asarray(style, jnp.float32))  # [B, I]
    return lax.rsqrt(s2 @ w2 + eps)                  # [B, O]


def modulated_conv2d(x, w, style, *, demodulate: bool = True,
                     eps: float = 1e-8):
    """Plain modulated conv. x: [B,H,W,I]; w: [kh,kw,I,O]; style: [B,I].
    'SAME'-style padding of the reference ConvLayer
    (reference stylegan2/modules.py:896-903): pad = k-1, pad0 = pad - pad//2.
    """
    k = w.shape[0]
    pad = k - 1
    pad0 = pad - pad // 2
    pad1 = pad - pad0
    xs = x * style[:, None, None, :].astype(x.dtype)
    y = _conv(xs, w, pad0=pad0, pad1=pad1)
    if demodulate:
        y = y * demod_coef(w, style, eps).astype(y.dtype)[:, None, None, :]
    return y


def modulated_conv2d_up(x, w, style, *, demodulate: bool = True,
                        filter_taps=(1, 3, 3, 1), eps: float = 1e-8):
    """Fused 2x-upsampling modulated conv (transposed conv stride 2, no pad,
    then FIR), pad_once=True layout (reference stylegan2/modules.py:1043-1072,
    1093-1139).

    torch convT(x, W, stride=2, pad=0) == dilated conv with spatially flipped
    kernel and full (k-1) padding; the trailing FIR uses
    pad = (fk-2)-(k-1), pad0 = (pad+1)//2+1, pad1 = pad//2+1.
    """
    k = w.shape[0]
    xs = x * style[:, None, None, :].astype(x.dtype)
    w_flip = jnp.flip(w, axis=(0, 1))
    y = _conv(xs, w_flip, lhs_dilation=2, pad0=k - 1, pad1=k - 1)
    fk = setup_filter_kernel(tuple(filter_taps), gain=1.0, up_factor=2)
    pad = (fk.shape[-1] - 2) - (k - 1)
    y = fir(y, fk, pad0=(pad + 1) // 2 + 1, pad1=pad // 2 + 1)
    if demodulate:
        y = y * demod_coef(w, style, eps).astype(y.dtype)[:, None, None, :]
    return y


def conv2d(x, w, *, stride=1):
    """Unmodulated 'SAME' conv (reference ConvLayer without modulation)."""
    k = w.shape[0]
    pad = k - 1
    pad0 = pad - pad // 2
    pad1 = pad - pad0
    return _conv(x, w, stride=stride, pad0=pad0, pad1=pad1)


def conv2d_down(x, w, *, filter_taps=(1, 3, 3, 1)):
    """Fused FIR + stride-2 conv (reference ConvDownLayer, pad_once=True,
    stylegan2/modules.py:1197-1232): FIR pad = (fk-2)+(k-1), split
    ((pad+1)//2, pad//2), then stride-2 VALID conv."""
    k = w.shape[0]
    fk = setup_filter_kernel(tuple(filter_taps), gain=1.0, up_factor=1)
    pad = (fk.shape[-1] - 2) + (k - 1)
    y = fir(x, fk, pad0=(pad + 1) // 2, pad1=pad // 2)
    return _conv(y, w, stride=2)
