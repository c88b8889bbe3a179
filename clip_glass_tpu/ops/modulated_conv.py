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

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax

from clip_glass_tpu.ops import quant
from clip_glass_tpu.ops.upfirdn import fir, setup_filter_kernel

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NHWC", "HWIO", "NHWC"))


def _conv(x, w, *, stride=1, pad0=0, pad1=0, lhs_dilation=1):
    if _PAD_EVEN and lhs_dilation == 1 and w.shape[0] % 2 == 0 \
            and w.shape[1] % 2 == 0:
        # Experiment knob (CLIP_GLASS_PAD_EVEN=1): zero-pad even square
        # kernels to the next odd size — K'[1+i,1+j] = K[i,j], pad0 += 1 is
        # the exact same arithmetic for any stride. Rationale: the XLA TPU
        # conv emitter tiles odd/SAME windows far better than even ones at
        # these shapes (measured: [3,3] rows at 74-96% of roofline vs [2,2]
        # at ~21% and [4,4] stride-2 at 43% on the flagship step).
        w = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
        pad0 = pad0 + 1
    if _CONV_IN_BARRIER:
        # experiment knob (CLIP_GLASS_CONV_IN_BARRIER=1): materialize the
        # conv INPUT instead of letting its elementwise producers fuse into
        # the conv's tiled reads (the output-side CONV_BARRIER showed the
        # emitter gap is not output-fusion-induced; same-shape convs with
        # different fused producers measure up to 2x apart, so probe the
        # input side too)
        (x,) = lax.optimization_barrier((x,))

    def run(xx, ww, pt):
        return lax.conv_general_dilated(
            xx, ww, window_strides=(stride, stride),
            padding=((pad0, pad1), (pad0, pad1)),
            lhs_dilation=(lhs_dilation, lhs_dilation),
            dimension_numbers=_DN, preferred_element_type=pt)

    # opt-in int8 execution (ops/quant.py): a pass-through unless an ambient
    # quantization scope is active during tracing
    y = quant.conv_hook(x, w, run)
    if _CONV_BARRIER:
        # experiment knob: keep the conv OUT of generic elementwise output
        # fusions (measurement: CLIP_GLASS_CONV_BARRIER=1)
        (y,) = lax.optimization_barrier((y,))
    return y


import os as _os  # noqa: E402

_CONV_BARRIER = _os.environ.get("CLIP_GLASS_CONV_BARRIER", "") == "1"
_PAD_EVEN = _os.environ.get("CLIP_GLASS_PAD_EVEN", "") == "1"
_CONV_IN_BARRIER = _os.environ.get("CLIP_GLASS_CONV_IN_BARRIER", "") == "1"


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


@lru_cache(maxsize=None)
def _up_phase_map(filter_taps):
    """Constant coefficient tensor A[d, r, t] = sum_{s: s+t=2d+1-r (valid)}
    k1[s] of the convT+FIR polyphase composition (one per dimension)."""
    k1 = np.asarray(filter_taps, np.float64)
    k1 = k1 / k1.sum() * 2.0  # separable 1-D factor (total FIR gain 4)
    A = np.zeros((3, 2, 3), np.float32)
    for r in (0, 1):
        for t in range(3):
            for s in range(len(k1)):
                d2 = s + t - 3 + r
                if d2 % 2 == 0 and -2 <= d2 <= 2:
                    A[d2 // 2 + 1, r, t] += k1[s]
    return A


def _polyphase_up_kernels(w, filter_taps):
    """Compose convT(stride 2, k=3) + 4-tap FIR into FOUR 3x3 phase kernels.

    out[2p+r, 2q+c] = conv(x, K[r,c])[p, q] with
      K[r,c][di,dj] = sum_{s1+t1=2di+3-r, s2+t2=2dj+3-c}
                      k1[s1] k1[s2] w[2-t1, 2-t2]
    (derived from the zero-stuffing + padding arithmetic of
    modulated_conv2d_up). Exact; ONE einsum against constant per-dimension
    coefficient tensors. Returns [3, 3, I, 4, O] (phases r-major)."""
    A = jnp.asarray(_up_phase_map(tuple(filter_taps)), jnp.float32)
    wf = jnp.flip(jnp.asarray(w, jnp.float32), (0, 1))  # w[2-t1, 2-t2]
    Kp = jnp.einsum("drt,ecs,tsio->deirco", A, A, wf)
    d, e, I, r, c, O = Kp.shape
    return Kp.reshape(d, e, I, r * c, O).astype(w.dtype)


def modulated_conv2d_up_polyphase(x, w, style, *, demodulate: bool = True,
                                  filter_taps=(1, 3, 3, 1), eps: float = 1e-8):
    """Exact alternative to modulated_conv2d_up: ONE dense 3x3 conv at input
    resolution with 4x output channels (the composed phase kernels), then a
    phase interleave — no zero-stuffed 2x-resolution intermediate between the
    transposed conv and the FIR.

    Measured on a v5e at 16x512^2x32->32 bf16: 49.4 ms vs 40.8 ms for the
    dilated-conv+FIR default — the interleave transpose at 2x resolution
    costs more than the composition saves, so this stays a documented
    alternative (the dense-phase formulation is the right STARTING POINT for
    a Pallas kernel that writes phases directly to strided output slots)."""
    assert w.shape[0] == 3 and len(filter_taps) == 4
    B, H, W, I = x.shape
    O = w.shape[-1]
    Kp = _polyphase_up_kernels(w, tuple(filter_taps))   # [3,3,I,4,O]
    xs = x * style[:, None, None, :].astype(x.dtype)
    y = _conv(xs, Kp.reshape(3, 3, I, 4 * O), pad0=1, pad1=1)  # [B,H,W,4O]
    y = y.reshape(B, H, W, 2, 2, O)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, O)
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


def conv2d_down(x, w, *, filter_taps=(1, 3, 3, 1), fuse: bool = False):
    """FIR + stride-2 conv (reference ConvDownLayer, pad_once=True,
    stylegan2/modules.py:1197-1232): FIR pad = (fk-2)+(k-1), split
    ((pad+1)//2, pad//2), then stride-2 VALID conv.

    fuse=True composes the depthwise FIR and the conv into ONE exact
    (k+fk-1)-tap stride-2 conv (correlation composition
    C[u] = sum_{t+s=u} fir[s] w[t]), removing the full-resolution FIR
    intermediate at 4x the conv MACs. Measured on a v5e (ffhq_d D, pop 16):
    90.8 ms vs 79.5 ms for the two-op default — at these narrow channel
    counts the extra MACs cost more than the saved HBM pass, so the default
    stays unfused (same verdict as the other reformulation experiments:
    XLA's native conv paths win on this workload)."""
    k = w.shape[0]
    fk = setup_filter_kernel(tuple(filter_taps), gain=1.0, up_factor=1)
    pad = (fk.shape[-1] - 2) + (k - 1)
    pad0, pad1 = (pad + 1) // 2, pad // 2
    if not fuse:
        y = fir(x, fk, pad0=pad0, pad1=pad1)
        return _conv(y, w, stride=2)
    # composite kernel: full 2-D convolution of fir with each w[:,:,i,o]
    fkj = jnp.asarray(fk, w.dtype)
    kk = k + fk.shape[-1] - 1
    C = jnp.zeros((kk, kk) + w.shape[2:], w.dtype)
    for s1 in range(fk.shape[0]):
        for s2 in range(fk.shape[1]):
            C = C.at[s1:s1 + k, s2:s2 + k].add(fkj[s1, s2] * w)
    return _conv(x, C, stride=2, pad0=pad0, pad1=pad1)
