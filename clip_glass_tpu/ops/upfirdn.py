"""FIR up/down-sampling (upfirdn2d family), TPU-native.

Behavioral reference: stylegan2/modules.py:459-676 (FilterLayer, Upsample,
Downsample) — depthwise FIR convs around zero-stuffing / striding. Here each
op is ONE `lax.conv_general_dilated` call in NHWC:

- upsample2x:  lhs_dilation=2 fuses the reference's transposed-ones-conv
  zero-stuffing (stylegan2/modules.py:589-596) with the FIR pass.
- downsample2x: stride-2 depthwise conv.
- fir:          plain depthwise conv with explicit asymmetric padding.

XLA lowers depthwise convs to the VPU with fused padding; a hand-written
Pallas kernel for the hot 4-tap case lives in ops/pallas/upfirdn2d.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NHWC", "HWIO", "NHWC"))


@lru_cache(maxsize=None)
def setup_filter_kernel(filter_taps: tuple = (1, 3, 3, 1), gain: float = 1.0,
                        up_factor: int = 1) -> np.ndarray:
    """1-D taps -> normalized separable 2-D kernel * gain * up_factor^2
    (reference stylegan2/modules.py:169-203)."""
    k1 = np.asarray(filter_taps, np.float32)
    k2 = np.outer(k1, k1)
    k2 /= k2.sum()
    return (k2 * gain * up_factor ** 2).astype(np.float32)


def _depthwise(x, kernel2d, *, stride=1, lhs_dilation=1, pad0=0, pad1=0):
    """x: [B, H, W, C]; kernel2d: [kh, kw]."""
    C = x.shape[-1]
    kh, kw = kernel2d.shape
    rhs = jnp.broadcast_to(jnp.asarray(kernel2d, x.dtype)[:, :, None, None],
                           (kh, kw, 1, C))
    return lax.conv_general_dilated(
        x, rhs,
        window_strides=(stride, stride),
        padding=((pad0, pad1), (pad0, pad1)),
        lhs_dilation=(lhs_dilation, lhs_dilation),
        dimension_numbers=_DN,
        feature_group_count=C,
    )


def fir(x, kernel2d, pad0: int, pad1: int, stride: int = 1):
    """FilterLayer (reference stylegan2/modules.py:459-527)."""
    return _depthwise(x, kernel2d, stride=stride, pad0=pad0, pad1=pad1)


def upsample2x(x, filter_taps=(1, 3, 3, 1), gain: float = 1.0):
    """2x FIR upsample (reference stylegan2/modules.py:549-604): zero-stuff
    then filter with pad ((k-1+1)//2+1, (k-1)//2); kernel gain x4."""
    from clip_glass_tpu.ops import pallas as _pk
    if _pk.enabled() and len(filter_taps) == 4:
        from clip_glass_tpu.ops.pallas.upfirdn2d import upsample2x_pallas
        return upsample2x_pallas(x, tuple(filter_taps), gain)
    k2 = setup_filter_kernel(tuple(filter_taps), gain, up_factor=2)
    k = k2.shape[-1]
    pad = k - 1
    return _depthwise(x, k2, lhs_dilation=2,
                      pad0=(pad + 1) // 2 + 1, pad1=pad // 2)


def downsample2x(x, filter_taps=(1, 3, 3, 1), gain: float = 1.0):
    """2x FIR downsample (reference stylegan2/modules.py:608-676)."""
    k2 = setup_filter_kernel(tuple(filter_taps), gain, up_factor=1)
    k = k2.shape[-1]
    pad = k - 2
    return _depthwise(x, k2, stride=2, pad0=pad // 2, pad1=pad - pad // 2)
