"""Pallas TPU kernels for the hot ops (SURVEY.md §2 marks upfirdn2d /
modulated conv / fused bias-act as the rebuild's native-kernel surface).

Dispatch policy: the kernels are OPT-IN (CLIP_GLASS_PALLAS=1). Measured on a
v5e chip (16x512x512x32 bf16): polyphase upsample2x 59.6ms vs 24.9ms for the
XLA dilated-depthwise-conv formulation; fused modulated 1x1 matmul 12.8ms vs
8.4ms for the XLA matmul chain — XLA's conv/matmul fusions win on these
shapes, so the lax formulations in ops/ stay the default production path and
these kernels remain the hand-kernel alternative (and the vehicle for future
fusion work, e.g. conv+FIR epilogues Mosaic can't express yet from XLA).
"""

import os

import jax


def enabled() -> bool:
    return os.environ.get("CLIP_GLASS_PALLAS", "0") == "1"


def interpret_mode() -> bool:
    """Interpret kernels off-TPU so tests exercise the same code path."""
    return jax.default_backend() != "tpu"
