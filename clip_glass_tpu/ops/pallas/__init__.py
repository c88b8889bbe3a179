"""Pallas TPU kernels for the hot ops (SURVEY.md §2 marks upfirdn2d /
modulated conv / fused bias-act as the rebuild's native-kernel surface).

Dispatch policy: the kernels are OPT-IN (CLIP_GLASS_PALLAS=1 for the
round-1 kernels, CLIP_GLASS_PALLAS_S2D=1 for the round-3 [2,2] fold conv).
Measured on a v5e chip: polyphase upsample2x 59.6ms vs 24.9ms for the XLA
dilated-depthwise-conv formulation; fused modulated 1x1 matmul 12.8ms vs
8.4ms for the XLA matmul chain (16x512x512x32 bf16); the round-3
s2d_conv2x2 kernel 208-216 vs 318-336 cand/s in-context on the flagship
step. XLA's conv/matmul emitters win on every production shape tried
across three rounds — the quantified case closure (per-op roofline table,
control experiments) is in DESIGN.md §7/§9 — so the lax formulations in
ops/ are the production path and these kernels remain exact, measured
baselines.
"""

import os

import jax


def enabled() -> bool:
    return os.environ.get("CLIP_GLASS_PALLAS", "0") == "1"


def interpret_mode() -> bool:
    """Interpret kernels off-TPU so tests exercise the same code path."""
    return jax.default_backend() != "tpu"
