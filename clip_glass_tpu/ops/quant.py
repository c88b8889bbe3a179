"""Opt-in int8 quantized execution of the frozen-model convolutions.

The v5e MXU executes int8 at 2x the bf16 rate (394 vs 197 TOPS), and the
flagship step's hot convs already sit at 72-96% of their *bf16* rooflines
(DESIGN.md §9) — int8 is the one remaining lever that moves the bound
itself. Measured at the production shapes (static-scale requantization, the
epilogue shape this module generates): [2,2,128,128] on 16x512^2 = 1.77x,
[3,3,128,128] = 1.76x over bf16.

Design — chosen so the quantization adds ZERO extra memory passes:

- Weights: per-output-channel symmetric int8 (scale = absmax/127), computed
  from the same (folded, frozen) kernels the bf16 path feeds the conv. The
  quantization is loop-invariant — XLA hoists it out of the generation loop.
- Activations: per-call-site STATIC scalar scales, calibrated once from a
  bf16 evaluation of a representative population at init (mode "calib"
  below). A static scale keeps the quantize/requantize steps pure
  elementwise ops that fuse into the producer/consumer convs; a *dynamic*
  absmax requantization was measured to erase the entire int8 win (it
  serializes a full reduction + rewrite pass between convs: 9.0 ms vs
  4.5 ms static vs 7.8 bf16 on the [2,2,128,128] class). Out-of-range
  activations saturate (jnp.clip) — the GA tolerates rare clipping; the
  calibration margin (config.quantize_margin) adds headroom.
- Accumulation: int32 (preferred_element_type), dequantized by the fused
  sw[o] * sx multiply in the conv epilogue; everything around the conv
  (demodulation, noise, bias, leaky-relu, phantom masks) stays in the
  bf16/fp32 policy exactly as before.

Scope/lifecycle: an ambient TRACE-TIME context (contextmanagers below).
`fitness.generator` wraps its batch evaluation in `int8_scope(scales)`, so
*whenever and wherever* that python body is traced (inside the jitted GA
step, under lax.map microbatching, inside lax.fori_loop generation chunks),
every eligible `ops.modulated_conv._conv` call — which includes every
phase-composed s2d/s4d fold kernel (ops/s2d.py) and the BigGAN bottleneck
segments — executes int8. Call sites are matched to calibrated scales by
trace order, which is deterministic for a fixed python code path; the
eligibility predicate depends only on static kernel shapes, so calibration
and execution traces enumerate identical sequences.

Eligibility: min(in_ch, out_ch) >= min_ch (default 64). This captures the
compute-heavy feature convs (the s2d [2,2]/[4,4] folds at C=128, the plain
mid-level 3x3s at C>=64, the dense 512-channel low-res stack) while leaving
the value-sensitive narrow RGB/skip paths (C = 3..48) in bf16.

This mode is an APPROXIMATION of the reference arithmetic (the only one in
the framework — everything else is exact modulo reduction order) and ships
strictly opt-in: Config.quantize = "int8" / CLI --quantize int8. Fitness
fidelity at production scale is measured by scripts/quant_fidelity.py and
recorded in DESIGN.md.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax.numpy as jnp
import numpy as np

INT8_MODES = ("int8",)


class _Ctx:
    __slots__ = ("mode", "min_ch", "records", "scales", "i")

    def __init__(self, mode: str, min_ch: int,
                 scales: Optional[np.ndarray] = None):
        self.mode = mode            # "calib" | "int8"
        self.min_ch = min_ch
        self.records = []           # calib: traced absmax scalars, call order
        self.scales = scales        # int8: host floats, same order
        self.i = 0


_CTX: Optional[_Ctx] = None


def eligible(w_shape, min_ch: int) -> bool:
    """Static predicate: quantize convs whose in/out channel counts are both
    >= min_ch. Must depend only on shapes so the calibration and execution
    traces enumerate the same call sites."""
    _, _, in_ch, out_ch = w_shape
    return min(in_ch, out_ch) >= min_ch


@contextlib.contextmanager
def calibration(min_ch: int = 64):
    """Trace-time recording mode: every eligible conv appends the traced
    absmax of its input to the yielded list (convs themselves run in the
    normal float path). Return the list's values from the traced function
    and feed them (with margin) to int8_scope."""
    global _CTX
    prev, _CTX = _CTX, _Ctx("calib", min_ch)
    try:
        yield _CTX.records
    finally:
        _CTX = prev


@contextlib.contextmanager
def int8_scope(scales: np.ndarray, min_ch: int = 64):
    """Trace-time int8 execution mode: eligible convs consume the calibrated
    activation scales in call order and run as int8 MXU convs."""
    global _CTX
    prev, _CTX = _CTX, _Ctx("int8", min_ch, np.asarray(scales, np.float64))
    try:
        yield
    finally:
        _CTX = prev


def conv_hook(x, w, run):
    """The single integration point, called by ops.modulated_conv._conv:
    `run(x, w, preferred_element_type)` performs the actual XLA conv. With
    no ambient context (the default) this is a plain pass-through."""
    ctx = _CTX
    if ctx is None or not eligible(w.shape, ctx.min_ch):
        return run(x, w, None)
    if ctx.mode == "calib":
        ctx.records.append(jnp.max(jnp.abs(jnp.asarray(x, jnp.float32))))
        return run(x, w, None)
    if ctx.scales is None or ctx.i >= len(ctx.scales):
        raise RuntimeError(
            f"int8_scope: conv call #{ctx.i} has no calibrated scale "
            f"({0 if ctx.scales is None else len(ctx.scales)} recorded) — "
            "the calibration trace and this trace took different paths")
    sx = float(ctx.scales[ctx.i])
    ctx.i += 1
    if not np.isfinite(sx) or sx <= 0.0:
        # dead/degenerate activation at calibration time: keep float
        return run(x, w, None)
    w32 = jnp.asarray(w, jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-30) / 127.0
    wq = jnp.clip(jnp.round(w32 / sw), -127, 127).astype(jnp.int8)
    xq = jnp.clip(jnp.round(jnp.asarray(x, jnp.float32) * (127.0 / sx)),
                  -127, 127).astype(jnp.int8)
    y = run(xq, wq, jnp.int32)
    return (y.astype(jnp.float32)
            * (sw * jnp.float32(sx / 127.0))).astype(x.dtype)
