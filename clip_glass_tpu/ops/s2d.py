"""Space-to-depth (s2d) execution domain for narrow-channel high-res levels.

StyleGAN2 config-f's top synthesis/discriminator levels run 3-32 channels at
512-1024px (reference stylegan2/models.py:744-750). On TPU, NHWC tensors with
C << 128 waste most of each (sublane, lane) tile: measured on a v5e, the
1024px ops run at ~60 GB/s effective — 7% of the 819 GB/s HBM roofline —
while the same elements laid out as [B, H/2, W/2, 4C] (C=128 = exactly one
lane tile) run 2.5-3x faster.

This module makes that layout an exact *execution domain*: every op of the
high-res segment (modulated 3x3 conv, fused 2x-up modulated conv, ToRGB 1x1,
FIR skip upsample, FIR+stride-2 down convs, bilinear resize) is re-expressed
as a standard XLA conv ON the s2d tensor with a phase-composed kernel, so the
full-resolution tensor never materializes in the fitness path.

Layout convention (phase-major): s2d(x)[b, p, q, (2r+c)*C + i] = x[b, 2p+r,
2q+c, i]. All kernel composition is exact (verified element-wise against the
plain path in tests/test_s2d.py); float differences are reduction-order only.

Lattice OFFSETS (round 2.5): a same-res 3x3 conv folded onto the aligned
lattice needs a [3,3,4I,4O] kernel — 4x the original MACs (75% of the phase
blocks are zero) because the nine full-res taps of an output pixel straddle
three cells per dimension. Folding between lattices that are offset by one
full-res pixel (cell v' of an offset -1 tensor holds rows 2v'-1 and 2v';
one extra cell row/col carries the two phantom rows -1 and H, stored as
zeros) makes the same window straddle only TWO cells: the kernel support
drops to [2,2] and the redundancy from 4x to 16/9 (measured 1.5-1.7x faster
at the production shapes). Alternating offsets 0 <-> -1 along a chain of
convs keeps every same-res conv at [2,2], the D skip convs shrink to
[3,3]/[2,2], and only the fold pads change elsewhere. Offsets are an
exact re-indexing; phantom cells must be zero whenever a conv consumes
them (mask_phantoms, fused by XLA into the producer's elementwise epilogue).

Behavioral reference for the ops themselves: stylegan2/modules.py:459-676
(FIR resampling), 920-967 (modulated conv), 1089-1139 (fused up),
1148-1260 (fused down); reference generator.py:45 (kornia 224px resize).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from clip_glass_tpu.ops.modulated_conv import (
    _conv,
    _polyphase_up_kernels,
    demod_coef,
)
from clip_glass_tpu.ops.upfirdn import setup_filter_kernel

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NHWC", "HWIO", "NHWC"))


# ------------------------------------------------------------ layout
#
# Offset convention: an s2d tensor with lattice offset `off` stores cell v'
# as full-res rows (2v' + off, 2v' + 1 + off). off=0 is the aligned lattice
# (H/2 cells); off=-1 has H/2 + 1 cells covering rows -1..H, where row -1
# (cell 0, phase 0) and row H (last cell, phase 1) are zero PHANTOMS.


def n_cells(size: int, off: int = 0) -> int:
    """Cell count of one spatial dim of an s2d tensor at lattice `off`."""
    return size // 2 + (1 if off else 0)


def phys_size(n: int, off: int = 0) -> int:
    """Inverse of n_cells: full-res extent from the cell count."""
    return 2 * (n - (1 if off else 0))


def s2d(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], phase-major."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def un_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H/2, W/2, 4C] -> [B, H, W, C] (inverse of s2d)."""
    B, Hh, Wh, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, Hh, Wh, 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * Hh, 2 * Wh, C)


def s2d_hw(n: jnp.ndarray, off: int = 0) -> jnp.ndarray:
    """Per-layer noise plane [H, W] -> [nh, nw, 4] (phase-major) on the
    lattice at `off` (phantom entries zero)."""
    if off:
        n = jnp.pad(n, ((1, 1), (1, 1)))
    H, W = n.shape
    return n.reshape(H // 2, 2, W // 2, 2).transpose(0, 2, 1, 3).reshape(
        H // 2, W // 2, 4)


def un_s2d_off(x: jnp.ndarray, off: int = 0) -> jnp.ndarray:
    """s2d tensor at lattice `off` -> plain [B, H, W, C] (phantoms dropped)."""
    y = un_s2d(x)
    if off:
        y = y[:, 1:-1, 1:-1, :]
    return y


def shift_to_m1(x: jnp.ndarray) -> jnp.ndarray:
    """Re-lattice an offset-0 s2d tensor to offset -1: [B,n,n,4C] ->
    [B,n+1,n+1,4C] with zero phantoms (one fused pad/concat pass)."""
    C = x.shape[-1] // 4
    p00, p01, p10, p11 = (x[..., i * C:(i + 1) * C] for i in range(4))

    def pad(a, t, l):
        return jnp.pad(a, ((0, 0), (t, 1 - t), (l, 1 - l), (0, 0)))

    # new phase (rp, cp) of cell (v, w) = full-res row/col (2v+rp-1, 2w+cp-1)
    return jnp.concatenate([
        pad(p11, 1, 1),   # (0,0): old (1,1)[v-1, w-1]
        pad(p10, 1, 0),   # (0,1): old (1,0)[v-1, w]
        pad(p01, 0, 1),   # (1,0): old (0,1)[v, w-1]
        pad(p00, 0, 0),   # (1,1): old (0,0)[v, w]
    ], axis=-1)


@lru_cache(maxsize=None)
def _phantom_masks(nh: int, nw: int, C4: int):
    C = C4 // 4
    mr = np.ones((nh, 1, C4), np.float32)
    mr[0, :, :2 * C] = 0.0        # row -1 lives in phases rp=0
    mr[-1, :, 2 * C:] = 0.0       # row H lives in phases rp=1
    mc = np.ones((1, nw, C4), np.float32)
    cp0 = np.r_[0:C, 2 * C:3 * C]                    # phases cp=0
    cp1 = np.r_[C:2 * C, 3 * C:4 * C]                # phases cp=1
    mc[:, 0, cp0] = 0.0
    mc[:, -1, cp1] = 0.0
    return mr, mc


def mask_phantoms(x: jnp.ndarray) -> jnp.ndarray:
    """Zero the phantom row/col entries of an offset -1 s2d tensor. Two
    broadcast multiplies; XLA fuses them into the producing elementwise
    chain (bias/act/noise), so this is free in practice."""
    mr, mc = _phantom_masks(x.shape[1], x.shape[2], x.shape[3])
    return x * jnp.asarray(mr, x.dtype) * jnp.asarray(mc, x.dtype)


def tile_channels(v: jnp.ndarray, phases: int = 4) -> jnp.ndarray:
    """Per-channel vector [..., C] -> [..., 4C] matching phase-major layout
    (every phase carries the same per-channel value)."""
    return jnp.concatenate([v] * phases, axis=-1)


# ------------------------------------------------------------ kernel folding
#
# Every transform below rewrites  y[v] = sum_t K[t] * x[s*v + t - p]  (per
# spatial dim) onto the half lattices v = 2v' + rv, j = 2j' + rj:
#     j' = s'*v' + floor((s*rv + t - p) / 2),   rj = (s*rv + t - p) mod 2
# so the op stays an ordinary conv with kernel indexed by (offset, rj, rv).


@lru_cache(maxsize=None)
def _fold_map(kh: int, p0: int, stride: int, fi: int, fo: int, sh: int):
    """Constant per-dimension 0/1 mapping tensor M[d, a, rj, rv] of the
    lattice fold (tap a of output phase rv lands at folded tap d, input
    phase rj). Returns (M, omin, kh')."""
    offs = [(stride * rv + a - p0 + sh) for rv in range(fo) for a in range(kh)]
    omin = min(o // fi for o in offs)
    kh_new = max(o // fi for o in offs) - omin + 1
    M = np.zeros((kh_new, kh, fi, fo), np.float32)
    for rv in range(fo):
        for a in range(kh):
            uh = stride * rv + a - p0 + sh
            M[uh // fi - omin, a, uh % fi, rv] = 1.0
    return M, omin, kh_new


def _fold(K: jnp.ndarray, p0: int, stride: int, in_s2d: bool, out_s2d: bool,
          in_off: int = 0, out_off: int = 0):
    """Fold a stride-`stride` conv kernel [kh, kw, I, O] with symmetric-ish
    pad start `p0` onto s2d input/output lattices at offsets `in_off`/
    `out_off` (see the layout section). Returns (K', p0', kh').
    Exact; ONE einsum against a constant mapping tensor (the loop-hoisted
    fold must be cheap: an earlier scatter-add formulation cost ~170 ms of
    in-program time per parameter set)."""
    kh, kw, I, O = K.shape
    fo = 2 if out_s2d else 1
    fi = 2 if in_s2d else 1
    s_new, rem = divmod(stride * fo, fi)
    assert rem == 0 and s_new >= 1, "lattice ratio must stay integral"
    # X index = stride * (fo*v' + rv + out_off) + t - p0 = fi*j' + rj + in_off
    sh = (stride * out_off if out_s2d else 0) - (in_off if in_s2d else 0)

    M, omin, kh_new = _fold_map(kh, p0, stride, fi, fo, sh)
    Mj = jnp.asarray(M)
    K32 = jnp.asarray(K, jnp.float32)
    # ci = (rjh*fi + rjw)*I + i  (J,K,i);  co = (rv*fo + rc)*O + o  (R,S,o)
    Kp = jnp.einsum("DaJR,EbKS,abio->DEJKiRSo", Mj, Mj, K32)
    Kp = Kp.reshape(kh_new, kh_new, fi * fi * I, fo * fo * O)
    return Kp, -omin, kh_new


@lru_cache(maxsize=None)
def _down_composite_taps(k: int, filter_taps: tuple):
    """Compose depthwise FIR + stride-2 conv (reference ConvDownLayer,
    stylegan2/modules.py:1197-1232) into one (k + fk - 1)-tap stride-2 conv's
    FIR coefficient table and pad start (the conv weights are folded in
    s2d_down_kernel)."""
    fk = setup_filter_kernel(filter_taps, gain=1.0, up_factor=1)
    pad = (fk.shape[-1] - 2) + (k - 1)
    return fk, (pad + 1) // 2


def s2d_same_kernel(w: jnp.ndarray, in_off: int = 0, out_off: int = 0):
    """Stride-1 'SAME' conv (reference ConvLayer pads: pad0 = (k-1) -
    (k-1)//2) on an s2d tensor: kernel [kh,kw,I,O] -> ([kh',kw',4I,4O], pad').
    With in_off != out_off a 3x3 kernel folds to [2,2] (see module docstring)."""
    k = w.shape[0]
    p0 = (k - 1) - (k - 1) // 2
    Kp, pad0, _ = _fold(w, p0, 1, True, True, in_off, out_off)
    return Kp, pad0


def _pad1_for(n_in: int, n_out: int, k: int, stride: int, pad0: int) -> int:
    """Trailing pad that makes a VALID-counted conv emit exactly n_out."""
    return (n_out - 1) * stride + k - pad0 - n_in


def s2d_up_kernel(w: jnp.ndarray, filter_taps=(1, 3, 3, 1)):
    """Fused 2x-up modulated conv (transposed conv + FIR) from a PLAIN input
    to an s2d output: the four composed phase kernels of
    ops/modulated_conv._polyphase_up_kernels stacked phase-major.
    Returns ([3,3,I,4O], pad0=1)."""
    Kp = _polyphase_up_kernels(w, tuple(filter_taps))  # [3,3,I,4,O]
    kh, kw, I, _, O = Kp.shape
    return Kp.reshape(kh, kw, I, 4 * O), 1


def s2d_up_kernel_from_s2d(w: jnp.ndarray, filter_taps=(1, 3, 3, 1),
                           in_off: int = 0):
    """Fused 2x-up modulated conv from an s2d INPUT to an s2d output: the
    polyphase kernel's input side folded onto the half lattice. The result is
    a lhs_dilation=2 conv at the physical level (in res H stored at H/2,
    out res 2H stored at H, output lattice offset 0): kernel [4,4,4I,4O],
    lhs_dilation 2. Derivation: y[v'] = sum_t Kp[t] x[v'+t-1] with
    x[2j'+rj+in_off] = xs[j', rj] => dilated-input tap index a+1-rj with
    pad0 = 2 + in_off (the kernel is offset-independent; only the pad moves)."""
    Kp = _polyphase_up_kernels(w, tuple(filter_taps))  # [3,3,I,4,O]
    kh, kw, I, _, O = Kp.shape
    Kp32 = jnp.asarray(Kp.reshape(kh, kw, I, 4 * O), jnp.float32)
    U = jnp.asarray(_dilated_fold_map())
    Kd = jnp.einsum("FaJ,GbK,abim->FGJKim", U, U, Kp32)
    return Kd.reshape(4, 4, 4 * I, 4 * O), 2 + in_off


@lru_cache(maxsize=None)
def _dilated_fold_map():
    """0/1 tensor U[f, a, rj]: dilated-conv tap index f = a + 1 - rj."""
    U = np.zeros((4, 3, 2), np.float32)
    for a in range(3):
        for rj in range(2):
            U[a + 1 - rj, a, rj] = 1.0
    return U


def s2d_down_kernel(w: jnp.ndarray, filter_taps=(1, 3, 3, 1),
                    out_s2d: bool = False, in_off: int = 0,
                    out_off: int = 0):
    """FIR + stride-2 conv (reference ConvDownLayer) from an s2d input to a
    half-res output — PLAIN ([kh',kw',4I,O], stride 1 at the physical level)
    or s2d ([kh',kw',4I,4O], stride 2). Returns (K', pad0', stride').
    Offsets shave a tap where the lattice alignment allows (the 1x1 skip's
    composite shrinks [4,4] -> [3,3] for in_off=-1)."""
    k = w.shape[0]
    fk, p0 = _down_composite_taps(k, tuple(filter_taps))
    kk = k + fk.shape[-1] - 1
    G = jnp.asarray(_compose_map(kk, fk.shape[-1], k))
    C = jnp.einsum("Usa,Vtb,st,abio->UVio", G, G,
                   jnp.asarray(fk, jnp.float32),
                   jnp.asarray(w, jnp.float32))
    Kp, pad0, _ = _fold(C, p0, 2, True, out_s2d, in_off, out_off)
    return Kp, pad0, (2 if out_s2d else 1)


@lru_cache(maxsize=None)
def _compose_map(kk: int, n_fir: int, k: int):
    """0/1 tensor G[u, s, t]: 2-D convolution index u = s + t (composing the
    depthwise FIR with the conv kernel as one einsum)."""
    G = np.zeros((kk, n_fir, k), np.float32)
    for s in range(n_fir):
        for t in range(k):
            G[s + t, s, t] = 1.0
    return G


@lru_cache(maxsize=None)
def _upsample2x_s2d_taps(filter_taps: tuple, gain: float):
    """FIR 2x upsample (reference Upsample, stylegan2/modules.py:549-604)
    from a PLAIN input to an s2d output: per-phase 2-tap polyphase of the
    separable kernel. Returns [2, 2, 2, 2] = [dj, dk, rv, rc] coefficients."""
    k2 = setup_filter_kernel(filter_taps, gain, up_factor=2)
    T = np.zeros((2, 2, 2, 2), np.float64)
    for rv in range(2):
        for dj in range(2):
            s1 = 2 * dj + 1 - rv            # tap of the 4-tap filter
            for rc in range(2):
                for dk in range(2):
                    s2 = 2 * dk + 1 - rc
                    T[dj, dk, rv, rc] = k2[s1, s2]
    return T


def s2d_upsample2x(y: jnp.ndarray, filter_taps=(1, 3, 3, 1),
                   gain: float = 1.0) -> jnp.ndarray:
    """upsample2x(y) in s2d form: [B,H,W,C] -> [B,H,W,4C] (phys same res)."""
    C = y.shape[-1]
    T = _upsample2x_s2d_taps(tuple(filter_taps), gain)
    K = np.zeros((2, 2, C, 4 * C), np.float64)
    for rv in range(2):
        for rc in range(2):
            for i in range(C):
                K[:, :, i, (rv * 2 + rc) * C + i] = T[:, :, rv, rc]
    return _conv(y, jnp.asarray(K, y.dtype), pad0=1, pad1=0)


# ------------------------------------------------------------ modulated ops


def _pallas_2x2_enabled() -> bool:
    """Opt-in dispatch of the offset-lattice [2,2] convs to the Mosaic
    kernel (ops/pallas/s2d_conv2x2.py): CLIP_GLASS_PALLAS_S2D=1."""
    import os
    return os.environ.get("CLIP_GLASS_PALLAS_S2D", "0") == "1"


def _pallas_2x2(x_s2d, Kp, pad0, style_t, demod_t):
    from clip_glass_tpu.ops.pallas.s2d_conv2x2 import s2d_conv2x2_pallas
    return s2d_conv2x2_pallas(x_s2d, Kp, style_t, demod_t, pad0=pad0)


def s2d_modulated_conv2d(x_s2d, w, style, *, demodulate: bool = True,
                         eps: float = 1e-8, in_off: int = 0,
                         out_off: int = 0):
    """modulated_conv2d on an s2d tensor. x_s2d: [B,nh,nw,4I] at lattice
    `in_off`; w: [k,k,I,O] (ORIGINAL kernel); style: [B,I]. Exact: input
    scaling and output demodulation tile per-phase; the spatial kernel folds
    onto the lattice pair (in_off != out_off keeps a 3x3 at [2,2] support)."""
    Kp, pad0 = s2d_same_kernel(w, in_off, out_off)
    k = Kp.shape[0]
    if (k == 2 and Kp.shape[2] == Kp.shape[3] == x_s2d.shape[-1]
            and _pallas_2x2_enabled()):
        d = demod_coef(w, style, eps) if demodulate else \
            jnp.ones_like(style, jnp.float32)
        return _pallas_2x2(x_s2d, Kp, pad0, tile_channels(style),
                           tile_channels(d))
    H = phys_size(x_s2d.shape[1], in_off)
    n_out = n_cells(H, out_off)
    pad1 = _pad1_for(x_s2d.shape[1], n_out, k, 1, pad0)
    xs = x_s2d * tile_channels(style).astype(x_s2d.dtype)[:, None, None, :]
    y = _conv(xs, Kp.astype(x_s2d.dtype), pad0=pad0, pad1=pad1)
    if demodulate:
        d = demod_coef(w, style, eps)
        y = y * tile_channels(d).astype(y.dtype)[:, None, None, :]
    return y


def s2d_modulated_conv2d_up(x, w, style, *, demodulate: bool = True,
                            filter_taps=(1, 3, 3, 1), eps: float = 1e-8,
                            input_s2d: bool = False, in_off: int = 0):
    """modulated_conv2d_up straight into s2d form (the polyphase composition
    WITHOUT the interleave that made it lose as a full-res op,
    ops/modulated_conv.py:133-155). Output lattice offset is always 0.

    input_s2d=False: x [B,H,W,I] plain -> [B,H,W,4O] (= s2d of 2H x 2W).
    input_s2d=True:  x s2d at lattice `in_off` -> [B,H,W,4O] via a
    lhs_dilation=2 conv at the physical level (the s2d(H) -> s2d(2H) up
    transition)."""
    if input_s2d:
        Kd, pad0 = s2d_up_kernel_from_s2d(w, filter_taps, in_off)
        n_in = x.shape[1]
        n_out = phys_size(n_in, in_off)  # cells of s2d(2H) at offset 0
        pad1 = _pad1_for(2 * n_in - 1, n_out, 4, 1, pad0)  # dilated length
        xs = x * tile_channels(style).astype(x.dtype)[:, None, None, :]
        y = _conv(xs, Kd.astype(x.dtype), pad0=pad0, pad1=pad1, lhs_dilation=2)
    else:
        Kp, pad0 = s2d_up_kernel(w, filter_taps)
        xs = x * style[:, None, None, :].astype(x.dtype)
        y = _conv(xs, Kp.astype(x.dtype), pad0=pad0, pad1=pad0)
    if demodulate:
        d = demod_coef(w, style, eps)
        y = y * tile_channels(d).astype(y.dtype)[:, None, None, :]
    return y


def s2d_conv2d(x_s2d, w, in_off: int = 0, out_off: int = 0):
    """Unmodulated stride-1 'SAME' conv on an s2d tensor (D fromRGB/conv0)."""
    Kp, pad0 = s2d_same_kernel(w, in_off, out_off)
    if (Kp.shape[0] == 2 and Kp.shape[2] == Kp.shape[3] == x_s2d.shape[-1]
            and _pallas_2x2_enabled()):
        ones = jnp.ones((x_s2d.shape[0], x_s2d.shape[-1]), jnp.float32)
        return _pallas_2x2(x_s2d, Kp, pad0, ones, ones)
    H = phys_size(x_s2d.shape[1], in_off)
    n_out = n_cells(H, out_off)
    pad1 = _pad1_for(x_s2d.shape[1], n_out, Kp.shape[0], 1, pad0)
    return _conv(x_s2d, Kp.astype(x_s2d.dtype), pad0=pad0, pad1=pad1)


def s2d_conv2d_down(x_s2d, w, *, filter_taps=(1, 3, 3, 1),
                    output_s2d: bool = False, in_off: int = 0,
                    out_off: int = 0):
    """FIR + stride-2 conv on an s2d input -> half-res output, PLAIN
    (default) or s2d (the level below also runs in the s2d domain)."""
    Kp, pad0, stride = s2d_down_kernel(w, filter_taps, out_s2d=output_s2d,
                                       in_off=in_off, out_off=out_off)
    k = Kp.shape[0]
    H = phys_size(x_s2d.shape[1], in_off)  # input physical resolution
    # output length: cells of s2d(H/2) at out_off, or H/2 plain... the conv
    # runs at the CELL level: n_in cells, stride' = stride
    n_out = n_cells(H // 2, out_off) if output_s2d else H // 2
    pad1 = _pad1_for(x_s2d.shape[1], n_out, k, stride, pad0)
    return _conv(x_s2d, Kp.astype(x_s2d.dtype), stride=stride,
                 pad0=pad0, pad1=pad1)


# ------------------------------------------------------------ BigGAN ops
#
# BigGAN-deep's bottleneck blocks (reference models.py:65-86 via
# pytorch_pretrained_biggan) run mid = in/4 channels at up to 512px —
# the same narrow-channel pathology as StyleGAN2's top levels. The mid
# segment (conv0 1x1 -> [up] -> conv1 3x3 -> conv2 3x3 -> conv3 1x1) maps
# onto the s2d domain with NO standalone layout transposes: conv0 folds
# plain->s2d, the nearest-neighbour upsample composes into conv1, and
# conv3 folds s2d->plain.


def s2d_enter_conv1x1(x_plain, w, out_off: int = 0):
    """1x1 conv [I -> O] from a PLAIN tensor straight into s2d form:
    y_s2d[v,w,(rp,cp,o)] = (x @ w)[2v+rp+off, 2w+cp+off, o] — a stride-2
    conv with the per-phase kernel. Exact (pointwise op re-indexed)."""
    I, O = w.shape[2], w.shape[3]
    assert w.shape[0] == w.shape[1] == 1
    Kp, pad0, _ = _fold(w, 0, 1, False, True, 0, out_off)
    H = x_plain.shape[1]
    n_out = n_cells(H, out_off)
    pad1 = _pad1_for(H, n_out, Kp.shape[0], 2, pad0)
    return _conv(x_plain, Kp.astype(x_plain.dtype), stride=2,
                 pad0=pad0, pad1=pad1)


def s2d_exit_conv1x1(x_s2d, w, in_off: int = 0):
    """1x1 conv [I -> O] from an s2d tensor back to PLAIN full resolution:
    a lhs_dilation=2 conv whose [2,2] taps pick the right phase block per
    output pixel. Exact."""
    I, O = w.shape[2], w.shape[3]
    assert w.shape[0] == w.shape[1] == 1
    w32 = jnp.asarray(w[0, 0], jnp.float32)
    K = jnp.zeros((2, 2, 4 * I, O), jnp.float32)
    # y[m] = x_plain[m] @ w; x_plain[m] = xs[(m-oi)//2, (m-oi)%2];
    # dilated tap tau = pad0 - oi - rj (same both dims); pad0 = 1 + oi keeps
    # taus in {0, 1}
    pad0 = 1 + in_off
    for rjh in range(2):
        for rjw in range(2):
            th = pad0 - in_off - rjh
            tw = pad0 - in_off - rjw
            ci = (rjh * 2 + rjw) * I
            K = K.at[th, tw, ci:ci + I, :].set(w32)
    n_in = x_s2d.shape[1]
    H = phys_size(n_in, in_off)
    pad1 = _pad1_for(2 * n_in - 1, H, 2, 1, pad0)  # dilated input length
    return _conv(x_s2d, K.astype(x_s2d.dtype), pad0=pad0, pad1=pad1,
                 lhs_dilation=2)


@lru_cache(maxsize=None)
def _nearest_up_fold_map(kh: int, in_off: int, out_off: int = 0):
    """Mapping tensor M[tau, a, rj, rv] for conv(k=kh, SAME-pad p0=(kh-1)//2
    ... reference pad (k-1)//2) composed with a 2x NEAREST upsample of the
    input, from s2d(H, in_off) to s2d(2H, out_off) as a lhs_dilation=2 conv.
    y[2v'+oo+rv] = sum_a K[a] x_up[2v'+oo+rv+a-p0], x_up[i] = x_plain[i//2].
    With out_off=-1 the output carries phantom cells (mask before use)."""
    p0 = (kh - 1) // 2
    entries = []
    for rv in range(2):
        for a in range(kh):
            # + v' (the 2v' term floors away)
            du = (out_off + rv + a - p0) // 2
            for rj in range(2):
                # x_plain[v'+du] = xs[(v'+du-oi)//2, (v'+du-oi)%2]
                entries.append((du, rj, rv, a))
    taus = [du - in_off - rj for (du, rj, rv, a) in entries]
    tmin = min(taus)
    kt = max(taus) - tmin + 1
    M = np.zeros((kt, kh, 2, 2), np.float32)
    for (du, rj, rv, a) in entries:
        # the (du, rj) pair must actually address x_plain[v'+du]: phase rj
        # contributes only when (v'+du-oi) % 2 == rj — but v' is free, so
        # BOTH phases appear; the tap position encodes which cell.
        M[du - in_off - rj - tmin, a, rj, rv] += 1.0
    return M, -tmin


def s2d_nearest_up_conv(x_s2d, w, in_off: int = 0, out_off: int = 0):
    """conv2d 'SAME' (pad (k-1)//2, the BigGAN convention) applied to the 2x
    NEAREST-upsampled input, computed directly from the s2d input to the
    s2d(2H, out_off) output as one lhs_dilation=2 conv. Exact. out_off=-1
    emits phantom cells (garbage until mask_phantoms) and shrinks the fold
    kernel by one tap; it sets up an offset-alternating chain whose exit
    lands back at offset 0 (see s2d_exit_conv1x1_skip)."""
    kh, kw, I, O = w.shape
    M, pad0 = _nearest_up_fold_map(kh, in_off, out_off)
    Mj = jnp.asarray(M)
    K32 = jnp.asarray(w, jnp.float32)
    Kp = jnp.einsum("DaJR,EbKS,abio->DEJKiRSo", Mj, Mj, K32)
    kt = Kp.shape[0]
    Kp = Kp.reshape(kt, kt, 4 * I, 4 * O)
    n_in = x_s2d.shape[1]
    H = phys_size(n_in, in_off)      # input physical resolution
    n_out = n_cells(2 * H, out_off)  # cells of s2d(2H) at out_off
    pad1 = _pad1_for(2 * n_in - 1, n_out, kt, 1, pad0)  # dilated length
    return _conv(x_s2d, Kp.astype(x_s2d.dtype), pad0=pad0, pad1=pad1,
                 lhs_dilation=2)


def s2d_exit_conv1x1_skip(x_s2d, w, skip, in_off: int = 0):
    """s2d_exit_conv1x1 with a fused nearest-up residual: returns
    plain(conv1x1(x_s2d)) + nearest_up_2x(skip) as ONE lhs_dilation=2 conv.

    skip: [B, n, n, O] at the PRE-up resolution — which, at in_off=0, is
    exactly the cell lattice of x_s2d (cell v' covers output rows 2v',
    2v'+1, and nearest-up gives both rows skip[v']). The skip is CONCATed
    onto the s2d channels and the kernel extended with identity taps at
    all four [2,2] positions: per output pixel the input dilation zeros
    select exactly one of them (the containing cell), so no full-res skip
    tensor is ever materialized and the add rides the conv epilogue.
    Replaces BigGAN-deep's residual `h + upsample_nearest(x0)` for the
    s2d up-blocks (reference consumes it via pytorch-pretrained-biggan,
    models.py:65-86). Exact; requires in_off == 0 (with in_off=-1 the two
    output rows of a cell straddle two skip cells and the fold needs a
    [3,3] kernel — 2.25x the taps — instead)."""
    assert in_off == 0, "skip fusion requires the offset-0 exit lattice"
    I, O = w.shape[2], w.shape[3]
    assert w.shape[0] == w.shape[1] == 1 and skip.shape[-1] == O
    w32 = jnp.asarray(w[0, 0], jnp.float32)
    K = jnp.zeros((2, 2, 4 * I + O, O), jnp.float32)
    pad0 = 1
    eye = jnp.eye(O, dtype=jnp.float32)
    for rjh in range(2):
        for rjw in range(2):
            th, tw = pad0 - rjh, pad0 - rjw
            ci = (rjh * 2 + rjw) * I
            K = K.at[th, tw, ci:ci + I, :].set(w32)
            # skip identity: tap (rjh, rjw) hits dilated position
            # 2*(m//2) exactly when the output parities match — the other
            # three taps land on dilation zeros for that pixel
            K = K.at[rjh, rjw, 4 * I:, :].set(eye)
    xin = jnp.concatenate([x_s2d, skip.astype(x_s2d.dtype)], axis=-1)
    n_in = x_s2d.shape[1]
    H = phys_size(n_in, 0)
    pad1 = _pad1_for(2 * n_in - 1, H, 2, 1, pad0)  # dilated input length
    return _conv(xin, K.astype(x_s2d.dtype), pad0=pad0, pad1=pad1,
                 lhs_dilation=2)


# ------------------------------------------------------------ s4d RGB domain
#
# The RGB/skip-accumulator path carries C=3 tensors; even in s2d form
# (12 channels) they waste ~90% of every (8,128) lane tile, and the trace
# shows ~12 ms/generation of ToRGB writes, norm/denorm layout copies and
# the D fromRGB read against such buffers. A 4x4 space-to-depth packing
# (s4d: [B, H/4, W/4, 16C] = 48 channels, phase-major with channel
# (rp*4+cp)*C + c for the block-internal row/col rp, cp in 0..3) cuts the
# physical size 4x. All boundary ops fold exactly: ToRGB lands s2d->s4d,
# the FIR skip upsample runs s4d->s4d (lhs_dilation over cells, the
# parity-dependent taps resolved by the dilation zeros), the 224px resize
# contracts the 16 phases, and the D fromRGB folds s4d->s2d. s4d tensors
# are kept at lattice offset 0 (rows 4v..4v+3) — no phantoms.


def s4d(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/4, W/4, 16C], phase-major (rp*4+cp)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 4, 4, W // 4, 4, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 4, W // 4, 16 * C)


def un_s4d(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H/4, W/4, 16C] -> [B, H, W, C] (inverse of s4d)."""
    B, Hq, Wq, C16 = x.shape
    C = C16 // 16
    x = x.reshape(B, Hq, Wq, 4, 4, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 4 * Hq, 4 * Wq, C)


def s2d_to_s4d(x_s2d: jnp.ndarray) -> jnp.ndarray:
    """Repack an offset-0 s2d tensor [B, H/2, W/2, 4C] as s4d
    [B, H/4, W/4, 16C]: s4d phase rp splits as (jr, r2) = (rp//2, rp%2)
    where jr indexes the s2d cell pair and r2 the s2d phase."""
    B, n, m, C4 = x_s2d.shape
    C = C4 // 4
    x = x_s2d.reshape(B, n // 2, 2, m // 2, 2, 2, 2, C)
    # dims: B, q1, jr, q2, kr, r2, c2, C -> B, q1, q2, (jr, r2, kr, c2), C
    x = x.transpose(0, 1, 3, 2, 5, 4, 6, 7)
    return x.reshape(B, n // 2, m // 2, 16 * C)


def s4d_from_s2d_conv1x1(x_s2d, w, in_off: int = 0):
    """1x1 conv [I -> O] from an s2d tensor (lattice `in_off`) straight to
    s4d(0): per output phase rp the source row is 4v''+rp, i.e. s2d cell
    (4v''+rp-oi)//2 phase (4v''+rp-oi)%2 — a stride-2 conv whose taps
    select the right (cell, phase) per output phase. Exact."""
    assert w.shape[0] == w.shape[1] == 1
    I, O = w.shape[2], w.shape[3]
    w32 = jnp.asarray(w[0, 0], jnp.float32)
    taus = [(rp - in_off) // 2 for rp in range(4)]
    rjs = [(rp - in_off) % 2 for rp in range(4)]
    kh = max(taus) + 1
    K = jnp.zeros((kh, kh, 4 * I, 16 * O), jnp.float32)
    for rp in range(4):
        for cp in range(4):
            ci = (rjs[rp] * 2 + rjs[cp]) * I
            co = (rp * 4 + cp) * O
            K = K.at[taus[rp], taus[cp], ci:ci + I, co:co + O].set(w32)
    n_in = x_s2d.shape[1]
    H = phys_size(n_in, in_off)
    n_out = H // 4
    pad1 = _pad1_for(n_in, n_out, kh, 2, 0)
    return _conv(x_s2d, K.astype(x_s2d.dtype), stride=2, pad0=0, pad1=pad1)


@lru_cache(maxsize=None)
def _s4d_up_map(filter_taps: tuple, gain: float):
    """Fold of the FIR 2x upsample (reference Upsample) from s4d(H, 0) to
    s4d(2H, 0) as a lhs_dilation=2 conv over cells: out full row
    m = 4v''+rv = 2p+rm; Y[m] = sum_dj k2[2dj+1-rm] X[p+dj-1]; the input
    pixel u = 2v'' + rv//2 + dj - 1 maps to cell u//4 / phase u%4, with the
    cell arithmetic depending on v'' parity — both parities get their own
    tap slots, the dilation zeros mask the mismatched one. Returns
    (M[t, pu, rv] coefficients, pad0)."""
    k1 = np.asarray(filter_taps, np.float64)
    k1 = k1 / k1.sum() * np.sqrt(float(gain)) * 2.0  # separable 1-D factor
    entries = {}
    pad0 = 2
    for parity in (0, 1):        # v'' = 2w + parity
        for rv in range(4):
            rm = rv % 2
            for dj in (0, 1):
                coef = float(k1[2 * dj + 1 - rm])
                if coef == 0.0:
                    continue
                delta = rv // 2 + dj - 1
                u_base = 2 * parity + delta      # u - 4w
                c_rel = u_base // 4              # cell - w
                pu = u_base % 4
                tau = 2 * c_rel - parity + pad0  # dilated tap index
                key = (tau, pu, rv)
                entries[key] = entries.get(key, 0.0) + coef
    kt = max(t for (t, _, _) in entries) + 1
    M = np.zeros((kt, 4, 4), np.float32)
    for (t, pu, rv), coef in entries.items():
        M[t, pu, rv] = coef
    return M, pad0


def s4d_upsample2x(y: jnp.ndarray, filter_taps=(1, 3, 3, 1),
                   gain: float = 1.0) -> jnp.ndarray:
    """upsample2x on an s4d tensor: [B, H/4, W/4, 16C] -> [B, H/2, W/2, 16C]
    (physical 2x). Exact (tests vs ops/upfirdn.upsample2x)."""
    C = y.shape[-1] // 16
    M, pad0 = _s4d_up_map(tuple(filter_taps), gain)
    kt = M.shape[0]
    Mj = jnp.asarray(M)
    eye = jnp.eye(C, dtype=jnp.float32)
    # K[t1, t2, (pu1*4+pu2)*C+c, (rv1*4+rv2)*C+c]
    K = jnp.einsum("tpr,uqs,cd->tupqcrsd", Mj, Mj, eye)
    K = K.reshape(kt, kt, 16 * C, 16 * C)
    n_in = y.shape[1]
    n_out = 2 * n_in
    pad1 = _pad1_for(2 * n_in - 1, n_out, kt, 1, pad0)
    return _conv(y, K.astype(y.dtype), pad0=pad0, pad1=pad1, lhs_dilation=2)


@lru_cache(maxsize=None)
def _plain_to_s4d_up_taps(filter_taps: tuple, gain: float):
    """1-D polyphase map M[t, pu] of the FIR 2x upsample read directly in
    s4d phase coordinates: output pixel m = 4w + pu = 2v + rv (so
    v = 2w + pu//2, rv = pu%2) reads plain input u = 2w + (pu//2 - 1 + dj)
    with tap k1[2dj+1-rv], dj in {0,1} — the same per-phase 2-tap polyphase
    as _upsample2x_s2d_taps, re-indexed onto stride-2 cells: a width-3
    stride-2 window (t = pu//2 + dj, pad 1)."""
    k1 = np.asarray(filter_taps, np.float64)
    k1 = k1 / k1.sum() * np.sqrt(float(gain)) * 2.0
    M = np.zeros((3, 4), np.float64)
    for pu in range(4):
        for dj in (0, 1):
            M[pu // 2 + dj, pu] += float(k1[2 * dj + 1 - (pu % 2)])
    return M


def plain_to_s4d_upsample2x(y: jnp.ndarray, filter_taps=(1, 3, 3, 1),
                            gain: float = 1.0) -> jnp.ndarray:
    """upsample2x from a PLAIN [B, H, W, C] tensor straight into the s4d
    domain at 2x physical resolution: [B, H/2, W/2, 16C]. Composes
    s2d_to_s4d(s2d_upsample2x(y)) into ONE stride-2 [3,3,C,16C] conv — the
    separate form costs a lane-starved 4C-channel intermediate plus its
    repack copies (~1.6 ms/step at the 1024px flagship: trace rows
    fusion.1564/copy.536/copy.537, DESIGN.md §9). Exact (tested vs the
    composed path). Reference behavior: Upsample then ToRGB skip add,
    stylegan2/modules.py:530-604 + models.py:969-1014."""
    C = y.shape[-1]
    M = jnp.asarray(_plain_to_s4d_up_taps(tuple(filter_taps), float(gain)),
                    jnp.float32)
    eye = jnp.eye(C, dtype=jnp.float32)
    # K[t1, t2, c, (pu_row*4 + pu_col)*C + c]  (s4d phase-major layout)
    K = jnp.einsum("tp,uq,cd->tucpqd", M, M, eye).reshape(3, 3, C, 16 * C)
    return _conv(y, K.astype(y.dtype), stride=2, pad0=1, pad1=1)


def s2d_from_s4d_conv1x1(y_s4d, w, out_off: int = 0):
    """1x1 conv [I -> O] from an s4d(0) tensor to an s2d tensor at lattice
    `out_off` (the D fromRGB entry): out row m = 2v'+rp+oo reads s4d cell
    m//4 phase m%4 — a lhs_dilation=2 conv over cells. Exact."""
    assert w.shape[0] == w.shape[1] == 1
    I, O = w.shape[2], w.shape[3]
    w32 = jnp.asarray(w[0, 0], jnp.float32)
    # out cell v' parity of m vs 4: m = 2v' + rp + oo; v' = 2w + parity
    pad0 = 2
    entries = {}
    for parity in (0, 1):
        for rp in range(2):
            m_base = 2 * parity + rp + out_off   # m - 4w
            c_rel = m_base // 4
            pu = m_base % 4
            tau = 2 * c_rel - parity + pad0
            entries[(tau, pu, rp, parity)] = 1.0
    kt = max(t for (t, _, _, _) in entries) + 1
    K = jnp.zeros((kt, kt, 16 * I, 4 * O), jnp.float32)
    for (t1, pu1, rp1, _) in entries:
        for (t2, pu2, rp2, _) in entries:
            ci = (pu1 * 4 + pu2) * I
            co = (rp1 * 2 + rp2) * O
            K = K.at[t1, t2, ci:ci + I, co:co + O].set(w32)
    n_in = y_s4d.shape[1]
    H = 4 * n_in
    n_out = n_cells(H, out_off)
    pad1 = _pad1_for(2 * n_in - 1, n_out, kt, 1, pad0)
    return _conv(y_s4d, K.astype(y_s4d.dtype), pad0=pad0, pad1=pad1,
                 lhs_dilation=2)


def resize_bilinear_from_s4d(img_s4d: jnp.ndarray, size: int = 224):
    """[B, H/4, W/4, 16C] s4d image -> [B, C, size, size] (NCHW), the
    bilinear weight matrix folding the 4-phase index per dimension."""
    B, Hq, Wq, C16 = img_s4d.shape
    C = C16 // 16
    dt = img_s4d.dtype
    R_h = jnp.asarray(_bilinear_matrix(4 * Hq, size).reshape(size, Hq, 4), dt)
    R_w = jnp.asarray(_bilinear_matrix(4 * Wq, size).reshape(size, Wq, 4), dt)
    x = img_s4d.reshape(B, Hq, Wq, 4, 4, C)
    t = jnp.einsum("bpqrsc,opr->boqsc", x, R_h,
                   preferred_element_type=jnp.float32)
    z = jnp.einsum("boqsc,wqs->bowc", t.astype(dt), R_w,
                   preferred_element_type=jnp.float32)
    return jnp.transpose(z, (0, 3, 1, 2))


# ------------------------------------------------------------ resize


@lru_cache(maxsize=None)
def _bilinear_matrix(src: int, dst: int):
    """Exact jax.image.resize(bilinear, antialias=False) row-weight matrix
    [dst, src], via resize of the identity (the op is linear/separable)."""
    eye = np.eye(src, dtype=np.float32)
    with jax.ensure_compile_time_eval():  # stay concrete under jit tracing
        R = jax.image.resize(jnp.asarray(eye), (dst, src), method="bilinear",
                             antialias=False)
    return np.asarray(R, np.float32)


def resize_bilinear_from_s2d(img_s2d: jnp.ndarray, size: int = 224,
                             in_off: int = 0):
    """[B, nh, nw, 4C] s2d image (lattice `in_off`) -> [B, C, size, size]
    (NCHW, matching ops/resize.resize_bilinear semantics) without
    materializing the full-res image: the bilinear weight matrix folds the
    phase index (phantom rows get zero weight, so they never contribute)."""
    B, Hh, Wh, C4 = img_s2d.shape
    C = C4 // 4
    dt = img_s2d.dtype

    def mat(n):
        R = _bilinear_matrix(phys_size(n, in_off), size)
        if in_off:  # zero weight columns for the phantom rows -1 and H
            R = np.pad(R, ((0, 0), (1, 1)))
        return R.reshape(size, n, 2)

    R_h = jnp.asarray(mat(Hh), dt)
    R_w = jnp.asarray(mat(Wh), dt)
    x = img_s2d.reshape(B, Hh, Wh, 2, 2, C)
    # contract H (p, r) then W (q, s); fp32 accumulation, source-dtype reads
    t = jnp.einsum("bpqrsc,opr->boqsc", x, R_h,
                   preferred_element_type=jnp.float32)
    z = jnp.einsum("boqsc,wqs->bowc", t.astype(dt), R_w,
                   preferred_element_type=jnp.float32)
    return jnp.transpose(z, (0, 3, 1, 2))
