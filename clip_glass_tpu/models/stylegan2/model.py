"""StyleGAN2 generator (mapping + synthesis) and discriminator, TPU-native.

Behavioral reference: stylegan2/models.py (GeneratorMapping 516-627,
GeneratorSynthesis 753-1014, Generator truncation 314-324, Discriminator
1017-1230) and stylegan2/modules.py conv blocks (1263-1601). Config-f:
channels [32,32,64,128,256,512,512,512,512], base 4x4, skip-G / resnet-D,
2-layer blocks, 18 style layers at 1024px.

TPU-first design decisions:
- NHWC layout end-to-end; every conv is a standard batched XLA conv
  (modulation via ops/modulated_conv's input-scale/output-demod identity).
- All equalized-lr runtime coefficients (he_std * lr_mul,
  stylegan2/modules.py:87-118) are folded into the stored parameters at
  init/conversion time, so the forward pass touches no scalars.
- Noise is injected from an explicit per-layer list (deterministic fitness
  for the GA) or freshly drawn from a key to match the reference's
  random-noise default (NoiseInjectionWrapper, stylegan2/modules.py:303-456,
  whose buffers are excluded from checkpoints, so reference searches run
  with fresh noise each call).
- Mapping + synthesis for an 18-layer 1024px model stays one jittable
  function of (params, z); the population axis is just the batch.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clip_glass_tpu.core.dtypes import Policy, FP32
from clip_glass_tpu.ops.bias_act import bias_act, minibatch_std
from clip_glass_tpu.ops.modulated_conv import (
    conv2d,
    conv2d_down,
    modulated_conv2d,
    modulated_conv2d_up,
    style_from_latent,
)
from clip_glass_tpu.ops.upfirdn import upsample2x


@dataclasses.dataclass(frozen=True)
class SG2Config:
    latent_size: int = 512
    label_size: int = 0
    mapping_layers: int = 8
    mapping_lr_mul: float = 0.01
    channels: Sequence[int] = (32, 32, 64, 128, 256, 512, 512, 512, 512)
    base_size: int = 4
    data_channels: int = 3
    conv_block_size: int = 2
    kernel_size: int = 3
    filter_taps: Sequence[int] = (1, 3, 3, 1)
    mbstd_group_size: int = 4
    demodulate: bool = True
    modulate_data_out: bool = True
    noise: bool = True
    eps: float = 1e-8
    # Levels with output resolution >= this run in the space-to-depth
    # execution domain (ops/s2d.py): [B,H,W,C] stored as [B,H/2,W/2,4C],
    # exact phase-composed kernels, full-res tensors never materialized.
    # 512 = config-f's 32-64 channel levels, where the plain layout runs at
    # ~7% of the HBM roofline on TPU (measured). 2**30 disables.
    s2d_min_res: int = 512
    # Alternate the s2d lattice offset (0 <-> -1) between consecutive convs
    # so every same-res 3x3 folds to a [2,2] kernel instead of [3,3] — a
    # 2.25x MAC cut on the dominant high-res convs (ops/s2d.py docstring).
    s2d_offsets: bool = True
    # Carry the RGB/skip-accumulator path (C = data_channels) in the 4x4
    # space-to-depth domain (s4d, 16C channels) at the s2d levels: 12-channel
    # s2d RGB tensors waste ~90% of every lane tile (ops/s2d.py "s4d RGB
    # domain" section).
    rgb_s4d: bool = True

    @property
    def n_blocks(self) -> int:
        return len(self.channels)

    @property
    def resolution(self) -> int:
        return self.base_size * 2 ** (self.n_blocks - 1)

    @property
    def num_latents(self) -> int:
        # reference stylegan2/models.py:890-896
        n = 1 + self.conv_block_size * (self.n_blocks - 1)
        return n + 1 if self.modulate_data_out else n

    def block_channels(self) -> List[tuple]:
        """Synthesis blocks, first->last: (in_ch, out_ch, up, n_layers)."""
        ch = list(self.channels)
        blocks = [(ch[-1], ch[-1], False, 1)]
        for i in range(1, len(ch)):
            blocks.append((ch[-i], ch[-i - 1], True, self.conv_block_size))
        return blocks

    def noise_shapes(self) -> List[tuple]:
        shapes = []
        size = self.base_size
        for bi, (_, _, up, n_layers) in enumerate(self.block_channels()):
            if up:
                size *= 2
            shapes.extend([(size, size)] * n_layers)
        return shapes


CONFIG_F = SG2Config()

# Every GENERATOR forward consumer feeds weights through
# policy.cast_compute (the s2d/s4d ToRGB folds are value-preserving
# re-indexings), EXCEPT `truncate`, which lerps against dlatent_avg raw in
# fp32 — staging a frozen G tree for the compute dtype
# (core.dtypes.precast_params) is bitwise-exact with that one leaf
# excluded (asserted in tests/test_s2d.py). The DISCRIMINATOR is NOT
# precast-safe: its s2d down-composite folds (ops/s2d.s2d_down_kernel)
# compose FIR taps with the raw fp32 weights and round once at the end;
# pre-cast weights would move the rounding before the composition.
PRECAST_EXCLUDE = ("dlatent_avg",)
# tiny variant for tests / dryrun: 3 blocks -> 16px, slim channels
TINY = SG2Config(latent_size=32, mapping_layers=2,
                 channels=(16, 16, 16), mbstd_group_size=2)


# ---------------------------------------------------------------- init

def _he_coef(shape, gain=1.0, lr_mul=1.0):
    fan_in = int(np.prod(shape[:-1]))
    return gain / math.sqrt(fan_in) * lr_mul


def _dense_init(key, in_f, out_f, lr_mul=1.0, bias_init=0.0):
    """Effective (runtime-coefficient-folded) equalized-lr dense params."""
    coef = _he_coef((in_f,), 1.0, lr_mul)
    w = jax.random.normal(key, (in_f, out_f)) * (1.0 / lr_mul) * coef
    b = jnp.full((out_f,), bias_init * lr_mul, jnp.float32)
    return {"w": w, "b": b}


def _conv_params(key, in_ch, out_ch, k, latent=None, lr_mul=1.0,
                 noise: bool = False):
    kw, ks = jax.random.split(key)
    coef = _he_coef((k, k, in_ch), 1.0, lr_mul)
    p = {"w": jax.random.normal(kw, (k, k, in_ch, out_ch)) * (1.0 / lr_mul) * coef,
         "b": jnp.zeros((out_ch,))}
    if latent is not None:
        p["style"] = _dense_init(ks, latent, in_ch, lr_mul, bias_init=1.0)
    if noise:
        p["noise_scale"] = jnp.zeros(())
    return p


def mapping_init(key, cfg: SG2Config = CONFIG_F):
    keys = jax.random.split(key, cfg.mapping_layers + 1)
    params = {"dense": [
        _dense_init(keys[i], cfg.latent_size, cfg.latent_size, cfg.mapping_lr_mul)
        for i in range(cfg.mapping_layers)]}
    if cfg.label_size:
        params["embedding"] = jax.random.normal(
            keys[-1], (cfg.label_size, cfg.latent_size))
    return params


def synthesis_init(key, cfg: SG2Config = CONFIG_F):
    blocks = cfg.block_channels()
    keys = jax.random.split(key, 2 * len(blocks) + 1)
    params = {
        "const": jax.random.normal(keys[-1], (cfg.base_size, cfg.base_size,
                                               cfg.channels[-1])),
        "blocks": [], "to_rgb": [],
    }
    for bi, (in_ch, out_ch, up, n_layers) in enumerate(blocks):
        bkeys = jax.random.split(keys[2 * bi], n_layers)
        layers = []
        c_in = in_ch
        for li in range(n_layers):
            layers.append(_conv_params(bkeys[li], c_in, out_ch, cfg.kernel_size,
                                       latent=cfg.latent_size, noise=cfg.noise))
            c_in = out_ch
        params["blocks"].append({"layers": layers})
        params["to_rgb"].append(_conv_params(
            keys[2 * bi + 1], out_ch, cfg.data_channels, 1,
            latent=cfg.latent_size if cfg.modulate_data_out else None))
    return params


def generator_init(key, cfg: SG2Config = CONFIG_F):
    km, ks = jax.random.split(key)
    return {"mapping": mapping_init(km, cfg),
            "synthesis": synthesis_init(ks, cfg),
            "dlatent_avg": jnp.zeros((cfg.latent_size,))}


def discriminator_init(key, cfg: SG2Config = CONFIG_F):
    ch = list(cfg.channels)
    n = len(ch)
    keys = jax.random.split(key, 4 * n + 4)
    params = {"from_rgb": _conv_params(keys[0], cfg.data_channels, ch[0], 1),
              "blocks": []}
    ki = 1
    for i in range(n - 1):
        params["blocks"].append({
            "conv0": _conv_params(keys[ki], ch[i], ch[i], cfg.kernel_size),
            "conv1": _conv_params(keys[ki + 1], ch[i], ch[i + 1], cfg.kernel_size),
            "skip": {"w": jax.random.normal(keys[ki + 2], (1, 1, ch[i], ch[i + 1]))
                     * _he_coef((1, 1, ch[i]), 1.0, 1.0)},
        })
        ki += 3
    mb_extra = 1 if cfg.mbstd_group_size else 0
    params["final_conv"] = _conv_params(keys[ki], ch[-1] + mb_extra, ch[-1],
                                        cfg.kernel_size)
    params["dense0"] = _dense_init(keys[ki + 1],
                                   ch[-1] * cfg.base_size ** 2, ch[-1])
    params["dense1"] = _dense_init(keys[ki + 2], ch[-1], max(1, cfg.label_size))
    return params


# ---------------------------------------------------------------- forward

def mapping_apply(params, latents, cfg: SG2Config = CONFIG_F,
                  labels=None, policy: Policy = FP32):
    """z -> w (reference stylegan2/models.py:589-627): optional label embed
    concat, RMS input normalize, 8x dense+lrelu*sqrt(2)."""
    x = policy.cast_compute(latents)
    if labels is not None:
        y = policy.cast_compute(params["embedding"][labels])
        x = jnp.concatenate([x, y], axis=-1)
    x32 = jnp.asarray(x, jnp.float32)
    x = (x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), -1, keepdims=True)
                             + cfg.eps)).astype(x.dtype)
    for d in params["dense"]:
        x = x @ policy.cast_compute(d["w"])
        x = bias_act(x, policy.cast_compute(d["b"]), act="lrelu")
    return x


def truncate(dlatents, dlatent_avg, psi: float = 1.0,
             cutoff: Optional[int] = None):
    """Truncation lerp toward dlatent_avg (reference stylegan2/models.py:265-324).
    dlatents: [B, n_latents, D]."""
    if psi == 1.0:
        return dlatents
    n = dlatents.shape[1]
    layer_psi = jnp.ones((n,))
    if cutoff is None:
        layer_psi = layer_psi * psi
    else:
        layer_psi = jnp.where(jnp.arange(n) < cutoff, psi, 1.0)
    return dlatent_avg[None, None, :] + layer_psi[None, :, None] * (
        dlatents - dlatent_avg[None, None, :])


def _noise_list(cfg: SG2Config, batch: int, noise, key):
    """Resolve the per-layer noise tensors ([H,W], shared over batch,
    matching same_over_batch=True, stylegan2/modules.py:323-329)."""
    shapes = cfg.noise_shapes()
    if not cfg.noise or noise == "none":
        return [None] * len(shapes)
    if isinstance(noise, (list, tuple)):
        return list(noise)
    assert key is not None, "noise='random' requires a PRNG key"
    keys = jax.random.split(key, len(shapes))
    return [jax.random.normal(k, s) for k, s in zip(keys, shapes)]


def _s2d_supported(cfg: SG2Config) -> bool:
    return cfg.kernel_size == 3 and len(cfg.filter_taps) == 4


def noise_layouts(cfg: SG2Config):
    """Replays synthesis_apply's lattice progression: for each noise layer
    (in noise_shapes order) the (is_s2d, lattice_offset) of the tensor the
    noise add sees. Keep in lockstep with the synthesis loop below."""
    out = []
    res = cfg.base_size
    x_s2d, x_off = False, 0
    for (_in_ch, _out_ch, up, n_layers) in cfg.block_channels():
        if up:
            res *= 2
        use_s2d = _s2d_supported(cfg) and res >= cfg.s2d_min_res
        for li in range(n_layers):
            if up and li == 0:
                if use_s2d:
                    x_s2d, x_off = True, 0
            else:
                if use_s2d and not x_s2d:
                    x_s2d, x_off = True, 0
                if x_s2d:
                    x_off = (0 if x_off else -1) if cfg.s2d_offsets else 0
            out.append((x_s2d, x_off))
    return out


def pack_noise(noise, cfg: SG2Config, policy: Policy = FP32):
    """Pre-fold fixed per-layer noise planes into the lattice layouts the
    synthesis consumes: s2d-level planes become [nh, nw, 4] (phase-major, at
    the layer's lattice offset, phantoms zero) in the compute dtype.

    The fold is a pure reshape/pad (ops/s2d.s2d_hw) — exact — but as a jit
    INPUT it cannot be hoisted out of the per-generation program, where it
    showed up as ~1 ms/step of layout-change copies at 1024px (trace,
    DESIGN.md §9). Fixed-noise searches fold once here instead;
    synthesis_apply detects packed entries by ndim (raw planes are 2-D).
    The reference cannot stage this at all: it redraws noise every call
    (reference stylegan2/modules.py:303-456)."""
    from clip_glass_tpu.ops import s2d as s2d_ops

    if noise is None or not isinstance(noise, (list, tuple)):
        return noise
    packed = []
    for nz, (is_s2d, off) in zip(noise, noise_layouts(cfg)):
        if nz is not None and is_s2d and nz.ndim == 2:
            nz = s2d_ops.s2d_hw(policy.cast_compute(nz), off)
        packed.append(nz)
    return packed


def s2d_output_offset(cfg: SG2Config) -> int:
    """Lattice offset of the tensor synthesis_apply(output_s2d=True) returns
    (and discriminator_apply(input_s2d=True) expects as input_offset).
    Irrelevant when rgb_domain(cfg) == "s4d" (s4d carries no offset)."""
    return -1 if (cfg.s2d_offsets and _s2d_supported(cfg)
                  and cfg.resolution >= cfg.s2d_min_res) else 0


def rgb_domain(cfg: SG2Config) -> str:
    """Layout of the image synthesis_apply(output_s2d=True) returns:
    "s4d" ([B, H/4, W/4, 16*data_channels], offset-free) when the top level
    runs s2d with rgb_s4d, else "s2d" (at s2d_output_offset(cfg))."""
    if (cfg.rgb_s4d and _s2d_supported(cfg)
            and cfg.resolution >= cfg.s2d_min_res and cfg.resolution % 4 == 0):
        return "s4d"
    return "s2d"


def synthesis_apply(params, dlatents, cfg: SG2Config = CONFIG_F,
                    noise="random", noise_key=None, policy: Policy = FP32,
                    output_s2d: bool = False, s2d: Optional[bool] = None):
    """dlatents: [B, num_latents, D] -> images [B, C, H, W] in [-1, 1]
    (reference stylegan2/models.py:969-1014).

    Levels with output resolution >= cfg.s2d_min_res execute in the
    space-to-depth domain (ops/s2d.py) — same math, phase-composed kernels,
    no full-resolution tensors. With output_s2d=True the final image is
    returned packed, in the layout rgb_domain(cfg) names: "s4d"
    ([B, H/4, W/4, 16*data_ch], offset-free — the default) or "s2d"
    ([B, nh, nw, 4*data_ch] at lattice s2d_output_offset(cfg), zero
    phantoms). The fitness path feeds it to the matching discriminator/
    resize entry without ever interleaving.

    `s2d` selects the execution domain: None = auto (cfg-gated, the frozen
    fitness/inference default), False = force the plain domain. Training
    and any other DIFFERENTIATED use must pass False: the s2d fold builders
    compose per-style (per-sample) kernel tensors, which is the right trade
    for frozen inference but multiplies autodiff's saved-activation
    footprint by the kernel-composition chains (trainer AOT: 1024px step
    20.5 -> fits-16GiB per device on the plain domain).
    """
    from clip_glass_tpu.ops import s2d as s2d_ops

    allow_s2d = _s2d_supported(cfg) if s2d is None else (
        s2d and _s2d_supported(cfg))
    if output_s2d and not allow_s2d:
        raise ValueError("output_s2d=True requires the s2d domain")

    B = dlatents.shape[0]
    dl = policy.cast_compute(dlatents)
    noises = _noise_list(cfg, B, noise, noise_key)

    x = jnp.broadcast_to(policy.cast_compute(params["const"])[None],
                         (B,) + params["const"].shape)
    y = None
    x_s2d = False
    y_dom = "plain"  # layout of the skip accumulator: plain | s2d | s4d
    x_off = y_off = 0  # lattice offsets (0 or -1), see ops/s2d.py docstring
    res = cfg.base_size
    layer_idx = 0
    noise_idx = 0
    blocks = cfg.block_channels()
    taps = tuple(cfg.filter_taps)
    for bi, (in_ch, out_ch, up, n_layers) in enumerate(blocks):
        if up:
            res *= 2
        use_s2d = allow_s2d and res >= cfg.s2d_min_res
        bp = params["blocks"][bi]
        for li in range(n_layers):
            lp = bp["layers"][li]
            lat = dl[:, layer_idx + li]
            style = style_from_latent(lat, policy.cast_compute(lp["style"]["w"]),
                                      policy.cast_compute(lp["style"]["b"]))
            if up and li == 0:
                if use_s2d:
                    # input_s2d=True is the s2d(res/2) -> s2d(res) transition:
                    # one lhs_dilation=2 conv at the physical level
                    # weights enter the compute dtype at the model boundary
                    # (same convention as the plain branch below: demod and
                    # kernel folds see the cast weight)
                    x = s2d_ops.s2d_modulated_conv2d_up(
                        x, policy.cast_compute(lp["w"]), style,
                        demodulate=cfg.demodulate,
                        filter_taps=taps, eps=cfg.eps, input_s2d=x_s2d,
                        in_off=x_off)
                    x_s2d, x_off = True, 0
                else:
                    x = modulated_conv2d_up(x, policy.cast_compute(lp["w"]),
                                            style, demodulate=cfg.demodulate,
                                            filter_taps=taps, eps=cfg.eps)
            else:
                if use_s2d and not x_s2d:
                    x = s2d_ops.s2d(x)
                    x_s2d, x_off = True, 0
                if x_s2d:
                    # alternate the lattice offset: every same-res conv
                    # between opposite lattices folds to a [2,2] kernel
                    out_off = (0 if x_off else -1) if cfg.s2d_offsets else 0
                    x = s2d_ops.s2d_modulated_conv2d(
                        x, policy.cast_compute(lp["w"]), style,
                        demodulate=cfg.demodulate,
                        eps=cfg.eps, in_off=x_off, out_off=out_off)
                    x_off = out_off
                else:
                    x = modulated_conv2d(x, policy.cast_compute(lp["w"]),
                                         style, demodulate=cfg.demodulate,
                                         eps=cfg.eps)
            nz = noises[noise_idx]
            if nz is not None:
                scale = policy.cast_compute(lp["noise_scale"])
                if x_s2d:
                    # 3-D noise = pre-packed by pack_noise (already on this
                    # layer's lattice); 2-D = raw plane, fold here
                    nz_s = (policy.cast_compute(nz) if nz.ndim == 3
                            else s2d_ops.s2d_hw(policy.cast_compute(nz), x_off))
                    Bs, Hh, Wh, C4 = x.shape
                    x = (x.reshape(Bs, Hh, Wh, 4, C4 // 4)
                         + scale * nz_s[None, :, :, :, None]
                         ).reshape(Bs, Hh, Wh, C4)
                else:
                    x = x + scale * policy.cast_compute(nz)[None, :, :, None]
            noise_idx += 1
            b = policy.cast_compute(lp["b"])
            x = bias_act(x, s2d_ops.tile_channels(b) if x_s2d else b,
                         act="lrelu")
            if x_off:
                # consumers' folded kernels assume zero phantoms; the mask
                # fuses into the bias/act elementwise chain
                x = s2d_ops.mask_phantoms(x)
        layer_idx += n_layers

        use_s4d = x_s2d and cfg.rgb_s4d and res % 4 == 0
        if y is not None:
            if use_s4d:
                if y_dom == "s4d":
                    y = s2d_ops.s4d_upsample2x(y, taps)
                else:  # enter s4d from the plain level below
                    if y_dom == "s2d":
                        y = s2d_ops.un_s2d_off(y, y_off)
                    # one fused stride-2 conv (plain -> s4d at 2x) instead
                    # of the 4C-channel s2d intermediate + repack copies
                    y = s2d_ops.plain_to_s4d_upsample2x(y, taps)
            elif x_s2d:
                if y_dom == "s2d":  # s2d(res/2) -> s2d(res)
                    y = s2d_ops.un_s2d_off(y, y_off)
                y = s2d_ops.s2d_upsample2x(y, taps)
                if x_off:  # match the ToRGB lattice (cheap: C = 4*data_ch)
                    y = s2d_ops.shift_to_m1(y)
            else:
                y = upsample2x(y, taps)
        rp = params["to_rgb"][bi]
        lat_idx = min(layer_idx, cfg.num_latents - 1)
        rb = policy.cast_compute(rp["b"])
        style = None
        if cfg.modulate_data_out:
            style = style_from_latent(dl[:, lat_idx],
                                      policy.cast_compute(rp["style"]["w"]),
                                      policy.cast_compute(rp["style"]["b"]))
        if use_s4d:
            # ToRGB straight into the s4d domain: 1x1 modulation is an
            # input scale (ops/modulated_conv docstring), the fold selects
            # (cell, phase) per output phase
            xs = x
            if style is not None:
                xs = x * s2d_ops.tile_channels(style).astype(x.dtype)[
                    :, None, None, :]
            t = s2d_ops.s4d_from_s2d_conv1x1(
                xs, policy.cast_compute(rp["w"]), in_off=x_off)
            tile, y_dom = 16, "s4d"
        elif x_s2d:
            if style is not None:
                t = s2d_ops.s2d_modulated_conv2d(
                    x, policy.cast_compute(rp["w"]), style,
                    demodulate=False, eps=cfg.eps,
                    in_off=x_off, out_off=x_off)
            else:
                t = s2d_ops.s2d_conv2d(x, policy.cast_compute(rp["w"]),
                                       x_off, x_off)
            tile, y_dom, y_off = 4, "s2d", x_off
        else:
            if style is not None:
                t = modulated_conv2d(x, policy.cast_compute(rp["w"]), style,
                                     demodulate=False, eps=cfg.eps)
            else:
                t = conv2d(x, policy.cast_compute(rp["w"]))
            tile, y_dom = 1, "plain"
        t = bias_act(t, rb if tile == 1 else s2d_ops.tile_channels(rb, tile),
                     act="linear")
        y = t if y is None else y + t

    if output_s2d:
        if y_dom == "s4d":  # offset-free; contract: rgb_domain(cfg)=="s4d"
            return y
        target = s2d_output_offset(cfg)
        if y_dom == "plain":
            y = s2d_ops.s2d(y)
            y_off = 0
        if y_off != target:  # only 0 -> -1 can occur (odd-layer blocks)
            y = s2d_ops.shift_to_m1(y)
        if target:  # contract: phantom entries of the returned image are 0
            y = s2d_ops.mask_phantoms(y)
        return y
    if y_dom == "s4d":
        y = s2d_ops.un_s4d(y)
    elif y_dom == "s2d":
        y = s2d_ops.un_s2d_off(y, y_off)
    return jnp.transpose(y, (0, 3, 1, 2))  # NHWC -> NCHW (reference layout)


def distribute_latents(dlatents, num_layers: int,
                       latent_to_layer_idx=None, key=None):
    """Expand [B, N, D] per-sample latents to [B, num_layers, D] (reference
    stylegan2/models.py:425-458): N == 1 broadcasts; N == num_layers passes
    through; otherwise each latent covers a span of consecutive layers —
    either random spans (the reference's np.random.choice cutoffs; `key`
    supplies the randomness here) or the explicit per-layer index list
    `latent_to_layer_idx` (reference models.py:452-458)."""
    B, N, D = dlatents.shape
    if N == 1:
        return jnp.broadcast_to(dlatents, (B, num_layers, D))
    if latent_to_layer_idx is not None:
        idx = jnp.asarray(latent_to_layer_idx)
        if idx.shape[0] != num_layers:
            raise ValueError(f"latent_to_layer_idx has {idx.shape[0]} entries"
                             f" for {num_layers} layers")
        return dlatents[:, idx]
    if N == num_layers:
        return dlatents
    if N > num_layers:
        raise ValueError(f"more latents ({N}) than layers ({num_layers})")
    assert key is not None, "mixing N<num_layers latents needs a PRNG key"
    cut = jnp.sort(jax.random.permutation(key, jnp.arange(1, num_layers))[:N - 1])
    layer = jnp.arange(num_layers)
    idx = jnp.sum(layer[:, None] >= cut[None, :], axis=1)
    return dlatents[:, idx]


def generator_apply(params, latents=None, cfg: SG2Config = CONFIG_F,
                    labels=None, truncation_psi: float = 1.0,
                    truncation_cutoff: Optional[int] = None,
                    noise="random", noise_key=None, policy: Policy = FP32,
                    output_s2d: bool = False, dlatents=None,
                    latent_to_layer_idx=None, mix_key=None,
                    s2d: Optional[bool] = None):
    """Full G: z -> mapping -> distribute to num_latents -> (truncate) ->
    synthesis (reference stylegan2/models.py:326-482). The CLIP-GLaSS search
    path calls G(z) with no truncation configured (reference models.py:108-118;
    set_truncation() defaults disable it).

    Reference input surface (models.py:380-458): `latents` may be [B, D] or
    multi-latent [B, N, D] (style mixing — each latent mapped through
    G_mapping and assigned a span of layers, see distribute_latents);
    `dlatents` bypasses the mapping AND truncation (truncation applies only
    when dlatents are not explicitly given, models.py:469-471)."""
    if dlatents is None:
        assert latents is not None, "latents or dlatents required"
        if latents.ndim == 3:
            B, N, D = latents.shape
            flat_labels = (jnp.repeat(labels, N) if labels is not None
                           else None)
            w = mapping_apply(params["mapping"], latents.reshape(B * N, D),
                              cfg, flat_labels, policy).reshape(B, N, -1)
        else:
            w = mapping_apply(params["mapping"], latents, cfg, labels,
                              policy)[:, None, :]
        dl = distribute_latents(w, cfg.num_latents, latent_to_layer_idx,
                                mix_key)
        dl = truncate(dl, params["dlatent_avg"], truncation_psi,
                      truncation_cutoff)
    else:
        if dlatents.ndim == 2:
            dlatents = dlatents[:, None, :]
        dl = distribute_latents(dlatents, cfg.num_latents,
                                latent_to_layer_idx, mix_key)
    return synthesis_apply(params["synthesis"], dl, cfg,
                           noise=noise, noise_key=noise_key, policy=policy,
                           output_s2d=output_s2d, s2d=s2d)


def discriminator_apply(params, images, cfg: SG2Config = CONFIG_F,
                        labels=None, policy: Policy = FP32,
                        input_s2d: bool = False, input_offset: int = 0,
                        input_s4d: bool = False):
    """images: [B, C, H, W] in [-1, 1] -> score logits [B, 1]
    (reference stylegan2/models.py:1193-1230).

    input_s2d=True: `images` arrives as the s2d NHWC tensor produced by
    synthesis_apply(output_s2d=True) — phase-major, at lattice
    `input_offset` (pass s2d_output_offset(cfg)) — and the levels at
    resolution >= cfg.s2d_min_res run in the s2d domain (fromRGB / conv0 on
    phase-composed kernels, the down convs folding back to the plain
    lattice), so the full-res image never materializes. With cfg.s2d_offsets
    the block convs alternate lattices: conv0 in -1 -> out 0 ([2,2]), the
    down convs land back on -1, the composite skip shrinks to [3,3]."""
    from clip_glass_tpu.ops import s2d as s2d_ops

    taps = tuple(cfg.filter_taps)
    res_scale = 1.0 / math.sqrt(2.0)
    fr = params["from_rgb"]
    if input_s4d:
        # fromRGB folds s4d(0) -> s2d at the offset the conv0 chain wants
        x = policy.cast_compute(images)  # [B, H/4, W/4, 16*data_ch]
        res = 4 * images.shape[1]
        x_off = -1 if (cfg.s2d_offsets and res >= cfg.s2d_min_res) else 0
        x = s2d_ops.s2d_from_s4d_conv1x1(x, fr["w"], out_off=x_off)
        x = bias_act(x, s2d_ops.tile_channels(policy.cast_compute(fr["b"])),
                     act="lrelu")
        if x_off:
            x = s2d_ops.mask_phantoms(x)
        x_s2d = True
    elif input_s2d:
        x = policy.cast_compute(images)  # NHWC s2d
        x_off = input_offset
        res = s2d_ops.phys_size(images.shape[1], x_off)
        x_s2d = True
        if cfg.s2d_offsets and x_off == 0 and res >= cfg.s2d_min_res:
            # the offset chain wants the first conv0 input at lattice -1
            x = s2d_ops.shift_to_m1(x)
            x_off = -1
        x = s2d_ops.s2d_conv2d(x, fr["w"], x_off, x_off)
        x = bias_act(x, s2d_ops.tile_channels(policy.cast_compute(fr["b"])),
                     act="lrelu")
        if x_off:
            x = s2d_ops.mask_phantoms(x)
    else:
        x = policy.cast_compute(jnp.transpose(images, (0, 2, 3, 1)))  # NHWC
        res = images.shape[2]
        x_off = 0
        x_s2d = False
        x = conv2d(x, policy.cast_compute(fr["w"]))
        x = bias_act(x, policy.cast_compute(fr["b"]), act="lrelu")

    for bp in params["blocks"]:
        use_s2d = x_s2d and _s2d_supported(cfg) and res >= cfg.s2d_min_res
        if x_s2d and not use_s2d:
            x = s2d_ops.un_s2d_off(x, x_off)
            x_s2d, x_off = False, 0
        inp = x
        if use_s2d:
            next_s2d = _s2d_supported(cfg) and res // 2 >= cfg.s2d_min_res
            next_off = -1 if (next_s2d and cfg.s2d_offsets) else 0
            x = s2d_ops.s2d_conv2d(x, bp["conv0"]["w"], x_off, 0)
            x = bias_act(x, s2d_ops.tile_channels(
                policy.cast_compute(bp["conv0"]["b"])), act="lrelu")
            x = s2d_ops.s2d_conv2d_down(x, bp["conv1"]["w"], filter_taps=taps,
                                        output_s2d=next_s2d,
                                        in_off=0, out_off=next_off)
            b1 = policy.cast_compute(bp["conv1"]["b"])
            x = bias_act(x, s2d_ops.tile_channels(b1) if next_s2d else b1,
                         act="lrelu")
            proj = s2d_ops.s2d_conv2d_down(inp, bp["skip"]["w"],
                                           filter_taps=taps,
                                           output_s2d=next_s2d,
                                           in_off=x_off, out_off=next_off)
            x = (x + proj) * res_scale
            if next_off:
                x = s2d_ops.mask_phantoms(x)
            x_s2d, x_off = next_s2d, next_off
            res //= 2
            continue
        x = conv2d(x, policy.cast_compute(bp["conv0"]["w"]))
        x = bias_act(x, policy.cast_compute(bp["conv0"]["b"]), act="lrelu")
        x = conv2d_down(x, policy.cast_compute(bp["conv1"]["w"]),
                        filter_taps=taps)
        x = bias_act(x, policy.cast_compute(bp["conv1"]["b"]), act="lrelu")
        proj = conv2d_down(inp, policy.cast_compute(bp["skip"]["w"]),
                           filter_taps=taps)
        x = (x + proj) * res_scale
        res //= 2

    if x_s2d:  # cutoff reached the base block: fall back to plain for the head
        x = s2d_ops.un_s2d_off(x, x_off)
    if cfg.mbstd_group_size:
        x = minibatch_std(x, cfg.mbstd_group_size, cfg.eps)
    x = conv2d(x, policy.cast_compute(params["final_conv"]["w"]))
    x = bias_act(x, policy.cast_compute(params["final_conv"]["b"]), act="lrelu")

    # flatten in the reference's NCHW order (stylegan2/models.py:1224)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    x = x @ policy.cast_compute(params["dense0"]["w"])
    x = bias_act(x, policy.cast_compute(params["dense0"]["b"]), act="lrelu")
    x = x @ policy.cast_compute(params["dense1"]["w"])
    x = bias_act(x, policy.cast_compute(params["dense1"]["b"]), act="linear")
    if labels is not None:
        x = x[jnp.arange(x.shape[0]), labels][:, None]
    return x
