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


def synthesis_apply(params, dlatents, cfg: SG2Config = CONFIG_F,
                    noise="random", noise_key=None, policy: Policy = FP32):
    """dlatents: [B, num_latents, D] -> images [B, C, H, W] in [-1, 1]
    (reference stylegan2/models.py:969-1014)."""
    B = dlatents.shape[0]
    dl = policy.cast_compute(dlatents)
    noises = _noise_list(cfg, B, noise, noise_key)

    x = jnp.broadcast_to(policy.cast_compute(params["const"])[None],
                         (B,) + params["const"].shape)
    y = None
    layer_idx = 0
    noise_idx = 0
    blocks = cfg.block_channels()
    for bi, (in_ch, out_ch, up, n_layers) in enumerate(blocks):
        bp = params["blocks"][bi]
        for li in range(n_layers):
            lp = bp["layers"][li]
            lat = dl[:, layer_idx + li]
            style = style_from_latent(lat, policy.cast_compute(lp["style"]["w"]),
                                      policy.cast_compute(lp["style"]["b"]))
            w = policy.cast_compute(lp["w"])
            if up and li == 0:
                x = modulated_conv2d_up(x, w, style, demodulate=cfg.demodulate,
                                        filter_taps=tuple(cfg.filter_taps),
                                        eps=cfg.eps)
            else:
                x = modulated_conv2d(x, w, style, demodulate=cfg.demodulate,
                                     eps=cfg.eps)
            nz = noises[noise_idx]
            if nz is not None:
                x = x + (policy.cast_compute(lp["noise_scale"])
                         * policy.cast_compute(nz)[None, :, :, None])
            noise_idx += 1
            x = bias_act(x, policy.cast_compute(lp["b"]), act="lrelu")
        layer_idx += n_layers

        if y is not None:
            y = upsample2x(y, tuple(cfg.filter_taps))
        rp = params["to_rgb"][bi]
        lat_idx = min(layer_idx, cfg.num_latents - 1)
        if cfg.modulate_data_out:
            style = style_from_latent(dl[:, lat_idx],
                                      policy.cast_compute(rp["style"]["w"]),
                                      policy.cast_compute(rp["style"]["b"]))
            t = modulated_conv2d(x, policy.cast_compute(rp["w"]), style,
                                 demodulate=False, eps=cfg.eps)
        else:
            t = conv2d(x, policy.cast_compute(rp["w"]))
        t = bias_act(t, policy.cast_compute(rp["b"]), act="linear")
        y = t if y is None else y + t

    return jnp.transpose(y, (0, 3, 1, 2))  # NHWC -> NCHW (reference layout)


def generator_apply(params, latents, cfg: SG2Config = CONFIG_F,
                    labels=None, truncation_psi: float = 1.0,
                    truncation_cutoff: Optional[int] = None,
                    noise="random", noise_key=None, policy: Policy = FP32):
    """Full G: z -> mapping -> broadcast to num_latents -> (truncate) ->
    synthesis (reference stylegan2/models.py:326-482). The CLIP-GLaSS search
    path calls G(z) with no truncation configured (reference models.py:108-118;
    set_truncation() defaults disable it)."""
    w = mapping_apply(params["mapping"], latents, cfg, labels, policy)
    dlatents = jnp.repeat(w[:, None, :], cfg.num_latents, axis=1)
    dlatents = truncate(dlatents, params["dlatent_avg"], truncation_psi,
                        truncation_cutoff)
    return synthesis_apply(params["synthesis"], dlatents, cfg,
                           noise=noise, noise_key=noise_key, policy=policy)


def discriminator_apply(params, images, cfg: SG2Config = CONFIG_F,
                        labels=None, policy: Policy = FP32):
    """images: [B, C, H, W] in [-1, 1] -> score logits [B, 1]
    (reference stylegan2/models.py:1193-1230)."""
    x = policy.cast_compute(jnp.transpose(images, (0, 2, 3, 1)))  # NHWC
    fr = params["from_rgb"]
    x = conv2d(x, policy.cast_compute(fr["w"]))
    x = bias_act(x, policy.cast_compute(fr["b"]), act="lrelu")

    res_scale = 1.0 / math.sqrt(2.0)
    for bp in params["blocks"]:
        inp = x
        x = conv2d(x, policy.cast_compute(bp["conv0"]["w"]))
        x = bias_act(x, policy.cast_compute(bp["conv0"]["b"]), act="lrelu")
        x = conv2d_down(x, policy.cast_compute(bp["conv1"]["w"]),
                        filter_taps=tuple(cfg.filter_taps))
        x = bias_act(x, policy.cast_compute(bp["conv1"]["b"]), act="lrelu")
        proj = conv2d_down(inp, policy.cast_compute(bp["skip"]["w"]),
                           filter_taps=tuple(cfg.filter_taps))
        x = (x + proj) * res_scale

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
