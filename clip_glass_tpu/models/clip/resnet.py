"""CLIP ModifiedResNet vision tower (RN50 family), TPU-native.

Behavioral reference: clip/model.py:9-149 — 3-conv stem with avgpool,
anti-aliased strided bottlenecks (avgpool before the stride>1 conv),
attention pooling head (mean token + learned positional embedding, separate
q/k/v projections). Completes the reference's `_MODELS` surface
(clip/clip.py:18-21 lists RN50 next to ViT-B/32).

NHWC layout; eval-mode BatchNorm folded to scale/bias at conversion time
(convert_clip_rn.py) — at inference BN is an affine transform, so the fold
is exact and removes all running-stat traffic.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from clip_glass_tpu.core.dtypes import Policy, FP32
from clip_glass_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class RNConfig:
    layers: Sequence[int] = (3, 4, 6, 3)   # RN50
    output_dim: int = 1024
    input_resolution: int = 224
    width: int = 64

    @property
    def heads(self) -> int:
        return self.width * 32 // 64  # reference clip/model.py:258

    @property
    def embed_dim(self) -> int:
        return self.width * 32


RN50 = RNConfig()
TINY_RN = RNConfig(layers=(1, 1, 1, 1), output_dim=64, input_resolution=32,
                   width=16)

_DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                     ("NHWC", "HWIO", "NHWC"))


def _conv(x, w, stride=1, pad=0):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=_DN)


def _bn(x, p):
    """Eval BN folded to y = x*scale + bias (fp32)."""
    x32 = jnp.asarray(x, jnp.float32)
    return (x32 * p["scale"] + p["bias"]).astype(x.dtype)


def _avgpool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID") / (k * k)


# ---------------------------------------------------------------- init

def _bn_init(ch):
    return {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}


def _conv_init(key, in_ch, out_ch, k):
    fan = in_ch * k * k
    return jax.random.normal(key, (k, k, in_ch, out_ch)) * (fan ** -0.5)


def _bottleneck_init(key, inplanes, planes, stride):
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _conv_init(ks[0], inplanes, planes, 1), "bn1": _bn_init(planes),
        "conv2": _conv_init(ks[1], planes, planes, 3), "bn2": _bn_init(planes),
        "conv3": _conv_init(ks[2], planes, planes * 4, 1), "bn3": _bn_init(planes * 4),
    }
    if stride > 1 or inplanes != planes * 4:
        p["downsample"] = {"conv": _conv_init(ks[3], inplanes, planes * 4, 1),
                           "bn": _bn_init(planes * 4)}
    return p


def init(key, cfg: RNConfig = RN50):
    w = cfg.width
    keys = jax.random.split(key, 16)
    params = {
        "stem": {
            "conv1": _conv_init(keys[0], 3, w // 2, 3), "bn1": _bn_init(w // 2),
            "conv2": _conv_init(keys[1], w // 2, w // 2, 3), "bn2": _bn_init(w // 2),
            "conv3": _conv_init(keys[2], w // 2, w, 3), "bn3": _bn_init(w),
        },
    }
    inplanes = w
    ki = 3
    for li, (blocks, planes, stride) in enumerate(zip(
            cfg.layers, (w, 2 * w, 4 * w, 8 * w), (1, 2, 2, 2))):
        layer = []
        for b in range(blocks):
            layer.append(_bottleneck_init(
                jax.random.fold_in(keys[ki], b), inplanes,
                planes, stride if b == 0 else 1))
            inplanes = planes * 4
        params[f"layer{li + 1}"] = layer
        ki += 1
    ed = cfg.embed_dim
    spacial = cfg.input_resolution // 32
    ks = jax.random.split(keys[-1], 5)
    params["attnpool"] = {
        "positional_embedding": jax.random.normal(
            ks[0], (spacial ** 2 + 1, ed)) / ed ** 0.5,
        "q": {"w": jax.random.normal(ks[1], (ed, ed)) * ed ** -0.5, "b": jnp.zeros((ed,))},
        "k": {"w": jax.random.normal(ks[2], (ed, ed)) * ed ** -0.5, "b": jnp.zeros((ed,))},
        "v": {"w": jax.random.normal(ks[3], (ed, ed)) * ed ** -0.5, "b": jnp.zeros((ed,))},
        "c": {"w": jax.random.normal(ks[4], (ed, cfg.output_dim)) * ed ** -0.5,
              "b": jnp.zeros((cfg.output_dim,))},
    }
    return params


# ---------------------------------------------------------------- forward

def _bottleneck_apply(p, x, stride, policy: Policy):
    identity = x
    out = jax.nn.relu(_bn(_conv(x, policy.cast_compute(p["conv1"])), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, policy.cast_compute(p["conv2"]), pad=1), p["bn2"]))
    if stride > 1:
        out = _avgpool(out, stride)
    out = _bn(_conv(out, policy.cast_compute(p["conv3"])), p["bn3"])
    if "downsample" in p:
        if stride > 1:
            identity = _avgpool(identity, stride)
        identity = _bn(_conv(identity, policy.cast_compute(p["downsample"]["conv"])),
                       p["downsample"]["bn"])
    return jax.nn.relu(out + identity)


def _attnpool_apply(p, x, n_heads: int, policy: Policy):
    """Attention pooling (reference clip/model.py:55-91): prepend mean token,
    add positional embedding, one MHA with separate q/k/v, return token 0."""
    B, H, W, C = x.shape
    t = x.reshape(B, H * W, C)
    t = jnp.concatenate([jnp.mean(t, axis=1, keepdims=True), t], axis=1)
    t = t + policy.cast_compute(p["positional_embedding"])
    in_w = jnp.concatenate([p["q"]["w"], p["k"]["w"], p["v"]["w"]], axis=1)
    in_b = jnp.concatenate([p["q"]["b"], p["k"]["b"], p["v"]["b"]])
    out = multi_head_attention(t, in_w, in_b, p["c"]["w"], p["c"]["b"],
                               n_heads, mask=None, policy=policy)
    return out[:, 0]


def apply(params, images, cfg: RNConfig = RN50, policy: Policy = FP32):
    """images: [B, 3, H, W] -> [B, output_dim] (reference clip/model.py:133-149)."""
    x = policy.cast_compute(jnp.transpose(images, (0, 2, 3, 1)))
    s = params["stem"]
    x = jax.nn.relu(_bn(_conv(x, policy.cast_compute(s["conv1"]), stride=2, pad=1), s["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, policy.cast_compute(s["conv2"]), pad=1), s["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, policy.cast_compute(s["conv3"]), pad=1), s["bn3"]))
    x = _avgpool(x, 2)
    for li, stride in zip(range(1, 5), (1, 2, 2, 2)):
        for b, bp in enumerate(params[f"layer{li}"]):
            x = _bottleneck_apply(bp, x, stride if b == 0 else 1, policy)
    return _attnpool_apply(params["attnpool"], x, cfg.heads, policy)
