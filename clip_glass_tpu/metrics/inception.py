"""InceptionV3 feature extractor for FID, TPU-native.

Behavioral reference: stylegan2/external_models/inception.py:29-276 — the
pytorch-fid InceptionV3 variant: standard torchvision InceptionV3 trunk with
FID-specific pooling patches (InceptionA/C/E_1 use count_exclude-pad average
pooling; the final InceptionE_2 uses max pooling in its pool branch), inputs
bilinearly resized to 299 and scaled from [0,1] to [-1,1], output = the
2048-d pre-logits average pool.

Weights: `convert_torch_inception` ingests the pytorch-fid / torchvision
state dict (pretrained weights are not downloadable in this environment);
`init` builds a random-weight instance so structure and converter stay
tested. BN is eval-mode and folded to scale/bias at conversion.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from clip_glass_tpu.core.dtypes import Policy, FP32

_DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                     ("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------- primitives

def _conv_bn(x, p, stride=1, padding=(0, 0), policy: Policy = FP32):
    """BasicConv2d: conv (no bias) + folded eval-BN + relu."""
    ph, pw = padding if isinstance(padding, tuple) else (padding, padding)
    y = jax.lax.conv_general_dilated(
        x, policy.cast_compute(p["w"]), (stride, stride),
        ((ph, ph), (pw, pw)), dimension_numbers=_DN)
    y32 = jnp.asarray(y, jnp.float32) * p["bn_scale"] + p["bn_bias"]
    return jax.nn.relu(y32).astype(x.dtype)


def _maxpool(x, k=3, s=2, pad=0):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, s, s, 1),
                                 ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def _avgpool_excl(x, k=3, s=1, pad=1):
    """count_include_pad=False average pool (the FID patch,
    reference inception.py:159-276)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    win = (1, k, k, 1)
    strides = (1, s, s, 1)
    pads = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    num = jax.lax.reduce_window(x, 0.0, jax.lax.add, win, strides, pads)
    den = jax.lax.reduce_window(ones, 0.0, jax.lax.add, win, strides, pads)
    return num / den


# ---------------------------------------------------------------- init helpers

def _cw(key, cin, cout, kh, kw):
    fan = cin * kh * kw
    return {"w": jax.random.normal(key, (kh, kw, cin, cout)) * fan ** -0.5,
            "bn_scale": jnp.ones((cout,)), "bn_bias": jnp.zeros((cout,))}


def _split(key, n):
    return list(jax.random.split(key, n))


# block channel tables (torchvision InceptionV3)
def _inception_a(key, cin, pool_features):
    k = _split(key, 7)
    return {
        "branch1x1": _cw(k[0], cin, 64, 1, 1),
        "branch5x5_1": _cw(k[1], cin, 48, 1, 1),
        "branch5x5_2": _cw(k[2], 48, 64, 5, 5),
        "branch3x3dbl_1": _cw(k[3], cin, 64, 1, 1),
        "branch3x3dbl_2": _cw(k[4], 64, 96, 3, 3),
        "branch3x3dbl_3": _cw(k[5], 96, 96, 3, 3),
        "branch_pool": _cw(k[6], cin, pool_features, 1, 1),
    }


def _inception_b(key, cin):
    k = _split(key, 4)
    return {
        "branch3x3": _cw(k[0], cin, 384, 3, 3),
        "branch3x3dbl_1": _cw(k[1], cin, 64, 1, 1),
        "branch3x3dbl_2": _cw(k[2], 64, 96, 3, 3),
        "branch3x3dbl_3": _cw(k[3], 96, 96, 3, 3),
    }


def _inception_c(key, cin, c7):
    k = _split(key, 10)
    return {
        "branch1x1": _cw(k[0], cin, 192, 1, 1),
        "branch7x7_1": _cw(k[1], cin, c7, 1, 1),
        "branch7x7_2": _cw(k[2], c7, c7, 1, 7),
        "branch7x7_3": _cw(k[3], c7, 192, 7, 1),
        "branch7x7dbl_1": _cw(k[4], cin, c7, 1, 1),
        "branch7x7dbl_2": _cw(k[5], c7, c7, 7, 1),
        "branch7x7dbl_3": _cw(k[6], c7, c7, 1, 7),
        "branch7x7dbl_4": _cw(k[7], c7, c7, 7, 1),
        "branch7x7dbl_5": _cw(k[8], c7, 192, 1, 7),
        "branch_pool": _cw(k[9], cin, 192, 1, 1),
    }


def _inception_d(key, cin):
    k = _split(key, 6)
    return {
        "branch3x3_1": _cw(k[0], cin, 192, 1, 1),
        "branch3x3_2": _cw(k[1], 192, 320, 3, 3),
        "branch7x7x3_1": _cw(k[2], cin, 192, 1, 1),
        "branch7x7x3_2": _cw(k[3], 192, 192, 1, 7),
        "branch7x7x3_3": _cw(k[4], 192, 192, 7, 1),
        "branch7x7x3_4": _cw(k[5], 192, 192, 3, 3),
    }


def _inception_e(key, cin):
    k = _split(key, 9)
    return {
        "branch1x1": _cw(k[0], cin, 320, 1, 1),
        "branch3x3_1": _cw(k[1], cin, 384, 1, 1),
        "branch3x3_2a": _cw(k[2], 384, 384, 1, 3),
        "branch3x3_2b": _cw(k[3], 384, 384, 3, 1),
        "branch3x3dbl_1": _cw(k[4], cin, 448, 1, 1),
        "branch3x3dbl_2": _cw(k[5], 448, 384, 3, 3),
        "branch3x3dbl_3a": _cw(k[6], 384, 384, 1, 3),
        "branch3x3dbl_3b": _cw(k[7], 384, 384, 3, 1),
        "branch_pool": _cw(k[8], cin, 192, 1, 1),
    }


def init(key) -> Dict:
    k = _split(key, 17)
    return {
        "Conv2d_1a_3x3": _cw(k[0], 3, 32, 3, 3),
        "Conv2d_2a_3x3": _cw(k[1], 32, 32, 3, 3),
        "Conv2d_2b_3x3": _cw(k[2], 32, 64, 3, 3),
        "Conv2d_3b_1x1": _cw(k[3], 64, 80, 1, 1),
        "Conv2d_4a_3x3": _cw(k[4], 80, 192, 3, 3),
        "Mixed_5b": _inception_a(k[5], 192, 32),
        "Mixed_5c": _inception_a(k[6], 256, 64),
        "Mixed_5d": _inception_a(k[7], 288, 64),
        "Mixed_6a": _inception_b(k[8], 288),
        "Mixed_6b": _inception_c(k[9], 768, 128),
        "Mixed_6c": _inception_c(k[10], 768, 160),
        "Mixed_6d": _inception_c(k[11], 768, 160),
        "Mixed_6e": _inception_c(k[12], 768, 192),
        "Mixed_7a": _inception_d(k[13], 768),
        "Mixed_7b": _inception_e(k[14], 1280),
        "Mixed_7c": _inception_e(k[15], 2048),
    }


def load_npz(path: str) -> Dict:
    """Converted-checkpoint load (the npz scripts/convert_weights.py
    inception emits)."""
    from clip_glass_tpu.core import pytree
    return pytree.restore_lists(pytree.load_npz(path))


# ---------------------------------------------------------------- forward

def _a(x, p, policy):
    b1 = _conv_bn(x, p["branch1x1"], policy=policy)
    b5 = _conv_bn(x, p["branch5x5_1"], policy=policy)
    b5 = _conv_bn(b5, p["branch5x5_2"], padding=2, policy=policy)
    b3 = _conv_bn(x, p["branch3x3dbl_1"], policy=policy)
    b3 = _conv_bn(b3, p["branch3x3dbl_2"], padding=1, policy=policy)
    b3 = _conv_bn(b3, p["branch3x3dbl_3"], padding=1, policy=policy)
    bp = _conv_bn(_avgpool_excl(x), p["branch_pool"], policy=policy)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _b(x, p, policy):
    b3 = _conv_bn(x, p["branch3x3"], stride=2, policy=policy)
    bd = _conv_bn(x, p["branch3x3dbl_1"], policy=policy)
    bd = _conv_bn(bd, p["branch3x3dbl_2"], padding=1, policy=policy)
    bd = _conv_bn(bd, p["branch3x3dbl_3"], stride=2, policy=policy)
    bp = _maxpool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _c(x, p, policy):
    b1 = _conv_bn(x, p["branch1x1"], policy=policy)
    b7 = _conv_bn(x, p["branch7x7_1"], policy=policy)
    b7 = _conv_bn(b7, p["branch7x7_2"], padding=(0, 3), policy=policy)
    b7 = _conv_bn(b7, p["branch7x7_3"], padding=(3, 0), policy=policy)
    bd = _conv_bn(x, p["branch7x7dbl_1"], policy=policy)
    bd = _conv_bn(bd, p["branch7x7dbl_2"], padding=(3, 0), policy=policy)
    bd = _conv_bn(bd, p["branch7x7dbl_3"], padding=(0, 3), policy=policy)
    bd = _conv_bn(bd, p["branch7x7dbl_4"], padding=(3, 0), policy=policy)
    bd = _conv_bn(bd, p["branch7x7dbl_5"], padding=(0, 3), policy=policy)
    bp = _conv_bn(_avgpool_excl(x), p["branch_pool"], policy=policy)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _d(x, p, policy):
    b3 = _conv_bn(x, p["branch3x3_1"], policy=policy)
    b3 = _conv_bn(b3, p["branch3x3_2"], stride=2, policy=policy)
    b7 = _conv_bn(x, p["branch7x7x3_1"], policy=policy)
    b7 = _conv_bn(b7, p["branch7x7x3_2"], padding=(0, 3), policy=policy)
    b7 = _conv_bn(b7, p["branch7x7x3_3"], padding=(3, 0), policy=policy)
    b7 = _conv_bn(b7, p["branch7x7x3_4"], stride=2, policy=policy)
    bp = _maxpool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _e(x, p, policy, pool: str):
    b1 = _conv_bn(x, p["branch1x1"], policy=policy)
    b3 = _conv_bn(x, p["branch3x3_1"], policy=policy)
    b3 = jnp.concatenate([
        _conv_bn(b3, p["branch3x3_2a"], padding=(0, 1), policy=policy),
        _conv_bn(b3, p["branch3x3_2b"], padding=(1, 0), policy=policy)], axis=-1)
    bd = _conv_bn(x, p["branch3x3dbl_1"], policy=policy)
    bd = _conv_bn(bd, p["branch3x3dbl_2"], padding=1, policy=policy)
    bd = jnp.concatenate([
        _conv_bn(bd, p["branch3x3dbl_3a"], padding=(0, 1), policy=policy),
        _conv_bn(bd, p["branch3x3dbl_3b"], padding=(1, 0), policy=policy)], axis=-1)
    if pool == "max":   # FIDInceptionE_2 (reference inception.py:240-276)
        bp = _maxpool(x, 3, 1, pad=1)
    else:               # FIDInceptionE_1: count_exclude-pad avg
        bp = _avgpool_excl(x)
    bp = _conv_bn(bp, p["branch_pool"], policy=policy)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def features(params, images01, policy: Policy = FP32,
             resize_input: bool = True) -> jnp.ndarray:
    """images01: [B, 3, H, W] in [0,1] -> [B, 2048] pool features
    (reference inception.py:96-133: resize to 299, scale to [-1,1], trunk,
    adaptive average pool)."""
    x = jnp.asarray(images01, jnp.float32)
    if resize_input:
        B, C = x.shape[:2]
        x = jax.image.resize(x, (B, C, 299, 299), method="bilinear")
    x = x * 2.0 - 1.0
    x = policy.cast_compute(jnp.transpose(x, (0, 2, 3, 1)))  # NHWC

    x = _conv_bn(x, params["Conv2d_1a_3x3"], stride=2, policy=policy)
    x = _conv_bn(x, params["Conv2d_2a_3x3"], policy=policy)
    x = _conv_bn(x, params["Conv2d_2b_3x3"], padding=1, policy=policy)
    x = _maxpool(x, 3, 2)
    x = _conv_bn(x, params["Conv2d_3b_1x1"], policy=policy)
    x = _conv_bn(x, params["Conv2d_4a_3x3"], policy=policy)
    x = _maxpool(x, 3, 2)
    x = _a(x, params["Mixed_5b"], policy)
    x = _a(x, params["Mixed_5c"], policy)
    x = _a(x, params["Mixed_5d"], policy)
    x = _b(x, params["Mixed_6a"], policy)
    x = _c(x, params["Mixed_6b"], policy)
    x = _c(x, params["Mixed_6c"], policy)
    x = _c(x, params["Mixed_6d"], policy)
    x = _d(x, params["Mixed_7a"], policy)
    x = _e(x, params["Mixed_7b"], policy, pool="avg")
    x = _e(x, params["Mixed_7c"], policy, pool="max")
    return jnp.mean(jnp.asarray(x, jnp.float32), axis=(1, 2))  # [B, 2048]


# ---------------------------------------------------------------- converter

def convert_torch_inception(sd: Dict) -> Dict:
    """pytorch-fid / torchvision inception_v3 state dict -> params pytree.
    BasicConv2d keys: <block>.<branch>.conv.weight + .bn.{weight,bias,
    running_mean,running_var}; BN folded (eps 1e-3, torchvision inception)."""
    def _np(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x, np.float32)

    def conv_bn(prefix, eps=1e-3):
        w = _np(sd[f"{prefix}.conv.weight"])
        gamma = _np(sd[f"{prefix}.bn.weight"])
        beta = _np(sd[f"{prefix}.bn.bias"])
        mean = _np(sd[f"{prefix}.bn.running_mean"])
        var = _np(sd[f"{prefix}.bn.running_var"])
        scale = gamma / np.sqrt(var + eps)
        return {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "bn_scale": jnp.asarray(scale),
                "bn_bias": jnp.asarray(beta - mean * scale)}

    template = init(jax.random.PRNGKey(0))
    out: Dict = {}
    for block, sub in template.items():
        if "w" in sub:  # stem conv
            out[block] = conv_bn(block)
        else:
            out[block] = {br: conv_bn(f"{block}.{br}") for br in sub}
    return out
