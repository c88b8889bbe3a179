"""LPIPS-VGG16 perceptual distance.

Behavioral reference: stylegan2/external_models/lpips.py:34-78 — VGG16
feature slices at torchvision indices [0,4,9,16,23,30], unit-normalized
feature differences, learned per-slice linear heads, input shift/scale.
Used by the reference's PPL metric and projector.

Pretrained VGG16 + LPIPS linear weights cannot be downloaded in this
environment; `convert_torch_lpips` ingests them when supplied (torchvision
vgg16 `features.*` state dict + the richzhang v0.1 linear weights), and
`init` builds a random-weight instance for tests. The forward is exact
otherwise.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clip_glass_tpu.core.dtypes import Policy, FP32

# channels out of each conv in torchvision vgg16.features, by layer index
_VGG_CFG = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
            (10, 128, 256), (12, 256, 256), (14, 256, 256),
            (17, 256, 512), (19, 512, 512), (21, 512, 512),
            (24, 512, 512), (26, 512, 512), (28, 512, 512)]
# feature-slice boundaries (reference lpips.py:35: [0, 4, 9, 16, 23, 30])
_SLICE_END = [4, 9, 16, 23, 30]
# conv indices per slice, and whether the slice starts with a maxpool
_SLICES = [
    ([0, 2], False),
    ([5, 7], True),
    ([10, 12, 14], True),
    ([17, 19, 21], True),
    ([24, 26, 28], True),
]
_SLICE_OUT = [64, 128, 256, 512, 512]

SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

_DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                     ("NHWC", "HWIO", "NHWC"))


def init(key, scale: float = 0.1) -> Dict:
    """Random-weight LPIPS (tests / smoke); same structure as converted."""
    convs = {}
    for i, (idx, cin, cout) in enumerate(_VGG_CFG):
        k1, key = jax.random.split(key)
        convs[str(idx)] = {
            "w": scale * jax.random.normal(k1, (3, 3, cin, cout)),
            "b": jnp.zeros((cout,)),
        }
    heads = []
    for i, c in enumerate(_SLICE_OUT):
        k1, key = jax.random.split(key)
        heads.append(jnp.abs(scale * jax.random.normal(k1, (c,))))
    return {"convs": convs, "heads": heads}


def convert_torch_lpips(vgg_features_sd: Dict, linear_weights: Sequence) -> Dict:
    """torchvision vgg16 `features.{i}.weight/bias` + the 5 LPIPS linear
    weight tensors -> params pytree."""
    def _np(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x, np.float32)

    convs = {}
    for idx, cin, cout in _VGG_CFG:
        w = _np(vgg_features_sd[f"{idx}.weight"])      # [O,I,3,3]
        convs[str(idx)] = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                           "b": jnp.asarray(_np(vgg_features_sd[f"{idx}.bias"]))}
    heads = [jnp.asarray(_np(w).reshape(-1)) for w in linear_weights]
    return {"convs": convs, "heads": heads}


def load_npz(path: str) -> Dict:
    """Converted-checkpoint load (the npz scripts/convert_weights.py lpips
    emits); restores ONLY the heads list from its flattened encoding —
    `convs` is keyed by torchvision layer index, i.e. digit strings that
    restore_lists would wrongly collapse into a dense list."""
    from clip_glass_tpu.core import pytree
    tree = pytree.load_npz(path)
    return {"convs": tree["convs"],
            "heads": pytree.restore_lists(tree["heads"])}


def _conv(x, p, policy):
    y = jax.lax.conv_general_dilated(
        x, policy.cast_compute(p["w"]), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DN)
    return y + policy.cast_compute(p["b"])


def _maxpool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _unit_normalize(x, eps=1e-8):
    r = jax.lax.rsqrt(jnp.sum(jnp.square(jnp.asarray(x, jnp.float32)),
                              axis=-1, keepdims=True) + eps)
    return (x * r.astype(x.dtype))


def lpips(params, x0, x1, pixel_min: float = -1.0, pixel_max: float = 1.0,
          policy: Policy = FP32) -> jnp.ndarray:
    """x0, x1: [B, 3, H, W] in [pixel_min, pixel_max] -> [B] distances
    (reference lpips.py:60-78)."""
    def prep(x):
        x = jnp.asarray(x, jnp.float32)
        if pixel_min != -1.0 or pixel_max != 1.0:
            x = (2 * x - pixel_min - pixel_max) / (pixel_max - pixel_min)
        x = (x - SHIFT[None, :, None, None]) / SCALE[None, :, None, None]
        return policy.cast_compute(jnp.transpose(x, (0, 2, 3, 1)))  # NHWC

    a, b = prep(x0), prep(x1)
    dist = jnp.zeros((x0.shape[0],), jnp.float32)
    for (conv_ids, pre_pool), head in zip(_SLICES, params["heads"]):
        if pre_pool:
            a, b = _maxpool2(a), _maxpool2(b)
        for ci in conv_ids:
            a = jax.nn.relu(_conv(a, params["convs"][str(ci)], policy))
            b = jax.nn.relu(_conv(b, params["convs"][str(ci)], policy))
        na, nb = _unit_normalize(a), _unit_normalize(b)
        sq = jnp.mean(jnp.square(jnp.asarray(na - nb, jnp.float32)),
                      axis=(1, 2))                       # [B, C]
        dist = dist + sq @ jnp.asarray(head, jnp.float32)
    return dist
