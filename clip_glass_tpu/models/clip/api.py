"""clip.load-style convenience API (reference clip/clip.py:56-122).

`load` returns a `LoadedCLIP` exposing `encode_image`/`encode_text` (jitted)
and the host-side `preprocess`, mirroring `model, preprocess = clip.load(...)`.
Accepts a checkpoint path or `"random[:seed]"`; names mirror the reference's
`_MODELS` registry (clip/clip.py:18-21) but map to local checkpoint paths —
this environment has no download egress.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import numpy as np

from clip_glass_tpu.core.dtypes import Policy, FP32
from clip_glass_tpu.models.clip import model as clip_model
from clip_glass_tpu.ops.resize import clip_preprocess_pil
from clip_glass_tpu.tokenizers import tokenize  # noqa: F401  (re-export)

# reference clip/clip.py:18-21 lists these names
AVAILABLE_MODELS = ("RN50", "ViT-B/32")


def available_models():
    return list(AVAILABLE_MODELS)


@dataclasses.dataclass
class LoadedCLIP:
    params: dict
    cfg: clip_model.CLIPConfig
    policy: Policy
    _enc_img: Callable = None
    _enc_txt: Callable = None

    def __post_init__(self):
        self._enc_img = jax.jit(partial(clip_model.encode_image,
                                        cfg=self.cfg, policy=self.policy))
        self._enc_txt = jax.jit(partial(clip_model.encode_text,
                                        cfg=self.cfg, policy=self.policy))

    def encode_image(self, images):
        return self._enc_img(self.params, images)

    def encode_text(self, text_ids):
        return self._enc_txt(self.params, text_ids)

    def preprocess(self, pil_image) -> np.ndarray:
        return clip_preprocess_pil(pil_image, self.cfg.image_resolution)


def load(name_or_path: str = "random:0", policy: Optional[Policy] = None,
         cfg: Optional[clip_model.CLIPConfig] = None) -> LoadedCLIP:
    policy = policy or FP32
    if isinstance(name_or_path, str) and name_or_path.startswith("random"):
        seed = int(name_or_path.split(":")[1]) if ":" in name_or_path else 0
        cfg = cfg or clip_model.VIT_B_32
        params = jax.jit(lambda k: clip_model.init(k, cfg))(
            jax.random.PRNGKey(seed))
        return LoadedCLIP(params, cfg, policy)
    from clip_glass_tpu.weights import convert_clip
    params, cfg = convert_clip.load_torch_checkpoint(name_or_path)
    return LoadedCLIP(params, cfg, policy)
