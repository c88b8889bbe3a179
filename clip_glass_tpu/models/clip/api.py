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

# reference clip/clip.py:17-21: model registry; the sha256 of each official
# checkpoint is embedded in its download URL and verified after download
# (clip/clip.py:24-53). No egress here — the hashes validate local files.
MODEL_SHA256 = {
    "RN50": "afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762",
    "ViT-B/32": "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af",
}
AVAILABLE_MODELS = tuple(MODEL_SHA256)


def available_models():
    return list(AVAILABLE_MODELS)


def verify_checkpoint(path: str, model_name: str) -> bool:
    """sha256-check a local checkpoint against the official hash
    (reference clip/clip.py:45-53)."""
    import hashlib

    expected = MODEL_SHA256.get(model_name)
    if expected is None:
        raise KeyError(f"unknown model {model_name!r}; see available_models()")
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest() == expected


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
    params, cfg = convert_clip.load_checkpoint(name_or_path)
    return LoadedCLIP(params, cfg, policy)
