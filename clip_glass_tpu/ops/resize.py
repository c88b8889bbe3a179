"""Image resizing for CLIP scoring.

The fitness path resizes generated images to 224x224 with bilinear,
half-pixel-centers semantics (`kornia.resize(x, (224,224))`, reference
generator.py:45 — torch F.interpolate align_corners=False), which is exactly
`jax.image.resize(method="bilinear")`.

The img2txt target preprocessing (reference clip/clip.py:68-74: shorter-side
bicubic resize -> center crop -> normalize) runs once per search on the host.
"""

from __future__ import annotations

import jax.image
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def resize_bilinear(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """images: [B, C, H, W] -> [B, C, size, size].

    antialias=False is load-bearing: torch F.interpolate (and kornia) do NOT
    lowpass-filter on downscale, and the fitness path downsamples 1024px ->
    224px — with antialiasing the CLIP inputs (and hence fitness) diverge
    from the reference by ~0.4 in pixel values."""
    B, C = images.shape[:2]
    return jax.image.resize(images, (B, C, size, size), method="bilinear",
                            antialias=False)


def clip_preprocess_pil(pil_image, size: int = 224) -> np.ndarray:
    """Host-side CLIP preprocessing of a target image for img2txt
    (reference generator.py:25-27): bicubic shorter-side resize, center crop,
    [0,1] scale, CLIP mean/std normalize. Returns [1, 3, size, size] fp32."""
    from PIL import Image

    img = pil_image.convert("RGB")
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((max(size, int(round(w * scale))),
                      max(size, int(round(h * scale)))), Image.BICUBIC)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    return np.transpose(arr, (2, 0, 1))[None].astype(np.float32)
