"""Image grid saving (torchvision-free equivalents of reference utils.py:5-12
make_grid/save_image usage)."""

from __future__ import annotations

import math
import os

import numpy as np


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """[B, C, H, W] floats in [0,1] -> [C, H', W'] grid
    (torchvision.utils.make_grid semantics)."""
    b, c, h, w = images.shape
    ncol = min(nrow, b)
    nrows = math.ceil(b / ncol)
    grid = np.full((c, padding + nrows * (h + padding),
                    padding + ncol * (w + padding)), pad_value, np.float32)
    for idx in range(b):
        r, col = divmod(idx, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[:, y:y + h, x:x + w] = images[idx]
    return grid


def to_pil(image_chw: np.ndarray):
    from PIL import Image
    arr = np.clip(image_chw, 0.0, 1.0)
    arr = (np.transpose(arr, (1, 2, 0)) * 255.0 + 0.5).astype(np.uint8)
    return Image.fromarray(arr)


def save_image(image_chw: np.ndarray, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    to_pil(image_chw).save(path)


def show_grid(images: np.ndarray, nrow: int = 8):
    """Display a batch grid (reference utils.py:9-12 uses matplotlib; this
    opens the PIL viewer — headless environments should use save_grid)."""
    to_pil(make_grid(np.asarray(images, np.float32), nrow=nrow)).show()


def save_grid(images: np.ndarray, path: str, nrow: int = 8):
    """Save a batch as a grid jpg (reference utils.py:5-7); single images
    are saved directly (reference generator.py:64-67). Accepts floats in
    [0,1] or pre-quantized uint8 (device-side quantization, fitness
    generator.save)."""
    images = np.asarray(images)
    if images.dtype == np.uint8:
        images = images.astype(np.float32) / 255.0
    images = np.asarray(images, np.float32)
    if images.shape[0] == 1:
        save_image(images[0], path)
    else:
        save_image(make_grid(images, nrow=nrow), path)
