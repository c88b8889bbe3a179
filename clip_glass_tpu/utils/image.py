"""Image grid saving (torchvision-free equivalents of reference utils.py:5-12
make_grid/save_image usage)."""

from __future__ import annotations

import math
import os

import numpy as np


def _grid_cells(b: int, h: int, w: int, nrow: int, padding: int):
    """Shared grid geometry: ((H', W'), [(y, x) per tile])."""
    ncol = min(nrow, b)
    nrows = math.ceil(b / ncol)
    shape = (padding + nrows * (h + padding), padding + ncol * (w + padding))
    cells = [(padding + (i // ncol) * (h + padding),
              padding + (i % ncol) * (w + padding)) for i in range(b)]
    return shape, cells


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """[B, C, H, W] floats in [0,1] -> [C, H', W'] grid
    (torchvision.utils.make_grid semantics)."""
    b, c, h, w = images.shape
    (gh, gw), cells = _grid_cells(b, h, w, nrow, padding)
    grid = np.full((c, gh, gw), pad_value, np.float32)
    for idx, (y, x) in enumerate(cells):
        grid[:, y:y + h, x:x + w] = images[idx]
    return grid


def to_pil(image_chw: np.ndarray):
    from PIL import Image
    # quantize BEFORE transposing: elementwise math through the strided
    # CHW->HWC view is pathologically slow (measured 24 s for a 16 MP
    # grid on this host); on the contiguous array it is milliseconds
    arr = (np.clip(image_chw, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    return Image.fromarray(np.ascontiguousarray(arr.transpose(1, 2, 0)))


def save_image(image_chw: np.ndarray, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    to_pil(image_chw).save(path)


def show_grid(images: np.ndarray, nrow: int = 8):
    """Display a batch grid (reference utils.py:9-12 uses matplotlib; this
    opens the PIL viewer — headless environments should use save_grid)."""
    to_pil(make_grid(np.asarray(images, np.float32), nrow=nrow)).show()


def _grid_u8(images: np.ndarray, nrow: int = 8, padding: int = 2):
    """[B, C, H, W] uint8 -> [H', W', C] uint8 grid, assembled HWC-native
    (no float round trip, no strided elementwise math)."""
    b, c, h, w = images.shape
    (gh, gw), cells = _grid_cells(b, h, w, nrow, padding)
    out = np.zeros((gh, gw, c), np.uint8)
    for i, (y, x) in enumerate(cells):
        out[y:y + h, x:x + w] = images[i].transpose(1, 2, 0)
    return out


def save_grid(images: np.ndarray, path: str, nrow: int = 8):
    """Save a batch as a grid jpg (reference utils.py:5-7); single images
    are saved directly (reference generator.py:64-67). Accepts floats in
    [0,1] or pre-quantized uint8 (device-side quantization, fitness
    generator.save) — the uint8 path assembles the grid without any float
    math (the float path cost ~25-39 s per 16 MP grid on this host)."""
    from PIL import Image

    images = np.asarray(images)
    if images.dtype == np.uint8:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if images.shape[0] == 1:
            arr = np.ascontiguousarray(images[0].transpose(1, 2, 0))
        else:
            arr = _grid_u8(images, nrow=nrow)
        Image.fromarray(arr).save(path)
        return
    images = np.asarray(images, np.float32)
    if images.shape[0] == 1:
        save_image(images[0], path)
    else:
        save_image(make_grid(images, nrow=nrow), path)
