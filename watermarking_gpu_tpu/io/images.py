"""Image file IO.

The reference loads PNGs with ``af::loadImage(file, true)`` (float RGB on the
0..255 range, ``/root/reference/Watermark_GPU/main.cpp:153``) and saves
watermarked outputs as u8 with ``af::saveImageNative`` after a plain cast
(``main.cpp:235-237``). We mirror both: float32 0..255 in, truncating u8 cast
out (values are already clamped to [0, 255] by the embedder).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def load_image_rgb(path: str | os.PathLike) -> np.ndarray:
    """Load an image as float32 (H, W, 3) on 0..255."""
    with Image.open(path) as img:
        rgb = img.convert("RGB")
        return np.asarray(rgb, dtype=np.float32)


def load_image_gray(path: str | os.PathLike) -> np.ndarray:
    """Load an image and return BT.601 luma as float32 (H, W) on 0..255."""
    rgb = load_image_rgb(path)
    weights = np.array([0.299, 0.587, 0.114], dtype=np.float32)
    return rgb @ weights


def save_image_u8(path: str | os.PathLike, image: np.ndarray) -> None:
    """Save a float image (H, W) or (H, W, 3) as 8-bit, truncating cast."""
    arr = np.asarray(image)
    u8 = arr.astype(np.uint8)  # truncation, matching af::array::as(u8)
    Image.fromarray(u8).save(path)


def add_suffix_before_extension(path: str, suffix: str) -> str:
    """'img.png', '_W_NVF' -> 'img_W_NVF.png' (Utilities.cpp:7-11)."""
    root, ext = os.path.splitext(path)
    return f"{root}{suffix}{ext}"
