"""Independent NumPy loop-level oracle of the watermarking math.

Deliberately written as plain Python loops over the algorithm *definitions*
(local variance mask; 8-neighbor least-squares predictor; normalized
correlation) so the JAX ops are validated against something that shares no
code with them.
"""

from __future__ import annotations

import functools

import numpy as np


def clamp_get(img: np.ndarray, r: int, c: int) -> float:
    h, w = img.shape
    return img[min(max(r, 0), h - 1), min(max(c, 0), w - 1)]


@functools.lru_cache(maxsize=None)   # neighbors_of runs per pixel
def neighbor_offsets(p: int = 3):
    half = p // 2
    return [(dr, dc) for dr in range(-half, half + 1)
            for dc in range(-half, half + 1) if (dr, dc) != (0, 0)]


NEIGHBOR_OFFSETS = neighbor_offsets(3)


def nvf_mask(img: np.ndarray, p: int = 3) -> np.ndarray:
    pad = p // 2
    h, w = img.shape
    out = np.zeros((h, w), dtype=np.float64)
    for r in range(h):
        for c in range(w):
            vals = [clamp_get(img, r + i, c + j)
                    for i in range(-pad, pad + 1)
                    for j in range(-pad, pad + 1)]
            vals = np.asarray(vals, dtype=np.float64)
            mean = vals.sum() / (p * p)
            var = (vals * vals).sum() / (p * p) - mean * mean
            out[r, c] = var / (1.0 + var)
    return out


def neighbors_of(img: np.ndarray, r: int, c: int, p: int = 3) -> np.ndarray:
    return np.asarray(
        [clamp_get(img, r + dr, c + dc) for dr, dc in neighbor_offsets(p)],
        dtype=np.float64)


def me_normal_equations(img: np.ndarray, p: int = 3):
    h, w = img.shape
    k = p * p - 1
    rx_m = np.zeros((k, k), dtype=np.float64)
    rx_v = np.zeros(k, dtype=np.float64)
    for r in range(h):
        for c in range(w):
            n = neighbors_of(img, r, c, p)
            rx_m += np.outer(n, n)
            rx_v += n * img[r, c]
    return rx_m, rx_v


def predict(img: np.ndarray, coeffs: np.ndarray, p: int = 3) -> np.ndarray:
    h, w = img.shape
    out = np.zeros((h, w), dtype=np.float64)
    for r in range(h):
        for c in range(w):
            out[r, c] = float(np.dot(coeffs, neighbors_of(img, r, c, p)))
    return out


def me_mask_and_error(img: np.ndarray, p: int = 3):
    rx_m, rx_v = me_normal_equations(img, p)
    coeffs = np.linalg.solve(rx_m, rx_v)
    err = img - predict(img, coeffs, p)
    mask = np.abs(err) / np.abs(err).max()
    return mask, err, coeffs


def embed(img_gray: np.ndarray, output: np.ndarray, mask: np.ndarray,
          watermark: np.ndarray, psnr: float):
    u = mask * watermark
    n = u.size
    sf = 255.0 / np.sqrt(10.0 ** (psnr / 10.0))
    strength = sf / (np.linalg.norm(u) / np.sqrt(n))
    add = u * strength
    if output.ndim == 3:
        add = add[..., None]
    return np.clip(output + add, 0, 255), strength


def correlation(e_u: np.ndarray, e_z: np.ndarray) -> float:
    a, b = e_u.ravel(), e_z.ravel()
    return float(np.dot(a, b) / (np.linalg.norm(b) * np.linalg.norm(a)))


def detect(img: np.ndarray, watermark: np.ndarray, mask_type: str,
           p: int = 3) -> float:
    # Predictor window: p for the generalized ME mask; the NVF detector
    # keeps the fixed 3x3 predictor (p sizes only the variance window).
    pred_p = p if mask_type == "me" else 3
    rx_m, rx_v = me_normal_equations(img, pred_p)
    coeffs = np.linalg.solve(rx_m, rx_v)
    e_z = img - predict(img, coeffs, pred_p)
    if mask_type == "me":
        mask = np.abs(e_z) / np.abs(e_z).max()
    else:
        mask = nvf_mask(img, p)
    u = mask * watermark
    e_u = u - predict(u, coeffs, pred_p)
    return correlation(e_u, e_z)
