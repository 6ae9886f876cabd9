"""Vectorized float64 NumPy oracle of the full watermarking pipelines.

Unlike ``oracle.py`` (scalar loops, only practical on tiny images), this
implementation is fast enough to run over the reference's real bundled
samples (512^2 / 480p / 720p PNG + ``.dat`` pairs), so the recorded goldens
in ``goldens.json`` are cross-checked against math that shares no code with
``watermarking_gpu_tpu`` — closing the shared-bug blind spot of
self-generated goldens. Everything accumulates in float64; agreement with
the f32 framework is expected to ~1e-4.

Algorithm definitions follow the reference
(``/root/reference/Watermark_GPU/Watermark.cpp:156-250``): BT.601 grayscale,
clamp-to-edge borders, NVF mask sigma^2/(1+sigma^2), 8-tap least-squares
prediction with Rx a = rx, mask |e|/max|e|, additive embed with
strength = (255/sqrt(10^(psnr/10))) / (||u||/sqrt(N)), and the normalized
error-sequence correlation detector.
"""

from __future__ import annotations

import numpy as np

OFFSETS = [(-1, -1), (-1, 0), (-1, 1),
           (0, -1), (0, 1),
           (1, -1), (1, 0), (1, 1)]


def rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    """BT.601 luma (main.cpp:142-144) in float64."""
    weights = np.asarray([0.299, 0.587, 0.114], dtype=np.float64)
    return rgb.astype(np.float64) @ weights


def neighbor_planes(img: np.ndarray) -> np.ndarray:
    """(H, W) -> (8, H, W) clamp-to-edge 3x3 neighbors."""
    h, w = img.shape
    padded = np.pad(img, 1, mode="edge")
    return np.stack([padded[1 + dr:1 + dr + h, 1 + dc:1 + dc + w]
                     for dr, dc in OFFSETS])


def nvf_mask(img: np.ndarray, p: int = 3) -> np.ndarray:
    half = p // 2
    h, w = img.shape
    padded = np.pad(img, half, mode="edge")
    total = np.zeros((h, w), dtype=np.float64)
    total_sq = np.zeros((h, w), dtype=np.float64)
    for dr in range(p):
        for dc in range(p):
            window = padded[dr:dr + h, dc:dc + w]
            total += window
            total_sq += window * window
    mean = total / (p * p)
    variance = total_sq / (p * p) - mean * mean
    return variance / (1.0 + variance)


def solve_predictor(img: np.ndarray) -> np.ndarray:
    flat = neighbor_planes(img).reshape(8, -1)
    rx_matrix = flat @ flat.T
    rx_vector = flat @ img.ravel()
    return np.linalg.solve(rx_matrix, rx_vector)


def predict(img: np.ndarray, coeffs: np.ndarray) -> np.ndarray:
    return np.einsum("k,khw->hw", coeffs, neighbor_planes(img))


def embed(gray: np.ndarray, output: np.ndarray, watermark: np.ndarray,
          mask_type: str, psnr: float, p: int = 3):
    """Returns (watermarked float64, strength)."""
    if mask_type == "me":
        coeffs = solve_predictor(gray)
        error = gray - predict(gray, coeffs)
        mask = np.abs(error) / np.abs(error).max()
    else:
        mask = nvf_mask(gray, p)
    u = mask * watermark.astype(np.float64)
    strength_factor = 255.0 / np.sqrt(10.0 ** (psnr / 10.0))
    strength = strength_factor / (np.linalg.norm(u) / np.sqrt(u.size))
    addend = u * strength
    if output.ndim == 3:
        addend = addend[..., None]
    return np.clip(output.astype(np.float64) + addend, 0, 255), strength


def detect(gray: np.ndarray, watermark: np.ndarray, mask_type: str,
           p: int = 3) -> float:
    coeffs = solve_predictor(gray)
    e_z = gray - predict(gray, coeffs)
    if mask_type == "me":
        mask = np.abs(e_z) / np.abs(e_z).max()
    else:
        mask = nvf_mask(gray, p)
    u = mask * watermark.astype(np.float64)
    e_u = u - predict(u, coeffs)
    a, b = e_u.ravel(), e_z.ravel()
    return float(a @ b / (np.linalg.norm(b) * np.linalg.norm(a)))
