"""Watermark embedding math.

Reference behavior (``/root/reference/Watermark_GPU/Watermark.cpp:156-172``):

    u        = mask * W
    strength = strengthFactor / (||u|| / sqrt(N))    # strengthFactor = 255/sqrt(10^(psnr/10))
    output   = clamp(output + u * strength, 0, 255)

When ``output`` is RGB the grayscale ``u`` broadcasts over the channel axis
(``Watermark.cpp:171`` relies on ArrayFire broadcasting).

Batch-polymorphic: masks/watermarks (..., H, W); outputs (..., H, W) or
(..., H, W, 3); strengths (...,).

Note (documented invariance): ``u * strength = strengthFactor * sqrt(N) * u/||u||``
is invariant to any positive rescaling of the mask, so the ME mask's
``1/max|e|`` normalization only affects the *reported* strength scalar, never
the embedded pixels. The fused fast path exploits this; this module keeps the
reference formula verbatim.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def strength_factor(psnr: float) -> float:
    """255 / sqrt(10^(psnr/10)) (Watermark.cpp:22)."""
    return 255.0 / math.sqrt(10.0 ** (psnr / 10.0))


def embed_watermark(output: jnp.ndarray, mask: jnp.ndarray,
                    watermark: jnp.ndarray,
                    strength_factor_value: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Additive spread-spectrum embed. Returns (watermarked, strengths)."""
    u = mask * watermark
    n = u.shape[-1] * u.shape[-2]
    norm_sq = jnp.sum(u * u, axis=(-2, -1))
    strength = strength_factor_value / jnp.sqrt(norm_sq / n)   # (...,)
    addend = u * strength[..., None, None]
    if output.ndim == mask.ndim + 1:  # (..., H, W, C) broadcast over channels
        addend = addend[..., None]
    return jnp.clip(output + addend, 0.0, 255.0), strength
