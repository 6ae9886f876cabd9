"""Color conversion ops.

The reference grayscales with ``af::rgb2gray(rgb, 0.299, 0.587, 0.114)``
(``/root/reference/Watermark_GPU/main.cpp:142-144,154``) — BT.601 luma on
0..255 float data.
"""

from __future__ import annotations

import jax.numpy as jnp

BT601_WEIGHTS = (0.299, 0.587, 0.114)


def rgb_to_gray(rgb: jnp.ndarray,
                weights: tuple[float, float, float] = BT601_WEIGHTS) -> jnp.ndarray:
    """(H, W, 3) -> (H, W) luma. Passes 2D inputs through unchanged."""
    if rgb.ndim == 2:
        return rgb
    w = jnp.asarray(weights, dtype=rgb.dtype)
    return jnp.tensordot(rgb[..., :3], w, axes=([-1], [0]))
