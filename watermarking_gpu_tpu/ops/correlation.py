"""Normalized correlation detector.

Reference (``/root/reference/Watermark_GPU/Watermark.cpp:228-231``):

    corr = dot(flat(e_u), flat(e_z)) / (||e_z|| * ||e_u||)

Batch-polymorphic: error sequences (..., H, W) -> correlations (...,).
"""

from __future__ import annotations

import jax.numpy as jnp


def correlation(e_u: jnp.ndarray, e_z: jnp.ndarray) -> jnp.ndarray:
    """Per-image cosine similarity between two error sequences."""
    axes = (-2, -1)
    dot = jnp.sum(e_u * e_z, axis=axes)
    norm_u = jnp.sum(e_u * e_u, axis=axes)
    norm_z = jnp.sum(e_z * e_z, axis=axes)
    return dot / (jnp.sqrt(norm_z) * jnp.sqrt(norm_u))
