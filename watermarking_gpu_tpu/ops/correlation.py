"""Normalized correlation detector.

Reference (``/root/reference/Watermark_GPU/Watermark.cpp:228-231``):

    corr = dot(flat(e_u), flat(e_z)) / (||e_z|| * ||e_u||)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def correlation(e_u: jnp.ndarray, e_z: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity between two error sequences (any matching shapes)."""
    a = e_u.reshape(-1)
    b = e_z.reshape(-1)
    dot = jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    return dot / (jnp.linalg.norm(b) * jnp.linalg.norm(a))
