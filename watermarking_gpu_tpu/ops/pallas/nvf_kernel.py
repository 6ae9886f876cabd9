"""Fused NVF mask Pallas kernel.

One pass over the image: each grid step loads a halo-extended row strip into
VMEM and computes the p x p window sum and sum-of-squares with separable
row/column shifted adds (2*p adds per plane instead of p^2), then the
variance -> ``var / (1 + var)`` mask, all in registers/VMEM.

Reference semantics: ``/root/reference/Watermark_GPU/kernels/nvf.hpp:37-50``
(clamp-to-edge window, population variance, compile-time p).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_mode, pad_image, pick_strip, pick_strip_for_width


def _nvf_kernel(pin, pout, *, p: int, pad: int, strip: int, width: int):
    half = p // 2
    inv_p2 = 1.0 / float(p * p)
    ext = pin[0]  # (strip + 2*pad, width + 2*pad)

    # separable box sums: columns first (lane shifts), then rows
    rows_span = strip + 2 * half
    col_sum = jnp.zeros((rows_span, width), jnp.float32)
    col_sq = jnp.zeros((rows_span, width), jnp.float32)
    row0 = pad - half
    for dc in range(-half, half + 1):
        sl = ext[row0 : row0 + rows_span, pad + dc : pad + dc + width]
        col_sum = col_sum + sl
        col_sq = col_sq + sl * sl

    total = jnp.zeros((strip, width), jnp.float32)
    total_sq = jnp.zeros((strip, width), jnp.float32)
    for dr in range(p):
        total = total + col_sum[dr : dr + strip]
        total_sq = total_sq + col_sq[dr : dr + strip]

    mean = total * inv_p2
    variance = total_sq * inv_p2 - mean * mean
    pout[0] = variance / (1.0 + variance)


@partial(jax.jit, static_argnames=("p", "strip"))
def nvf_mask_pallas(image: jnp.ndarray, p: int = 3,
                    strip: int | None = None) -> jnp.ndarray:
    """NVF mask of (H, W) or (B, H, W) images via the fused strip kernel."""
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
    batch, rows, cols = image.shape
    pad = 4 if p // 2 <= 3 else 8
    if strip is None:  # width-adaptive VMEM budget (col sums + totals live)
        strip, rows_padded = pick_strip_for_width(rows, cols, 240_000, pad)
    else:
        strip, rows_padded = pick_strip(rows, strip)
    padded = pad_image(image, pad, rows_padded)

    out = pl.pallas_call(
        partial(_nvf_kernel, p=p, pad=pad, strip=strip, width=cols),
        grid=(batch, rows_padded // strip),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(strip + 2 * pad),
             pl.Element(cols + 2 * pad)),
            lambda b, i: (b, i * strip, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, strip, cols), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, rows_padded, cols),
                                       jnp.float32),
        interpret=interpret_mode(),
    )(padded)
    out = out[:, :rows]
    return out[0] if squeeze else out
