"""Fused prediction-error normal-equation (Rx/rx) Pallas kernel.

One pass over the image accumulates all 45 unique entries of the 9x9 Gram
matrix of [8 clamped neighbors; center]. ``G[:8, :8]`` is Rx and ``G[:8, 8]``
is rx — both reference reductions in a single fused pass
(``/root/reference/Watermark_GPU/kernels/me_p3.hpp:8-21,59-82`` staged these
as fp16 workgroup partials; here everything stays f32, strictly more
precise).

Reduction strategy (chosen by measurement over MXU-reshape and full-tree
variants): each pair's product reduces over sublanes only (a cheap axis-0
reduction) into a (W,)-lane partial accumulated in a (48, W) output block
that lives in VMEM across the sequential strip grid; the final lane
reduction and the scatter into the symmetric 9x9 happen in XLA on the tiny
(45, W) result. No in-kernel scalar reduction trees.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..neighbors import NEIGHBOR_OFFSETS
from .common import interpret_mode, pad_image, pick_strip, pick_strip_for_width

PAD = 4
_OFFSETS = tuple(NEIGHBOR_OFFSETS) + ((0, 0),)  # 8 neighbors then center
_PAIRS = [(a, b) for a in range(9) for b in range(a, 9)]  # 45 unique entries

# symmetric pair -> flat partial-row index
_PAIR_INDEX = np.zeros((9, 9), dtype=np.int32)
for _idx, (_a, _b) in enumerate(_PAIRS):
    _PAIR_INDEX[_a, _b] = _idx
    _PAIR_INDEX[_b, _a] = _idx


def _me_gram_kernel(pin, pout, *, pad: int, strip: int, width: int,
                    rows: int):
    ext = pin[0]
    strip_index = pl.program_id(1)

    # mask rows beyond the true image (bottom padding of the last strip):
    # they replicate the edge and must not count as centers
    global_row = (strip_index * strip
                  + jax.lax.broadcasted_iota(jnp.int32, (strip, width), 0))
    mask = (global_row < rows).astype(jnp.float32)

    def plane(k):
        dr, dc = _OFFSETS[k]
        return ext[pad + dr : pad + dr + strip, pad + dc : pad + dc + width]

    @pl.when(strip_index == 0)
    def _():
        pout[0] = jnp.zeros_like(pout[0])

    index = 0
    for a in range(9):
        pa = plane(a) * mask
        for b in range(a, 9):
            pout[0, index, :] += jnp.sum(pa * plane(b), axis=0)
            index += 1


def me_gram_padded(img_p: jnp.ndarray, rows: int, cols: int, pad: int,
                   strip: int, rows_padded: int) -> jnp.ndarray:
    """(B, 9, 9) Gram from a pre-padded (B, rows_padded+2p, cols+2p) image."""
    batch = img_p.shape[0]
    partials = pl.pallas_call(
        partial(_me_gram_kernel, pad=pad, strip=strip, width=cols, rows=rows),
        grid=(batch, rows_padded // strip),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(strip + 2 * pad),
             pl.Element(cols + 2 * pad)),
            lambda b, i: (b, i * strip, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 48, cols), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 48, cols), jnp.float32),
        interpret=interpret_mode(),
    )(img_p)
    sums = jnp.sum(partials[:, :45], axis=-1)        # (B, 45)
    return sums[:, _PAIR_INDEX]                      # (B, 9, 9) gather


@partial(jax.jit, static_argnames=("strip",))
def me_gram_pallas(image: jnp.ndarray,
                   strip: int | None = None) -> jnp.ndarray:
    """(H, W) or (B, H, W) -> (B?, 9, 9) Gram matrix."""
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
    batch, rows, cols = image.shape
    if strip is None:  # width-adaptive VMEM budget (ext + pair temporaries)
        strip, rows_padded = pick_strip_for_width(rows, cols, 130_000, PAD)
    else:
        strip, rows_padded = pick_strip(rows, strip)
    padded = pad_image(image, PAD, rows_padded)
    gram = me_gram_padded(padded, rows, cols, PAD, strip, rows_padded)
    return gram[0] if squeeze else gram


def me_normal_equations_pallas(
        image: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rx (8, 8) and rx (8,) — or batched (B, 8, 8)/(B, 8) — in one pass."""
    gram = me_gram_pallas(image)
    return gram[..., :8, :8], gram[..., :8, 8]
