"""Shared tiling/padding helpers for the Pallas TPU stencil kernels.

Kernel geometry: images are processed as overlapping full-width row strips.
Each grid step reads a (STRIP + 2*PAD, W + 2*PAD) halo-extended strip of the
edge-padded image via elementwise-indexed BlockSpecs (``pl.Element``) and
writes a (STRIP, W) output tile. PAD is 4 (or 8 for very wide stencils) so
strip block heights stay divisible by the f32 sublane size 8; the halo rows a
3x3 stencil actually consumes sit at offsets PAD +/- 1.

This replaces the reference's 16x16 workgroup + shared-memory tile geometry
(``/root/reference/Watermark_GPU/kernels/nvf.hpp:19-28``) with
(8, 128)-lane-aligned VMEM strips that Mosaic can pipeline (double-buffered
HBM->VMEM DMA per strip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_STRIP = 256


def is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU CI)."""
    return not is_tpu()


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pick_strip(rows: int, strip: int = DEFAULT_STRIP) -> tuple[int, int]:
    """Return (strip_rows, padded_rows) with strip % 8 == 0, strip | padded.

    Among strips within the budget, pick the one whose padded row count is
    smallest (largest strip on ties): a naive round-up can waste nearly a
    whole strip of masked padding rows (e.g. rows=512, budget 492 -> strip
    492 pads to 984 — half the kernel's work thrown away; strip 256 pads to
    exactly 512).
    """
    budget = max(8, min(strip, round_up(rows, 8)) // 8 * 8)
    best = (round_up(rows, budget), -budget)
    for candidate in range(budget, 7, -8):
        padded = round_up(rows, candidate)
        if (padded, -candidate) < best:
            best = (padded, -candidate)
        if padded == round_up(rows, 8):
            break   # no smaller padding exists
    return -best[1], best[0]


def pick_strip_for_width(rows: int, cols: int, budget_elems: int,
                         pad: int = 4) -> tuple[int, int]:
    """Width-adaptive strip: (strip + 2*pad) * (cols + 2*pad) <= budget.

    Keeps each kernel's VMEM working set roughly constant across image widths
    (Mosaic's scoped-vmem stack is ~16 MB; budgets are calibrated per kernel
    from their live temporaries at 1080p).
    """
    strip = budget_elems // (cols + 2 * pad) - 2 * pad
    strip = max(8, strip // 8 * 8)
    return pick_strip(rows, strip)


def pad_image(image: jnp.ndarray, pad: int, rows_to: int) -> jnp.ndarray:
    """Edge-pad (..., H, W) to (..., rows_to + 2*pad, W + 2*pad).

    Edge replication reproduces the reference's CLAMP_TO_EDGE sampler; the
    extra bottom rows (rows_to - H) also replicate the last row and are
    either masked out (reductions) or sliced off (maps) by the callers.
    """
    rows = image.shape[-2]
    widths = [(0, 0)] * (image.ndim - 2)
    widths += [(pad, pad + rows_to - rows), (pad, pad)]
    return jnp.pad(image, widths, mode="edge")
