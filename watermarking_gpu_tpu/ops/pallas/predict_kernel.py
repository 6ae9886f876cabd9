"""Fused (p*p-1)-tap prediction-error Pallas kernel.

err = center - sum_k coeffs[k] * neighbor_k in one pass over the image
(the reference runs this as the ``scaled_neighbors_p3`` kernel plus an
ArrayFire subtraction, ``/root/reference/Watermark_GPU/kernels/
scaled_neighbors_p3.hpp:29-43`` and ``Watermark.cpp:210``; here the subtract
and the stencil fuse into the same VMEM strip pass).

Coefficients arrive via scalar prefetch (SMEM) so each strip's weighted
accumulation uses scalar * vector VPU ops. The window generalizes to
p in {3, 5, 7, 9} (the reference is p=3-only, ``main.cpp:88-89``): the
PAD=4 halo covers stencil reach up to p=9, and each extra tap is one more
shifted scalar*vector FMA over the strip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..neighbors import neighbor_offsets
from .common import interpret_mode, pad_image, pick_strip, pick_strip_for_width

PAD = 4


def predict_budget(p: int) -> int:
    """Width-adaptive VMEM budget (f32 elements) for the strip kernel.

    The kernel's live temporaries scale with the tap count (each shifted
    plane is a strip-sized buffer), so wider windows shrink the budget to
    stay inside the 16 MB scoped-vmem stack (1080p p=5 measured 17.45M at
    the p=3 budget)."""
    return 240_000 * 8 // (p * p - 1)   # == 240_000 at p=3


def predict_supported(cols: int, p: int = 3) -> bool:
    """Can the strip kernel run at this width? The minimum 8-row strip
    (plus halos) must fit the p-scaled VMEM budget; callers outside the
    envelope (``pipelines.detect_many_pipeline``'s non-fused branch) run
    the XLA formulation instead. For the wide windows (p > 3, whose
    budgets were chip-bisected) the calibration must also apply to the
    current (jax, device) stack (``common.chip_facts_valid``)."""
    from .common import chip_facts_valid, lane_padded

    return (p // 2 <= PAD
            and (8 + 2 * PAD) * lane_padded(cols + 2 * PAD)
            <= predict_budget(p)
            and (p <= 3 or chip_facts_valid()))


def _predict_error_kernel(coeffs_ref, pin, pout, *, pad: int, strip: int,
                          width: int, p: int):
    ext = pin[0]
    taps = p * p - 1
    image_index = pl.program_id(0)  # coeffs per image, flattened (B*taps,)
    acc = ext[pad : pad + strip, pad : pad + width]  # center
    for k, (dr, dc) in enumerate(neighbor_offsets(p)):
        plane = ext[pad + dr : pad + dr + strip, pad + dc : pad + dc + width]
        acc = acc - coeffs_ref[image_index * taps + k] * plane
    pout[0] = acc


@partial(jax.jit, static_argnames=("strip", "p"))
def prediction_error_pallas(image: jnp.ndarray, coefficients: jnp.ndarray,
                            strip: int | None = None,
                            p: int = 3) -> jnp.ndarray:
    """(H, W) or (B, H, W) image + (k,) or (B, k) coeffs -> error sequence,
    k = p*p-1."""
    if p // 2 > PAD:
        raise ValueError(f"predict kernel halo PAD={PAD} < p//2 for p={p}")
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
        coefficients = coefficients[None]
    batch, rows, cols = image.shape
    if strip is None:
        budget = predict_budget(p)
        strip, rows_padded = pick_strip_for_width(rows, cols, budget, PAD)
        from .common import lane_padded
        if (strip + 2 * PAD) * lane_padded(cols + 2 * PAD) > budget:
            # pick_strip_for_width clamps to the 8-row minimum strip; at
            # p=9 on wide images even that exceeds the scoped-VMEM budget
            # (the live set is one (strip+2*PAD)-row plane per tap), so the
            # kernel would hit the 16 MB Mosaic compile error. Fail with
            # the actionable message instead.
            raise ValueError(
                f"prediction_error_pallas: width {cols} at p={p} exceeds "
                f"the VMEM strip budget ({budget} elems); use impl='xla' "
                f"for this geometry (pipeline call sites gate on "
                f"predict_supported and downgrade automatically)")
    else:
        strip, rows_padded = pick_strip(rows, strip)
    padded = pad_image(image, PAD, rows_padded)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, rows_padded // strip),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(strip + 2 * PAD),
             pl.Element(cols + 2 * PAD)),
            lambda b, i, coeffs: (b, i * strip, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, strip, cols),
                               lambda b, i, coeffs: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        partial(_predict_error_kernel, pad=PAD, strip=strip, width=cols,
                p=p),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, rows_padded, cols),
                                       jnp.float32),
        interpret=interpret_mode(),
    )(coefficients.reshape(-1), padded)
    out = out[:, :rows]
    return out[0] if squeeze else out
