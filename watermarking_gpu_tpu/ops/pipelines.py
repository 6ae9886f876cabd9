"""End-to-end embed/detect pipelines as pure jittable functions.

These compose the ops in ``watermarking_gpu_tpu.ops`` into the exact observable
behavior of the reference engine
(``/root/reference/Watermark_GPU/Watermark.cpp:156-250``):

* ``embed_pipeline``  == ``Watermark::makeWatermark``
* ``detect_pipeline`` == ``Watermark::detectWatermark``

Mask type is a static (trace-time) argument; the solve-failure soft path is a
traced ``valid`` scalar applied with ``jnp.where`` so the functions stay fully
jittable with no data-dependent Python control flow.

Implementation selection: ``impl='xla'`` uses the pure-jnp ops (oracle),
``impl='pallas'`` uses the fused TPU kernels from ``ops.pallas``.
"""

from __future__ import annotations

from typing import Literal

import jax.numpy as jnp

from .embed import embed_watermark
from .correlation import correlation
from .me import (me_mask_from_error, me_normal_equations, prediction_error,
                 solve_coefficients)
from .nvf import nvf_mask

MaskTypeName = Literal["nvf", "me"]
ImplName = Literal["xla", "pallas"]


def _analysis(image: jnp.ndarray, impl: ImplName):
    """Rx/rx accumulation + solve. Returns (coefficients, valid)."""
    if impl == "pallas":
        from .pallas.me_kernel import me_normal_equations_pallas
        rx_matrix, rx_vector = me_normal_equations_pallas(image)
    else:
        rx_matrix, rx_vector = me_normal_equations(image)
    return solve_coefficients(rx_matrix, rx_vector)


def _prediction_error(image: jnp.ndarray, coefficients: jnp.ndarray,
                      impl: ImplName) -> jnp.ndarray:
    if impl == "pallas":
        from .pallas.predict_kernel import prediction_error_pallas
        return prediction_error_pallas(image, coefficients)
    return prediction_error(image, coefficients)


def _nvf_mask(image: jnp.ndarray, p: int, impl: ImplName) -> jnp.ndarray:
    if impl == "pallas":
        from .pallas.nvf_kernel import nvf_mask_pallas
        return nvf_mask_pallas(image, p=p)
    return nvf_mask(image, p=p)


def embed_pipeline(image: jnp.ndarray, output: jnp.ndarray,
                   watermark: jnp.ndarray, strength_factor_value: float,
                   mask_type: MaskTypeName, p: int = 3,
                   impl: ImplName = "xla") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Embed into `output` the watermark computed from grayscale `image`.

    Returns (watermarked, strength). On an unsolvable ME system the output is
    returned unmodified and strength is 0 (Watermark.cpp:164-165).
    """
    if mask_type == "me":
        coefficients, valid = _analysis(image, impl)
        error = _prediction_error(image, coefficients, impl)
        mask = me_mask_from_error(error)
    else:
        mask = _nvf_mask(image, p, impl)
        valid = jnp.bool_(True)
    watermarked, strength = embed_watermark(
        output, mask, watermark, strength_factor_value)
    watermarked = jnp.where(valid, watermarked, output)
    strength = jnp.where(valid, strength, 0.0)
    return watermarked, strength


def detect_pipeline(image: jnp.ndarray, watermark: jnp.ndarray,
                    mask_type: MaskTypeName, p: int = 3,
                    impl: ImplName = "xla") -> jnp.ndarray:
    """Detector correlation for a (possibly watermarked) grayscale image.

    NVF detection still runs the prediction-error analysis for the
    coefficients and error sequence, with the NVF mask replacing the ME mask
    (Watermark.cpp:238-241). Returns 0.0 when the system is unsolvable.
    """
    coefficients, valid = _analysis(image, impl)
    e_z = _prediction_error(image, coefficients, impl)
    if mask_type == "me":
        mask = me_mask_from_error(e_z)
    else:
        mask = _nvf_mask(image, p, impl)
    u = mask * watermark
    e_u = _prediction_error(u, coefficients, impl)
    corr = correlation(e_u, e_z)
    return jnp.where(valid, corr, 0.0)
