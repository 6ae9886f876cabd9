"""Fully-fused detect-tail and embed kernels.

These collapse everything after the Rx/rx solve into one pass over the image:

* ``fused_detect_tail``: per strip, compute the error sequence e_z on a
  halo-extended region, form u = |e_z| * W (ME) or u = nvf(img) * W (NVF),
  clamp-fix u's border ring, compute e_u = u - predict(u), and accumulate the
  three correlation reductions (dot, ||e_u||^2, ||e_z||^2). The reference
  needs four kernel launches plus five ArrayFire ops for this
  (``/root/reference/Watermark_GPU/Watermark.cpp:234-250``); here it is one
  strip-pipelined pass reading img and W once each.

* ``fused_embed_field``: per strip, compute the unnormalized watermark field
  u_raw = mask_unnormalized * W and accumulate sum(u_raw^2) and max|e| — all
  the embedder then needs is one tiny AXPY+clamp pass.

Both expose ``*_padded`` variants taking pre-padded inputs and shared strip
geometry so a pipeline pads each array exactly once (``ops/pipelines.py``).

Numerical notes:

- The ME mask's 1/max|e| normalization cancels exactly in both the detector
  correlation and the embedded pixels (u * strength = sf * sqrt(N) * u/||u||),
  so the fused path skips dividing the field by the max and only tracks the
  max for the *reported* strength scalar. See ops/embed.py.
- Border semantics: the reference computes e_u by re-uploading u to the
  clamp-to-edge texture (``Watermark.cpp:221-225``), so u's out-of-image
  neighbors are u's own edge values — NOT values computed from edge-replicated
  image rows. The kernel rebuilds that ring explicitly (global-row wheres for
  the top/bottom strips, column concat for left/right).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..neighbors import NEIGHBOR_OFFSETS
from .common import (interpret_mode, pad_image, pick_strip_for_width,
                     raw_row_start, stage_raw_strip)

# accumulator slots: sublane rows of the per-image (8, W) lane-partial
# block. The kernels only ever do sublane reductions (sum/max over the strip
# rows) into these; XLA reduces the lanes afterwards — the same
# sublane-only-reduction structure that made the Gram kernel fast
# (me_kernel.py; cross-lane tree reductions per strip measurably dominate
# the tail otherwise).
SLOT_DOT = 0      # sum e_u * e_z
SLOT_NORM_U = 1   # sum e_u^2
SLOT_NORM_Z = 2   # sum e_z^2
SLOT_SUM_U2 = 0   # embed: sum u_raw^2
SLOT_MAX_E = 1    # embed: max |error| (reported-strength only)

SHARED_BUDGET = 320_000  # elements; recalibrated for the raw-mode kernels:
# 4K strips widen 56 -> 72 (812 -> 955 fps) with 1080p/512 unchanged-or-
# better, and the detect tail still fits scoped VMEM at 4K widths (the
# raw path adds a (span, W+2*pad) staging scratch to the budget)


def pipeline_geometry(rows: int, cols: int, mask_type: str,
                      p: int) -> tuple[int, int, int]:
    """(pad, strip, rows_padded) shared by every kernel of one pipeline.

    Prefers a raw-eligible geometry (zero-copy kernel inputs, see
    common.raw_mode_ok): when the unconstrained pick lands on a single
    strip, a pick capped at half the rows restores >= 2 strips — measured
    faster than losing raw mode (512^2: 23k vs 21k fps round trips).
    """
    from .common import pick_strip, raw_mode_ok

    pad = 4 if (mask_type == "me" or 1 + p // 2 <= 4) else 8
    strip, rows_padded = pick_strip_for_width(rows, cols, SHARED_BUDGET, pad)
    if not raw_mode_ok(rows, strip, rows_padded):
        budget_strip = max(8, (SHARED_BUDGET // (cols + 2 * pad) - 2 * pad)
                           // 8 * 8)
        capped = max(8, rows // 2 // 8 * 8)
        strip2, rows_padded2 = pick_strip(rows, min(budget_strip, capped),
                                          pad)
        if raw_mode_ok(rows, strip2, rows_padded2):
            return pad, strip2, rows_padded2
    return pad, strip, rows_padded


# row bound of the max-dims guard (TPU analog of the reference's
# CL_DEVICE_IMAGE2D_MAX_HEIGHT check): padded f32 copies of a 16384-row
# frame at max width stay well under one v5e chip's 16 GB HBM
MAX_ROWS = 16384


def max_supported_cols(mask_type: str = "me", p: int = 3) -> int:
    """Largest image width the fused strip kernels support.

    The minimum 8-row strip (plus halos) must still fit the scoped-VMEM
    budget — the TPU analog of the reference's texture-size guard
    (``/root/reference/Watermark_GPU/main.cpp:162``,
    CL_DEVICE_IMAGE2D_MAX_WIDTH).
    """
    pad = 4 if (mask_type == "me" or 1 + p // 2 <= 4) else 8
    return SHARED_BUDGET // (8 + 2 * pad) - 2 * pad


def _error_region(ext, coeffs, base, span, width):
    """e = center - sum_k c_k * neighbor_k over a (span, width) region whose
    top-left sits at (base, base) inside the padded strip."""
    acc = ext[base : base + span, base : base + width]
    for k, (dr, dc) in enumerate(NEIGHBOR_OFFSETS):
        acc = acc - coeffs[k] * ext[base + dr : base + dr + span,
                                    base + dc : base + dc + width]
    return acc


def _nvf_region(ext, base, span, width, p):
    """NVF mask over a (span, width) region at offset (base, base)."""
    half = p // 2
    inv_p2 = 1.0 / float(p * p)
    rows_span = span + 2 * half
    col_sum = jnp.zeros((rows_span, width), jnp.float32)
    col_sq = jnp.zeros((rows_span, width), jnp.float32)
    r0 = base - half
    for dc in range(-half, half + 1):
        sl = ext[r0 : r0 + rows_span, base + dc : base + dc + width]
        col_sum = col_sum + sl
        col_sq = col_sq + sl * sl
    total = jnp.zeros((span, width), jnp.float32)
    total_sq = jnp.zeros((span, width), jnp.float32)
    for dr in range(p):
        total = total + col_sum[dr : dr + span]
        total_sq = total_sq + col_sq[dr : dr + span]
    mean = total * inv_p2
    variance = total_sq * inv_p2 - mean * mean
    return variance / (1.0 + variance)


def _clamp_fix_ring(u_ext, strip_index, strip, rows, row_start):
    """Rebuild u's border ring with clamp-to-edge of u itself.

    u_ext is (strip+2, width+2): row 0 / col 0 are the -1 halo, the last
    row/col the +1 halo. Rows use global image indices — ``row_start`` (a
    traced scalar, nonzero under spatial sharding) plus the strip offset —
    so only strips touching the true image border get the fix; columns are
    static.
    """
    span = u_ext.shape[0]
    width_ext = u_ext.shape[1]
    base_row = row_start + strip_index * strip - 1
    g = base_row + jax.lax.broadcasted_iota(jnp.int32, (span, width_ext), 0)
    shifted_down = jnp.concatenate([u_ext[1:], u_ext[-1:]], axis=0)
    shifted_up = jnp.concatenate([u_ext[:1], u_ext[:-1]], axis=0)
    u = jnp.where(g < 0, shifted_down, u_ext)          # top ring := row 0
    u = jnp.where(g > rows - 1, shifted_up, u)         # bottom ring := row H-1
    # columns: position 0 represents col -1, position width_ext-1 col W
    left = u[:, 1:2]
    right = u[:, width_ext - 2 : width_ext - 1]
    return jnp.concatenate([left, u[:, 1 : width_ext - 1], right], axis=1)


def _detect_tail_core(coeffs_ref, row0_ref, ext, wm_ref, acc_ref,
                      strip_index, *, pad: int, strip: int, width: int,
                      rows: int, total_rows: int, mask_type: str, p: int,
                      masked: bool):
    wm_ext = wm_ref
    image_index = pl.program_id(0)
    coeffs = [coeffs_ref[image_index * 8 + k] for k in range(8)]

    span = strip + 2   # e_z / u region including the +/-1 ring
    wspan = width + 2
    base = pad - 1
    e_z_ext = _error_region(ext, coeffs, base, span, wspan)
    if mask_type == "me":
        mask_ext = jnp.abs(e_z_ext)       # unnormalized: corr is invariant
    else:
        mask_ext = _nvf_region(ext, base, span, wspan, p)
    u_ext = mask_ext * wm_ext[base : base + span, base : base + wspan]
    u_ext = _clamp_fix_ring(u_ext, strip_index, strip, total_rows,
                            row0_ref[0])

    # e_u over the true center from u's own ring
    e_u = u_ext[1 : 1 + strip, 1 : 1 + width]
    for k, (dr, dc) in enumerate(NEIGHBOR_OFFSETS):
        e_u = e_u - coeffs[k] * u_ext[1 + dr : 1 + dr + strip,
                                      1 + dc : 1 + dc + width]
    e_z = e_z_ext[1 : 1 + strip, 1 : 1 + width]

    if masked:   # mask off padded bottom rows of the final strip
        g = (strip_index * strip
             + jax.lax.broadcasted_iota(jnp.int32, (strip, width), 0))
        valid = (g < rows).astype(jnp.float32)
        e_u = e_u * valid
        e_z_masked = e_z * valid
    else:
        e_z_masked = e_z

    @pl.when(strip_index == 0)
    def _():
        acc_ref[0] = jnp.zeros_like(acc_ref[0])

    # sublane-only reductions into per-column lane partials
    acc_ref[0, SLOT_DOT, :] += jnp.sum(e_u * e_z_masked, axis=0)
    acc_ref[0, SLOT_NORM_U, :] += jnp.sum(e_u * e_u, axis=0)
    acc_ref[0, SLOT_NORM_Z, :] += jnp.sum(e_z_masked * e_z_masked, axis=0)


def _detect_tail_kernel(coeffs_ref, row0_ref, img_ref, wm_ref, acc_ref, *,
                        pad: int, strip: int, width: int, rows: int,
                        total_rows: int, mask_type: str, p: int,
                        masked: bool):
    _detect_tail_core(coeffs_ref, row0_ref, img_ref[0], wm_ref, acc_ref,
                      pl.program_id(1), pad=pad, strip=strip, width=width,
                      rows=rows, total_rows=total_rows, mask_type=mask_type,
                      p=p, masked=masked)


def _detect_tail_kernel_raw(coeffs_ref, row0_ref, img_ref, wm_ref, acc_ref,
                            scratch, *, pad: int, strip: int, width: int,
                            rows: int, rows_padded: int, total_rows: int,
                            mask_type: str, p: int, masked: bool):
    strip_index = pl.program_id(1)
    stage_raw_strip(img_ref, scratch, strip_index, pad=pad, strip=strip,
                    rows=rows, rows_padded=rows_padded, cols=width)
    _detect_tail_core(coeffs_ref, row0_ref, scratch[:, :], wm_ref, acc_ref,
                      strip_index, pad=pad, strip=strip, width=width,
                      rows=rows, total_rows=total_rows, mask_type=mask_type,
                      p=p, masked=masked)


def fused_detect_partials_padded(
        img_p: jnp.ndarray, wm_p: jnp.ndarray, coefficients: jnp.ndarray,
        rows: int, cols: int, pad: int, strip: int, rows_padded: int,
        mask_type: str, p: int, row_start: jnp.ndarray | None = None,
        total_rows: int | None = None
        ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(dot, ||e_u||^2, ||e_z||^2) per image from pre-padded inputs.

    ``row_start`` (a (1,) int32 array, default 0) and ``total_rows``
    (default ``rows``) place this call's rows inside a larger image — the
    spatially-sharded path passes the shard's global row offset so the
    kernel's clamp-ring fix only fires at the true image border, while
    interior seams keep the true neighbor values spliced into the padding.
    """
    batch = img_p.shape[0]
    if row_start is None:
        row_start = jnp.zeros((1,), jnp.int32)
    total_rows = rows if total_rows is None else total_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, rows_padded // strip),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(strip + 2 * pad),
                 pl.Element(cols + 2 * pad)),
                lambda b, i, c, r: (b, i * strip, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (pl.Element(strip + 2 * pad), pl.Element(cols + 2 * pad)),
                lambda b, i, c, r: (i * strip, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, cols), lambda b, i, c, r: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    acc = pl.pallas_call(
        partial(_detect_tail_kernel, pad=pad, strip=strip, width=cols,
                rows=rows, total_rows=total_rows, mask_type=mask_type, p=p,
                masked=rows_padded != rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, 8, cols), jnp.float32),
        interpret=interpret_mode(),
    )(coefficients.reshape(-1), row_start, img_p, wm_p)
    # final lane reduction of the per-column partials happens here in XLA
    return (jnp.sum(acc[:, SLOT_DOT, :], axis=-1),
            jnp.sum(acc[:, SLOT_NORM_U, :], axis=-1),
            jnp.sum(acc[:, SLOT_NORM_Z, :], axis=-1))


def fused_detect_partials_raw(
        img: jnp.ndarray, wm_p: jnp.ndarray, coefficients: jnp.ndarray,
        rows: int, cols: int, pad: int, strip: int, rows_padded: int,
        mask_type: str, p: int
        ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Detect partials straight from the raw (B, rows, cols) image.

    Requires ``raw_mode_ok`` geometry: each strip's halo-extended block is
    staged in VMEM scratch (clamped row window + in-kernel edge fill), so
    no padded HBM copy of the image is ever materialized. The watermark is
    still passed padded — it is engine-constant and tiny to pad.
    """
    batch = img.shape[0]
    span = strip + 2 * pad
    row_start = jnp.zeros((1,), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, rows_padded // strip),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(span), pl.Element(cols)),
                lambda b, i, c, r: (b, raw_row_start(i, strip, pad, rows),
                                    0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (pl.Element(span), pl.Element(cols + 2 * pad)),
                lambda b, i, c, r: (i * strip, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, cols), lambda b, i, c, r: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((span, cols + 2 * pad), jnp.float32)],
    )
    acc = pl.pallas_call(
        partial(_detect_tail_kernel_raw, pad=pad, strip=strip, width=cols,
                rows=rows, rows_padded=rows_padded, total_rows=rows,
                mask_type=mask_type, p=p, masked=rows_padded != rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, 8, cols), jnp.float32),
        interpret=interpret_mode(),
    )(coefficients.reshape(-1), row_start, img, wm_p)
    return (jnp.sum(acc[:, SLOT_DOT, :], axis=-1),
            jnp.sum(acc[:, SLOT_NORM_U, :], axis=-1),
            jnp.sum(acc[:, SLOT_NORM_Z, :], axis=-1))


def fused_detect_tail_padded(img_p: jnp.ndarray, wm_p: jnp.ndarray,
                             coefficients: jnp.ndarray, rows: int, cols: int,
                             pad: int, strip: int, rows_padded: int,
                             mask_type: str, p: int) -> jnp.ndarray:
    """Correlations from pre-padded (B, rows_padded+2p, cols+2p) inputs."""
    dot, norm_u, norm_z = fused_detect_partials_padded(
        img_p, wm_p, coefficients, rows, cols, pad, strip, rows_padded,
        mask_type, p)
    return dot / jnp.sqrt(norm_u * norm_z)


@partial(jax.jit, static_argnames=("mask_type", "p"))
def fused_detect_tail(image: jnp.ndarray, watermark: jnp.ndarray,
                      coefficients: jnp.ndarray, mask_type: str = "me",
                      p: int = 3) -> jnp.ndarray:
    """Correlations for (B?, H, W) images given per-image coefficients."""
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
        coefficients = coefficients[None]
    batch, rows, cols = image.shape
    pad, strip, rows_padded = pipeline_geometry(rows, cols, mask_type, p)
    corr = fused_detect_tail_padded(
        pad_image(image, pad, rows_padded),
        pad_image(watermark, pad, rows_padded),
        coefficients, rows, cols, pad, strip, rows_padded, mask_type, p)
    return corr[0] if squeeze else corr


def _embed_field_core(coeffs_ref, ext, wm_ref, u_ref, acc_ref, strip_index,
                      *, pad: int, strip: int, width: int, rows: int,
                      mask_type: str, p: int, masked: bool):
    image_index = pl.program_id(0)

    if mask_type == "me":
        coeffs = [coeffs_ref[image_index * 8 + k] for k in range(8)]
        err = _error_region(ext, coeffs, pad, strip, width)
        mask = jnp.abs(err)               # unnormalized (see module docstring)
    else:
        mask = _nvf_region(ext, pad, strip, width, p)
        err = mask                        # max|e| slot unused for NVF
    u_raw = mask * wm_ref[pad : pad + strip, pad : pad + width]

    abs_err = jnp.abs(err)
    if masked:   # mask off padded bottom rows of the final strip
        g = (strip_index * strip
             + jax.lax.broadcasted_iota(jnp.int32, (strip, width), 0))
        valid = (g < rows).astype(jnp.float32)
        u_raw = u_raw * valid
        abs_err = abs_err * valid
    u_ref[0] = u_raw

    @pl.when(strip_index == 0)
    def _():
        acc_ref[0] = jnp.zeros_like(acc_ref[0])

    # sublane-only reductions: per-column sum partials / max partials
    acc_ref[0, SLOT_SUM_U2, :] += jnp.sum(u_raw * u_raw, axis=0)
    acc_ref[0, SLOT_MAX_E, :] = jnp.maximum(
        acc_ref[0, SLOT_MAX_E, :], jnp.max(abs_err, axis=0))


def _embed_field_kernel(coeffs_ref, img_ref, wm_ref, u_ref, acc_ref, *,
                        pad: int, strip: int, width: int, rows: int,
                        mask_type: str, p: int, masked: bool):
    _embed_field_core(coeffs_ref, img_ref[0], wm_ref, u_ref, acc_ref,
                      pl.program_id(1), pad=pad, strip=strip, width=width,
                      rows=rows, mask_type=mask_type, p=p, masked=masked)


def _embed_field_kernel_raw(coeffs_ref, img_ref, wm_ref, u_ref, acc_ref,
                            scratch, *, pad: int, strip: int, width: int,
                            rows: int, rows_padded: int, mask_type: str,
                            p: int, masked: bool):
    strip_index = pl.program_id(1)
    stage_raw_strip(img_ref, scratch, strip_index, pad=pad, strip=strip,
                    rows=rows, rows_padded=rows_padded, cols=width)
    _embed_field_core(coeffs_ref, scratch[:, :], wm_ref, u_ref, acc_ref,
                      strip_index, pad=pad, strip=strip, width=width,
                      rows=rows, mask_type=mask_type, p=p, masked=masked)


def fused_embed_field_padded(img_p: jnp.ndarray, wm_p: jnp.ndarray,
                             coefficients: jnp.ndarray, rows: int, cols: int,
                             pad: int, strip: int, rows_padded: int,
                             mask_type: str, p: int):
    """(u_raw (B, rows, cols), sum_u2 (B,), max_e (B,)) from padded inputs."""
    batch = img_p.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, rows_padded // strip),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(strip + 2 * pad),
                 pl.Element(cols + 2 * pad)),
                lambda b, i, c: (b, i * strip, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (pl.Element(strip + 2 * pad), pl.Element(cols + 2 * pad)),
                lambda b, i, c: (i * strip, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, strip, cols), lambda b, i, c: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cols), lambda b, i, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    u_raw, acc = pl.pallas_call(
        partial(_embed_field_kernel, pad=pad, strip=strip, width=cols,
                rows=rows, mask_type=mask_type, p=p,
                masked=rows_padded != rows),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((batch, rows_padded, cols), jnp.float32),
            jax.ShapeDtypeStruct((batch, 8, cols), jnp.float32),
        ),
        interpret=interpret_mode(),
    )(coefficients.reshape(-1), img_p, wm_p)
    # final lane reductions of the per-column partials happen here in XLA
    return (u_raw[:, :rows], jnp.sum(acc[:, SLOT_SUM_U2, :], axis=-1),
            jnp.max(acc[:, SLOT_MAX_E, :], axis=-1))


def fused_embed_field_raw(img: jnp.ndarray, wm_p: jnp.ndarray,
                          coefficients: jnp.ndarray, rows: int, cols: int,
                          pad: int, strip: int, rows_padded: int,
                          mask_type: str, p: int):
    """Embed field straight from the raw (B, rows, cols) image (see
    fused_detect_partials_raw for the staging scheme)."""
    batch = img.shape[0]
    span = strip + 2 * pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch, rows_padded // strip),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(span), pl.Element(cols)),
                lambda b, i, c: (b, raw_row_start(i, strip, pad, rows), 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (pl.Element(span), pl.Element(cols + 2 * pad)),
                lambda b, i, c: (i * strip, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, strip, cols), lambda b, i, c: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cols), lambda b, i, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((span, cols + 2 * pad), jnp.float32)],
    )
    u_raw, acc = pl.pallas_call(
        partial(_embed_field_kernel_raw, pad=pad, strip=strip, width=cols,
                rows=rows, rows_padded=rows_padded, mask_type=mask_type,
                p=p, masked=rows_padded != rows),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((batch, rows_padded, cols), jnp.float32),
            jax.ShapeDtypeStruct((batch, 8, cols), jnp.float32),
        ),
        interpret=interpret_mode(),
    )(coefficients.reshape(-1), img, wm_p)
    return (u_raw[:, :rows], jnp.sum(acc[:, SLOT_SUM_U2, :], axis=-1),
            jnp.max(acc[:, SLOT_MAX_E, :], axis=-1))


@partial(jax.jit, static_argnames=("mask_type", "p"))
def fused_embed_field(image: jnp.ndarray, watermark: jnp.ndarray,
                      coefficients: jnp.ndarray, mask_type: str = "me",
                      p: int = 3):
    """Unnormalized watermark field + reductions for (B?, H, W) images.

    Returns (u_raw (B?, H, W), sum_u2 (B?,), max_e (B?,)).
    """
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
        coefficients = coefficients[None]
    batch, rows, cols = image.shape
    pad, strip, rows_padded = pipeline_geometry(rows, cols, mask_type, p)
    u_raw, sum_u2, max_e = fused_embed_field_padded(
        pad_image(image, pad, rows_padded),
        pad_image(watermark, pad, rows_padded),
        coefficients, rows, cols, pad, strip, rows_padded, mask_type, p)
    if squeeze:
        return u_raw[0], sum_u2[0], max_e[0]
    return u_raw, sum_u2, max_e
