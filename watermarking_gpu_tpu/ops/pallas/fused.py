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

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..neighbors import NEIGHBOR_OFFSETS, neighbor_offsets
from .common import (chip_facts_valid, interpret_mode, pad_image,
                     pick_strip_for_width, raw_row_start, stage_raw_strip)

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

# Opt-in bf16 staging of the wide (ME p>3) detect tail's ring temporaries
# (e_z/u planes): halves the dominant live VMEM planes so the p=7/9 strip
# budgets can rise (they force 32/16-row strips at 1080p, ~1.3-2x halo
# re-read overhead). Reductions still accumulate in f32; the precision
# cost is bounded CPU-side by tests/test_pallas.py (the reference itself
# stages its Gram in fp16, kernels/me_p3.hpp:27). Default OFF pending the
# on-chip budget re-calibration that would justify it (r3 VERDICT item 8).
WIDE_TAIL_BF16 = False

SHARED_BUDGET = 320_000  # elements; recalibrated for the raw-mode kernels:
# 4K strips widen 56 -> 72 (812 -> 955 fps) with 1080p/512 unchanged-or-
# better, and the detect tail still fits scoped VMEM at 4K widths (the
# raw path adds a (span, W+2*pad) staging scratch to the budget)


def stencil_reach(mask_type: str, p: int) -> int:
    """Halo rows/cols the fused tail kernels read beyond a strip.

    ME: the e_z/u ring is h = p//2 deep and each ring row's taps reach h
    further (2h total). NVF: the variance window reaches p//2 and the ring
    ring+taps of the fixed 3x3 predictor one more (1 + p//2)."""
    return 2 * (p // 2) if mask_type == "me" else 1 + p // 2


# generalized-ME fused-tail strip budgets (f32 elements), chip-calibrated:
# at p=5/1080p the 320k budget compiled to a 22.1 MB scoped allocation
# against the 16 MB limit (and p=7 at 130k to 18.0 MB) — the measured
# per-strip-element footprint fits ~40 + 2*(p*p-1) bytes (each tap's
# scaled shift keeps a vreg-tiled temporary live); these keep the worst
# case ~1.5 MB under the limit. tools/calibrate_wide_tail.py re-bisects
# them (e.g. under WIDE_TAIL_BF16).
TAIL_BUDGET_WIDE = {5: 180_000, 7: 104_000, 9: 72_000}


def tail_budget(mask_type: str, p: int) -> int:
    """Strip-plane VMEM budget (f32 elements) for the fused tail kernels.

    The p=3 SHARED_BUDGET is calibrated for the 8-tap ring; the
    generalized-ME rings hold more live temporaries per strip row (each
    tap's scaled shift, the deeper e_z/u rings) — see TAIL_BUDGET_WIDE."""
    if mask_type == "me" and p > 3:
        return TAIL_BUDGET_WIDE[p]
    return SHARED_BUDGET


def pipeline_geometry(rows: int, cols: int, mask_type: str,
                      p: int) -> tuple[int, int, int]:
    """(pad, strip, rows_padded) shared by every kernel of one pipeline.

    Prefers a raw-eligible geometry (zero-copy kernel inputs, see
    common.raw_mode_ok): when the unconstrained pick lands on a single
    strip, a pick capped at half the rows restores >= 2 strips — measured
    faster than losing raw mode (512^2: 23k vs 21k fps round trips).
    """
    from .common import budget_rows, pick_strip, raw_mode_ok

    budget = tail_budget(mask_type, p)
    pad = 4 if stencil_reach(mask_type, p) <= 4 else 8
    strip, rows_padded = pick_strip_for_width(rows, cols, budget, pad)
    if not raw_mode_ok(rows, strip, rows_padded):
        budget_strip = budget_rows(budget, cols, pad)
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
    pad = 4 if stencil_reach(mask_type, p) <= 4 else 8
    # the lane-padded (cols + 2*pad) must fit budget // (8 + 2*pad):
    # round the padded-width bound DOWN to the vreg lane tile
    padded_bound = tail_budget(mask_type, p) // (8 + 2 * pad) // 128 * 128
    return padded_bound - 2 * pad


def _error_region(ext, coeffs, base, span, width, p=3):
    """e = center - sum_k c_k * neighbor_k over a (span, width) region whose
    top-left sits at (base, base) inside the padded strip. ``p`` sizes the
    predictor window ((p*p-1) taps; 3 everywhere the reference goes,
    main.cpp:88-89 — wider windows serve the generalized-ME pipelines)."""
    acc = ext[base : base + span, base : base + width]
    for k, (dr, dc) in enumerate(neighbor_offsets(p)):
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


def _clamp_fix_ring(u_ext, strip_index, strip, rows, row_start, half=1):
    """Rebuild u's border ring with clamp-to-edge of u itself.

    u_ext is (strip+2*half, width+2*half): the first/last ``half`` rows
    and columns are the halo ring (half = 1 for the reference's 3x3
    predictor, p//2 for the generalized-ME windows). Rows use global image
    indices — ``row_start`` (a traced scalar, nonzero under spatial
    sharding) plus the strip offset — so only strips touching the true
    image border get the fix; columns are static. Each of the ``half``
    shift passes pulls ring row -d one step closer to row 0 (after all
    passes every out-of-image row holds the edge row, exactly
    clamp-to-edge of u).
    """
    span = u_ext.shape[0]
    width_ext = u_ext.shape[1]
    base_row = row_start + strip_index * strip - half
    g = base_row + jax.lax.broadcasted_iota(jnp.int32, (span, width_ext), 0)
    u = u_ext
    for _ in range(half):
        shifted_down = jnp.concatenate([u[1:], u[-1:]], axis=0)
        shifted_up = jnp.concatenate([u[:1], u[:-1]], axis=0)
        u = jnp.where(g < 0, shifted_down, u)       # top ring := row 0
        u = jnp.where(g > rows - 1, shifted_up, u)  # bottom ring := row H-1
    # columns: position 0 represents col -half, the last col W-1+half
    left = jnp.broadcast_to(u[:, half : half + 1], (span, half))
    right = jnp.broadcast_to(u[:, width_ext - half - 1 : width_ext - half],
                             (span, half))
    return jnp.concatenate([left, u[:, half : width_ext - half], right],
                           axis=1)


def _tail_rows(ext, wm_ext, coeffs, strip_index, row0, *, pad: int,
               strip: int, width: int, rows: int, total_rows: int,
               mask_type: str, p: int, masked: bool):
    """The detect tail's math as a PURE function of the staged strip.

    Factored out of the kernel so the per-vreg op accounting
    (tools/roofline_wide.py) traces the EXACT jnp graph the kernel runs —
    the kernel wrapper only stages refs and accumulates the returned
    per-column row sums. Returns (dot, norm_u, norm_z) lane partials of
    shape (width,).
    """
    # ME uses the generalized (p*p-1)-tap predictor; NVF keeps the
    # reference's fixed 3x3 predictor at every p (p sizes only the NVF
    # variance window, Watermark.cpp:238-241)
    pred_p = p if mask_type == "me" else 3
    taps = neighbor_offsets(pred_p)
    half = pred_p // 2    # e_z / u ring depth

    span = strip + 2 * half   # e_z / u region including the ring
    wspan = width + 2 * half
    base = pad - half
    # bf16 ring staging (wide windows only, opt-in): the (span, wspan)
    # e_z/u planes and their tap shifts dominate the live set; staging
    # them at bf16 halves it. e_u accumulates in f32 from upcast taps.
    ring_bf16 = WIDE_TAIL_BF16 and mask_type == "me" and p > 3
    e_z_ext = _error_region(ext, coeffs, base, span, wspan, pred_p)
    if ring_bf16:
        e_z_ext = e_z_ext.astype(jnp.bfloat16)
    if mask_type == "me":
        mask_ext = jnp.abs(e_z_ext)       # unnormalized: corr is invariant
    else:
        mask_ext = _nvf_region(ext, base, span, wspan, p)
    wm_slice = wm_ext[base : base + span, base : base + wspan]
    if ring_bf16:
        wm_slice = wm_slice.astype(jnp.bfloat16)
    u_ext = mask_ext * wm_slice
    u_ext = _clamp_fix_ring(u_ext, strip_index, strip, total_rows,
                            row0, half)

    # e_u over the true center from u's own ring
    e_u = u_ext[half : half + strip,
                half : half + width].astype(jnp.float32)
    for k, (dr, dc) in enumerate(taps):
        e_u = e_u - coeffs[k] * u_ext[half + dr : half + dr + strip,
                                      half + dc : half + dc + width
                                      ].astype(jnp.float32)
    e_z = e_z_ext[half : half + strip,
                  half : half + width].astype(jnp.float32)

    if masked:   # mask off padded bottom rows of the final strip
        g = (strip_index * strip
             + jax.lax.broadcasted_iota(jnp.int32, (strip, width), 0))
        valid = (g < rows).astype(jnp.float32)
        e_u = e_u * valid
        e_z_masked = e_z * valid
    else:
        e_z_masked = e_z

    # sublane-only reductions into per-column lane partials
    return (jnp.sum(e_u * e_z_masked, axis=0),
            jnp.sum(e_u * e_u, axis=0),
            jnp.sum(e_z_masked * e_z_masked, axis=0))


def _detect_tail_core(coeffs_ref, row0_ref, ext, wm_ref, acc_ref,
                      strip_index, *, pad: int, strip: int, width: int,
                      rows: int, total_rows: int, mask_type: str, p: int,
                      masked: bool):
    image_index = pl.program_id(0)
    pred_p = p if mask_type == "me" else 3
    n_taps = len(neighbor_offsets(pred_p))
    coeffs = [coeffs_ref[image_index * n_taps + k] for k in range(n_taps)]
    dot, nu, nz = _tail_rows(
        ext, wm_ref, coeffs, strip_index, row0_ref[0], pad=pad, strip=strip,
        width=width, rows=rows, total_rows=total_rows, mask_type=mask_type,
        p=p, masked=masked)

    @pl.when(strip_index == 0)
    def _():
        acc_ref[0] = jnp.zeros_like(acc_ref[0])

    acc_ref[0, SLOT_DOT, :] += dot
    acc_ref[0, SLOT_NORM_U, :] += nu
    acc_ref[0, SLOT_NORM_Z, :] += nz


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


# -- fused multi-candidate detect (watermark identification) -------------
#
# One strip pass computes e_z and the mask ONCE and then loops an
# nc-candidate chunk of the watermark bank: u = mask * W_c, clamp-fix,
# e_u, and per-candidate (dot, ||e_u||^2) lane partials — the image is
# read once per chunk instead of once per candidate, and the (B*N, H, W)
# u / e_u intermediates of the XLA formulation are never materialized.
# The reference can only loop N full detections (Watermark.cpp:234-250).


# Chunked multi-candidate kernel VMEM admission. Everything the kernel
# holds is strip-plane sized ((strip+2*pad) x lane_padded(W+2*pad) f32),
# but the r4 calibration campaigns measured that NO closed-form budget
# in plane units is sound:
#   * the naive live-set count undercounts Mosaic's copies by ~8 planes
#     (512^2 campaign: 29 observed vs 21 counted at p=3/nc=8);
#   * a linear live(nc) = 2*nc + C model over-predicts intermediate
#     chunk sizes by 4-25% (p=7 halving nc 8->4 bought only ~1% of
#     plane; p=9's ring overhead dominates so completely that the
#     shrink buys <3%);
#   * scoped VMEM GROWS with total frame rows (nvf p=9 nc=4 at plane
#     187,392: compiles at 1,440 rows, overflows at 2,160) and, at tall
#     heights, with cols beyond the plane units (me p=3 nc=4 at 4,320
#     rows: plane 212,992 compiles at 1,920 cols while plane 187,392
#     overflows at 7,680 cols).
#
# Admission is therefore by DOMINANCE over chip-compiled facts: each
# entry below is a configuration the REAL kernel COMPILED on chip
# (tools/calibrate_detect_many.py --probe, r4 campaign), recorded as
# (nc, rows, lanes, plane) with lanes = lane_padded(cols + 2*pad). A
# candidate configuration is admitted iff some fact dominates it in all
# four monotone dimensions — fewer candidate planes, fewer frame rows,
# narrower lanes, smaller strip plane each strictly shrink the live
# set, so a dominated configuration allocates no more scoped VMEM than
# its witness. The open geometries are PROVABLY VMEM-maximal (r5
# campaign, overflow at the MINIMUM nc=1/strip=8 configuration): ME p=9
# at 4K lanes needs 19.15M scoped vs the 16M limit, ME p=7 at 8K lanes
# 24.83M — those fall back to the XLA formulation
# (``detect_many_supported``). Frames up to 7,680 rows (portrait 8K)
# are fused (r5 tall campaign; taller than 7,680 falls back). NVF has
# its own facts: its
# kernel differs from ME p=3 (they shared a budget before r4) and its
# worst window (p=9, pad=8) is the binding measurement, dominating the
# narrower p<9 rings.
DETECT_MANY_PROVEN = {
    3: [(8, 7680, 2048, 114_688),    # strip 48 @ 1920 (1080p pick;
                                     # r5: re-proven at 7,680 rows)
        (8, 4320, 3968, 126_976),    # strip 24 @ 3840 (4K pick)
        (8, 7680, 4352, 69_632),     # strip 8 @ 4320 (portrait-8K pick)
        (4, 4320, 7808, 124_928)],   # strip 8 @ 7680 (8K pick)
    "nvf": [(8, 7680, 2048, 114_688),   # p=9 strip 40 @ 1920 (r5: tall)
            (8, 4320, 3968, 95_232),    # p=9 strip 8 @ 3840
            (4, 7680, 4352, 104_448),   # p=9 strip 8 @ 4320 (portrait 8K)
            (2, 4320, 7808, 187_392)],  # p=9 strip 8 @ 7680 (nc=4 FAILS
                                        # here — nc=2 is the 8K witness)
    5: [(8, 7680, 2048, 98_304),     # strip 40 @ 1920 (1080p pick;
                                     # r5: re-proven at 7,680 rows)
        (4, 4320, 3968, 95_232),     # strip 16 @ 3840 (nc=8 FAILS at 4K
                                     # even at 2,160 rows — nc=4 is the
                                     # witness; chip parity 3.0e-09 end
                                     # to end at 8K)
        (4, 7680, 4352, 69_632),     # strip 8 @ 4320 (portrait-8K pick)
        (4, 4320, 7808, 124_928)],   # strip 8 @ 7680 (8K pick)
    7: [(8, 4320, 2048, 81_920),     # strip 24 @ 1920 (1080p pick;
                                     # strip 24 OVERFLOWS at 7,680 rows —
                                     # the rows trap again; tall frames
                                     # take the strip-16 fact below)
        (8, 7680, 2048, 65_536),     # strip 16 @ 1920 (tall-narrow pick)
        (2, 7680, 4352, 104_448),    # strip 8 @ 4320 (portrait-8K pick)
        (4, 4320, 3968, 95_232)],    # strip 8 @ 3840 (4K pick; chip
                                     # parity 5.6e-09 end to end)
    9: [(8, 7680, 2048, 49_152),     # strip 8 @ 1920 (1080p pick;
                                     # r5: re-proven at 7,680 rows)
        (1, 4320, 2688, 64_512)],    # strip 8 @ 2560 (QHD-class pick)
}
# calibration hook: {(window_key, nc): plane_elems} consulted first, but
# ONLY when WMTPU_CALIBRATION is set (tools/calibrate_detect_many.py sets
# it to force geometries the facts would reject; a stray entry must never
# silently replace chip-proven facts in production admission — r4 VERDICT
# weak #5).
_PLANE_BUDGET_OVERRIDE: dict = {}


def _calibration_mode() -> bool:
    return bool(os.environ.get("WMTPU_CALIBRATION"))


def _window_key(mask_type: str, p: int):
    if mask_type != "me":
        return "nvf"
    return p if p > 3 else 3


def detect_many_plane_budget(mask_type: str, p: int, nc: int,
                             rows: int = 1080, lanes: int = 2048) -> int:
    """Largest halo-extended lane-padded strip plane (f32 elements) the
    chunked multi-candidate kernel may allocate at chunk size ``nc``
    for a ``rows``-tall frame with ``lanes`` lane-padded columns: the
    largest plane of any chip-compiled fact that dominates the
    configuration (0 when no fact does — the geometry is inadmissible
    at this ``nc``). Chunk sizes between the fact tiers round UP (a
    fact at nc=8 witnesses any nc <= 8 at the same plane)."""
    key = _window_key(mask_type, p)
    tier = next(t for t in (1, 2, 4, 8) if t >= nc) if nc < 8 else 8
    if _calibration_mode() and (key, tier) in _PLANE_BUDGET_OVERRIDE:
        return _PLANE_BUDGET_OVERRIDE[(key, tier)]
    if not chip_facts_valid():
        # the facts were compiled on a different (jax, device) stack —
        # admitting from them could VMEM-fail at compile time; callers
        # fall back to the XLA formulation (detect_many_supported False)
        return 0
    return max((f_plane for f_nc, f_rows, f_lanes, f_plane
                in DETECT_MANY_PROVEN[key]
                if tier <= f_nc and rows <= f_rows and lanes <= f_lanes),
               default=0)


def detect_many_chunk(n: int, rows: int, cols: int, mask_type: str,
                      p: int) -> tuple[int, int, int, int]:
    """(nc, pad, strip, rows_padded) for the multi-candidate kernel.

    nc=8 balances image re-reads (n/nc strip passes) against strip
    height at 1080p-class widths; where the minimum 8-row strip cannot
    fit at nc=8 (4K/8K widths at wide windows), nc SHRINKS
    (8 -> 4 -> 2 -> 1) until it does — each step frees candidate planes
    for strip height at the cost of image re-reads, still far cheaper
    than the XLA formulation's (B*N, H, W) materialization. Only when
    even nc=1 cannot fit the minimum strip do callers fall back to XLA
    (``detect_many_supported``). The resulting fused frontier (r5
    campaign): 8K at ME p=3 / p=5 (nc=4) and NVF every p (nc=2), 4K at
    ME p=7 (nc=4, chip parity 5.6e-09), QHD-class (~2.6k) widths at ME
    p=9 (its ring overhead dominates the live set; the shrink buys <3%
    there), and frames up to 7,680 rows — portrait 8K fused at ME
    p=3/5 (nc≥4), p=7 (nc=2) and NVF (nc=4); tall-narrow (1080p-class
    lanes) fused at nc=8 for every window. The open corners are
    VMEM-maximal at the minimum nc=1/strip=8 configuration: ME p=9 @
    4K lanes overflows 16M scoped VMEM by 3.15M, ME p=7 @ 8K lanes by
    8.83M (measured r5).

    Every admitted configuration is dominated by a chip-compiled fact,
    NOT a model — see the DETECT_MANY_PROVEN comment for the three
    measured reasons a closed-form budget fails here.
    tools/calibrate_detect_many.py is the measurement harness
    (``--probe`` compiles one forced configuration; the tier bisections
    and the original nc=8 numerator campaign seeded the facts).
    """
    from .common import budget_rows, lane_padded, pick_strip, raw_mode_ok

    pad = 4 if stencil_reach(mask_type, p) <= 4 else 8
    lanes = lane_padded(cols + 2 * pad)
    min_strip = (8 + 2 * pad) * lanes
    nc = min(8, n)
    for cand in (min(8, n), 4, 2, 1):
        if cand > min(8, n):
            continue
        if min_strip <= detect_many_plane_budget(mask_type, p, cand,
                                                 rows, lanes):
            nc = cand
            break
    budget = detect_many_plane_budget(mask_type, p, nc, rows, lanes)
    budget = max(budget, min_strip)   # inadmissible geometries still get
    # a well-formed (unsupported) chunk answer for the callers' gate
    strip, rows_padded = pick_strip_for_width(rows, cols, budget, pad)
    if not raw_mode_ok(rows, strip, rows_padded):
        capped = max(8, rows // 2 // 8 * 8)
        strip2, rows_padded2 = pick_strip(
            rows, min(budget_rows(budget, cols, pad), capped), pad)
        if raw_mode_ok(rows, strip2, rows_padded2):
            return nc, pad, strip2, rows_padded2
    return nc, pad, strip, rows_padded


def detect_many_supported(n: int, rows: int, cols: int, mask_type: str,
                          p: int) -> bool:
    """Can the chunked multi-candidate kernel run at this geometry? The
    minimum 8-row strip (plus halos) must be dominated by a chip-
    compiled fact at some chunk size (nc shrinks before giving up);
    callers fall back to the shared-analysis XLA formulation otherwise
    (``pipelines.detect_many_pipeline``)."""
    from .common import lane_padded

    nc, pad, _, _ = detect_many_chunk(n, rows, cols, mask_type, p)
    lanes = lane_padded(cols + 2 * pad)
    return ((8 + 2 * pad) * lanes
            <= detect_many_plane_budget(mask_type, p, nc, rows, lanes))


def _detect_many_core(coeffs_ref, row0_ref, ext, wm_ref, acc_ref,
                      strip_index, *, pad: int, strip: int, width: int,
                      rows: int, total_rows: int, mask_type: str, p: int,
                      nc: int, masked: bool):
    image_index = pl.program_id(0)
    pred_p = p if mask_type == "me" else 3
    taps = neighbor_offsets(pred_p)
    n_taps = len(taps)
    half = pred_p // 2
    coeffs = [coeffs_ref[image_index * n_taps + k] for k in range(n_taps)]

    span = strip + 2 * half
    wspan = width + 2 * half
    base = pad - half
    e_z_ext = _error_region(ext, coeffs, base, span, wspan, pred_p)
    if mask_type == "me":
        mask_ext = jnp.abs(e_z_ext)
    else:
        mask_ext = _nvf_region(ext, base, span, wspan, p)
    e_z = e_z_ext[half : half + strip, half : half + width]
    if masked:
        g = (strip_index * strip
             + jax.lax.broadcasted_iota(jnp.int32, (strip, width), 0))
        valid = (g < rows).astype(jnp.float32)
        e_z = e_z * valid

    @pl.when(strip_index == 0)
    def _():
        acc_ref[0, 0] = jnp.zeros_like(acc_ref[0, 0])

    # norm_z accumulates in every chunk's block (the assembly reads chunk
    # 0's copy); one extra sublane reduction per strip is noise
    acc_ref[0, 0, 2 * nc, :] += jnp.sum(e_z * e_z, axis=0)

    for c in range(nc):
        u_ext = mask_ext * wm_ref[c, base : base + span,
                                  base : base + wspan]
        u_ext = _clamp_fix_ring(u_ext, strip_index, strip, total_rows,
                                row0_ref[0], half)
        e_u = u_ext[half : half + strip, half : half + width]
        for k, (dr, dc) in enumerate(taps):
            e_u = e_u - coeffs[k] * u_ext[half + dr : half + dr + strip,
                                          half + dc : half + dc + width]
        if masked:
            e_u = e_u * valid
        acc_ref[0, 0, 2 * c, :] += jnp.sum(e_u * e_z, axis=0)
        acc_ref[0, 0, 2 * c + 1, :] += jnp.sum(e_u * e_u, axis=0)


def _detect_many_kernel(coeffs_ref, row0_ref, img_ref, wm_ref, acc_ref, *,
                        pad: int, strip: int, width: int, rows: int,
                        total_rows: int, mask_type: str, p: int, nc: int,
                        masked: bool):
    _detect_many_core(coeffs_ref, row0_ref, img_ref[0], wm_ref, acc_ref,
                      pl.program_id(2), pad=pad, strip=strip, width=width,
                      rows=rows, total_rows=total_rows, mask_type=mask_type,
                      p=p, nc=nc, masked=masked)


def _detect_many_kernel_raw(coeffs_ref, row0_ref, img_ref, wm_ref, acc_ref,
                            scratch, *, pad: int, strip: int, width: int,
                            rows: int, rows_padded: int, total_rows: int,
                            mask_type: str, p: int, nc: int, masked: bool):
    strip_index = pl.program_id(2)
    stage_raw_strip(img_ref, scratch, strip_index, pad=pad, strip=strip,
                    rows=rows, rows_padded=rows_padded, cols=width)
    _detect_many_core(coeffs_ref, row0_ref, scratch[:, :], wm_ref, acc_ref,
                      strip_index, pad=pad, strip=strip, width=width,
                      rows=rows, total_rows=total_rows, mask_type=mask_type,
                      p=p, nc=nc, masked=masked)


def fused_detect_many_partials_padded(
        img_p: jnp.ndarray, wm_p: jnp.ndarray, coefficients: jnp.ndarray,
        rows: int, cols: int, pad: int, strip: int, rows_padded: int,
        nc: int, mask_type: str, p: int,
        row_start: jnp.ndarray | None = None,
        total_rows: int | None = None
        ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-candidate partials from PRE-PADDED inputs.

    ``img_p`` is (B, rows_padded+2pad, cols+2pad) and ``wm_p`` a
    chunk-multiple (N_pad, rows_padded+2pad, cols+2pad) candidate bank
    (N_pad a multiple of ``nc``; geometry from ``detect_many_chunk``).
    ``row_start``/``total_rows`` position the shard in the global image
    for the clamp-ring fix, exactly as in ``fused_detect_partials_padded``
    — the spatially-sharded identification path splices ICI-exchanged
    halo rows into the padding and passes its global row offset. Returns
    per-image/per-candidate partials (dot (B, N_pad), ||e_u||^2 (B, N_pad),
    ||e_z||^2 (B,)) — NOT psum'd; mesh callers reduce over the space axis.
    """
    batch = img_p.shape[0]
    n_pad = wm_p.shape[0]
    n_chunks = n_pad // nc
    slots = (2 * nc + 1 + 7) // 8 * 8
    if row_start is None:
        row_start = jnp.zeros((1,), jnp.int32)
    total_rows = rows if total_rows is None else total_rows
    kw = dict(pad=pad, strip=strip, width=cols, rows=rows,
              total_rows=total_rows, mask_type=mask_type, p=p, nc=nc,
              masked=rows_padded != rows)
    wm_spec = pl.BlockSpec(
        (pl.Element(nc), pl.Element(strip + 2 * pad),
         pl.Element(cols + 2 * pad)),
        lambda b, c, i, cf, r: (c * nc, i * strip, 0),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, n_chunks, rows_padded // strip),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(strip + 2 * pad),
                 pl.Element(cols + 2 * pad)),
                lambda b, c, i, cf, r: (b, i * strip, 0),
                memory_space=pltpu.VMEM),
            wm_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, slots, cols),
                               lambda b, c, i, cf, r: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    acc = pl.pallas_call(
        partial(_detect_many_kernel, **kw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, n_chunks, slots, cols),
                                       jnp.float32),
        interpret=interpret_mode(),
    )(coefficients.reshape(-1), row_start, img_p, wm_p)
    dot = jnp.sum(acc[:, :, 0:2 * nc:2, :], axis=-1).reshape(batch, n_pad)
    norm_u = jnp.sum(acc[:, :, 1:2 * nc:2, :], axis=-1).reshape(batch,
                                                                n_pad)
    norm_z = jnp.sum(acc[:, 0, 2 * nc, :], axis=-1)
    return dot, norm_u, norm_z


def fused_detect_many_partials(
        img: jnp.ndarray, wm_stack: jnp.ndarray, coefficients: jnp.ndarray,
        mask_type: str, p: int
        ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(dot (B, N), ||e_u||^2 (B, N), ||e_z||^2 (B,)) against N candidate
    watermarks, one strip pass per nc-candidate chunk.

    ``img`` is the raw (B, rows, cols) image; ``wm_stack`` the raw
    (N, rows, cols) candidate bank; ``coefficients`` (B, k) the shared
    per-image predictor (the analysis is image-only, so it amortizes over
    candidates at the caller).
    """
    from .common import RAW_PAD, raw_mode_ok

    batch, rows, cols = img.shape
    n = wm_stack.shape[0]
    nc, pad, strip, rows_padded = detect_many_chunk(n, rows, cols,
                                                    mask_type, p)
    use_raw = raw_mode_ok(rows, strip, rows_padded)
    pad_used = RAW_PAD if use_raw else pad
    n_pad = (n + nc - 1) // nc * nc
    if n_pad != n:   # pad the bank to the chunk multiple; sliced off below
        wm_stack = jnp.concatenate(
            [wm_stack, jnp.broadcast_to(wm_stack[-1:],
                                        (n_pad - n,) + wm_stack.shape[1:])])
    wm_p = pad_image(wm_stack, pad_used, rows_padded)
    n_chunks = n_pad // nc
    slots = (2 * nc + 1 + 7) // 8 * 8
    row_start = jnp.zeros((1,), jnp.int32)
    kw = dict(pad=pad_used, strip=strip, width=cols, rows=rows,
              total_rows=rows, mask_type=mask_type, p=p, nc=nc,
              masked=rows_padded != rows)

    # wm blocks start at the 8-aligned strip offset (Mosaic requires
    # provably sublane-tile-divisible Element row offsets); the kernel
    # slices the (pad - half) interior itself
    wm_spec = pl.BlockSpec(
        (pl.Element(nc), pl.Element(strip + 2 * pad_used),
         pl.Element(cols + 2 * pad_used)),
        lambda b, c, i, cf, r: (c * nc, i * strip, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, slots, cols),
                            lambda b, c, i, cf, r: (b, c, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((batch, n_chunks, slots, cols),
                                     jnp.float32)
    if use_raw:
        span_raw = strip + 2 * pad_used
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch, n_chunks, rows_padded // strip),
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(1), pl.Element(span_raw), pl.Element(cols)),
                    lambda b, c, i, cf, r: (
                        b, raw_row_start(i, strip, pad_used, rows), 0),
                    memory_space=pltpu.VMEM),
                wm_spec,
            ],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((span_raw, cols + 2 * pad_used),
                                       jnp.float32)],
        )
        acc = pl.pallas_call(
            partial(_detect_many_kernel_raw, rows_padded=rows_padded, **kw),
            grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret_mode(),
        )(coefficients.reshape(-1), row_start, img, wm_p)
    else:
        img_p = pad_image(img, pad_used, rows_padded)
        dot, norm_u, norm_z = fused_detect_many_partials_padded(
            img_p, wm_p, coefficients, rows, cols, pad_used, strip,
            rows_padded, nc, mask_type, p)
        return dot[:, :n], norm_u[:, :n], norm_z
    dot = jnp.sum(acc[:, :, 0:2 * nc:2, :], axis=-1).reshape(batch, n_pad)
    norm_u = jnp.sum(acc[:, :, 1:2 * nc:2, :], axis=-1).reshape(batch,
                                                                n_pad)
    norm_z = jnp.sum(acc[:, 0, 2 * nc, :], axis=-1)
    return dot[:, :n], norm_u[:, :n], norm_z


def _embed_field_core(coeffs_ref, ext, wm_ref, u_ref, acc_ref, strip_index,
                      *, pad: int, strip: int, width: int, rows: int,
                      mask_type: str, p: int, masked: bool):
    image_index = pl.program_id(0)

    if mask_type == "me":
        n_taps = p * p - 1
        coeffs = [coeffs_ref[image_index * n_taps + k]
                  for k in range(n_taps)]
        err = _error_region(ext, coeffs, pad, strip, width, p)
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
