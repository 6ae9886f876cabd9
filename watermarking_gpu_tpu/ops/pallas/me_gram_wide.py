"""Generalized-window (p in {5, 7, 9}) prediction-error Gram Pallas kernel.

The reference hard-codes the p=3 predictor and rejects anything wider
("TODO for p>3 we have problems with ME masking buffers",
``/root/reference/Watermark_GPU/main.cpp:88-89``); the framework generalizes
ME to the (p*p-1)-tap window, and this module gives that capability a
Pallas-grade Gram — the dominant cost of the wide pipelines, previously only
available as the XLA lag formulation (``ops/me.py::_gram_lags``, ~41 sibling
full-plane reductions that XLA splits into bandwidth-bound fusions).

Same lag-decomposition design as the p=3 kernel (``me_kernel.py``), scaled to
the wide window:

* Every pair sum of the (k+1)x(k+1) Gram of [k neighbors; center] is a
  window sum of one lag product plane Q_d[y] = P[y] * P[y+d]; orienting
  pairs canonically leaves ((4h+1)^2+1)/2 distinct lags (h = p//2): 41 at
  p=5, 85 at p=7, 145 at p=9 (13 at p=3).
* One kernel pass over the image computes, per lag, a sublane reduction of
  rows [0, H) into an (L, W+2h) lane-partial block held in VMEM across the
  sequential strip grid; lags are iterated grouped by column shift so at
  most one hoisted shift is live at a time.
* The XLA assembly is FULLY VECTORIZED — O(1) ops in p, unlike the p=3
  module's per-pair lane windows (which at p=9 would be thousands of
  sibling ops and minutes of compile, the failure mode of the pure-XLA lag
  assembly this replaces):
    - each pair's lane window [ac, W+ac) differs from the full partial sum
      only by <= 2h edge lanes, so all (lag, ac) windows come from one full
      reduction plus two tiny edge prefix sums;
    - the boundary-row corrections (rows [-h, h) and [H-h, H+h) of each
      Q_d, the inclusion-exclusion terms for pairs whose window is row-
      shifted by ar != 0) reduce to cumulative sums over the 2h-row low/
      high blocks, and every pair's correction is sign(ar) * (D[hi] -
      D[lo]) on the cumulated difference tensor D = cumHigh - cumLow —
      two gathers for all pairs at once.

Numerics: everything accumulates in f32 (strictly tighter than the
reference's fp16 Rx staging, ``kernels/me_p3.hpp:27,59-82``); clamp-to-edge
semantics match the reference sampler exactly (edge-replicated padding /
in-kernel raw staging, boundary rows from the clamped row provider).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..neighbors import neighbor_offsets
from .common import (interpret_mode, pad_image, pick_strip_for_width,
                     raw_mode_ok, raw_row_start, round_up, stage_raw_strip)
from .me_kernel import _block_row

# Kernel VMEM working-set budget in f32 elements for the (span, W+2*pad)
# input strip; the live set adds ~3 strip-height planes (base, one hoisted
# column shift, the product temporary) plus the (L, W+2h) accumulator.
BUDGET = 320_000


def wide_pad(p: int) -> int:
    """Halo the kernel needs: column reach is 3h (window offset h + lag
    shift 2h), rounded up to the f32 sublane tile so raw-mode staging and
    strip block heights stay 8-aligned."""
    return round_up(3 * (p // 2), 8)


@lru_cache(maxsize=None)
def _plan(p: int):
    """Static per-p assembly plan.

    Returns (lags, pair_lag, pair_ar, pair_ai, pair_index):
    lags      -- canonical (dr, dc) lag list, dr >= 0 (dc >= 0 when dr == 0)
    pair_lag  -- per pair, index into lags
    pair_ar   -- per pair, window row offset ar in [-h, h] (the reoriented
                 pair's first offset)
    pair_ai   -- per pair, window column index ac + h in [0, 2h]
    pair_index -- (k+1, k+1) int32 grid mapping Gram positions to pair ids
                 (the unused center-center cell points at pair 0; consumers
                 only read [:k, :k] and [:k, k])
    """
    h = p // 2
    offsets = list(neighbor_offsets(p)) + [(0, 0)]   # center last
    k = len(offsets) - 1
    lags: list[tuple[int, int]] = []
    pair_lag, pair_ar, pair_ai, pairs = [], [], [], []
    for a in range(k + 1):
        for b in range(a, k + 1):
            if a == b == k:
                continue                              # center-center unused
            first, second = offsets[a], offsets[b]
            lag = (second[0] - first[0], second[1] - first[1])
            if lag < (0, 0):    # reorient: Q_{-d} is a shifted Q_d
                lag = (-lag[0], -lag[1])
                first = second
            if lag not in lags:
                lags.append(lag)
            pairs.append((a, b))
            pair_lag.append(lags.index(lag))
            pair_ar.append(first[0])
            pair_ai.append(first[1] + h)
    pair_index = np.zeros((k + 1, k + 1), np.int32)
    for i, (a, b) in enumerate(pairs):
        pair_index[a, b] = i
        pair_index[b, a] = i
    assert len(lags) == ((4 * h + 1) ** 2 + 1) // 2
    return (tuple(lags), np.asarray(pair_lag, np.int32),
            np.asarray(pair_ar, np.int32), np.asarray(pair_ai, np.int32),
            pair_index)


def wide_gram_supported(rows: int, cols: int, p: int) -> bool:
    """Geometry gate: the lag windows and low/high boundary blocks need a
    few halo-widths of real image (same threshold as the XLA lag path,
    ``ops/me.py::gram_terms_from_padded``), the minimum 8-row strip must
    fit the VMEM budget, and the chip-calibrated budget must apply to the
    current (jax, device) stack (``common.chip_facts_valid``) — on a
    stack mismatch the whole wide fused pipeline routes to XLA
    (``pipelines._wide_me_fallback_geometry``, ``wide_shard_supported``)."""
    from .common import chip_facts_valid, lane_padded

    h, pad = p // 2, wide_pad(p)
    return (p in (5, 7, 9) and rows >= 6 * h and cols >= 6 * h
            and (8 + 2 * pad) * lane_padded(cols + 2 * pad) <= BUDGET
            and chip_facts_valid())


def wide_gram_geometry(rows: int, cols: int, p: int) -> tuple[int, int]:
    """(strip, rows_padded) for the wide Gram, preferring raw-eligible
    geometry: when the unconstrained pick lands on a single strip, a pick
    capped at half the rows restores >= 2 strips so the zero-copy raw path
    applies (same trade as ``fused.pipeline_geometry``)."""
    from .common import budget_rows, pick_strip

    pad = wide_pad(p)
    strip, rows_padded = pick_strip_for_width(rows, cols, BUDGET, pad)
    if not raw_mode_ok(rows, strip, rows_padded, pad):
        budget_strip = budget_rows(BUDGET, cols, pad)
        capped = max(8, rows // 2 // 8 * 8)
        strip2, rows_padded2 = pick_strip(rows, min(budget_strip, capped),
                                          pad)
        if raw_mode_ok(rows, strip2, rows_padded2, pad):
            return strip2, rows_padded2
    return strip, rows_padded


# -- kernel -------------------------------------------------------------


def _wide_gram_core(ext, pout, strip_index, *, h: int, pad: int, strip: int,
                    width: int, rows: int, lags, masked: bool):
    wspan = width + 2 * h
    col0 = pad - h          # lane 0 of the partials is image column -h
    span = strip + 2 * pad

    base = ext[pad:pad + strip, col0:col0 + wspan]
    if masked:
        # rows beyond the true image (bottom padding of the last strip)
        # replicate the edge and must not count as window rows
        global_row = (strip_index * strip + jax.lax.broadcasted_iota(
            jnp.int32, (strip, wspan), 0))
        base = base * (global_row < rows).astype(jnp.float32)

    @pl.when(strip_index == 0)
    def _():
        pout[0] = jnp.zeros_like(pout[0])

    # iterate lags grouped by column shift: one hoisted lane-shifted plane
    # live at a time (bounds VMEM; each shift serves ~2h+1 row lags)
    by_dc: dict[int, list[tuple[int, int]]] = {}
    for index, (lag_r, lag_c) in enumerate(lags):
        by_dc.setdefault(lag_c, []).append((index, lag_r))
    for lag_c in sorted(by_dc):
        colshift = ext[0:span, col0 + lag_c: col0 + lag_c + wspan]
        for index, lag_r in by_dc[lag_c]:
            pout[0, index, :] += jnp.sum(
                base * colshift[pad + lag_r: pad + lag_r + strip], axis=0)


def _wide_gram_kernel(pin, pout, *, h: int, pad: int, strip: int,
                      width: int, rows: int, lags, masked: bool):
    _wide_gram_core(pin[0], pout, pl.program_id(1), h=h, pad=pad,
                    strip=strip, width=width, rows=rows, lags=lags,
                    masked=masked)


def _wide_gram_kernel_raw(pin, pout, scratch, *, h: int, pad: int,
                          strip: int, width: int, rows: int,
                          rows_padded: int, lags, masked: bool):
    strip_index = pl.program_id(1)
    stage_raw_strip(pin, scratch, strip_index, pad=pad, strip=strip,
                    rows=rows, rows_padded=rows_padded, cols=width)
    _wide_gram_core(scratch[:, :], pout, strip_index, h=h, pad=pad,
                    strip=strip, width=width, rows=rows, lags=lags,
                    masked=masked)


# -- row providers (boundary rows of the clamp-extended image) ----------


def wide_padded_row_provider(img_p: jnp.ndarray, pad: int, cols: int,
                             h: int):
    """row_of(j) -> (B, cols + 6h) image row j, lanes = cols [-3h, W+3h).

    Rows outside [0, H) come from the padded array itself (edge replicas on
    a single chip; a future sharded caller can splice true halo rows)."""
    blocks: dict = {}

    def row_of(j: int) -> jnp.ndarray:
        return _block_row(img_p, pad + j, blocks)[:, pad - 3 * h:
                                                  pad + cols + 3 * h]
    return row_of


def wide_raw_row_provider(img: jnp.ndarray, h: int):
    """row_of(j) from the raw (B, H, W) image: clamp rows, edge-pad cols."""
    rows = img.shape[-2]
    blocks: dict = {}

    def row_of(j: int) -> jnp.ndarray:
        row = _block_row(img, min(max(j, 0), rows - 1), blocks)
        return jnp.pad(row, [(0, 0), (3 * h, 3 * h)], mode="edge")
    return row_of


# -- vectorized assembly ------------------------------------------------


def _edge_windows(x: jnp.ndarray, h: int) -> jnp.ndarray:
    """All 2h+1 lane windows of (..., W + 2h) partials in O(1) ops.

    Window ai sums lanes [ai, ai + W); it equals the full lane sum minus
    the excluded ai left lanes and 2h - ai right lanes — tiny prefix sums
    over the <= 2h edge lanes instead of one reduction per (row, ai)."""
    wspan = x.shape[-1]
    full = jnp.sum(x, axis=-1)
    zero = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    left = jnp.concatenate(
        [zero, jnp.cumsum(x[..., :2 * h], axis=-1)], axis=-1)
    right = jnp.concatenate(
        [zero, jnp.cumsum(x[..., :wspan - 2 * h - 1:-1], axis=-1)], axis=-1)
    # index ai: exclude left[ai] and right[2h - ai]
    return full[..., None] - left - right[..., ::-1]


def _assemble_wide(partials: jnp.ndarray, row_of, rows: int, cols: int,
                   p: int) -> jnp.ndarray:
    """(B, L_pad, W+2h) lane partials + boundary-row provider
    -> (B, k+1, k+1) Gram."""
    h = p // 2
    lags, pair_lag, pair_ar, pair_ai, pair_index = _plan(p)
    n_lags = len(lags)
    na = 2 * h + 1

    # base windows: rows [0, H) of each lag, all 2h+1 column windows
    win_base = _edge_windows(partials[:, :n_lags], h)     # (B, L, 2h+1)
    base_vals = win_base.reshape(win_base.shape[0], -1)[
        :, pair_lag * na + pair_ai]                        # (B, P)

    # boundary-row banks: rows [-h, 3h) (low) and [H-h, H+3h) (high) of the
    # clamp-extended image, lanes cols [-3h, W+3h)
    low = jnp.stack([row_of(j) for j in range(-h, 3 * h)], axis=1)
    high = jnp.stack([row_of(rows + j) for j in range(-h, 3 * h)], axis=1)

    def q_windows(bank, lag_r, lag_c):
        # Q_d rows j in [-h, h) (block index 0..2h): top row j times row
        # j + dr shifted dc lanes; then all column windows
        top = bank[:, 0:2 * h, 2 * h: 2 * h + cols + 2 * h]
        bottom = bank[:, lag_r:lag_r + 2 * h,
                      2 * h + lag_c: 2 * h + lag_c + cols + 2 * h]
        return _edge_windows(top * bottom, h)              # (B, 2h, 2h+1)

    q_low = jnp.stack([q_windows(low, lr, lc) for lr, lc in lags], axis=1)
    q_high = jnp.stack([q_windows(high, lr, lc) for lr, lc in lags], axis=1)
    # cumulative over the block rows, zero-prepended: cum[..., m, :] is the
    # sum of the first m block rows (block row m holds image row m - h for
    # the low block, H + m - h for the high block)
    zero = jnp.zeros(q_low.shape[:2] + (1, na), q_low.dtype)
    cum_low = jnp.concatenate([zero, jnp.cumsum(q_low, axis=2)], axis=2)
    cum_high = jnp.concatenate([zero, jnp.cumsum(q_high, axis=2)], axis=2)
    # a pair's window rows [ar, H+ar) correct the base rows [0, H) by
    #   ar > 0: + rows [H, H+ar)   - rows [0, ar)
    #   ar < 0: + rows [ar, 0)     - rows [H+ar, H)
    # both collapse to sign(ar) * (D[h + max(ar,0)] - D[h + min(ar,0)])
    # on D = cumHigh - cumLow
    diff = (cum_high - cum_low).reshape(q_low.shape[0], -1)  # (B, L*(2h+1)*na)
    per_lag = (2 * h + 1) * na
    hi_m = h + np.maximum(pair_ar, 0)
    lo_m = h + np.minimum(pair_ar, 0)
    sign = np.sign(pair_ar).astype(np.float32)
    idx_hi = pair_lag * per_lag + hi_m * na + pair_ai
    idx_lo = pair_lag * per_lag + lo_m * na + pair_ai
    corrections = sign * (diff[:, idx_hi] - diff[:, idx_lo])

    values = base_vals + corrections                       # (B, P)
    return values[:, pair_index]                           # (B, k+1, k+1)


# -- entry points -------------------------------------------------------


def wide_gram_partials_padded(img_p: jnp.ndarray, rows: int, cols: int,
                              pad: int, strip: int, rows_padded: int,
                              p: int) -> jnp.ndarray:
    """Kernel-side half of the wide Gram: (B, round_up(L, 8), cols + 2h)
    per-lag lane partials over ``rows`` rows of a pre-padded
    (B, rows_padded+2pad, cols+2pad) image (the Pallas form of
    ``ops.me.lag_partials``; same layout contract, lane 0 = column -h).

    The spatially-sharded path (``parallel.spatial._gram_wide_sharded``)
    calls this per shard with the ICI-exchanged 2h-row bottom halo spliced
    into the padding region: base rows are masked to the shard's local
    rows (each center counted once globally) while the lag shifts read the
    true neighbor rows, so the psum of the per-shard partials equals the
    unsharded ones.
    """
    h = p // 2
    lags = _plan(p)[0]
    batch = img_p.shape[0]
    n_out = round_up(len(lags), 8)
    return pl.pallas_call(
        partial(_wide_gram_kernel, h=h, pad=pad, strip=strip, width=cols,
                rows=rows, lags=lags, masked=rows_padded != rows),
        grid=(batch, rows_padded // strip),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(strip + 2 * pad),
             pl.Element(cols + 2 * pad)),
            lambda b, i: (b, i * strip, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n_out, cols + 2 * h),
                               lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, n_out, cols + 2 * h),
                                       jnp.float32),
        interpret=interpret_mode(),
    )(img_p)


def me_gram_wide_padded(img_p: jnp.ndarray, rows: int, cols: int, pad: int,
                        strip: int, rows_padded: int, p: int) -> jnp.ndarray:
    """(B, k+1, k+1) Gram from a pre-padded (B, rows_padded+2pad, cols+2pad)
    image."""
    h = p // 2
    partials = wide_gram_partials_padded(img_p, rows, cols, pad, strip,
                                         rows_padded, p)
    return _assemble_wide(partials,
                          wide_padded_row_provider(img_p, pad, cols, h),
                          rows, cols, p)


def me_gram_wide_raw(img: jnp.ndarray, rows: int, cols: int, pad: int,
                     strip: int, rows_padded: int, p: int) -> jnp.ndarray:
    """(B, k+1, k+1) Gram straight from the raw (B, rows, cols) image
    (halo-extended strips staged in VMEM scratch, no HBM edge-pad copy)."""
    h = p // 2
    lags = _plan(p)[0]
    batch = img.shape[0]
    span = strip + 2 * pad
    n_out = round_up(len(lags), 8)

    partials = pl.pallas_call(
        partial(_wide_gram_kernel_raw, h=h, pad=pad, strip=strip,
                width=cols, rows=rows, rows_padded=rows_padded, lags=lags,
                masked=rows_padded != rows),
        grid=(batch, rows_padded // strip),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(span), pl.Element(cols)),
            lambda b, i: (b, raw_row_start(i, strip, pad, rows), 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n_out, cols + 2 * h),
                               lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, n_out, cols + 2 * h),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((span, cols + 2 * pad), jnp.float32)],
        interpret=interpret_mode(),
    )(img)
    return _assemble_wide(partials, wide_raw_row_provider(img, h),
                          rows, cols, p)


def me_gram_wide(image: jnp.ndarray, p: int) -> jnp.ndarray:
    """(H, W) or (B, H, W) -> (B?, k+1, k+1) Gram of [k neighbors; center],
    k = p*p - 1."""
    if not wide_gram_supported(image.shape[-2], image.shape[-1], p):
        raise ValueError(
            f"wide Gram kernel does not support p={p} at "
            f"{image.shape[-2:]} (see wide_gram_supported)")
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
    _, rows, cols = image.shape
    pad = wide_pad(p)
    strip, rows_padded = wide_gram_geometry(rows, cols, p)
    # RAW (VMEM-staged halos) when the geometry allows — settled by the
    # r5 on-chip A/B (tools/bench_wide_gram_raw_ab.py, 1080p p=7 batch=8):
    # the raw route measures 0.94 ms/frame against 1.27 for the padded
    # route once the edge-pad copy the padded kernel needs is included
    # (the pad alone costs ~0.86 ms/frame — the pad output's misaligned
    # width keeps it from fusing; it dwarfs the ~0.5 ms the in-kernel
    # halo staging adds over the bare padded kernel's 0.39). Component
    # rows that feed a PRE-padded device array (bench_wide_components)
    # therefore flatter the padded kernel; route on the end-to-end A/B.
    if raw_mode_ok(rows, strip, rows_padded, pad):
        gram = me_gram_wide_raw(image, rows, cols, pad, strip, rows_padded,
                                p)
    else:
        padded = pad_image(image, pad, rows_padded)
        gram = me_gram_wide_padded(padded, rows, cols, pad, strip,
                                   rows_padded, p)
    return gram[0] if squeeze else gram


def me_normal_equations_wide(
        image: jnp.ndarray, p: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rx (..., k, k) and rx (..., k) in one fused pass, k = p*p - 1."""
    gram = me_gram_wide(image, p)
    k = p * p - 1
    return gram[..., :k, :k], gram[..., :k, k]
