"""Fused prediction-error normal-equation (Rx/rx) Pallas kernel.

One pass over the image accumulates the data for all 45 unique entries of
the 9x9 Gram matrix of [8 clamped neighbors; center]. ``G[:8, :8]`` is Rx
and ``G[:8, 8]`` is rx — both reference reductions in a single fused pass
(``/root/reference/Watermark_GPU/kernels/me_p3.hpp:8-21,59-82`` staged these
as fp16 workgroup partials; here everything stays f32, strictly more
precise).

Algorithm (lag decomposition — measured ~1.7x fewer full-plane VPU ops than
the direct 45-pair form):

* Pair sums group by relative lag d = off_b - off_a; orienting each
  symmetric pair canonically leaves 13 distinct lags: every pair at lag d
  sums the SAME product plane Q_d[y] = P[y] * P[y+d] over a window that
  differs from the base window (rows [0,H), cols [-1,W+1)) only by a +/-1
  shift.
* The kernel computes, per lag, one product + one sublane reduction into a
  (16, W+2) lane-partial block that lives in VMEM across the sequential
  strip grid (bottom-strip rows masked so padded rows never count).
* XLA assembles each pair's window by inclusion-exclusion: lane windows of
  the exported partials give the column shifts; boundary-row terms
  (global rows -1, 0, H-1, H of Q_d) are recomputed directly from the
  padded image — O(W) work per lag, negligible. Rows that out-of-window
  pairs must not count cancel exactly between the base and the row
  corrections, which also neutralizes the clamp-replicated +/-2 rows.

No in-kernel scalar reduction trees, no per-pair row operations (a previous
in-kernel variant of these corrections ran at 1/8 sublane utilization and
won nothing).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..neighbors import NEIGHBOR_OFFSETS
from .common import (interpret_mode, pad_image, pick_strip,
                     pick_strip_for_width, raw_row_start, stage_raw_strip)

PAD = 4
_OFFSETS = tuple(NEIGHBOR_OFFSETS) + ((0, 0),)  # 8 neighbors then center
_PAIRS = [(a, b) for a in range(9) for b in range(a, 9)]  # 45 unique entries

# Pair sums are symmetric (S_ab == S_ba), and the product plane of lag -d is
# the plane of lag d shifted: Q_{-d}(r, c) = Q_d(r - dr, c - dc). Orienting
# every pair so its lag is lexicographically canonical (>= (0, 0)) therefore
# halves the kernel's work to 13 distinct lags — the assembly's existing
# window machinery (lane offsets + the +/-1 boundary-row corrections)
# handles the reoriented pairs verbatim, because the reoriented window
# offset is still the first offset's row/col in {-1, 0, 1}.
_LAGS: list[tuple[int, int]] = []
_PAIR_PLAN: list[tuple[int, int, tuple[int, int], tuple[int, int]]] = []
for _a, _b in _PAIRS:
    _da, _db = _OFFSETS[_a], _OFFSETS[_b]
    _lag = (_db[0] - _da[0], _db[1] - _da[1])
    if _lag < (0, 0):   # reorient: kernel computes canonical lags only
        _da, _db = _db, _da
        _lag = (-_lag[0], -_lag[1])
    if _lag not in _LAGS:
        _LAGS.append(_lag)
    _PAIR_PLAN.append((_a, _b, _lag, _da))
assert len(_LAGS) == 13


def _gram_core(ext, pout, strip_index, *, pad: int, strip: int, width: int,
               rows: int, masked: bool):
    wspan = width + 2
    col0 = pad - 1  # lane 0 of the partials is image column -1

    # hoist the 5 distinct column shifts once (lane rolls); every lag then
    # takes a sublane-offset slice of one of them — measured faster than 25
    # independently 2D-shifted reads
    span = strip + 2 * pad
    cols_by_dc = {dc: ext[0:span, col0 + dc : col0 + dc + wspan]
                  for dc in (-2, -1, 0, 1, 2)}
    base = cols_by_dc[0][pad : pad + strip]
    if masked:
        # mask rows beyond the true image (bottom padding of the last
        # strip): they replicate the edge and must not count as centers.
        # Statically skipped when the strip divides the row count.
        global_row = (strip_index * strip + jax.lax.broadcasted_iota(
            jnp.int32, (strip, wspan), 0))
        base = base * (global_row < rows).astype(jnp.float32)

    @pl.when(strip_index == 0)
    def _():
        pout[0] = jnp.zeros_like(pout[0])

    for index, (lag_r, lag_c) in enumerate(_LAGS):
        shifted = cols_by_dc[lag_c][pad + lag_r : pad + lag_r + strip]
        pout[0, index, :] += jnp.sum(base * shifted, axis=0)


def _me_gram_kernel(pin, pout, *, pad: int, strip: int, width: int,
                    rows: int, masked: bool):
    _gram_core(pin[0], pout, pl.program_id(1), pad=pad, strip=strip,
               width=width, rows=rows, masked=masked)


def _me_gram_kernel_raw(pin, pout, scratch, *, pad: int, strip: int,
                        width: int, rows: int, rows_padded: int,
                        masked: bool):
    """Raw-input variant: the halo-extended block is built in VMEM scratch
    (stage_raw_strip), skipping the HBM edge-pad copy entirely."""
    strip_index = pl.program_id(1)
    stage_raw_strip(pin, scratch, strip_index, pad=pad, strip=strip,
                    rows=rows, rows_padded=rows_padded, cols=width)
    _gram_core(scratch[:, :], pout, strip_index, pad=pad, strip=strip,
               width=width, rows=rows, masked=masked)


# symmetric pair -> position in the 45-value vector (for the final gather)
_PAIR_INDEX = np.zeros((9, 9), dtype=np.int32)
for _i, (_a, _b) in enumerate(_PAIRS):
    _PAIR_INDEX[_a, _b] = _i
    _PAIR_INDEX[_b, _a] = _i


def _block_row(img: jnp.ndarray, row: int, cache: dict) -> jnp.ndarray:
    """(B, W) row ``row`` of img, sliced via an 8-aligned row *block*.

    A direct ``img[:, row, :]`` makes XLA relayout-copy the ENTIRE image
    ({2,0,1} transposition, ~0.21 ms per 8x1080p batch — 8% of the round
    trip) just to serve four boundary rows. Slicing a sublane-tile-aligned
    block keeps the default layout (a cheap strided DMA); the single-row
    slice then happens on the small (B, <=8, W) block.
    """
    start = row // 8 * 8  # stays 8-aligned; the slice clamps a ragged tail
    block = cache.get(start)
    if block is None:
        block = cache[start] = img[:, start:start + 8, :]
    # pick the row by one-hot reduction, NOT block[:, i, :]: a slice on the
    # sublane dim makes XLA's layout assignment demand (and back-propagate)
    # the {2,0,1} layout all the way to the image parameter
    onehot = jnp.zeros((block.shape[1], 1), jnp.float32).at[row - start].set(
        1.0)
    return jnp.sum(block * onehot, axis=1)


def padded_row_provider(img_p: jnp.ndarray, pad: int, cols: int):
    """row_of(j) -> (B, cols+6) image row j, lanes = image cols [-3, W+3).

    Rows outside [0, H) come from the padded array itself — edge replicas
    on a single chip, true neighbor rows under spatial sharding (where the
    halo exchange splices them into the padding region).
    """
    blocks: dict = {}

    def row_of(j: int) -> jnp.ndarray:
        return _block_row(img_p, pad + j, blocks)[:, pad - 3:pad + cols + 3]
    return row_of


def raw_row_provider(img: jnp.ndarray):
    """row_of(j) from the raw (B, H, W) image: clamp rows, edge-pad cols."""
    rows = img.shape[-2]
    blocks: dict = {}

    def row_of(j: int) -> jnp.ndarray:
        row = _block_row(img, min(max(j, 0), rows - 1), blocks)
        return jnp.pad(row, [(0, 0), (3, 3)], mode="edge")
    return row_of


def _assemble_gram(partials: jnp.ndarray, row_of, rows: int,
                   cols: int) -> jnp.ndarray:
    """(B, 16, W+2) lane partials + boundary-row provider -> (B, 9, 9)."""
    wspan = cols + 2
    window_cache: dict = {}
    row_cache: dict = {}

    def lane_window(key, vec, ac):  # (B, wspan) -> (B,), cols [ac, W+ac)
        cached = window_cache.get((key, ac))
        if cached is None:
            cached = jnp.sum(vec[:, 1 + ac : 1 + ac + cols], axis=-1)
            window_cache[(key, ac)] = cached
        return cached

    # boundary rows of each lag's product plane: Q_d[k] = row k * row k+dr
    # shifted by dc lanes (row_of lanes are image cols [-3, W+3))
    def q_row(k, lag):  # (B, wspan)
        cached = row_cache.get((k, lag))
        if cached is None:
            lag_r, lag_c = lag
            top = row_of(k)[:, 2 : 2 + wspan]
            bottom = row_of(k + lag_r)[:, 2 + lag_c : 2 + lag_c + wspan]
            cached = top * bottom
            row_cache[(k, lag)] = cached
        return cached

    values = []
    for a, b, lag, (ar, ac) in _PAIR_PLAN:
        lag_index = _LAGS.index(lag)
        value = lane_window(("p", lag_index), partials[:, lag_index], ac)
        if ar == 1:       # window rows [1, H+1): + row H - row 0
            value = value \
                + lane_window(("q", rows, lag), q_row(rows, lag), ac) \
                - lane_window(("q", 0, lag), q_row(0, lag), ac)
        elif ar == -1:    # window rows [-1, H-1): + row -1 - row H-1
            value = value \
                + lane_window(("q", -1, lag), q_row(-1, lag), ac) \
                - lane_window(("q", rows - 1, lag), q_row(rows - 1, lag), ac)
        values.append(value)
    stacked = jnp.stack(values, axis=-1)          # (B, 45)
    return stacked[:, _PAIR_INDEX]                # (B, 9, 9) gather


def me_gram_padded(img_p: jnp.ndarray, rows: int, cols: int, pad: int,
                   strip: int, rows_padded: int) -> jnp.ndarray:
    """(B, 9, 9) Gram from a pre-padded (B, rows_padded+2p, cols+2p) image."""
    batch = img_p.shape[0]
    partials = pl.pallas_call(
        partial(_me_gram_kernel, pad=pad, strip=strip, width=cols, rows=rows,
                masked=rows_padded != rows),
        grid=(batch, rows_padded // strip),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(strip + 2 * pad),
             pl.Element(cols + 2 * pad)),
            lambda b, i: (b, i * strip, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, cols + 2), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 16, cols + 2), jnp.float32),
        interpret=interpret_mode(),
    )(img_p)
    return _assemble_gram(partials, padded_row_provider(img_p, pad, cols),
                          rows, cols)


def me_gram_raw(img: jnp.ndarray, rows: int, cols: int, pad: int,
                strip: int, rows_padded: int) -> jnp.ndarray:
    """(B, 9, 9) Gram straight from the raw (B, rows, cols) image.

    Requires ``raw_mode_ok`` geometry; the kernel stages each strip's
    halo-extended block in VMEM scratch instead of reading an XLA-padded
    copy from HBM.
    """
    batch = img.shape[0]
    span = strip + 2 * pad

    def row_index(b, i):
        return (b, raw_row_start(i, strip, pad, rows), 0)

    partials = pl.pallas_call(
        partial(_me_gram_kernel_raw, pad=pad, strip=strip, width=cols,
                rows=rows, rows_padded=rows_padded,
                masked=rows_padded != rows),
        grid=(batch, rows_padded // strip),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(span), pl.Element(cols)),
            row_index, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, cols + 2), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 16, cols + 2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((span, cols + 2 * pad), jnp.float32)],
        interpret=interpret_mode(),
    )(img)
    return _assemble_gram(partials, raw_row_provider(img), rows, cols)


@partial(jax.jit, static_argnames=("strip",))
def me_gram_pallas(image: jnp.ndarray,
                   strip: int | None = None) -> jnp.ndarray:
    """(H, W) or (B, H, W) -> (B?, 9, 9) Gram matrix."""
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
    batch, rows, cols = image.shape
    if strip is None:  # width-adaptive VMEM budget (ext + lag temporaries)
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
