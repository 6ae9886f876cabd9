"""Spatially-sharded (SP) single-image embed/detect across a TPU mesh.

One image's rows shard across the ``space`` mesh axis. Stencils need their
neighbors' edge rows, so each step exchanges a row halo with mesh neighbors
via ``lax.ppermute`` over ICI (the Pallas-guide ring pattern, expressed at the
XLA level); global clamp-to-edge semantics are preserved by replicating the
true image edges at the outermost shards. Global scalars (Rx/rx normal
equations, norms, correlations, mask maxima) reduce with ``lax.psum`` /
``lax.pmax``.

This is the TPU-native scaling axis the reference lacks entirely (SURVEY.md
§2.4: single-device, single-queue); it makes arbitrarily large frames behave
like per-chip-sized ones.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops.me import solve_coefficients
from ..ops.neighbors import neighbor_stack_from_padded
from .mesh import SPACE_AXIS

_HIGHEST = jax.lax.Precision.HIGHEST


def exchange_row_halo(x: jnp.ndarray, halo: int,
                      axis: str = SPACE_AXIS) -> jnp.ndarray:
    """Extend a (h, W) row shard to (h + 2*halo, W) with neighbor rows.

    Interior shard boundaries receive the true adjacent rows from mesh
    neighbors (ppermute); the global top/bottom replicate the edge row,
    matching the reference's CLAMP_TO_EDGE sampler.
    """
    n = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    send_up = x[:halo]        # our top rows -> previous shard's bottom halo
    send_down = x[-halo:]     # our bottom rows -> next shard's top halo
    from_up = lax.ppermute(send_down, axis,
                           [(i, i + 1) for i in range(n - 1)])
    from_down = lax.ppermute(send_up, axis,
                             [(i + 1, i) for i in range(n - 1)])
    top_fill = jnp.repeat(x[:1], halo, axis=0)
    bottom_fill = jnp.repeat(x[-1:], halo, axis=0)
    top = jnp.where(idx == 0, top_fill, from_up)
    bottom = jnp.where(idx == n - 1, bottom_fill, from_down)
    return jnp.concatenate([top, x, bottom], axis=0)


def _extend(x: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Row halo via ICI exchange + column halo via local edge padding."""
    with_rows = exchange_row_halo(x, halo)
    return jnp.pad(with_rows, ((0, 0), (halo, halo)), mode="edge")


def _local_neighbors(img: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape
    return neighbor_stack_from_padded(_extend(img, 1), h, w)


def _nvf_local(img: jnp.ndarray, p: int) -> jnp.ndarray:
    halo = p // 2
    ext = _extend(img, halo)
    p2 = float(p * p)
    total = lax.reduce_window(ext, 0.0, lax.add, (p, p), (1, 1), "VALID")
    total_sq = lax.reduce_window(ext * ext, 0.0, lax.add, (p, p), (1, 1),
                                 "VALID")
    mean = total / p2
    variance = total_sq / p2 - mean * mean
    return variance / (1.0 + variance)


def _analysis_local(img: jnp.ndarray, impl: str = "xla"):
    """Global Rx/rx from per-shard partials + psum, then a replicated solve.

    impl="pallas" runs the fused Gram strip kernel on each shard: the halo
    rows exchanged over ICI are spliced into the kernel's padding region so
    shard seams see true neighbors, and the kernel's own bottom-row masking
    keeps each center counted exactly once; the 9x9 partials then psum.
    """
    h, w = img.shape
    if impl == "pallas":
        from ..ops.pallas.common import pick_strip_for_width
        from ..ops.pallas.me_kernel import PAD, me_gram_padded

        strip, rows_padded = pick_strip_for_width(h, w, 130_000, PAD)
        ext = exchange_row_halo(img, 1)                  # (h+2, W), true seams
        img_p = jnp.pad(ext, ((PAD - 1, PAD - 1 + rows_padded - h),
                              (PAD, PAD)), mode="edge")
        gram = me_gram_padded(img_p[None], h, w, PAD, strip, rows_padded)[0]
        gram = lax.psum(gram, SPACE_AXIS)
        return solve_coefficients(gram[:8, :8], gram[:8, 8])
    neighbors = _local_neighbors(img).reshape(8, -1)
    center = img.reshape(-1)
    rx_matrix = lax.psum(
        jnp.matmul(neighbors, neighbors.T, precision=_HIGHEST,
                   preferred_element_type=jnp.float32), SPACE_AXIS)
    rx_vector = lax.psum(
        jnp.matmul(neighbors, center, precision=_HIGHEST,
                   preferred_element_type=jnp.float32), SPACE_AXIS)
    return solve_coefficients(rx_matrix, rx_vector)


def _predict_local(img: jnp.ndarray, coefficients: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("k,khw->hw", coefficients, _local_neighbors(img),
                      precision=_HIGHEST, preferred_element_type=jnp.float32)


def _detect_shard(img: jnp.ndarray, watermark: jnp.ndarray, mask_type: str,
                  p: int, impl: str = "xla") -> jnp.ndarray:
    coefficients, valid = _analysis_local(img, impl)
    e_z = img - _predict_local(img, coefficients)
    if mask_type == "me":
        abs_err = jnp.abs(e_z)
        mask = abs_err / lax.pmax(jnp.max(abs_err), SPACE_AXIS)
    else:
        mask = _nvf_local(img, p)
    u = mask * watermark
    e_u = u - _predict_local(u, coefficients)
    dot = lax.psum(jnp.vdot(e_u, e_z, precision=_HIGHEST), SPACE_AXIS)
    norm_u = lax.psum(jnp.vdot(e_u, e_u, precision=_HIGHEST), SPACE_AXIS)
    norm_z = lax.psum(jnp.vdot(e_z, e_z, precision=_HIGHEST), SPACE_AXIS)
    corr = dot / jnp.sqrt(norm_u * norm_z)
    return jnp.where(valid, corr, 0.0)


def _embed_shard(img: jnp.ndarray, output: jnp.ndarray,
                 watermark: jnp.ndarray, strength_factor_value: float,
                 mask_type: str, p: int, total_pixels: int,
                 impl: str = "xla"):
    if mask_type == "me":
        coefficients, valid = _analysis_local(img, impl)
        e = img - _predict_local(img, coefficients)
        abs_err = jnp.abs(e)
        mask = abs_err / lax.pmax(jnp.max(abs_err), SPACE_AXIS)
    else:
        mask = _nvf_local(img, p)
        valid = jnp.bool_(True)
    u = mask * watermark
    norm_sq = lax.psum(jnp.vdot(u, u, precision=_HIGHEST), SPACE_AXIS)
    strength = strength_factor_value / jnp.sqrt(norm_sq / total_pixels)
    addend = u * strength
    if output.ndim == 3:
        addend = addend[..., None]
    watermarked = jnp.clip(output + addend, 0.0, 255.0)
    watermarked = jnp.where(valid, watermarked, output)
    return watermarked, jnp.where(valid, strength, 0.0)


def make_spatial_detect(mesh, mask_type: str, p: int = 3,
                        impl: str = "xla"):
    """jit-compiled row-sharded detect: (H, W) image, (H, W) W -> scalar.

    impl="pallas" runs the fused Gram kernel per shard (analysis stage).
    """
    row_sharded = P(SPACE_AXIS, None)
    fn = shard_map(
        partial(_detect_shard, mask_type=mask_type, p=p, impl=impl),
        mesh=mesh, in_specs=(row_sharded, row_sharded), out_specs=P(),
        check_vma=False)
    return jax.jit(fn)


def make_spatial_embed(mesh, mask_type: str, strength_factor_value: float,
                       rows: int, cols: int, p: int = 3,
                       channels: bool = False, impl: str = "xla"):
    """jit-compiled row-sharded embed -> (watermarked, strength)."""
    row_sharded = P(SPACE_AXIS, None)
    out_sharded = P(SPACE_AXIS, None, None) if channels else row_sharded
    fn = shard_map(
        partial(_embed_shard, mask_type=mask_type, p=p,
                strength_factor_value=strength_factor_value,
                total_pixels=rows * cols, impl=impl),
        mesh=mesh, in_specs=(row_sharded, out_sharded, row_sharded),
        out_specs=(out_sharded, P()), check_vma=False)
    return jax.jit(fn)


def shard_rows(mesh, image: jnp.ndarray) -> jnp.ndarray:
    """Place an (H, W[, C]) image with rows sharded over the space axis."""
    spec = P(SPACE_AXIS, *([None] * (image.ndim - 1)))
    return jax.device_put(image, NamedSharding(mesh, spec))
