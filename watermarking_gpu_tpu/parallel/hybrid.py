"""Hybrid DP x SP: a batch of frames sharded over the ``data`` axis with each
frame's rows sharded over the ``space`` axis.

This is the framework's full multi-chip step: within a space group the
stencil halos ride ICI via ppermute and the scalar reductions psum; across
data groups frames are independent. ``vmap`` maps the per-shard spatial
kernels over the local frame sub-batch — collective axes are unaffected by
the batching transform.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, SPACE_AXIS
from .spatial import _detect_shard, _embed_shard, shard_map


def make_hybrid_detect(mesh, mask_type: str, p: int = 3):
    """(B, H, W) frames + (H, W) watermark -> (B,) correlations.

    B shards over data, H over space; the watermark is row-sharded and shared
    across the batch.
    """
    per_frame = jax.vmap(partial(_detect_shard, mask_type=mask_type, p=p),
                         in_axes=(0, None))
    fn = shard_map(per_frame, mesh=mesh,
                   in_specs=(P(DATA_AXIS, SPACE_AXIS, None),
                             P(SPACE_AXIS, None)),
                   out_specs=P(DATA_AXIS), check_vma=False)
    return jax.jit(fn)


def make_hybrid_embed(mesh, mask_type: str, strength_factor_value: float,
                      rows: int, cols: int, p: int = 3):
    """(B, H, W) frames -> (watermarked (B, H, W), strengths (B,))."""
    per_frame = jax.vmap(
        partial(_embed_shard, mask_type=mask_type, p=p,
                strength_factor_value=strength_factor_value,
                total_pixels=rows * cols),
        in_axes=(0, 0, None))
    fn = shard_map(per_frame, mesh=mesh,
                   in_specs=(P(DATA_AXIS, SPACE_AXIS, None),
                             P(DATA_AXIS, SPACE_AXIS, None),
                             P(SPACE_AXIS, None)),
                   out_specs=(P(DATA_AXIS, SPACE_AXIS, None), P(DATA_AXIS)),
                   check_vma=False)
    return jax.jit(fn)


def shard_hybrid(mesh, frames: jnp.ndarray) -> jnp.ndarray:
    """Place (B, H, W) with B over data and H over space."""
    return jax.device_put(
        frames, NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None)))


def shard_watermark(mesh, watermark: jnp.ndarray) -> jnp.ndarray:
    """Row-shard the (H, W) watermark over the space axis."""
    return jax.device_put(
        watermark, NamedSharding(mesh, P(SPACE_AXIS, None)))
