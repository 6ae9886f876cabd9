"""Frame-parallel (DP) embed/detect over a device mesh.

Independent video frames shard across the ``data`` mesh axis; XLA runs the
batched pipeline on each chip's shard with no cross-chip communication (the
per-frame 8x8 solves and scalar reductions are frame-local). This is the
TPU-native scaling story for the reference's sequential frame loop
(``/root/reference/Watermark_GPU/main.cpp:319-340``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.batched import batch_detect, batch_embed
from .mesh import DATA_AXIS


def shard_frames(mesh, frames: jnp.ndarray) -> jnp.ndarray:
    """Place a (B, H, W[, C]) stack with B sharded over the data axis."""
    spec = P(DATA_AXIS, *([None] * (frames.ndim - 1)))
    return jax.device_put(frames, NamedSharding(mesh, spec))


def replicate(mesh, value: jnp.ndarray) -> jnp.ndarray:
    """Replicate an array (e.g. the watermark matrix) on every device."""
    return jax.device_put(value, NamedSharding(mesh, P()))


def make_dp_detect(mesh, mask_type: str, p: int = 3, impl: str = "xla"):
    """jit-compiled frame-sharded detect: (B, H, W), W -> (B,) correlations."""
    frame_spec = NamedSharding(mesh, P(DATA_AXIS, None, None))
    out_spec = NamedSharding(mesh, P(DATA_AXIS))
    fn = partial(batch_detect, mask_type=mask_type, p=p, impl=impl)
    return jax.jit(fn,
                   in_shardings=(frame_spec, NamedSharding(mesh, P())),
                   out_shardings=out_spec)


def make_dp_embed(mesh, mask_type: str, strength_factor_value: float,
                  p: int = 3, impl: str = "xla", channels: bool = False):
    """jit-compiled frame-sharded embed.

    (B, H, W) images + (B, H, W[, C]) outputs -> watermarked stack + (B,)
    strengths, all frame-sharded.
    """
    img_spec = NamedSharding(mesh, P(DATA_AXIS, None, None))
    out_dims = (DATA_AXIS, None, None, None) if channels else \
        (DATA_AXIS, None, None)
    out_spec = NamedSharding(mesh, P(*out_dims))
    fn = partial(batch_embed, mask_type=mask_type, p=p, impl=impl,
                 strength_factor_value=strength_factor_value)
    return jax.jit(fn,
                   in_shardings=(img_spec, out_spec, NamedSharding(mesh, P())),
                   out_shardings=(out_spec, NamedSharding(mesh, P(DATA_AXIS))))
