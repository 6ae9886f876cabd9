"""Batched (multi-frame) embed/detect pipelines.

The reference processes video frames one at a time through a single in-order
queue (``/root/reference/Watermark_GPU/main.cpp:319-340``). The TPU-native
equivalent batches frames on a leading axis with ``vmap``: one dispatch embeds
or detects B frames, amortizing host dispatch and keeping the MXU fed — per-
frame Rx/rx solves become one batched 8x8 LU.

These are plain jittable functions; ``BatchedWatermark`` wraps them with the
same engine ergonomics as ``Watermark``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.pipelines import detect_pipeline, embed_pipeline
from .masks import MaskType
from .watermark import Watermark


def batch_embed(images: jnp.ndarray, outputs: jnp.ndarray,
                watermark: jnp.ndarray, strength_factor_value: float,
                mask_type: str, p: int = 3,
                impl: str = "xla") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Embed into (B, H, W[, C]) frames. Watermark matrix is shared.

    The pipelines are natively batch-polymorphic (no vmap), so the Pallas
    strip kernels see the whole batch as one grid.
    """
    return embed_pipeline(images, outputs, watermark, strength_factor_value,
                          mask_type=mask_type, p=p, impl=impl)


def batch_detect(images: jnp.ndarray, watermark: jnp.ndarray,
                 mask_type: str, p: int = 3,
                 impl: str = "xla") -> jnp.ndarray:
    """Detector correlations for (B, H, W) frames -> (B,) scalars."""
    return detect_pipeline(images, watermark, mask_type=mask_type, p=p,
                           impl=impl)


class BatchedWatermark(Watermark):
    """A ``Watermark`` engine whose embed/detect take (B, H, W) frame stacks."""

    def embed(self, images, outputs=None,
              mask_type: "MaskType | str" = MaskType.ME):
        mask_type = MaskType.parse(mask_type)
        self._check_me_window(mask_type)
        images = jnp.asarray(images, dtype=jnp.float32)
        self._check_dims(images[0])
        outputs = images if outputs is None else jnp.asarray(
            outputs, dtype=jnp.float32)
        key = ("batch_embed", mask_type, self.impl)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = jax.jit(partial(batch_embed, mask_type=mask_type.value,
                                 p=self.p, impl=self.impl,
                                 strength_factor_value=self.strength_factor))
            self._fn_cache[key] = fn
        return fn(images, outputs, self.random_matrix)

    def detect(self, images, mask_type: "MaskType | str" = MaskType.ME):
        mask_type = MaskType.parse(mask_type)
        self._check_me_window(mask_type)
        images = jnp.asarray(images, dtype=jnp.float32)
        self._check_dims(images[0])
        key = ("batch_detect", mask_type, self.impl)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = jax.jit(partial(batch_detect, mask_type=mask_type.value,
                                 p=self.p, impl=self.impl))
            self._fn_cache[key] = fn
        return fn(images, self.random_matrix)
