"""Clamp-to-edge neighborhood primitives shared by all masks.

The reference reads pixels through an OpenCL image2d sampler configured with
``CLK_ADDRESS_CLAMP_TO_EDGE`` (``/root/reference/Watermark_GPU/kernels/nvf.hpp:9``,
``me_p3.hpp:45``, ``scaled_neighbors_p3.hpp:14``). The TPU-native equivalent is
``jnp.pad(..., mode="edge")`` once per pass plus static slices, which XLA fuses
into the consuming computation.

Neighbor ordering is the row-major scan of the 3x3 window excluding the center
(top-left, top, top-right, left, right, bottom-left, bottom, bottom-right),
matching the coefficient order consumed by the reference prediction kernel
(``scaled_neighbors_p3.hpp:35-42``) and produced by the ``me`` kernel
(``me_p3.hpp:46-54``).

All ops here are batch-polymorphic: images are (..., H, W) with any number of
leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

# (row offset, col offset) for the 8 neighbors of a 3x3 window, row-major,
# center excluded. Index k here corresponds to coeffs[k] in the reference.
NEIGHBOR_OFFSETS: tuple[tuple[int, int], ...] = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 1),
    (1, -1), (1, 0), (1, 1),
)

NUM_NEIGHBORS = len(NEIGHBOR_OFFSETS)  # p*p - 1 with p=3


def pad_edge(image: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Replicate-pad the last two dims of (..., H, W) by `halo` pixels."""
    widths = [(0, 0)] * (image.ndim - 2) + [(halo, halo), (halo, halo)]
    return jnp.pad(image, widths, mode="edge")


def neighbor_stack_from_padded(padded: jnp.ndarray, rows: int,
                               cols: int) -> jnp.ndarray:
    """(..., rows+2, cols+2) halo-extended -> (..., 8, rows, cols) neighbors.

    Used directly by the spatially-sharded path, where the row halo comes
    from a ppermute exchange instead of local edge padding.
    """
    return jnp.stack(
        [padded[..., 1 + dr : 1 + dr + rows, 1 + dc : 1 + dc + cols]
         for dr, dc in NEIGHBOR_OFFSETS],
        axis=-3,
    )


def neighbor_stack(image: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., 8, H, W) clamp-to-edge 3x3 neighbor stack."""
    rows, cols = image.shape[-2:]
    return neighbor_stack_from_padded(pad_edge(image, 1), rows, cols)
