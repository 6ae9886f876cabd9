#!/usr/bin/env python3
"""High-rep timing of the gram partials kernel alone (A/B experiments)."""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from watermarking_gpu_tpu.ops.pallas.common import pad_image  # noqa: E402
from watermarking_gpu_tpu.ops.pallas.fused import pipeline_geometry  # noqa: E402

from bench_util import gram_partials_only  # noqa: E402

ROWS, COLS = 1080, 1920
BATCH = 8


def main():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(np.clip(rng.normal(128, 40, (BATCH, ROWS, COLS)),
                                 0, 255), dtype=jnp.float32)
    pad, strip, rows_padded = pipeline_geometry(ROWS, COLS, "me", 3)
    img_p = jax.device_put(np.asarray(pad_image(frames, pad, rows_padded)))

    def make(k):
        def run(img_p):
            out = jnp.float32(0.0)
            for _ in range(k):
                q = gram_partials_only(img_p + out * 1e-30, ROWS, COLS, pad,
                                       strip, rows_padded)
                out = q[0, 0, 0]
            return out
        return run

    ks, kl = 8, 40
    fns = {k: jax.jit(make(k)) for k in (ks, kl)}
    for k in (ks, kl):
        np.asarray(fns[k](img_p))

    def window(k):
        t0 = time.perf_counter()
        np.asarray(fns[k](img_p))
        return time.perf_counter() - t0

    slopes = sorted((window(kl) - window(ks)) / (kl - ks) for _ in range(8))
    print("per-call ms (sorted):",
          " ".join(f"{1e3 * s:.3f}" for s in slopes))
    print(f"best {1e3 * slopes[0]:.3f} ms/call = "
          f"{1e3 * slopes[0] / BATCH:.4f} ms/frame")


if __name__ == "__main__":
    main()
