#!/usr/bin/env python3
"""Finer breakdown: pad cost, gram kernel vs XLA assembly, embed AXPY tail."""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from watermarking_gpu_tpu.ops.pallas import me_kernel as mk  # noqa: E402
from watermarking_gpu_tpu.ops.pallas.common import pad_image  # noqa: E402
from watermarking_gpu_tpu.ops.pallas.fused import pipeline_geometry  # noqa: E402

from bench_util import gram_partials_only, measure  # noqa: E402

ROWS, COLS = 1080, 1920
BATCH = 8


def main():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(np.clip(rng.normal(128, 40, (BATCH, ROWS, COLS)),
                                 0, 255), dtype=jnp.float32)
    pad, strip, rows_padded = pipeline_geometry(ROWS, COLS, "me", 3)
    img_p = jax.device_put(np.asarray(pad_image(frames, pad, rows_padded)))
    partials = jax.device_put(np.asarray(
        jax.jit(gram_partials_only, static_argnums=(1, 2, 3, 4, 5))(
            img_p, ROWS, COLS, pad, strip, rows_padded)))

    def perturb(x, s):
        return x + s * 1e-30

    def make_pad(k):
        def run(frames):
            out = jnp.float32(0.0)
            for _ in range(k):
                p = pad_image(perturb(frames, out), pad, rows_padded)
                out = p[0, 0, 0] + p[-1, -1, -1]
            return out
        return run

    def make_partials(k):
        def run(img_p):
            out = jnp.float32(0.0)
            for _ in range(k):
                q = gram_partials_only(perturb(img_p, out), ROWS, COLS, pad,
                                       strip, rows_padded)
                out = q[0, 0, 0]
            return out
        return run

    def make_assembly(k):
        def run(partials, img_p):
            out = jnp.float32(0.0)
            row_of = mk.padded_row_provider(img_p, pad, COLS)
            for _ in range(k):
                gram = mk._assemble_gram(perturb(partials, out), row_of,
                                         ROWS, COLS)
                out = jnp.sum(gram[:, 0, 0])
            return out
        return run

    def make_axpy(k):
        def run(frames, u_raw):
            out = jnp.float32(0.0)
            for _ in range(k):
                marked = jnp.clip(frames + (1e-8 + out) * u_raw, 0.0, 255.0)
                out = marked[0, 0, 0]
            return out
        return run

    cases = [
        ("pad_image (B,1080,1920)", make_pad, (frames,), 32, 160),
        ("gram partials kernel", make_partials, (img_p,), 4, 16),
        ("gram XLA assembly", make_assembly, (partials, img_p), 32, 160),
        ("embed AXPY+clip tail", make_axpy, (frames, frames), 32, 160),
    ]
    for name, make_fn, fn_args, ks, kl in cases:
        per_call = measure(make_fn, fn_args, k_small=ks, k_large=kl)
        print(f"{name:28s} {1e3 * per_call:8.3f} ms/call "
              f"{1e3 * per_call / BATCH:7.4f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
