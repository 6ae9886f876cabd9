#!/usr/bin/env python3
"""Per-component timing of the fused 1080p ME pipeline on the real TPU.

Each component runs K times inside one jit with a forced data dependency
(a zero-scaled scalar feeds back into the input), so the measured window is
K sequential executions closed by one D2H pull; two iteration counts give a
slope that cancels the tunnel's fixed sync cost. Used to decide where the
round-trip's remaining time lives (docs/PERFORMANCE.md).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_util import measure  # noqa: E402
from watermarking_gpu_tpu.ops.me import solve_coefficients_spd  # noqa: E402
from watermarking_gpu_tpu.ops.pallas.common import pad_image
from watermarking_gpu_tpu.ops.pallas.fused import (
    fused_detect_partials_padded, fused_embed_field_padded,
    pipeline_geometry)
from watermarking_gpu_tpu.ops.pallas.me_kernel import me_gram_padded
from watermarking_gpu_tpu.ops.pipelines import detect_pipeline, embed_pipeline

ROWS, COLS = 1080, 1920
BATCH = 8


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=BATCH)
    args = parser.parse_args()
    batch = args.batch

    rng = np.random.default_rng(0)
    frames = jnp.asarray(np.clip(rng.normal(128, 40, (batch, ROWS, COLS)),
                                 0, 255), dtype=jnp.float32)
    wm = jnp.asarray(rng.normal(0, 1, (ROWS, COLS)), dtype=jnp.float32)
    pad, strip, rows_padded = pipeline_geometry(ROWS, COLS, "me", 3)
    img_p = jax.device_put(np.asarray(pad_image(frames, pad, rows_padded)))
    wm_p = jax.device_put(np.asarray(pad_image(wm, pad, rows_padded)))
    coeffs = jnp.tile(jnp.asarray([0.1] * 8, jnp.float32), (batch, 1))

    def perturb(x, scalar):  # forces sequential dependency, adds ~1 VPU op
        return x + scalar * 1e-30

    def make_gram(k):
        def run(img_p):
            out = jnp.float32(0.0)
            for _ in range(k):
                gram = me_gram_padded(perturb(img_p, out), ROWS, COLS, pad,
                                      strip, rows_padded)
                out = jnp.sum(gram[:, 0, 0])
            return out
        return run

    def make_gram_raw(k):
        from watermarking_gpu_tpu.ops.pallas.common import RAW_PAD
        from watermarking_gpu_tpu.ops.pallas.me_kernel import me_gram_raw

        def run(frames):
            out = jnp.float32(0.0)
            for _ in range(k):
                gram = me_gram_raw(perturb(frames, out), ROWS, COLS,
                                   RAW_PAD, strip, rows_padded)
                out = jnp.sum(gram[:, 0, 0])
            return out
        return run

    def make_solve(k):
        def run(img_p):
            gram = me_gram_padded(img_p, ROWS, COLS, pad, strip, rows_padded)
            out = jnp.float32(0.0)
            for _ in range(k):
                c, _ = solve_coefficients_spd(
                    perturb(gram[:, :8, :8], out), gram[:, :8, 8])
                out = jnp.sum(c)
            return out
        return run

    def make_tail(k):
        def run(img_p, wm_p, coeffs):
            out = jnp.float32(0.0)
            for _ in range(k):
                dot, nu, nz = fused_detect_partials_padded(
                    perturb(img_p, out), wm_p, coeffs, ROWS, COLS, pad,
                    strip, rows_padded, "me", 3)
                out = jnp.sum(dot / jnp.sqrt(nu * nz))
            return out
        return run

    def make_field(k):
        def run(img_p, wm_p, coeffs):
            out = jnp.float32(0.0)
            for _ in range(k):
                u_raw, su2, me_ = fused_embed_field_padded(
                    perturb(img_p, out), wm_p, coeffs, ROWS, COLS, pad,
                    strip, rows_padded, "me", 3)
                out = jnp.sum(su2) + u_raw[0, 0, 0]
            return out
        return run

    def make_embed(k):
        def run(frames, wm):
            out = jnp.float32(0.0)
            for _ in range(k):
                marked, s = embed_pipeline(perturb(frames, out), frames, wm,
                                           2.55, "me", impl="pallas")
                out = jnp.sum(s) + marked[0, 0, 0]
            return out
        return run

    def make_detect(k):
        def run(frames, wm):
            out = jnp.float32(0.0)
            for _ in range(k):
                corr = detect_pipeline(perturb(frames, out), wm, "me",
                                       impl="pallas")
                out = jnp.sum(corr)
            return out
        return run

    cases = [
        ("gram kernel + assembly", make_gram, (img_p,)),
        ("gram raw (VMEM-staged halo)", make_gram_raw, (frames,)),
        ("spd solve", make_solve, (img_p,)),
        ("detect tail kernel", make_tail, (img_p, wm_p, coeffs)),
        ("embed field kernel", make_field, (img_p, wm_p, coeffs)),
        ("full embed pipeline", make_embed, (frames, wm)),
        ("full detect pipeline", make_detect, (frames, wm)),
    ]
    for name, make_fn, fn_args in cases:
        per_call = measure(make_fn, fn_args)
        print(f"{name:28s} {1e3 * per_call:8.3f} ms/call "
              f"{1e3 * per_call / batch:7.4f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
