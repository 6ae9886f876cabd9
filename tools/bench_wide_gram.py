#!/usr/bin/env python3
"""A/B timing of the generalized-ME (p>3) Gram formulations on the real TPU.

Variants at 1080p (batch 8 by default):
  gram_xla     -- ops/me.py::_gram_lags (lag-decomposed XLA reductions)
  gram_pallas  -- ops/pallas/me_gram_wide.py (one-pass lag kernel + O(1)-op
                  vectorized assembly)
  predict_xla  -- shift-accumulate stencil (ops/me.py::predict_from_padded)
  predict_pal  -- wide-window Pallas predict kernel
  rt_*         -- full embed+detect round trips per impl routing

Two-count slope methodology (tools/bench_util.py). Run sequentially; each
new pallas shape compiles ~2 min through the compile helper.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_util import measure  # noqa: E402

from watermarking_gpu_tpu.ops.me import (  # noqa: E402
    me_normal_equations, prediction_error, solve_coefficients_spd_vec)
from watermarking_gpu_tpu.ops.pallas.me_gram_wide import (  # noqa: E402
    me_normal_equations_wide)
from watermarking_gpu_tpu.ops.pipelines import (  # noqa: E402
    detect_pipeline, embed_pipeline)


def perturb(x, scalar):
    return x + scalar * 1e-30


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--rows", type=int, default=1080)
    parser.add_argument("--cols", type=int, default=1920)
    parser.add_argument("--p", type=int, default=5)
    parser.add_argument("--only", type=str, default="")
    args = parser.parse_args()
    batch, rows, cols, p = args.batch, args.rows, args.cols, args.p

    rng = np.random.default_rng(0)
    frames = jnp.asarray(np.clip(rng.normal(128, 40, (batch, rows, cols)),
                                 0, 255), dtype=jnp.float32)
    wm = jnp.asarray(rng.normal(0, 1, (rows, cols)), dtype=jnp.float32)
    k = p * p - 1
    coeffs = jnp.tile(jnp.full((k,), 1.0 / k, jnp.float32), (batch, 1))

    def make_gram(fn):
        def make(n):
            def run(img):
                out = jnp.float32(0.0)
                for _ in range(n):
                    rx_m, rx_v = fn(perturb(img, out), p)
                    out = jnp.sum(rx_m[:, 0, 0]) + jnp.sum(rx_v[:, 0])
                return out
            return run
        return make

    def make_predict(impl):
        def make(n):
            def run(img):
                out = jnp.float32(0.0)
                for _ in range(n):
                    if impl == "pallas":
                        from watermarking_gpu_tpu.ops.pallas.predict_kernel \
                            import prediction_error_pallas
                        e = prediction_error_pallas(perturb(img, out),
                                                    coeffs, p=p)
                    else:
                        e = prediction_error(perturb(img, out), coeffs, p)
                    out = jnp.sum(e[:, 0, 0])
                return out
            return run
        return make

    def make_rt(impl):
        def make(n):
            def run(img):
                out = jnp.float32(0.0)
                for _ in range(n):
                    marked, s = embed_pipeline(perturb(img, out), img, wm,
                                               2.55, "me", p=p, impl=impl)
                    corr = detect_pipeline(marked, wm, "me", p=p, impl=impl)
                    out = jnp.sum(corr) + jnp.sum(s) * 1e-30
                return out
            return run
        return make

    variants = {
        "gram_xla": make_gram(me_normal_equations),
        "gram_pallas": make_gram(me_normal_equations_wide),
        "predict_xla": make_predict("xla"),
        "predict_pallas": make_predict("pallas"),
        "rt_xla": make_rt("xla"),
        "rt_pallas": make_rt("pallas"),
    }
    for name, make in variants.items():
        if args.only and args.only not in name:
            continue
        sec = measure(make, (frames,), k_small=4, k_large=16, reps=4)
        per_frame = sec / batch * 1e3
        print(f"{name:16s} {sec * 1e3:8.3f} ms/call  {per_frame:7.4f} "
              f"ms/frame  {1e3 / per_frame:8.1f} fps", flush=True)


if __name__ == "__main__":
    main()
