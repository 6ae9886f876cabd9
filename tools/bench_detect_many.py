#!/usr/bin/env python3
"""A/B timing of detect_many (watermark identification) on the real TPU.

Variants at 512^2, N=64 candidates (the VERDICT r2 target case):
  xla     -- shared-analysis XLA formulation (materializes (N, H, W) u/e_u)
  pallas  -- fused multi-candidate kernel (one strip pass per nc-candidate
             chunk; e_z/mask computed once, image read N/nc times)
  loop    -- N independent full detections (the reference's only option,
             Watermark.cpp:234-250) — the amortization baseline

Two-count slope methodology (tools/bench_util.py). Run without concurrent
host load.
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

from watermarking_gpu_tpu.ops.pipelines import (  # noqa: E402
    detect_many_pipeline, detect_pipeline)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=512)
    parser.add_argument("--cols", type=int, default=512)
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--mask", type=str, default="me")
    parser.add_argument("--p", type=int, default=3)
    parser.add_argument("--only", type=str, default="")
    parser.add_argument("--skip-loop", action="store_true")
    args = parser.parse_args()
    rows, cols, n = args.rows, args.cols, args.n

    rng = np.random.default_rng(0)
    img = jnp.asarray(np.clip(rng.normal(128, 40, (rows, cols)), 0, 255),
                      dtype=jnp.float32)
    bank = jnp.asarray(rng.normal(0, 1, (n, rows, cols)), dtype=jnp.float32)

    def make_many(impl):
        def make(k):
            def run(image, wms):
                out = jnp.float32(0.0)
                for _ in range(k):
                    corr = detect_many_pipeline(image + out * 1e-30, wms,
                                                args.mask, p=args.p,
                                                impl=impl)
                    out = jnp.sum(corr)
                return out
            return run
        return make

    def make_loop(k):
        def run(image, wms):
            out = jnp.float32(0.0)
            for _ in range(k):
                acc = jnp.float32(0.0)
                for c in range(n):
                    acc = acc + detect_pipeline(image + out * 1e-30,
                                                wms[c], args.mask,
                                                p=args.p, impl="pallas")
                out = acc
            return out
        return run

    variants = {"xla": make_many("xla"), "pallas": make_many("pallas")}
    results = {}
    for name, make in variants.items():
        if args.only and args.only not in name:
            continue
        sec = measure(make, (img, bank), k_small=4, k_large=16, reps=6)
        results[name] = sec
        print(f"{name:8s} {sec * 1e3:9.3f} ms/dispatch  "
              f"{sec * 1e6 / n:8.2f} us/candidate", flush=True)
    if not args.skip_loop and not args.only:
        # the looped baseline compiles n inlined detects — one (k_small,
        # k_large) pair is plenty (and keeps compile-helper load sane)
        sec = measure(make_loop, (img, bank), k_small=1, k_large=2, reps=5)
        results["loop"] = sec
        print(f"{'loop':8s} {sec * 1e3:9.3f} ms/dispatch  "
              f"{sec * 1e6 / n:8.2f} us/candidate", flush=True)
    if "xla" in results and "pallas" in results:
        print(f"fused speedup vs xla: {results['xla'] / results['pallas']:.2f}x")
    if "loop" in results and "pallas" in results:
        print(f"fused speedup vs loop: {results['loop'] / results['pallas']:.2f}x")


if __name__ == "__main__":
    main()
