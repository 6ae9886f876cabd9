#!/usr/bin/env python3
"""A/B the wide Gram's RAW (VMEM-staged halos) vs PADDED (XLA edge-pad)
formulations end to end, including the pad cost the padded path pays.

Motivated by the r5 component decomposition (tools/bench_wide_components.py):
at 1080p p=7 the full `_fused_analysis` (raw route) measured 0.93 ms/frame
while the padded kernel + assembly + solve measured 0.41 — the opposite of
the p=3 result where raw mode *removed* a bandwidth-bound pad. This tool
measures both complete routes so `me_gram_wide` can route on evidence.

Two-count slope methodology (tools/bench_util.py). Run alone on the chip.
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

from watermarking_gpu_tpu.ops.me import solve_coefficients_spd_vec  # noqa: E402
from watermarking_gpu_tpu.ops.pallas.common import pad_image  # noqa: E402
from watermarking_gpu_tpu.ops.pallas.me_gram_wide import (  # noqa: E402
    me_gram_wide_padded, me_gram_wide_raw, wide_gram_geometry, wide_pad)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--rows", type=int, default=1080)
    parser.add_argument("--cols", type=int, default=1920)
    parser.add_argument("--p", type=int, nargs="+", default=[5, 7, 9])
    parser.add_argument("--solve", action="store_true",
                        help="include the SPD solve in both routes")
    args = parser.parse_args()
    batch, rows, cols = args.batch, args.rows, args.cols

    rng = np.random.default_rng(0)
    frames = jnp.asarray(np.clip(rng.normal(128, 40, (batch, rows, cols)),
                                 0, 255), dtype=jnp.float32)

    def perturb(x, scalar):
        return x + scalar * 1e-30

    print(f"backend: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind}); batch={batch} "
          f"@ {rows}x{cols}", flush=True)

    for p in args.p:
        k = p * p - 1
        pad = wide_pad(p)
        strip, rows_padded = wide_gram_geometry(rows, cols, p)

        def finish(gram):
            if args.solve:
                c, _ = solve_coefficients_spd_vec(gram[:, :k, :k],
                                                  gram[:, :k, k])
                return jnp.sum(c[:, 0])
            return jnp.sum(gram[:, 0, 0])

        def make_raw(kk, p=p, pad=pad, strip=strip,
                     rows_padded=rows_padded):
            def run(frames):
                out = jnp.float32(0.0)
                for _ in range(kk):
                    gram = me_gram_wide_raw(perturb(frames, out), rows,
                                            cols, pad, strip, rows_padded,
                                            p)
                    out = finish(gram)
                return out
            return jax.jit(run)

        def make_padded(kk, p=p, pad=pad, strip=strip,
                        rows_padded=rows_padded):
            def run(frames):
                out = jnp.float32(0.0)
                for _ in range(kk):
                    img_p = pad_image(perturb(frames, out), pad,
                                      rows_padded)
                    gram = me_gram_wide_padded(img_p, rows, cols, pad,
                                               strip, rows_padded, p)
                    out = finish(gram)
                return out
            return jax.jit(run)

        for name, maker in [(f"p={p} gram raw   (pad={pad})", make_raw),
                            (f"p={p} gram padded(pad={pad})", make_padded)]:
            per = measure(maker, (frames,))
            print(f"{name:28s}: {1e3 * per / batch:8.4f} ms/frame "
                  f"({batch / per:7.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
