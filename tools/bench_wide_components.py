#!/usr/bin/env python3
"""Per-component timing of the WIDE (p>3) fused ME pipeline on the chip.

The r4 open question (VERDICT weak #2): 371/233 fps at p=7/9 1080p — is
that inherent to the ~6x op growth of the 48/80-tap rings, or is there
headroom? This tool times the wide pipeline's components separately so a
per-vreg roofline can be fitted per kernel (docs/PERFORMANCE.md):

  * wide lag-Gram kernel (+ vectorized assembly + SPD solve)
  * fused wide detect tail (e_z ring + mask + u ring + reductions)
  * full detect / embed pipelines (the sweep's round trip halves)

Methodology matches tools/bench_components.py: K chained executions
inside one jit (forced data dependency), closed by one D2H pull; the
(k2-k1) slope cancels the tunnel's fixed sync cost. Run alone on the
chip (no concurrent host load).
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
from watermarking_gpu_tpu.ops.me import (  # noqa: E402
    solve_coefficients_spd_blocked, solve_coefficients_spd_vec)
from watermarking_gpu_tpu.ops.pallas.common import pad_image  # noqa: E402
from watermarking_gpu_tpu.ops.pallas.fused import (  # noqa: E402
    fused_detect_partials_padded, pipeline_geometry)
from watermarking_gpu_tpu.ops.pallas.me_gram_wide import (  # noqa: E402
    _assemble_wide, wide_gram_geometry, wide_gram_partials_padded,
    wide_pad, wide_padded_row_provider)
from watermarking_gpu_tpu.ops.pipelines import (  # noqa: E402
    _fused_analysis, detect_pipeline, embed_pipeline)

ROWS, COLS = 1080, 1920


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--p", type=int, nargs="+", default=[5, 7, 9])
    args = parser.parse_args()
    batch = args.batch

    rng = np.random.default_rng(0)
    frames = jnp.asarray(np.clip(rng.normal(128, 40, (batch, ROWS, COLS)),
                                 0, 255), dtype=jnp.float32)
    wm = jnp.asarray(rng.normal(0, 1, (ROWS, COLS)), dtype=jnp.float32)

    def perturb(x, scalar):
        return x + scalar * 1e-30

    print(f"backend: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind}); batch={batch} "
          f"@ {ROWS}x{COLS}", flush=True)

    for p in args.p:
        k = p * p - 1
        pad, strip, rows_padded = pipeline_geometry(ROWS, COLS, "me", p)
        img_p = jax.device_put(np.asarray(pad_image(frames, pad,
                                                    rows_padded)))
        wm_p = jax.device_put(np.asarray(pad_image(wm, pad, rows_padded)))
        coeffs = jnp.tile(jnp.asarray([1.0 / k] * k, jnp.float32),
                          (batch, 1))

        def make_gram_solve(kk, p=p):
            def run(frames):
                out = jnp.float32(0.0)
                for _ in range(kk):
                    c, _ = _fused_analysis(perturb(frames, out), p)
                    out = jnp.sum(c[:, 0])
                return out
            return jax.jit(run)

        def make_tail(kk, p=p, pad=pad, strip=strip,
                      rows_padded=rows_padded):
            def run(img_p, wm_p, coeffs):
                out = jnp.float32(0.0)
                for _ in range(kk):
                    dot, nu, nz = fused_detect_partials_padded(
                        perturb(img_p, out), wm_p, coeffs, ROWS, COLS,
                        pad, strip, rows_padded, "me", p)
                    out = jnp.sum(dot) + jnp.sum(nu) * 1e-30
                return out
            return jax.jit(run)

        def make_detect(kk, p=p):
            def run(frames, wm):
                out = jnp.float32(0.0)
                for _ in range(kk):
                    corr = detect_pipeline(perturb(frames, out), wm, "me",
                                           p=p, impl="pallas")
                    out = jnp.sum(corr)
                return out
            return jax.jit(run)

        def make_embed(kk, p=p):
            def run(frames, wm):
                out = jnp.float32(0.0)
                for _ in range(kk):
                    marked, s = embed_pipeline(perturb(frames, out), frames,
                                               wm, 30.0, "me", p=p,
                                               impl="pallas")
                    out = jnp.sum(s) + marked[0, 0, 0] * 1e-30
                return out
            return jax.jit(run)

        # finer analysis stages (gap localization: roofline_wide.py found
        # ~1.2 ms/frame at p=7 outside the traced kernels — gram kernel vs
        # assembly vs solve must be separated to name the owner)
        h = p // 2
        wpad = wide_pad(p)
        wg_strip, wg_rows_padded = wide_gram_geometry(ROWS, COLS, p)
        img_wg = jax.device_put(np.asarray(pad_image(frames, wpad,
                                                     wg_rows_padded)))
        partials0 = None
        if p > 3:
            partials0 = wide_gram_partials_padded(
                img_wg, ROWS, COLS, wpad, wg_strip, wg_rows_padded, p)
            partials0 = jax.device_put(np.asarray(partials0))

        def make_gram_kernel(kk, p=p):
            def run(img_wg):
                out = jnp.float32(0.0)
                for _ in range(kk):
                    parts = wide_gram_partials_padded(
                        perturb(img_wg, out), ROWS, COLS, wpad, wg_strip,
                        wg_rows_padded, p)
                    out = jnp.sum(parts[:, 0, 0])
                return out
            return jax.jit(run)

        def make_assembly_solve(kk, p=p):
            def run(partials, img_wg):
                out = jnp.float32(0.0)
                row_of = wide_padded_row_provider(img_wg, wpad, COLS, h)
                for _ in range(kk):
                    gram = _assemble_wide(perturb(partials, out), row_of,
                                          ROWS, COLS, p)
                    c, _ = solve_coefficients_spd_vec(gram[:, :k, :k],
                                                      gram[:, :k, k])
                    out = jnp.sum(c[:, 0])
                return out
            return jax.jit(run)

        rng_s = np.random.default_rng(1)
        g = rng_s.normal(size=(batch, k, k)).astype(np.float32)
        spd = jnp.asarray(g @ np.swapaxes(g, -1, -2)
                          + 4.0 * k * np.eye(k, dtype=np.float32))
        rx0 = jnp.asarray(rng_s.normal(size=(batch, k)).astype(np.float32))

        def make_solve(kk, p=p):
            def run(spd, rx0):
                out = jnp.float32(0.0)
                for _ in range(kk):
                    c, _ = solve_coefficients_spd_vec(
                        spd, perturb(rx0, out))
                    out = jnp.sum(c[:, 0])
                return out
            return jax.jit(run)

        def make_solve_blocked(kk, p=p):
            def run(spd, rx0):
                out = jnp.float32(0.0)
                for _ in range(kk):
                    c, _ = solve_coefficients_spd_blocked(
                        spd, perturb(rx0, out))
                    out = jnp.sum(c[:, 0])
                return out
            return jax.jit(run)

        rows = [
            (f"p={p} wide gram + solve", make_gram_solve, (frames,)),
            (f"p={p} detect tail kernel", make_tail,
             (img_p, wm_p, coeffs)),
            (f"p={p} detect pipeline", make_detect, (frames, wm)),
            (f"p={p} embed pipeline", make_embed, (frames, wm)),
            (f"p={p} solve only (n={k})", make_solve, (spd, rx0)),
            (f"p={p} solve blocked (n={k})", make_solve_blocked,
             (spd, rx0)),
        ]
        if p > 3:
            rows[1:1] = [
                (f"p={p} gram kernel partials", make_gram_kernel,
                 (img_wg,)),
                (f"p={p} assembly + solve", make_assembly_solve,
                 (partials0, img_wg)),
            ]
        for name, maker, arrs in rows:
            per = measure(maker, arrs)
            print(f"{name:28s}: {1e3 * per / batch:8.4f} ms/frame "
                  f"({batch / per:7.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
