#!/usr/bin/env python3
"""Finer breakdown: pad cost, gram kernel vs XLA assembly, embed AXPY tail."""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from watermarking_gpu_tpu.ops.pallas import me_kernel as mk  # noqa: E402
from watermarking_gpu_tpu.ops.pallas.common import (  # noqa: E402
    interpret_mode, pad_image)
from watermarking_gpu_tpu.ops.pallas.fused import pipeline_geometry  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

ROWS, COLS = 1080, 1920
BATCH = 8


def measure(make_fn, args, k_small=4, k_large=16, reps=3):
    fns = {}
    for k in (k_small, k_large):
        fns[k] = jax.jit(make_fn(k))
        np.asarray(jax.tree.leaves(fns[k](*args))[-1])

    def window(k):
        t0 = time.perf_counter()
        out = fns[k](*args)
        np.asarray(jax.tree.leaves(out)[-1])
        return time.perf_counter() - t0

    return min((window(k_large) - window(k_small)) / (k_large - k_small)
               for _ in range(reps))


def gram_partials_only(img_p, rows, cols, pad, strip, rows_padded):
    batch = img_p.shape[0]
    return pl.pallas_call(
        partial(mk._me_gram_kernel, pad=pad, strip=strip, width=cols,
                rows=rows, masked=rows_padded != rows),
        grid=(batch, rows_padded // strip),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(strip + 2 * pad),
             pl.Element(cols + 2 * pad)),
            lambda b, i: (b, i * strip, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, cols + 2), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 16, cols + 2), jnp.float32),
        interpret=interpret_mode(),
    )(img_p)


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
            for _ in range(k):
                gram = mk._assemble_gram(perturb(partials, out), img_p,
                                         ROWS, COLS, pad)
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
