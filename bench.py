#!/usr/bin/env python3
"""Headline benchmark: embed+detect throughput at 1080p on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

The measured step is the full flagship round trip per frame — ME-mask embed
into the frame, then ME detection on the watermarked frame — matching the
reference's benchmark surface (``/root/reference/Watermark_GPU/main.cpp:
175-223``: embed timing + detect timing at the configured resolution).

``vs_baseline`` is the ratio against the 1000 FPS north-star target from
BASELINE.md (the reference publishes no numbers of its own).

Methodology: chained batched steps (each step's watermarked output feeds the
next step's input, forcing sequential device execution) closed by a real D2H
pull of the correlations, at two iteration counts — the slope isolates
per-step device time from the harness's fixed tunnel round-trip cost
(~30 ms per host sync on this setup; block_until_ready alone does not wait
until a D2H channel exists).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from watermarking_gpu_tpu.io import load_image_gray  # noqa: E402
from watermarking_gpu_tpu.io.matfile import generate_watermark  # noqa: E402
from watermarking_gpu_tpu.models.batched import (batch_detect,  # noqa: E402
                                                 batch_embed)
from watermarking_gpu_tpu.models.watermark import default_impl  # noqa: E402
from watermarking_gpu_tpu.ops import strength_factor  # noqa: E402

ROWS, COLS = 1080, 1920
BATCH = 8
ITERS_SMALL = 8
ITERS_LARGE = 40
TARGET_FPS = 1000.0  # BASELINE.md north star
SAMPLE_1080P = "/root/reference/Watermark_GPU/samples/images/1080p.png"


def _probe_devices(timeout_s: float = 180.0) -> None:
    """Fail fast when the device backend is unreachable.

    On this harness the TPU sits behind a network tunnel; when it is down,
    backend discovery blocks indefinitely inside the plugin rather than
    raising. Probe it on a side thread and emit one diagnostic JSON line
    (still machine-parseable) + exit 2 instead of hanging the driver.
    """
    import threading

    holder: dict = {}

    def probe():
        try:
            holder["n"] = len(jax.devices())
        except Exception as exc:  # backend raised cleanly
            holder["error"] = repr(exc)

    thread = threading.Thread(target=probe, daemon=True)
    thread.start()
    thread.join(timeout_s)
    if "n" in holder:
        return
    reason = holder.get(
        "error", f"device discovery timed out after {timeout_s:.0f}s "
                 f"(TPU tunnel down?)")
    print(json.dumps({"metric": "embed_detect_1080p_me", "value": None,
                      "unit": "fps", "vs_baseline": None, "error": reason}),
          flush=True)
    os._exit(2)


def load_frames() -> np.ndarray:
    if os.path.exists(SAMPLE_1080P):
        base = load_image_gray(SAMPLE_1080P)
    else:
        rng = np.random.default_rng(0)
        base = np.clip(rng.normal(128, 40, size=(ROWS, COLS)), 0,
                       255).astype(np.float32)
    # perturb each frame slightly so per-frame solves are not identical
    rng = np.random.default_rng(1)
    jitter = rng.normal(0, 1, size=(BATCH, 1, 1)).astype(np.float32)
    return np.clip(base[None] + jitter, 0, 255).astype(np.float32)


def main() -> int:
    global BATCH
    parser = argparse.ArgumentParser()
    parser.add_argument("--profile", default="",
                        help="capture a jax.profiler trace into this dir")
    parser.add_argument("--batch", type=int, default=BATCH,
                        help="frames per dispatch")
    parser.add_argument("--cache-dir", default=None,
                        help="persistent compile cache ('' disables; "
                             "default: per-user temp dir); compiles happen "
                             "before the timed windows, so this only saves "
                             "wall time")
    args = parser.parse_args()
    BATCH = args.batch
    _probe_devices()
    if args.cache_dir != "":
        from watermarking_gpu_tpu.utils import (default_cache_dir,
                                                enable_compilation_cache)
        enable_compilation_cache(args.cache_dir or default_cache_dir())
    impl = default_impl()
    frames = jax.device_put(load_frames())
    watermark = jax.device_put(
        generate_watermark(ROWS, COLS, seed=28390211).astype(np.float32))
    sf = strength_factor(40.0)
    # engine-style call-invariant padded watermark (pad copy paid once,
    # not inside every step — what Watermark/BatchedWatermark also do)
    from watermarking_gpu_tpu.ops.pipelines import precompute_padded_watermark
    wm_p = (precompute_padded_watermark(watermark, "me")
            if impl == "pallas" else None)

    @jax.jit
    def step(frames_in, wm):
        watermarked, _ = batch_embed(frames_in, frames_in, wm, sf, "me",
                                     impl=impl, watermark_padded=wm_p)
        return watermarked, batch_detect(watermarked, wm, "me", impl=impl,
                                         watermark_padded=wm_p)

    # warm-up: compile + establish the harness's D2H channel
    marked, corr = step(frames, watermark)
    np.asarray(corr)

    def run(iters: int) -> tuple[float, np.ndarray]:
        f = frames
        out = None
        t0 = time.perf_counter()
        for _ in range(iters):
            f, out = step(f, watermark)
        pulled = np.asarray(out)  # D2H pull waits for the whole chain
        return time.perf_counter() - t0, pulled

    run(2)  # stabilize
    from watermarking_gpu_tpu.utils.profiling import trace
    # slope of per-count minima: tunnel stalls only ever ADD time, so the
    # min over repeats is the cleanest sample per window, and sloping the
    # minima cancels the fixed sync cost without min-of-slopes' bias (a
    # stall in one small window would fake a too-good slope)
    smalls, larges = [], []
    corrs = None
    with trace(args.profile or None):
        for _ in range(3):
            smalls.append(run(ITERS_SMALL)[0])
            t_large, corrs = run(ITERS_LARGE)
            larges.append(t_large)
    t_small = min(smalls)
    per_step = (min(larges) - t_small) / (ITERS_LARGE - ITERS_SMALL)
    fps = BATCH / per_step

    result = {
        "metric": "embed_detect_fps_1080p_me",
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": round(fps / TARGET_FPS, 3),
        "detail": {
            "impl": impl,
            "batch": BATCH,
            "ms_per_frame": round(1e3 * per_step / BATCH, 4),
            "fixed_sync_overhead_ms": round(
                1e3 * (t_small - ITERS_SMALL * per_step), 1),
            "mean_correlation": round(float(corrs.mean()), 4),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
