#!/usr/bin/env python3
"""On-chip campaign for the wide (ME p>3) fused-tail strip budgets.

r3 VERDICT item 8: the p=7/9 tail budgets (``fused.TAIL_BUDGET_WIDE``)
force 32/16-row strips at 1080p — 1.3-2x halo re-read overhead. Two levers,
both measured here on the real chip:

1. re-bisect the budget ceiling as-is (the constants carry safety margin);
2. ``--bf16``: flip ``fused.WIDE_TAIL_BF16`` (bf16 staging of the tail's
   e_z/u ring planes, tolerance pinned CPU-side by
   tests/test_pallas.py::test_wide_tail_bf16_ring_tolerance) and re-bisect
   — if the ring really dominates the live set, the ceiling should rise
   substantially; then measure the end-to-end fps at the raised budget.

Run sequentially on the chip (each compile ~1-2 min through the remote
helper):

    timeout 3600 python tools/calibrate_wide_tail.py --p 7 9
    timeout 3600 python tools/calibrate_wide_tail.py --p 7 9 --bf16

Then update TAIL_BUDGET_WIDE (and decide whether WIDE_TAIL_BF16 defaults
on) with the measured numbers, and record the fps in BENCH_SWEEP /
docs/PERFORMANCE.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import watermarking_gpu_tpu.ops.pallas.fused as fused  # noqa: E402


def try_compile(budget: int, rows: int, cols: int, p: int) -> tuple[bool, str]:
    """Compile the fused DETECT pipeline with ``budget`` as the p's tail
    numerator (the detect tail is the deepest of the fused kernels)."""
    from watermarking_gpu_tpu.ops.pipelines import detect_pipeline

    old = fused.TAIL_BUDGET_WIDE[p]
    fused.TAIL_BUDGET_WIDE[p] = budget
    try:
        _, strip, _ = fused.pipeline_geometry(rows, cols, "me", p)
        fn = jax.jit(lambda i, w: detect_pipeline(i, w, "me", p=p,
                                                  impl="pallas"))
        t0 = time.time()
        fn.lower(jax.ShapeDtypeStruct((rows, cols), jnp.float32),
                 jax.ShapeDtypeStruct((rows, cols), jnp.float32)).compile()
        return True, f"strip={strip} compile={time.time() - t0:.0f}s"
    except Exception as exc:
        msg = str(exc)
        if "vmem" in msg.lower() or "scoped" in msg.lower():
            return False, f"scoped-vmem overflow: {msg.splitlines()[0][:120]}"
        raise
    finally:
        fused.TAIL_BUDGET_WIDE[p] = old


def bisect(rows: int, cols: int, p: int, cap: int,
           step: int = 8_000) -> int:
    lo = fused.TAIL_BUDGET_WIDE[p]
    ok, detail = try_compile(lo, rows, cols, p)
    print(f"  budget={lo:>7}: {'ok' if ok else 'FAIL'} ({detail})",
          flush=True)
    if not ok:
        raise SystemExit("current budget overflows?! recalibrate from low")
    hi = None
    while hi is None and lo < cap:
        candidate = min(lo * 2, cap)
        ok, detail = try_compile(candidate, rows, cols, p)
        print(f"  budget={candidate:>7}: {'ok' if ok else 'FAIL'} "
              f"({detail})", flush=True)
        if ok:
            lo = candidate
            if candidate == cap:
                return cap
        else:
            hi = candidate
    while hi is not None and hi - lo > step:
        mid = (lo + hi) // 2 // step * step
        if mid in (lo, hi):
            break
        ok, detail = try_compile(mid, rows, cols, p)
        print(f"  budget={mid:>7}: {'ok' if ok else 'FAIL'} ({detail})",
              flush=True)
        if ok:
            lo = mid
        else:
            hi = mid
    return lo


def measure_fps(rows: int, cols: int, p: int, budget: int) -> float:
    """Two-count-slope ms/frame of the embed+detect round trip at the
    given budget (benchmarks.measure_roundtrip methodology)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import benchmarks

    from watermarking_gpu_tpu.io.matfile import generate_watermark

    old = fused.TAIL_BUDGET_WIDE[p]
    fused.TAIL_BUDGET_WIDE[p] = budget
    try:
        rng = np.random.default_rng(0)
        frames = np.clip(rng.normal(128, 40, (8, rows, cols)), 0,
                         255).astype(np.float32)
        wm = generate_watermark(rows, cols, 28390211).astype(np.float32)
        row = benchmarks.measure_roundtrip(frames, wm, "me", "pallas",
                                           (6, 24), p=p)
        return row
    finally:
        fused.TAIL_BUDGET_WIDE[p] = old


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=1080)
    parser.add_argument("--cols", type=int, default=1920)
    parser.add_argument("--p", type=int, nargs="+", default=[7, 9])
    parser.add_argument("--cap", type=int, default=640_000)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--measure", action="store_true",
                        help="also measure round-trip fps at the found "
                             "ceiling (minus 10%% margin)")
    args = parser.parse_args()

    if args.bf16:
        fused.WIDE_TAIL_BF16 = True
    print(f"backend: {jax.default_backend()} bf16_ring={fused.WIDE_TAIL_BF16}",
          flush=True)
    for p in args.p:
        print(f"p={p} @ {args.rows}x{args.cols} "
              f"(current {fused.TAIL_BUDGET_WIDE[p]}):", flush=True)
        best = bisect(args.rows, args.cols, p, args.cap)
        safe = int(best * 0.9) // 8000 * 8000
        print(f"  -> ceiling {best}; suggested TAIL_BUDGET_WIDE[{p}] = "
              f"{safe}", flush=True)
        if args.measure:
            row = measure_fps(args.rows, args.cols, p, safe)
            print(f"  round trip at {safe}: {row}", flush=True)


if __name__ == "__main__":
    main()
