#!/usr/bin/env python3
"""On-chip compile-verification campaign for the chunked multi-candidate
kernel's VMEM model (``fused.DETECT_MANY_PLANE8`` / ``DETECT_MANY_OVERHEAD``).

The kernel's live set is ``2*nc + C`` strip planes (candidate-chunk
double buffer + nc-independent overhead); the model needs two measured
legs per window:

  * the nc=8 plane ceiling (fixes PLANE8, the production budget after
    ~10% margin) — the original r4 campaign, ``--leg nc8``;
  * the nc=1 plane ceiling at the SAME geometry (``--leg nc1``), from
    which the overhead solves as  C = (16 - 2r) / (r - 1)  with
    r = ceil_nc1 / ceil_nc8  — this is what makes the nc-shrink at
    4K-class widths honest (the legacy ``total // (2*nc + 5)`` divisor
    assumed C=5 and overflowed scoped VMEM by 4.5 MB at 4K p=7/nc=4).

Each leg bisects the largest strip whose kernel still compiles inside
the 16 MB scoped-vmem limit, by planting the exact plane size in
``fused._PLANE_BUDGET_OVERRIDE`` and compiling the real kernel.

Run ON THE REAL CHIP, sequentially (each compile takes ~1-2 min through
the remote compile helper; parallel/abandoned jobs wedge it for everyone):

    timeout 5400 python tools/calibrate_detect_many.py --leg nc1 \
        --p 5 7 9 --rows 1080 --cols 1920

Then set ``DETECT_MANY_OVERHEAD`` in ops/pallas/fused.py from the printed
solve and re-run with --verify-only at the target (e.g. 4K) geometry to
confirm the shrunk-nc kernels compile and match the XLA formulation.
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
from watermarking_gpu_tpu.ops.pallas.common import lane_padded  # noqa: E402


def try_compile(strip: int, nc: int, rows: int, cols: int, mask: str,
                p: int) -> tuple[bool, str]:
    """Compile the chunked kernel forced to exactly (nc, strip).

    Returns (compiled?, detail). A scoped-vmem overflow is reported as a
    clean failure; any other compile error re-raises (that would be a
    bug, not a budget miss).
    """
    key = fused._window_key(mask, p)
    pad = 4 if fused.stencil_reach(mask, p) <= 4 else 8
    plane = (strip + 2 * pad) * lane_padded(cols + 2 * pad)
    n = nc  # n == nc -> one chunk, detect_many_chunk picks nc = min(8, n)
    fused._PLANE_BUDGET_OVERRIDE[(key, nc)] = plane
    try:
        got_nc, got_pad, got_strip, rows_padded = fused.detect_many_chunk(
            n, rows, cols, mask, p)
        if (got_nc, got_strip) != (nc, strip):
            return False, (f"geometry not honored: got nc={got_nc} "
                           f"strip={got_strip} (wanted {nc}/{strip})")
        k = p * p - 1 if mask == "me" else 8
        fn = jax.jit(lambda img, wms, coeffs: fused.fused_detect_many_partials(
            img, wms, coeffs, mask, p))
        lowered = fn.lower(
            jax.ShapeDtypeStruct((1, rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((n, rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32))
        t0 = time.time()
        lowered.compile()
        return True, (f"plane={plane} pad={got_pad} "
                      f"compile={time.time() - t0:.0f}s")
    except Exception as exc:  # scoped-vmem overflow names the kernel
        msg = str(exc)
        if ("vmem" in msg.lower() or "VMEM" in msg
                or "scoped" in msg.lower()):
            first = msg.splitlines()[0] if msg else ""
            return False, f"scoped-vmem overflow: {first[:140]}"
        raise
    finally:
        del fused._PLANE_BUDGET_OVERRIDE[(key, nc)]


def bisect_strip(nc: int, rows: int, cols: int, mask: str, p: int,
                 lo_strip: int = 8, hi_cap: int = 1024) -> int:
    """Largest strip (multiple of 8, <= rows rounded) that compiles."""
    hi_cap = min(hi_cap, (rows // 8) * 8)
    ok, detail = try_compile(lo_strip, nc, rows, cols, mask, p)
    print(f"  nc={nc} strip={lo_strip:>4}: {'ok' if ok else 'FAIL'} "
          f"({detail})", flush=True)
    if not ok:
        raise SystemExit("even the 8-row minimum strip overflows: the "
                         "chunked kernel cannot run at this geometry/nc")
    lo = lo_strip
    hi = None
    step = lo_strip
    while hi is None:
        candidate = min(max(lo * 2, lo + 8), hi_cap)
        ok, detail = try_compile(candidate, nc, rows, cols, mask, p)
        print(f"  nc={nc} strip={candidate:>4}: {'ok' if ok else 'FAIL'} "
              f"({detail})", flush=True)
        if ok:
            lo = candidate
            if candidate == hi_cap:
                return hi_cap
        else:
            hi = candidate
    while hi - lo > 8:
        mid = (lo + hi) // 2 // 8 * 8
        if mid in (lo, hi):
            break
        ok, detail = try_compile(mid, nc, rows, cols, mask, p)
        print(f"  nc={nc} strip={mid:>4}: {'ok' if ok else 'FAIL'} "
              f"({detail})", flush=True)
        if ok:
            lo = mid
        else:
            hi = mid
    return lo


def plane_of(strip: int, cols: int, mask: str, p: int) -> int:
    pad = 4 if fused.stencil_reach(mask, p) <= 4 else 8
    return (strip + 2 * pad) * lane_padded(cols + 2 * pad)


def verify_parity(rows: int, cols: int, n: int, mask: str, p: int) -> float:
    """Max |fused - xla| correlation delta at the CURRENT model."""
    from watermarking_gpu_tpu.ops.pipelines import detect_many_pipeline

    rng = np.random.default_rng(0)
    img = jnp.asarray(np.clip(rng.normal(128, 40, (rows, cols)), 0, 255),
                      dtype=jnp.float32)
    bank = jnp.asarray(rng.normal(0, 1, (n, rows, cols)), dtype=jnp.float32)
    got = np.asarray(detect_many_pipeline(img, bank, mask, p=p,
                                          impl="pallas"))
    want = np.asarray(detect_many_pipeline(img, bank, mask, p=p,
                                           impl="xla"))
    return float(np.max(np.abs(got - want)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=1080)
    parser.add_argument("--cols", type=int, default=1920)
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--mask", type=str, default="me")
    parser.add_argument("--p", type=int, nargs="+", default=[5, 7, 9])
    parser.add_argument("--leg", choices=["nc8", "nc1"], default="nc1",
                        help="which ceiling to bisect (nc8 fixes PLANE8; "
                             "nc1 + the nc8 ceiling solve the overhead C)")
    parser.add_argument("--verify-only", action="store_true")
    args = parser.parse_args()

    print(f"backend: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind})", flush=True)
    nc = 8 if args.leg == "nc8" else 1
    results = {}
    for p in args.p:
        key = fused._window_key(args.mask, p)
        print(f"p={p} @ {args.rows}x{args.cols} "
              f"(model: PLANE8={fused.DETECT_MANY_PLANE8[key]} "
              f"C={fused.DETECT_MANY_OVERHEAD[key]}):", flush=True)
        if not args.verify_only:
            best = bisect_strip(nc, args.rows, args.cols, args.mask, p)
            ceil = plane_of(best, args.cols, args.mask, p)
            results[p] = ceil
            print(f"  -> nc={nc} ceiling: strip={best} plane={ceil}",
                  flush=True)
            if nc == 1:
                # solve C against the committed nc=8 model ceiling:
                # PLANE8 carries ~10% margin, so reconstruct the nc=8
                # ceiling estimate as PLANE8/0.9 (same-campaign values)
                p8c = fused.DETECT_MANY_PLANE8[key] / 0.9
                r = ceil / p8c
                if r > 1.0:
                    c = (16 - 2 * r) / (r - 1)
                    print(f"  -> solved overhead C = {c:.1f} "
                          f"(r = {r:.3f}; committed seed "
                          f"{fused.DETECT_MANY_OVERHEAD[key]})", flush=True)
                else:
                    print("  -> r <= 1: nc=1 ceiling not above the nc=8 "
                          "ceiling — overhead dominates entirely; keep "
                          "the conservative seed", flush=True)
        supported = fused.detect_many_supported(args.n, args.rows,
                                                args.cols, args.mask, p)
        chunk = fused.detect_many_chunk(args.n, args.rows, args.cols,
                                        args.mask, p)
        print(f"  detect_many_supported: {supported} "
              f"(nc={chunk[0]} strip={chunk[2]})", flush=True)
        if supported and args.verify_only:
            delta = verify_parity(args.rows, args.cols, min(args.n, 16),
                                  args.mask, p)
            print(f"  parity max|fused-xla|: {delta:.2e}", flush=True)
    if results:
        print(f"\nmeasured nc={nc} plane ceilings: {results}")


if __name__ == "__main__":
    main()
