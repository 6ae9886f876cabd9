#!/usr/bin/env python3
"""On-chip compile-verification campaign for the chunked multi-candidate
kernel's VMEM numerators (``fused.DETECT_MANY_TOTAL_WIDE``).

The fused identification kernel's strip budget is ``total // (2*nc + 5)``;
the p=3 ``total`` (2.6M elements) was measured against the compiler's
scoped-vmem accounting, but the generalized-ME (p in {5,7,9}) numerators
were only ever scaled by the tail kernels' ratio — conservative enough that
``detect_many_supported`` routes p=7/9 at 1080p-class widths to the slow XLA
formulation (r3 VERDICT item 3). This tool measures the true ceiling per p:
it bisects the largest ``total`` whose kernel still compiles inside the
16 MB scoped-vmem limit at a target geometry, then checks numeric parity of
the compiled kernel against the XLA formulation.

Run ON THE REAL CHIP, sequentially (each compile takes ~1-2 min through the
remote compile helper; parallel/abandoned jobs wedge it for everyone):

    timeout 3600 python tools/calibrate_detect_many.py --p 5 7 9 \
        --rows 1080 --cols 1920 --n 64

Then set ``DETECT_MANY_TOTAL_WIDE`` in ops/pallas/fused.py to the reported
values minus the safety margin, and re-run with --verify-only to confirm.
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


def _set_total(mask: str, p: int, total: int):
    if mask == "me" and p > 3:
        old = fused.DETECT_MANY_TOTAL_WIDE[p]
        fused.DETECT_MANY_TOTAL_WIDE[p] = total
    else:
        old = fused.DETECT_MANY_TOTAL
        fused.DETECT_MANY_TOTAL = total
    return old


def try_compile(total: int, rows: int, cols: int, n: int, mask: str,
                p: int) -> tuple[bool, str]:
    """Compile the chunked kernel with ``total`` as the VMEM numerator.

    Returns (compiled?, detail). A scoped-vmem overflow is reported as a
    clean failure; any other compile error re-raises (that would be a
    bug, not a budget miss).
    """
    old = _set_total(mask, p, total)
    try:
        from watermarking_gpu_tpu.ops.pallas.common import lane_padded

        nc, pad, strip, rows_padded = fused.detect_many_chunk(
            n, rows, cols, mask, p)
        if ((strip + 2 * pad) * lane_padded(cols + 2 * pad)
                > total // (2 * nc + 5)):
            return False, "minimum strip does not fit this numerator"
        k = p * p - 1 if mask == "me" else 8
        fn = jax.jit(lambda img, wms, coeffs: fused.fused_detect_many_partials(
            img, wms, coeffs, mask, p))
        lowered = fn.lower(
            jax.ShapeDtypeStruct((1, rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((n, rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32))
        t0 = time.time()
        lowered.compile()
        return True, (f"nc={nc} strip={strip} pad={pad} "
                      f"compile={time.time() - t0:.0f}s")
    except Exception as exc:  # scoped-vmem overflow names the kernel
        msg = str(exc)
        if ("vmem" in msg.lower() or "VMEM" in msg
                or "scoped" in msg.lower()):
            first = msg.splitlines()[0] if msg else ""
            return False, f"scoped-vmem overflow: {first[:140]}"
        raise
    finally:
        _set_total(mask, p, old)


def _min_strip_total(rows: int, cols: int, n: int, mask: str, p: int) -> int:
    """Smallest ``total`` that admits the 8-row minimum strip at this
    geometry — numerators below this fail with "minimum strip does not
    fit", which needs a LARGER total, not a smaller one."""
    import watermarking_gpu_tpu.ops.pallas.fused as fused_mod
    from watermarking_gpu_tpu.ops.pallas.common import lane_padded

    pad = 4 if fused_mod.stencil_reach(mask, p) <= 4 else 8
    nc = min(8, n)
    return (8 + 2 * pad) * lane_padded(cols + 2 * pad) * (2 * nc + 5)


def calibrate(rows: int, cols: int, n: int, mask: str, p: int,
              lo: int, hi_cap: int, step: int = 64_000) -> int:
    """Largest ``total`` (granularity ``step``) that compiles."""
    # a ``lo`` below the min-strip threshold can never compile — the fit
    # check fails in the "too small" direction; start the search at the
    # first total that admits the minimum strip (the r4 p=7/9 campaign
    # bisected DOWNWARD from there and wrongly concluded "unsupported")
    floor = _min_strip_total(rows, cols, n, mask, p)
    if lo < floor:
        lo = -(-floor // step) * step
        print(f"  raising start to min-strip total {lo}", flush=True)
    ok, detail = try_compile(lo, rows, cols, n, mask, p)
    print(f"  total={lo:>9}: {'ok' if ok else 'FAIL'} ({detail})",
          flush=True)
    if not ok:
        # current value already overflows: bisect downward (but never
        # below the min-strip floor)
        hi = lo
        lo = max(step, -(-floor // step) * step)
        if lo >= hi:
            raise SystemExit(
                "the min-strip total itself overflows scoped VMEM: the "
                "chunked kernel cannot run at this geometry/p")
        ok, detail = try_compile(lo, rows, cols, n, mask, p)
        print(f"  total={lo:>9}: {'ok' if ok else 'FAIL'} ({detail})",
              flush=True)
        if not ok:
            raise SystemExit("even the minimum numerator overflows")
    else:
        # double until failure or cap
        hi = lo
        while hi < hi_cap:
            candidate = min(hi * 2, hi_cap)
            ok, detail = try_compile(candidate, rows, cols, n, mask, p)
            print(f"  total={candidate:>9}: {'ok' if ok else 'FAIL'} "
                  f"({detail})", flush=True)
            if ok:
                lo = hi = candidate
                if candidate == hi_cap:
                    return hi_cap
            else:
                hi = candidate
                break
        else:
            return lo
    while hi - lo > step:
        mid = (lo + hi) // 2 // step * step
        if mid in (lo, hi):
            break
        ok, detail = try_compile(mid, rows, cols, n, mask, p)
        print(f"  total={mid:>9}: {'ok' if ok else 'FAIL'} ({detail})",
              flush=True)
        if ok:
            lo = mid
        else:
            hi = mid
    return lo


def verify_parity(rows: int, cols: int, n: int, mask: str, p: int) -> float:
    """Max |fused - xla| correlation delta at the CURRENT numerators."""
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
    parser.add_argument("--cap", type=int, default=4_000_000)
    parser.add_argument("--verify-only", action="store_true")
    args = parser.parse_args()

    print(f"backend: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind})", flush=True)
    results = {}
    for p in args.p:
        current = (fused.DETECT_MANY_TOTAL_WIDE[p]
                   if args.mask == "me" and p > 3 else
                   fused.DETECT_MANY_TOTAL)
        print(f"p={p} @ {args.rows}x{args.cols} n={args.n} "
              f"(current total {current}):", flush=True)
        if not args.verify_only:
            best = calibrate(args.rows, args.cols, args.n, args.mask, p,
                             lo=current, hi_cap=args.cap)
            results[p] = best
            print(f"  -> max compiling total: {best}", flush=True)
        supported = fused.detect_many_supported(args.n, args.rows,
                                                args.cols, args.mask, p)
        print(f"  detect_many_supported: {supported}", flush=True)
        if supported:
            delta = verify_parity(args.rows, args.cols, min(args.n, 16),
                                  args.mask, p)
            print(f"  parity max|fused-xla|: {delta:.2e}", flush=True)
    if results:
        print("\nsuggested DETECT_MANY_TOTAL_WIDE (with ~10% margin):")
        for p, best in results.items():
            print(f"  {p}: {int(best * 0.9) // 8000 * 8000},")


if __name__ == "__main__":
    main()
