#!/usr/bin/env python3
"""On-chip compile-verification harness for the chunked multi-candidate
kernel's VMEM admission facts (``fused.DETECT_MANY_PROVEN``).

``--probe NC,STRIP`` compiles ONE forced configuration at exactly
--rows/--cols by planting its plane size in
``fused._PLANE_BUDGET_OVERRIDE``; an ``ok`` result is a fact —
``(nc, rows, lane_padded(cols+2*pad), plane)`` — to append to
``DETECT_MANY_PROVEN`` verbatim (a configuration dominated by a
compiled fact in all four monotone dimensions allocates no more scoped
VMEM than its witness, so no margin is needed). ``--leg nc{8,4,2,1}``
bisects the largest strip that compiles at one tier (short-probe mode,
rows = 3*strip — see the try_compile caveat).

r4 campaign lessons baked into this tool and the facts design:
  * a linear ``live(nc) = 2*nc + C`` model over-predicts intermediate
    tiers by 4-25% (p=7 halving nc 8->4 bought ~1% of plane);
  * scoped VMEM GROWS with total frame rows (nvf p=9 nc=4 plane
    187,392: ok at 1,440 rows, overflow at 2,160) and, at tall
    heights, with cols beyond the plane units (me p=3 nc=4 at 4,320
    rows: plane 212,992 ok at 1,920 cols, plane 187,392 overflows at
    7,680) — so short-probe bisections only bound SHORT frames, and
    every production-geometry class needs its own --probe fact;
  * the waste-minimizing strip picker silently substitutes divisor
    strips at fixed campaign heights — probe strips must divide the
    probe height.

Run ON THE REAL CHIP, sequentially (compiles go through the shared
remote compile helper; parallel/abandoned jobs wedge it for everyone):

    python tools/calibrate_detect_many.py --probe 4,8 --mask me --p 7 \
        --rows 4320 --cols 3840

Then append the fact to ``fused.DETECT_MANY_PROVEN`` and re-run with
--verify-only at the target geometry to confirm the routed kernel
compiles and matches the XLA formulation end to end.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the _PLANE_BUDGET_OVERRIDE hook this tool plants is inert in production
# admission unless this flag is set (fused._calibration_mode) — only the
# calibration harness may force geometries the committed facts reject
os.environ["WMTPU_CALIBRATION"] = "1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import watermarking_gpu_tpu.ops.pallas.fused as fused  # noqa: E402
from watermarking_gpu_tpu.ops.pallas.common import lane_padded  # noqa: E402


def try_compile(strip: int, nc: int, rows: int, cols: int, mask: str,
                p: int, probe_rows: int | None = None) -> tuple[bool, str]:
    """Compile the chunked kernel forced to exactly (nc, strip).

    By default the probe runs at ``rows = 3*strip`` regardless of the
    campaign's nominal rows: the waste-minimizing picker honors any
    strip that divides the height exactly (at the campaign height it
    silently substitutes a divisor strip — the first nc=1 leg lost its
    p=5 probes above 72 rows to exactly that), and a multi-strip grid
    keeps Mosaic's double-buffering in the live set. CAVEAT (measured
    r4): scoped VMEM GROWS with total rows (an 8K-tall frame fails
    planes a 3-strip probe accepts), so short-probe ceilings only hold
    for frames up to the campaign height — the tall-rows campaign
    passes ``probe_rows`` (strip must divide it) to compile at the real
    frame height instead.

    Returns (compiled?, detail). A scoped-vmem overflow is reported as a
    clean failure; any other compile error re-raises (that would be a
    bug, not a budget miss).
    """
    del rows  # probe height is probe_rows or derived from the strip
    if nc not in (1, 2, 4, 8):
        # budgets are keyed by fact TIER (detect_many_plane_budget rounds
        # nc up to {1,2,4,8}); an off-tier override would be stored under
        # a key the lookup never consults and the probe would silently
        # admit against the committed facts instead
        raise SystemExit(f"--probe nc must be one of 1/2/4/8, got {nc}")
    key = fused._window_key(mask, p)
    pad = 4 if fused.stencil_reach(mask, p) <= 4 else 8
    plane = (strip + 2 * pad) * lane_padded(cols + 2 * pad)
    n = nc  # n == nc -> one chunk, detect_many_chunk picks nc = min(8, n)
    rows = probe_rows if probe_rows is not None else 3 * strip
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
    parser.add_argument("--leg", choices=["nc8", "nc4", "nc2", "nc1"],
                        default="nc1",
                        help="which ceiling to bisect (nc8 fixes PLANE8; "
                             "nc1 + the nc8 ceiling solve the overhead C; "
                             "nc4/nc2 spot-check the linear model between "
                             "the endpoints)")
    parser.add_argument("--verify-only", action="store_true")
    parser.add_argument("--probe", type=str, default=None, metavar="NC,STRIP",
                        help="compile ONE forced (nc, strip) at exactly "
                             "--rows/--cols (no 3*strip shortcut) and exit; "
                             "used for the tall-rows campaign, where scoped "
                             "vmem grows with total rows (threshold between "
                             "1440 and 2160 rows) and, at tall heights, with "
                             "cols beyond the plane units")
    args = parser.parse_args()

    if args.probe:
        nc, strip = (int(x) for x in args.probe.split(","))
        for p in args.p:
            ok, detail = try_compile(strip, nc, args.rows, args.cols,
                                     args.mask, p, probe_rows=args.rows)
            print(f"{args.mask} p={p} nc={nc} strip={strip} "
                  f"@{args.rows}x{args.cols}: {'ok' if ok else 'FAIL'} "
                  f"({detail})", flush=True)
        return

    print(f"backend: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind})", flush=True)
    nc = int(args.leg[2:])
    results = {}
    for p in args.p:
        key = fused._window_key(args.mask, p)
        print(f"p={p} @ {args.rows}x{args.cols} "
              f"(facts: {fused.DETECT_MANY_PROVEN[key]}):", flush=True)
        if not args.verify_only:
            best = bisect_strip(nc, args.rows, args.cols, args.mask, p)
            ceil = plane_of(best, args.cols, args.mask, p)
            results[p] = ceil
            print(f"  -> nc={nc} ceiling: strip={best} plane={ceil}",
                  flush=True)
            pad = 4 if fused.stencil_reach(args.mask, p) <= 4 else 8
            print(f"  -> short-frame fact candidate: ({nc}, <campaign "
                  f"rows>, {lane_padded(args.cols + 2 * pad)}, {ceil}) "
                  f"— remember scoped VMEM grows with rows; use --probe "
                  f"at the real frame height for DETECT_MANY_PROVEN "
                  f"entries", flush=True)
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
