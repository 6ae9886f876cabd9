#!/usr/bin/env python3
"""Per-XLA-op device-time breakdown of a watermark round trip.

Runs chained embed+detect steps at the given geometry under a
jax.profiler trace, then aggregates the "XLA Ops" timeline — the per-op
device busy durations, the ground truth the component benches only
approximate — and prints a per-frame table plus a JSON dump.

Built to diff aligned vs misaligned widths (the 4K 3872-wide per-pixel
penalty, reference sample ``samples/4k_non_divisible.png`` /
``samples/make_w.bat``):

    python tools/profile_roundtrip.py --cols 3840 --out /tmp/a.json
    python tools/profile_roundtrip.py --cols 3872 --out /tmp/b.json
    python tools/profile_roundtrip.py --diff /tmp/a.json /tmp/b.json
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_trace(log_dir: str) -> dict[str, dict]:
    """Sum device busy time per op name from the 'XLA Ops' timelines of
    the newest trace.json.gz under ``log_dir``."""
    paths = sorted(glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # thread-name metadata marks the per-core "XLA Ops" timelines
    xla_tids = {(e["pid"], e["tid"]) for e in events
                if e.get("ph") == "M" and e.get("name") == "thread_name"
                and "XLA Ops" in e.get("args", {}).get("name", "")}
    agg: dict[str, dict] = defaultdict(lambda: {"us": 0.0, "count": 0})
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in xla_tids:
            a = agg[e["name"]]
            a["us"] += e.get("dur", 0)
            a["count"] += 1
    return dict(agg)


def run_case(rows: int, cols: int, batch: int, iters: int, p: int,
             mask_type: str, log_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from watermarking_gpu_tpu.models.batched import batch_detect, batch_embed
    from watermarking_gpu_tpu.ops import strength_factor
    from watermarking_gpu_tpu.ops.pipelines import precompute_padded_watermark
    from watermarking_gpu_tpu.utils.profiling import trace

    rng = np.random.default_rng(0)
    frames = jnp.asarray(np.clip(rng.normal(128, 40, (batch, rows, cols)),
                                 0, 255), dtype=jnp.float32)
    wm = jnp.asarray(rng.normal(0, 1, (rows, cols)), dtype=jnp.float32)
    sf = strength_factor(40.0)
    wm_p = precompute_padded_watermark(wm, mask_type, p)

    @jax.jit
    def step(f, w):
        marked, _ = batch_embed(f, f, w, sf, mask_type, p=p, impl="pallas",
                                watermark_padded=wm_p)
        return marked, batch_detect(marked, w, mask_type, p=p,
                                    impl="pallas", watermark_padded=wm_p)

    m, c = step(frames, wm)
    np.asarray(c)                      # compile + open the D2H channel
    f = frames
    for _ in range(2):                 # stabilize
        f, c = step(f, wm)
    np.asarray(c)
    with trace(log_dir):
        f = frames
        out = None
        for _ in range(iters):
            f, out = step(f, wm)
        np.asarray(out)


def print_table(agg: dict[str, dict], frames_total: int, top: int) -> float:
    rows = sorted(agg.items(), key=lambda kv: -kv[1]["us"])
    total = sum(v["us"] for v in agg.values())
    print(f"{'us/frame':>10}  {'%':>5}  {'count':>6}  op")
    for name, v in rows[:top]:
        print(f"{v['us'] / frames_total:10.1f}  {100 * v['us'] / total:5.1f}"
              f"  {v['count']:6d}  {name[:90]}")
    print(f"{total / frames_total:10.1f}  total device-op time")
    return total


def diff(path_a: str, path_b: str, top: int) -> None:
    a = json.load(open(path_a))
    b = json.load(open(path_b))
    fa, fb = a["frames_total"], b["frames_total"]
    names = set(a["ops"]) | set(b["ops"])
    deltas = []
    for n in names:
        ua = a["ops"].get(n, {"us": 0})["us"] / fa
        ub = b["ops"].get(n, {"us": 0})["us"] / fb
        deltas.append((ub - ua, ua, ub, n))
    deltas.sort(key=lambda t: -abs(t[0]))
    ta = sum(v["us"] for v in a["ops"].values()) / fa
    tb = sum(v["us"] for v in b["ops"].values()) / fb
    print(f"total us/frame: {ta:.1f} -> {tb:.1f}  (delta {tb - ta:+.1f})")
    print(f"{'delta':>9}  {'A us/f':>9}  {'B us/f':>9}  op")
    for d, ua, ub, n in deltas[:top]:
        print(f"{d:+9.1f}  {ua:9.1f}  {ub:9.1f}  {n[:80]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2160)
    ap.add_argument("--cols", type=int, default=3872)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--p", type=int, default=3)
    ap.add_argument("--mask", default="me")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default=None, help="write aggregated JSON here")
    ap.add_argument("--diff", nargs=2, metavar=("A", "B"),
                    help="compare two --out files instead of running")
    args = ap.parse_args()

    if args.diff:
        diff(args.diff[0], args.diff[1], args.top)
        return
    log_dir = tempfile.mkdtemp(prefix="wmprof_")
    t0 = time.time()
    run_case(args.rows, args.cols, args.batch, args.iters, args.p,
             args.mask, log_dir)
    agg = aggregate_trace(log_dir)
    frames_total = args.batch * args.iters
    print(f"# {args.rows}x{args.cols} batch={args.batch} iters={args.iters}"
          f" p={args.p} mask={args.mask}  wall {time.time() - t0:.1f}s")
    print_table(agg, frames_total, args.top)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": args.rows, "cols": args.cols,
                       "frames_total": frames_total, "ops": agg}, f)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
