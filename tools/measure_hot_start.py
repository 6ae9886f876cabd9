#!/usr/bin/env python3
"""Cold vs warm process start for pinned programs (the AOT side-cache).

Pinned programs opt out of jax's persistent compile cache (reloaded
executables lose output layout tags — utils/layouts.py), so before r4 every
process restart at a flip-prone geometry (the 3872-wide 4K sample's class)
re-paid the full Pallas compile (~2 min/shape for the fused detect tail).
This tool measures what the AOT side-cache buys: it runs the same child
workload twice in FRESH processes against one side-cache directory and
reports both startup times.

Run on the real chip:

    timeout 1800 python tools/measure_hot_start.py --rows 2160 --cols 3872

Expected: run 1 (cold) pays the full compile; run 2 (warm) only
deserializes + loads. Paste the numbers into docs/PERFORMANCE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
rows, cols = int(sys.argv[1]), int(sys.argv[2])
mask = sys.argv[3] if len(sys.argv) > 3 else ""
t0 = time.time()
if os.environ.get("WM_FORCE_CPU"):   # smoke-test mode: the ambient TPU
    import jax                       # plugin outranks JAX_PLATFORMS
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax, jax.numpy as jnp
from watermarking_gpu_tpu.models.watermark import Watermark
engine = Watermark(rows, cols, 28390211, p=3, psnr=40.0)
t_init = time.time()
# Establish the tunnel's per-process execute/D2H channels BEFORE timing
# warmup: the first program execution and first device->host pull of a
# process block on channel setup — ~40 s healthy, 10-20 MINUTES in the
# tunnel's degraded windows (r5 measured 642 s / 1134 s on back-to-back
# runs) — and both cold and warm children pay it identically, so folding
# it into warmup_s swamps exactly the compile-vs-reload difference this
# tool exists to measure. A real (non-tunneled) deployment has no such
# channel cost; it is reported separately as channel_setup_s.
np.asarray(jnp.zeros((8, 128)) + 1.0)
t_chan = time.time()
# compiles (or reloads) embed + detect programs; a mask argument warms
# only that mask (the single-mask serving-restart scenario)
engine.warmup(mask_type=mask or None)
t_warm = time.time()
img = np.clip(np.random.default_rng(0).normal(128, 40, (rows, cols)),
              0, 255).astype(np.float32)
marked, s = engine.embed(img, mask_type="me")
corr = float(engine.detect(np.asarray(marked), "me"))
t_done = time.time()
print(json.dumps({
    "import_and_device_s": round(t_init - t0, 2),
    "channel_setup_s": round(t_chan - t_init, 2),
    "warmup_s": round(t_warm - t_chan, 2),
    "roundtrip_corr": round(corr, 6),
    "total_s": round(t_done - t0, 2),
}))
"""


def run_child(rows: int, cols: int, cache_dir: str,
              force_cpu: bool = False, mask: str = "",
              stage_log: list | None = None) -> dict:
    env = dict(os.environ, WMTPU_PINNED_CACHE=cache_dir)
    if force_cpu:
        env["WM_FORCE_CPU"] = "1"
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(rows), str(cols), mask],
        capture_output=True, text=True, env=env, cwd=REPO)
    if out.returncode != 0:
        raise SystemExit(f"child failed:\n{out.stderr[-2000:]}")
    for line in out.stdout.splitlines():
        if "[pinned_jit]" in line:       # WMTPU_TIMING=1 stage breakdown
            print(line, flush=True)
            if stage_log is not None:
                stage_log.append(line)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=2160)
    parser.add_argument("--cols", type=int, default=3872)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend in the children "
                             "(smoke-test mode)")
    parser.add_argument("--mask", default="",
                        help="warm a single mask type in the children "
                             "(the serving-restart scenario), e.g. 'me'")
    parser.add_argument("--json", default="",
                        help="also write the summary (plus WMTPU_TIMING "
                             "stage lines) to this JSON file")
    args = parser.parse_args()
    cache_dir = tempfile.mkdtemp(prefix="wm_pinned_hotstart_")
    print(f"side-cache: {cache_dir}")
    stages: list = []
    t0 = time.time()
    cold = run_child(args.rows, args.cols, cache_dir, args.cpu, args.mask,
                     stages)
    print(f"cold start: {json.dumps(cold)} (wall {time.time() - t0:.0f}s)")
    entries = len(os.listdir(cache_dir))
    print(f"cache entries written: {entries}")
    t1 = time.time()
    warm = run_child(args.rows, args.cols, cache_dir, args.cpu, args.mask,
                     stages)
    print(f"warm start: {json.dumps(warm)} (wall {time.time() - t1:.0f}s)")
    speedup = (cold["warmup_s"] / warm["warmup_s"]
               if warm["warmup_s"] else float("inf"))
    assert abs(cold["roundtrip_corr"] - warm["roundtrip_corr"]) < 1e-6, \
        "warm-start results diverged from cold-start"
    summary = {"rows": args.rows, "cols": args.cols,
               "mask": args.mask or "both",
               "cold_warmup_s": cold["warmup_s"],
               "warm_warmup_s": warm["warmup_s"],
               "speedup": round(speedup, 1),
               "cache_entries": entries}
    print(json.dumps(summary))
    if args.json:
        payload = dict(summary, cold=cold, warm=warm, stage_lines=stages)
        if os.path.exists(args.json):
            merged = json.load(open(args.json))
            if not isinstance(merged, list):
                merged = [merged]
        else:
            merged = []
        merged.append(payload)
        with open(args.json, "w") as fh:
            json.dump(merged, fh, indent=1)


if __name__ == "__main__":
    main()
