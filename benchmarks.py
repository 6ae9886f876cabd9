#!/usr/bin/env python3
"""Full benchmark sweep over the BASELINE.md configurations.

Covers what BASELINE.json lists as measured configs: embed+detect at 512^2 /
1080p / 4K for both masks, and interval-sampled video detection. Writes a
JSON report; ``bench.py`` remains the driver's single-line headline metric.

Usage: python benchmarks.py [--out BENCH_SWEEP.json] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from watermarking_gpu_tpu.io import load_image_gray  # noqa: E402
from watermarking_gpu_tpu.io.matfile import generate_watermark  # noqa: E402
from watermarking_gpu_tpu.models.batched import (batch_detect,  # noqa: E402
                                                 batch_embed)
from watermarking_gpu_tpu.models.watermark import default_impl  # noqa: E402
from watermarking_gpu_tpu.ops import strength_factor  # noqa: E402

SAMPLES = "/root/reference/Watermark_GPU/samples/images"
SIZES = {
    "512": (512, 512, "512.png"),
    "1080p": (1080, 1920, "1080p.png"),
    "4k": (2160, 3840, "4k.png"),
    # width not divisible by 64/128: the reference ships this sample
    # specifically to stress the pad path (samples/make_w.bat)
    "4k_nd": (2160, 3872, "4k_non_divisible.png"),
}


def load_frames(rows, cols, image_file, batch):
    path = os.path.join(SAMPLES, image_file)
    if os.path.exists(path):
        base = load_image_gray(path)
    else:
        rng = np.random.default_rng(0)
        base = np.clip(rng.normal(128, 40, (rows, cols)), 0,
                       255).astype(np.float32)
    return np.broadcast_to(base, (batch, rows, cols)).copy()


def measure_roundtrip(frames, watermark, mask_type, impl, iters=(6, 24),
                      p=3):
    """Chained embed+detect steps closed by a D2H pull; slope isolates
    per-step device time from the harness's fixed sync cost."""
    sf = strength_factor(40.0)
    batch = frames.shape[0]

    frames = jax.device_put(frames)
    watermark = jax.device_put(watermark)
    # engine-style call-invariant padded watermark (pad copy paid once)
    from watermarking_gpu_tpu.ops.pipelines import precompute_padded_watermark
    wm_p = (precompute_padded_watermark(watermark, mask_type, p)
            if impl == "pallas" else None)

    from watermarking_gpu_tpu.utils.layouts import pinned_jit

    @pinned_jit
    def step(f, wm):
        # pinned row-major boundary layouts, as the engines do — at the
        # lane-misaligned 4K width XLA's auto boundary layout otherwise
        # costs two full-frame relayout copies per step (utils/layouts.py)
        marked, _ = batch_embed(f, f, wm, sf, mask_type, p=p, impl=impl,
                                watermark_padded=wm_p)
        return marked, batch_detect(marked, wm, mask_type, p=p, impl=impl,
                                    watermark_padded=wm_p)
    m, c = step(frames, watermark)
    np.asarray(c)

    def run(n):
        f = frames
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            f, out = step(f, watermark)
        pulled = np.asarray(out)
        return time.perf_counter() - t0, pulled

    run(2)
    # slope of per-count minima: tunnel stalls only ever ADD time, so the
    # min over repeats is the cleanest estimate of each window — sloping
    # the minima is robust where min-of-slopes is biased by a stall that
    # happens to inflate the small window (observed: a 3.6x-too-good fps)
    corrs = None
    t_small = []
    t_large = []
    for _ in range(4):
        t_small.append(run(iters[0])[0])
        t2, corrs = run(iters[1])
        t_large.append(t2)
    per_step = (min(t_large) - min(t_small)) / (iters[1] - iters[0])
    if per_step <= 0:
        per_step = float("nan")
    return {
        "fps": round(batch / per_step, 1),
        "ms_per_frame": round(1e3 * per_step / batch, 4),
        "mean_correlation": round(float(corrs.mean()), 4),
    }


def _slope(run, iters=(4, 12), reps=4):
    """Per-iteration seconds via the slope of per-count minima (host syncs
    on the tunneled TPU cost ~30 ms and stalls only ever add time; minima
    per window are the cleanest samples, and their slope cancels the fixed
    cost without the bias of min-of-slopes)."""
    t1 = min(run(iters[0]) for _ in range(reps))
    t2 = min(run(iters[1]) for _ in range(reps))
    slope = (t2 - t1) / (iters[1] - iters[0])
    return slope if slope > 0 else float("nan")


def detect_many_benchmark(rows=512, cols=512, n=64, iters=(4, 16), reps=6,
                          p=3):
    """Watermark identification: one image against 64 candidates in one
    dispatch (the fused multi-candidate kernel; the reference can only
    loop N full detections, Watermark.cpp:234-250). ``p`` sizes the
    generalized window — wide rows measure the chunked kernel where the
    calibrated plane-budget model admits the geometry (shrinking the
    candidate chunk nc at 4K-class widths), else the XLA fallback."""
    import jax
    import jax.numpy as jnp

    from watermarking_gpu_tpu.ops.pipelines import detect_many_pipeline

    rng = np.random.default_rng(0)
    img = jnp.asarray(np.clip(rng.normal(128, 40, (rows, cols)), 0, 255),
                      dtype=jnp.float32)
    bank = jnp.asarray(rng.normal(0, 1, (n, rows, cols)), dtype=jnp.float32)

    def make(k):
        def run(image, wms):
            out = jnp.float32(0.0)
            for _ in range(k):
                corr = detect_many_pipeline(image + out * 1e-30, wms, "me",
                                            p=p, impl=default_impl())
                out = jnp.sum(corr)
            return out
        return run

    fns = {k: jax.jit(make(k)) for k in iters}
    for k in iters:
        np.asarray(fns[k](img, bank))          # compile + warm

    def window(k):
        t0 = time.perf_counter()
        np.asarray(fns[k](img, bank))
        return time.perf_counter() - t0

    window(iters[0])
    t_small = min(window(iters[0]) for _ in range(reps))
    t_large = min(window(iters[1]) for _ in range(reps))
    sec = (t_large - t_small) / (iters[1] - iters[0])
    if sec <= 0:
        sec = float("nan")
    return {
        "candidates": n,
        "ms_per_dispatch": round(1e3 * sec, 4),
        "us_per_candidate": round(1e6 * sec / n, 2),
    }


def video_detect_benchmark(rows=1080, cols=1920, interval=30, frames=2400,
                           batch=8):
    """Interval-sampled video detection with the real ingest path:
    uint8 lumas over the link, cast on device, one batch kept in flight.

    Reports an honest decomposition — end-to-end rate, device-only batch
    time, u8 H2D transfer time — rather than one opaque number.
    """
    import jax

    from watermarking_gpu_tpu.models.batched import BatchedWatermark

    sampled = frames // interval
    rng = np.random.default_rng(0)
    lumas = np.clip(rng.normal(128, 40, (sampled, rows, cols)), 0,
                    255).astype(np.uint8)
    engine = BatchedWatermark(rows, cols, 28390211, psnr=40.0)
    np.asarray(engine.detect(lumas[:batch]))   # compile + open D2H channel

    # end-to-end: dispatch u8 batches, keep one in flight (pipeline.py's
    # detect_video structure), count completed sampled detects
    def run_e2e():
        t0 = time.perf_counter()
        pend = []
        done = 0
        for i in range(0, sampled - batch + 1, batch):
            pend.append(engine.detect(lumas[i:i + batch]))
            if len(pend) > 1:
                done += len(np.asarray(pend.pop(0)))
        for out in pend:
            done += len(np.asarray(out))
        return time.perf_counter() - t0, done

    elapsed, done = min(run_e2e() for _ in range(3))

    # device-only: repeated detects on resident data, slope over two counts.
    # More windows + wider spread than the default _slope: each window is
    # short (a few ms of device time vs the ~30 ms tunnel sync), so this
    # estimate otherwise swings 3x between runs on a noisy host.
    resident = jax.device_put(lumas[:batch])

    def run_device(n):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = engine.detect(resident)
        np.asarray(out)
        return time.perf_counter() - t0

    device_s = _slope(run_device, iters=(8, 40), reps=6)

    # u8 H2D alone: device_put slope (each put moves batch*rows*cols bytes)
    def run_h2d(n):
        outs = []
        t0 = time.perf_counter()
        for i in range(n):
            outs.append(jax.device_put(lumas[(i % (sampled // batch)) * batch:][:batch]))
        jax.block_until_ready(outs)
        return time.perf_counter() - t0

    h2d_s = _slope(run_h2d)

    frame_mb = rows * cols / 1e6
    return {
        "sampled_detects_per_s": round(done / elapsed, 1),
        "video_frames_equivalent_fps": round(done * interval / elapsed, 1),
        "device_ms_per_batch": round(1e3 * device_s, 2),
        "h2d_u8_ms_per_batch": round(1e3 * h2d_s, 2),
        "e2e_link_MBps": round(done * frame_mb / elapsed, 1),
        "batch": batch,
        "interval": interval,
        "note": "e2e dispatches u8 batches with one in flight; device/h2d "
                "rows are two-count slopes isolating the tunnel sync cost. "
                "On this harness the TPU is tunneled over a network link "
                "(tens of MB/s), which bounds e2e; device_ms_per_batch is "
                "the chip-side capability (a local-PCIe host moves an 8-"
                "frame u8 batch in ~1.4 ms at gen3 x16).",
    }


def video_embed_benchmark(rows=1080, cols=1920, frames=240, batch=8):
    """interval=1 video embedding (the reference's real embed workload,
    main.cpp:343-389): u8 in, u8 out, one batch in flight."""
    from watermarking_gpu_tpu.models.batched import BatchedWatermark

    rng = np.random.default_rng(0)
    lumas = np.clip(rng.normal(128, 40, (frames, rows, cols)), 0,
                    255).astype(np.uint8)
    engine = BatchedWatermark(rows, cols, 28390211, psnr=40.0)
    np.asarray(engine.embed_luma_u8(lumas[:batch])[0])

    def run():
        t0 = time.perf_counter()
        pend = []
        done = 0
        for i in range(0, frames - batch + 1, batch):
            pend.append(engine.embed_luma_u8(lumas[i:i + batch])[0])
            if len(pend) > 1:
                done += len(np.asarray(pend.pop(0)))
        for out in pend:
            done += len(np.asarray(out))
        return time.perf_counter() - t0, done

    elapsed, done = min(run() for _ in range(3))
    return {
        "embed_fps_interval1": round(done / elapsed, 1),
        "e2e_link_MBps_bidirectional": round(
            2 * done * rows * cols / 1e6 / elapsed, 1),
        "batch": batch,
        "note": "end-to-end u8 ingest + u8 egress, one batch in flight; "
                "bound by the harness's tunneled network link, not the "
                "device (see video_detect device_ms_per_batch)",
    }


def video_embed_disk_soak(rows=1080, cols=1920, frames=240, batch=8):
    """Sustained-ingest proof: raw 1080p ``.yuv`` on the bench host's local
    disk through the REAL ``embed_video`` pipeline (interval=1, native pump
    when built, one batch in flight), with the pipeline's own wait
    decomposition — where a full end-to-end run actually blocks (source
    pump / device results / sink pump) and how busy the device was
    (overlap efficiency). Exercises the pump at disk speed instead of the
    harness's tunneled network link."""
    import io as io_mod
    import shutil
    import tempfile

    from watermarking_gpu_tpu.io.config import Settings
    from watermarking_gpu_tpu.models.batched import BatchedWatermark
    from watermarking_gpu_tpu.video.pipeline import embed_video
    from watermarking_gpu_tpu.video.pump import native_available
    from watermarking_gpu_tpu.video.rawyuv import frame_bytes, synthesize

    tmpdir = tempfile.mkdtemp(prefix="wm_soak_")
    need = 2.5 * frames * frame_bytes(cols, rows)
    if shutil.disk_usage(tmpdir).free < need:
        frames = max(batch * 4, int(
            shutil.disk_usage(tmpdir).free / (2.5 * frame_bytes(cols, rows))))
    src = os.path.join(tmpdir, "in.yuv")
    dst = os.path.join(tmpdir, "out.yuv")
    try:
        # one 16-frame chunk repeated to the soak length: content does not
        # change pipeline cost, and synthesis would dominate the setup
        chunk = synthesize(cols, rows, 16, seed=7)
        with open(src, "wb") as fh:
            for _ in range((frames + 15) // 16):
                fh.write(chunk)

        engine = BatchedWatermark(rows, cols, 28390211, psnr=40.0)
        np.asarray(engine.embed_luma_u8(
            np.zeros((batch, rows, cols), np.uint8))[0])   # steady state

        settings = Settings(video=src, raw_video_size=f"{cols}x{rows}",
                            watermark_interval=1, embed_batch=batch,
                            encode_watermark_file_path=dst, p=3, psnr=40.0)
        stats: dict = {}
        embed_video(settings, engine=engine, out=io_mod.StringIO(),
                    stats=stats)

        # device-only batch time on resident data (two-count slope) for the
        # busy-fraction estimate
        resident = jax.device_put(
            np.frombuffer(chunk[:rows * cols * batch], np.uint8)
            .reshape(batch, rows, cols).copy())

        def run_device(n):
            out = None
            t0 = time.perf_counter()
            for _ in range(n):
                out = engine.embed_luma_u8(resident)[0]
            np.asarray(out)
            return time.perf_counter() - t0

        device_s = _slope(run_device, iters=(8, 40), reps=6)
        wall = stats["wall_s"]
        accounted = (stats["read_s"] + stats["collect_s"]
                     + stats["write_s"] + stats["prep_s"] + stats["emit_s"])
        fracs = {
            "read_wait_frac": round(stats["read_s"] / wall, 3),
            "device_wait_frac": round(stats["collect_s"] / wall, 3),
            "write_wait_frac": round(stats["write_s"] / wall, 3),
            "host_prep_frac": round(stats["prep_s"] / wall, 3),
            "emit_assembly_frac": round(stats["emit_s"] / wall, 3),
            "other_frac": round((wall - accounted) / wall, 3),
        }
        binding = max(fracs, key=fracs.get)
        return {
            "fps_e2e": round(stats["frames"] / wall, 1),
            "frames": stats["frames"],
            "native_pump": native_available(),
            **fracs,
            "device_ms_per_batch": round(1e3 * device_s, 2),
            "device_busy_frac": round(
                stats["batches"] * device_s / wall, 4),
            "binding_constraint": binding,
            "note": "interval=1 embed of a local raw .yuv through the real "
                    "pipeline; fracs are the main loop's wall-time shares "
                    "and sum to ~1 (read = source pump, device = D2H "
                    "result pull, write = sink pump, host_prep = batch "
                    "stack + dispatch, emit_assembly = output-frame "
                    "assembly, other = loop/sampling overhead). "
                    "binding_constraint names the largest share. "
                    "device_busy_frac = batches x resident batch slope / "
                    "wall — the overlap efficiency.",
        }
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def _record(report, out_path, key, thunk) -> bool:
    """Run one sweep row, catching failures and flushing incrementally.

    A 2-hour sweep must never lose its completed rows to one bad row (a
    tunnel hiccup mid-run cost the r4 evidence chain exactly that): every
    row is written to ``out_path`` as soon as it lands, and a row that
    raises records ``{"error": ...}`` instead of aborting the sweep."""
    try:
        report["results"][key] = thunk()
    except Exception as exc:  # noqa: BLE001 — record and move on
        report["results"][key] = {"error": f"{type(exc).__name__}: {exc}"}
    print(key, report["results"][key], flush=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    return "error" not in report["results"][key]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="BENCH_SWEEP.json")
    parser.add_argument("--quick", action="store_true",
                        help="512 + 1080p only, fewer iterations")
    parser.add_argument("--only", nargs="*", default=None,
                        help="run only rows whose name contains any of "
                             "these substrings (re-runs merge into --out)")
    parser.add_argument("--cache-dir", default=None,
                        help="persistent compile cache ('' disables; "
                             "default: per-user temp dir)")
    args = parser.parse_args()
    from bench import _probe_devices
    _probe_devices()   # fail fast (one diagnostic line) if the tunnel hangs
    if args.cache_dir != "":
        from watermarking_gpu_tpu.utils import (default_cache_dir,
                                                enable_compilation_cache)
        enable_compilation_cache(args.cache_dir or default_cache_dir())

    impl = default_impl()
    report = {"impl": impl, "device": str(jax.devices()[0]), "results": {}}
    if args.only and os.path.exists(args.out):
        # partial re-run: keep the other rows of the existing artifact
        prior = json.load(open(args.out))
        if prior.get("device") == report["device"]:
            report["results"] = prior.get("results", {})

    def wanted(key: str) -> bool:
        return not args.only or any(s in key for s in args.only)

    sizes = {k: v for k, v in SIZES.items()
             if not (args.quick and k.startswith("4k"))}
    iters = (4, 12) if args.quick else (6, 24)
    failed = 0

    for name, (rows, cols, image_file) in sizes.items():
        size_keys = [f"embed_detect_{name}_{m}" for m in ("me", "nvf")]
        if not any(wanted(k) for k in size_keys):
            continue
        batch = 8 if rows <= 1080 else 2
        frames = load_frames(rows, cols, image_file, batch)
        watermark = generate_watermark(rows, cols, 28390211).astype(
            np.float32)
        # small images need many more iterations per window or the slope
        # drowns in host timing jitter (~30 ms per sync on this tunnel)
        size_iters = iters if rows >= 1080 else (iters[0] * 16, iters[1] * 16)
        for mask_type in ("me", "nvf"):
            key = f"embed_detect_{name}_{mask_type}"
            if wanted(key):
                failed += not _record(
                    report, args.out, key,
                    lambda f=frames, w=watermark, m=mask_type,
                    si=size_iters: measure_roundtrip(f, w, m, impl, si))

    # generalized ME at p in {5, 7, 9} (framework extension; the reference
    # rejects ME at p != 3, main.cpp:88-89) — the engines' routing: the
    # FUSED wide pipeline (wide Pallas lag-Gram kernel + generalized fused
    # tails), measured 1.8x the pure-XLA lag formulation at 1080p p=5
    # (Watermark._impl_for)
    wide_cases = [("512", 5, iters[0] * 16, iters[1] * 16)]
    if not args.quick:
        wide_cases += [("1080p", 5, iters[0] * 2, iters[1] * 2),
                       ("1080p", 7, iters[0] * 2, iters[1] * 2),
                       ("1080p", 9, iters[0], iters[1]),
                       ("4k", 5, iters[0], iters[1])]
    for name, p, ks, kl in wide_cases:
        key = f"embed_detect_{name}_me_p{p}"
        if not wanted(key):
            continue
        rows, cols, image_file = SIZES[name]
        frames = load_frames(rows, cols, image_file,
                             8 if rows <= 1080 else 2)
        watermark = generate_watermark(rows, cols, 28390211).astype(
            np.float32)
        failed += not _record(
            report, args.out, key,
            lambda f=frames, w=watermark, k=(ks, kl),
            pp=p: measure_roundtrip(f, w, "me", "pallas", k, p=pp))

    if wanted("detect_many_512_n64"):
        failed += not _record(report, args.out, "detect_many_512_n64",
                              detect_many_benchmark)
    if not args.quick and wanted("detect_many_1080p_n64_p5"):
        # identification at a generalized window on a production frame
        # size (r3 VERDICT item 3's done-bar row); fused when the chunked
        # kernel's calibrated budget admits the geometry
        from watermarking_gpu_tpu.ops.pallas.fused import \
            detect_many_supported

        def dm_1080p():
            row = detect_many_benchmark(rows=1080, cols=1920, n=64,
                                        iters=(2, 6), reps=4, p=5)
            row["fused"] = bool(detect_many_supported(64, 1080, 1920,
                                                      "me", 5))
            return row

        failed += not _record(report, args.out, "detect_many_1080p_n64_p5",
                              dm_1080p)
    if not args.quick and wanted("detect_many_4k_n64_p7"):
        # identification at a 4K geometry only the r4 adaptive-nc shrink
        # admits fused (nc=4; chip parity 5.6e-09 — the legacy divisor
        # model could not fit the 8-row minimum strip at any nc here)
        from watermarking_gpu_tpu.ops.pallas.fused import (
            detect_many_chunk, detect_many_supported)

        def dm_4k():
            row = detect_many_benchmark(rows=2160, cols=3840, n=64,
                                        iters=(2, 6), reps=4, p=7)
            row["fused"] = bool(detect_many_supported(64, 2160, 3840,
                                                      "me", 7))
            row["nc"] = detect_many_chunk(64, 2160, 3840, "me", 7)[0]
            return row

        failed += not _record(report, args.out, "detect_many_4k_n64_p7",
                              dm_4k)
    if wanted("video_detect_1080p"):
        failed += not _record(report, args.out, "video_detect_1080p",
                              video_detect_benchmark)
    if wanted("video_embed_1080p_interval1"):
        failed += not _record(report, args.out, "video_embed_1080p_interval1",
                              video_embed_benchmark)
    if wanted("video_embed_1080p_local_disk"):
        failed += not _record(report, args.out, "video_embed_1080p_local_disk",
                              video_embed_disk_soak)

    print(f"wrote {args.out}" + (f" ({failed} rows FAILED)" if failed else ""))
    return 2 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
