#!/usr/bin/env python3
"""Detection-threshold calibration for a target false-positive rate.

The detector outputs a correlation; deploying it needs a decision
threshold. This tool estimates the null distribution (correlations of
UNMARKED images against random candidate matrices — one ``detect_many``
dispatch per image samples the whole candidate bank) and the signal
distribution (each image embedded with its own matrix at the configured
PSNR), then reports the Gaussian-tail threshold for the requested FPR and
the measured margins. The reference/thesis reads correlations by eye
(``main.cpp:225-226``); this makes the operating point explicit.

Usage:
    python tools/calibrate_threshold.py [image.png]
        [--mask me] [--p 3] [--psnr 40] [--images 8] [--nulls 256]
        [--fpr 1e-6]          # --fpr must lie in (0, 0.5)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from watermarking_gpu_tpu import MaskType, Watermark  # noqa: E402
from watermarking_gpu_tpu.io import load_image_gray  # noqa: E402
from watermarking_gpu_tpu.io.matfile import generate_watermark  # noqa: E402

DEFAULT_IMAGE = "/root/reference/Watermark_GPU/samples/images/512.png"

def _z_for(fpr: float) -> float:
    """Exact Gaussian upper-tail quantile: threshold = mean + z * std."""
    if not 0.0 < fpr < 0.5:
        raise SystemExit(f"--fpr must be in (0, 0.5), got {fpr}")
    from statistics import NormalDist
    return NormalDist().inv_cdf(1.0 - fpr)


def synthesize_variants(base: np.ndarray, count: int,
                        rng: np.random.Generator) -> np.ndarray:
    """Independent-ish test images from one sample: noise + brightness
    jitter (the detector's null distribution is driven by image content
    statistics, so variants beat reusing one image verbatim)."""
    out = []
    for _ in range(count):
        scale = rng.uniform(0.85, 1.15)
        noisy = base * scale + rng.normal(0, 6.0, base.shape)
        out.append(np.clip(noisy, 0, 255).astype(np.float32))
    return np.stack(out)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("image", nargs="?", default=DEFAULT_IMAGE)
    parser.add_argument("--mask", choices=["me", "nvf"], default="me")
    parser.add_argument("--p", type=int, default=3, choices=[3, 5, 7, 9])
    parser.add_argument("--psnr", type=float, default=40.0)
    parser.add_argument("--images", type=int, default=8,
                        help="test-image variants for both distributions")
    parser.add_argument("--nulls", type=int, default=256,
                        help="random candidate matrices per image; these "
                             "are the iid axis of the null estimate, so "
                             "more candidates tighten the tail")
    parser.add_argument("--fpr", type=float, default=1e-6,
                        help="target false-positive rate")
    args = parser.parse_args()

    rng = np.random.default_rng(7)
    base = load_image_gray(args.image)
    rows, cols = base.shape
    images = synthesize_variants(base, args.images, rng)

    candidates = np.stack([generate_watermark(rows, cols, seed=50_000 + i)
                           for i in range(args.nulls)])
    engine = Watermark(rows, cols, candidates[0], p=args.p, psnr=args.psnr)

    # Null: unmarked images vs every candidate (none embedded) — one
    # batched dispatch for the whole (images, candidates) matrix
    nulls_2d = np.asarray(engine.detect_many(images, candidates, args.mask))

    # Signal: each image embedded with its own matrix, detected against it
    signals = []
    for i, img in enumerate(images):
        wm = generate_watermark(rows, cols, seed=90_000 + i)
        engine.reinitialize(wm, rows, cols)
        marked, _ = engine.embed(img, mask_type=args.mask)
        signals.append(float(engine.detect(np.asarray(marked), args.mask)))
    signals = np.asarray(signals)

    # Statistics: candidates are iid, image variants are correlated (they
    # share the base image), so the iid axis is the candidate bank — use
    # the WORST per-image spread, not the pooled std over images*nulls
    # (pooling overstates the effective sample count).
    per_image_std = nulls_2d.std(axis=1, ddof=1)
    mu = float(nulls_2d.mean())
    sigma = float(per_image_std.max())
    z = _z_for(args.fpr)
    threshold = mu + z * sigma
    misses = int((signals <= threshold).sum())

    print(f"geometry {rows}x{cols}, mask={args.mask}, p={args.p}, "
          f"psnr={args.psnr}")
    print(f"null: {args.images} images x {args.nulls} candidates  "
          f"mean={mu:+.5f}  per-image std "
          f"{float(per_image_std.min()):.5f}..{sigma:.5f}  "
          f"max={float(nulls_2d.max()):+.5f}")
    print(f"threshold @ FPR {args.fpr:g} (z={z:.2f}, Gaussian-tail "
          f"extrapolation from {args.nulls} iid candidates/image; "
          f"widen --nulls for tighter tails): {threshold:+.5f}")
    print(f"signal: n={signals.size}  mean={float(signals.mean()):+.4f}  "
          f"min={float(signals.min()):+.4f}")
    print(f"margin (signal min - threshold): "
          f"{float(signals.min()) - threshold:+.4f}"
          f"{'' if misses == 0 else f'  ({misses} MISSES)'}")
    return 0 if misses == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
