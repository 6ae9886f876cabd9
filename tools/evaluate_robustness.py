#!/usr/bin/env python3
"""Detector robustness evaluation under common attacks.

Embeds a watermark, applies an attack family (additive noise, JPEG
recompression, u8 quantization, brightness scaling), and reports detector
correlations — the standard evaluation the thesis behind the reference runs
by hand. Uses the batched engine so every attack level is one dispatch.

Usage:
    python tools/evaluate_robustness.py [image.png] [--psnr 40] [--mask me]
"""

from __future__ import annotations

import argparse
import io
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from watermarking_gpu_tpu.io import load_image_gray  # noqa: E402
from watermarking_gpu_tpu.io.matfile import generate_watermark  # noqa: E402
from watermarking_gpu_tpu.models.batched import BatchedWatermark  # noqa: E402

DEFAULT_IMAGE = "/root/reference/Watermark_GPU/samples/images/512.png"


def jpeg_roundtrip(gray: np.ndarray, quality: int) -> np.ndarray:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(gray.astype(np.uint8)).save(buf, format="JPEG",
                                                quality=quality)
    buf.seek(0)
    return np.asarray(Image.open(buf), dtype=np.float32)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("image", nargs="?", default=DEFAULT_IMAGE)
    parser.add_argument("--psnr", type=float, default=40.0)
    parser.add_argument("--mask", choices=["me", "nvf"], default="me")
    parser.add_argument("--p", type=int, default=3, choices=[3, 5, 7, 9],
                        help="mask window (ME p>3 runs the generalized "
                             "predictor — a framework extension)")
    parser.add_argument("--seed", type=int, default=28390211)
    args = parser.parse_args()

    gray = load_image_gray(args.image)
    rows, cols = gray.shape
    watermark = generate_watermark(rows, cols, args.seed)
    engine = BatchedWatermark(rows, cols, watermark, p=args.p,
                              psnr=args.psnr)

    marked_batch, strength = engine.embed(gray[None], mask_type=args.mask)
    marked = np.asarray(marked_batch)[0]
    print(f"image {args.image} ({rows}x{cols}), mask={args.mask}, "
          f"p={args.p}, psnr={args.psnr}, "
          f"strength={float(strength[0]):.4f}\n")

    rng = np.random.default_rng(0)
    attacks: list[tuple[str, np.ndarray]] = [("none", marked),
                                             ("clean image (no mark)", gray)]
    for sigma in (2, 5, 10, 20):
        noisy = np.clip(marked + rng.normal(0, sigma, marked.shape), 0, 255)
        attacks.append((f"gaussian noise sigma={sigma}",
                        noisy.astype(np.float32)))
    attacks.append(("u8 quantization",
                    marked.astype(np.uint8).astype(np.float32)))
    for quality in (90, 70, 50, 30):
        attacks.append((f"jpeg q={quality}",
                        jpeg_roundtrip(np.clip(marked, 0, 255), quality)))
    for scale in (0.9, 1.1):
        attacks.append((f"brightness x{scale}",
                        np.clip(marked * scale, 0, 255).astype(np.float32)))

    stack = np.stack([frame for _, frame in attacks])
    corrs = np.asarray(engine.detect(stack, args.mask))
    width = max(len(name) for name, _ in attacks)
    print(f"{'attack'.ljust(width)}  correlation")
    for (name, _), corr in zip(attacks, corrs):
        print(f"{name.ljust(width)}  {corr:+.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
