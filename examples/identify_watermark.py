#!/usr/bin/env python3
"""Watermark identification: which of N candidate matrices does an image
carry?

One `detect_many` dispatch correlates the image against every candidate,
sharing the image analysis (Gram, solve, error sequence, mask) across all
of them — ~10x cheaper per candidate than N separate detections (the
reference can only loop ``detectWatermark``, Watermark.cpp:234-250).

Usage: python examples/identify_watermark.py [image.png] [n_candidates]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from watermarking_gpu_tpu import MaskType, Watermark
from watermarking_gpu_tpu.io import load_image_gray
from watermarking_gpu_tpu.io.matfile import generate_watermark

SAMPLES = "/root/reference/Watermark_GPU/samples"


def main():
    image_path = sys.argv[1] if len(sys.argv) > 1 else \
        f"{SAMPLES}/images/512.png"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    gray = load_image_gray(image_path)
    rows, cols = gray.shape
    # one matrix per "user"; in production these come from a key registry
    candidates = np.stack([generate_watermark(rows, cols, seed=1000 + i)
                           for i in range(n)])
    true_index = n // 2

    engine = Watermark(rows, cols, candidates[true_index], p=3, psnr=40.0)
    marked, strength = engine.embed(gray, mask_type=MaskType.ME)
    print(f"embedded candidate #{true_index} "
          f"(strength {float(strength):.3f})")

    corrs = np.asarray(engine.detect_many(np.asarray(marked), candidates))
    best = int(np.argmax(corrs))
    print(f"identification over {n} candidates (one dispatch):")
    for i, c in enumerate(corrs):
        tag = "  <-- identified" if i == best else ""
        print(f"  candidate {i:2d}: {c:+.4f}{tag}")
    assert best == true_index, "identification failed"
    print("correct.")


if __name__ == "__main__":
    main()
