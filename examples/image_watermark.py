#!/usr/bin/env python3
"""Minimal image embed + detect round trip.

Usage: python examples/image_watermark.py [image.png] [watermark.dat]
Defaults to the reference's bundled 512^2 sample.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from watermarking_gpu_tpu import MaskType, Watermark
from watermarking_gpu_tpu.io import load_image_gray, save_image_u8

SAMPLES = "/root/reference/Watermark_GPU/samples"


def main():
    image_path = sys.argv[1] if len(sys.argv) > 1 else \
        f"{SAMPLES}/images/512.png"
    wm_path = sys.argv[2] if len(sys.argv) > 2 else f"{SAMPLES}/w_512.dat"

    gray = load_image_gray(image_path)
    engine = Watermark(*gray.shape, wm_path, p=3, psnr=40.0)

    for mask_type in (MaskType.NVF, MaskType.ME):
        marked, strength = engine.embed(gray, mask_type=mask_type)
        corr = engine.detect(marked, mask_type)
        clean = engine.detect(gray, mask_type)
        print(f"{mask_type.name}: strength={float(strength):.4f} "
              f"corr(marked)={float(corr):.6f} corr(clean)={float(clean):.6f}")
        save_image_u8(f"/tmp/marked_{mask_type.name.lower()}.png",
                      __import__("numpy").asarray(marked))
    print("watermarked images written to /tmp/marked_{nvf,me}.png")


if __name__ == "__main__":
    main()
