#!/usr/bin/env python3
"""Video embed + detect on a synthetic raw .yuv clip (no ffmpeg required).

Usage: python examples/video_watermark.py
"""

import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from watermarking_gpu_tpu.io.config import Settings
from watermarking_gpu_tpu.io.matfile import generate_watermark, save_watermark
from watermarking_gpu_tpu.video import detect_video, embed_video, synthesize

W, H, FRAMES, INTERVAL = 640, 360, 60, 10


def main():
    root = Path(tempfile.mkdtemp(prefix="wm_video_"))
    clip = root / "clip.yuv"
    clip.write_bytes(synthesize(W, H, FRAMES, seed=7))
    wm_path = root / "w.dat"
    save_watermark(wm_path, generate_watermark(H, W, 28390211))

    common = dict(watermark=str(wm_path), p=3, psnr=38.0,
                  watermark_interval=INTERVAL,
                  raw_video_size=f"{W}x{H}", raw_video_fps=30.0)

    marked = root / "marked.yuv"
    embed_video(Settings(video=str(clip),
                         encode_watermark_file_path=str(marked), **common))

    print("\n-- detection on the watermarked clip --")
    detect_video(Settings(video=str(marked), detect_batch=4, **common))

    print("\n-- detection on the clean clip (should be ~0) --")
    detect_video(Settings(video=str(clip), detect_batch=4, **common))


if __name__ == "__main__":
    main()
