#!/usr/bin/env python3
"""Batching detector service demo: submit frames, collect futures.

Usage: python examples/serving_demo.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from watermarking_gpu_tpu.models.batched import BatchedWatermark
from watermarking_gpu_tpu.serving import (DetectorService, EmbedderService,
                                          IdentifierService)

H, W, N = 360, 640, 32


def main():
    rng = np.random.default_rng(0)
    wm = rng.normal(size=(H, W)).astype(np.float32)
    frames = np.clip(rng.normal(128, 40, (N, H, W)), 0,
                     255).astype(np.float32)
    engine = BatchedWatermark(H, W, wm, p=3, psnr=35.0)

    embedder = EmbedderService(engine, batch_size=8)
    detector = DetectorService(engine, batch_size=8)
    try:
        t0 = time.perf_counter()
        marked = [f.result()[0]
                  for f in [embedder.submit(x) for x in frames]]
        corrs = [f.result()
                 for f in [detector.submit(m) for m in marked]]
        dt = time.perf_counter() - t0
        print(f"{N} frames embed+detect in {dt:.2f}s "
              f"({N / dt:.1f} fps end-to-end incl. transfers)")
        print(f"correlations: min {min(corrs):.3f} max {max(corrs):.3f}")
    finally:
        embedder.close()
        detector.close()

    # identification: which candidate does a frame carry? (the engine's
    # own matrix is candidate 0 among decoys)
    bank = np.stack([wm] + [rng.normal(size=(H, W)).astype(np.float32)
                            for _ in range(7)])
    identifier = IdentifierService(engine, bank, batch_size=8)
    try:
        scores = identifier.submit(marked[0]).result()
        print(f"identified candidate {int(np.argmax(scores))} "
              f"(scores: {np.round(scores, 3)})")
    finally:
        identifier.close()


if __name__ == "__main__":
    main()
