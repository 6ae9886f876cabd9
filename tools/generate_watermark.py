#!/usr/bin/env python3
"""Watermark matrix generator CLI.

Same contract as the reference's ``CommonRandomMatrix.exe rows cols seed file``
(``/root/reference/CommonRandomMatrix/main.cpp:16-68``): writes ``rows*cols``
N(0,1) float32 values to a raw little-endian file.

Extra flag ``--repeat-blocks N`` emulates the reference generator's
same-seed-per-OpenMP-thread quirk (``CommonRandomMatrix/main.cpp:41``).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from watermarking_gpu_tpu.io.matfile import generate_watermark, save_watermark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        description="Generate a N(0,1) float32 watermark matrix (.dat)")
    parser.add_argument("rows", type=int)
    parser.add_argument("cols", type=int)
    parser.add_argument("seed", type=int)
    parser.add_argument("output_file")
    parser.add_argument("--repeat-blocks", type=int, default=1,
                        help="emulate the reference's per-thread stream "
                             "repetition quirk")
    args = parser.parse_args(argv)
    try:
        matrix = generate_watermark(args.rows, args.cols, args.seed,
                                    repeat_blocks=args.repeat_blocks)
    except ValueError as exc:
        print(exc, file=sys.stderr)
        return 1
    save_watermark(args.output_file, matrix)
    print(f"Successfully wrote {args.rows * args.cols} random floats to "
          f"{args.output_file}.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
