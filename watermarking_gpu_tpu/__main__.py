"""``python -m watermarking_gpu_tpu [settings.ini]`` — the benchmark CLI."""

import sys

from .cli.main import main

if __name__ == "__main__":
    sys.exit(main())
