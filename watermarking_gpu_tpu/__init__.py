"""watermarking_gpu_tpu — a TPU-native spread-spectrum watermarking framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the OpenCL
reference kar-dim/Watermarking-GPU: NVF and Prediction-Error perceptual masks,
PSNR-scaled additive embedding, correlation-based detection, image and video
pipelines, and a settings.ini-driven benchmark CLI.
"""

from .models import MaskType, Watermark
from .ops import strength_factor

__version__ = "0.1.0"

__all__ = ["MaskType", "Watermark", "strength_factor", "__version__"]
