"""Watermarking engines (model families: NVF mask, Prediction-Error mask)."""

from .masks import MaskType
from .watermark import Watermark, default_impl

__all__ = ["MaskType", "Watermark", "default_impl"]
