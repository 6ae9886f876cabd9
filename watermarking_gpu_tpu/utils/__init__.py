"""Utilities: timing, debug display helpers."""

from .display import display_array
from .timing import Timer, execution_time

__all__ = ["Timer", "display_array", "execution_time"]
