"""Utilities: timing, profiling, compile caching, debug display helpers."""

from .compile_cache import default_cache_dir, enable_compilation_cache
from .display import display_array
from .profiling import annotate, trace
from .timing import Timer, execution_time

__all__ = ["Timer", "annotate", "default_cache_dir", "display_array",
           "enable_compilation_cache", "execution_time", "trace"]
