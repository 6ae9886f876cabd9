"""Persistent compilation cache for cold-start avoidance.

The fused Pallas programs compile in minutes per (shape, batch) on TPU —
the reference's analog is its OpenCL JIT at startup
(``/root/reference/Watermark_GPU/main.cpp:99-118``), which is fast only
because OpenCL C is tiny. JAX's persistent compilation cache stores the
compiled executables on disk keyed by program fingerprint, so every process
after the first starts hot (verified to work through the remote TPU
compile path: 6.4 s -> 2.6 s on a small shape; minutes on 1080p).

Enable via ``[options] compilation_cache_dir`` in settings.ini, or call
``enable_compilation_cache`` before the first jit.
"""

from __future__ import annotations

import getpass
import os
import tempfile


def default_cache_dir() -> str:
    """Per-user default cache path (a world-shared /tmp path would let one
    user's cache poison or permission-block another's).

    The ``v2`` suffix namespaces away executables compiled before the
    engines pinned row-major boundary layouts (utils/layouts.py): jax's
    persistent-cache key does not capture jit layout Formats, so a
    pre-pinning executable (compiled with auto boundary layouts) loads
    for a pinned jit and then fails dispatch with "Layout passed to jit
    does not match the layout on the respective arg". Bump the suffix on
    any future change that alters boundary layouts without changing HLO.
    """
    try:
        user = getpass.getuser()
    except Exception:
        user = str(os.getuid()) if hasattr(os, "getuid") else "user"
    return os.path.join(tempfile.gettempdir(), f"wm_jax_cache_v2_{user}")


def enable_compilation_cache(path: "str | os.PathLike",
                             min_compile_seconds: float = 1.0) -> str:
    """Persist compiled executables under ``path`` across processes.

    Must run before the first compilation. Programs whose compile takes
    less than ``min_compile_seconds`` are not persisted (avoids flooding
    the cache with trivial kernels).
    """
    import jax

    path = os.fspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_seconds))
    return path
