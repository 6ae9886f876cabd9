"""Test configuration: run the suite on an 8-device virtual CPU mesh.

Real-TPU behavior is covered by bench.py and __graft_entry__.py, which the
driver runs on hardware; the test suite targets the XLA CPU backend so it can
validate numerics and multi-chip sharding without TPUs (SURVEY.md §4).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# keep the suite out of the pinned-program AOT side-cache (the cache tests
# point it at tmp dirs explicitly via monkeypatch.setenv)
os.environ.setdefault("WMTPU_PINNED_CACHE", "off")

import jax  # noqa: E402

# The ambient environment pins an experimental TPU platform plugin that wins
# over JAX_PLATFORMS; the config update below takes precedence over both.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Build the native frame pump when a compiler exists so the C++ ring is
# CI-exercised (the suite otherwise silently skips to the Python pump).
import shutil  # noqa: E402
import subprocess  # noqa: E402

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
if (not os.path.exists(os.path.join(_NATIVE_DIR, "libwmpump.so"))
        and shutil.which("make") and shutil.which("g++")):
    subprocess.run(["make", "-C", _NATIVE_DIR, "libwmpump.so"],
                   check=False, capture_output=True, timeout=180)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_SAMPLES = "/root/reference/Watermark_GPU/samples"


@pytest.fixture()
def rng():
    """A fresh identically-seeded generator per test.

    Function scope makes every test's random draws independent of
    execution order — with a shared session generator, adding or removing
    any test shifted all later draws, turning tolerance-borderline tests
    into order-dependent flakes.
    """
    return np.random.default_rng(28390211)


@pytest.fixture(scope="session")
def small_image():
    """A structured 72x96 grayscale test image on 0..255 (self-seeded so
    the pixels never depend on which tests ran before first use)."""
    h, w = 72, 96
    # distinct seed from the per-test rng fixture: sharing a stream would
    # make this image's noise IDENTICAL to the first per-test draw (which
    # broke watermark-identification tests — the noise was candidate 0)
    rng = np.random.default_rng(96720817)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 96.0 + 64.0 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
    noise = rng.normal(0.0, 12.0, size=(h, w)).astype(np.float32)
    return np.clip(base + noise, 0.0, 255.0).astype(np.float32)


@pytest.fixture(scope="session")
def small_watermark(small_image):
    rng = np.random.default_rng(1171)
    return rng.normal(0.0, 1.0, size=small_image.shape).astype(np.float32)
