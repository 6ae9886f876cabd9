"""Golden regression tests on the reference's bundled sample fixtures.

The reference ships sample PNGs with exactly-matching watermark ``.dat``
files (512^2, 480p, 720p — ``samples/make_w.bat``, seed 28390211). The
goldens in ``goldens.json`` are this framework's own XLA-oracle outputs,
recorded once (provenance: generated on the CPU backend, jax 0.9) — they pin
the full embed->detect numerics (strengths to 1e-4 relative, correlations to
2e-4 absolute, which also brackets the Pallas path) so any semantic
regression in masks, solve, embedding or detection trips these tests.
"""

import json
import os

import jax.numpy as jnp
import pytest

from watermarking_gpu_tpu.io import load_image_rgb, load_watermark
from watermarking_gpu_tpu.ops import rgb_to_gray, strength_factor
from watermarking_gpu_tpu.ops.pipelines import detect_pipeline, embed_pipeline

SAMPLES = "/root/reference/Watermark_GPU/samples"
CASES = {
    "512": (f"{SAMPLES}/images/512.png", f"{SAMPLES}/w_512.dat", 512, 512),
    "480p": (f"{SAMPLES}/images/480p.png", f"{SAMPLES}/w_480p.dat", 480, 720),
    "720p": (f"{SAMPLES}/images/720p.png", f"{SAMPLES}/w_720p.dat",
             720, 1280),
}

GOLDENS = json.load(open(os.path.join(os.path.dirname(__file__),
                                      "goldens.json")))


@pytest.mark.skipif(not os.path.isdir(SAMPLES),
                    reason="reference samples unavailable")
@pytest.mark.parametrize("name", list(CASES))
@pytest.mark.parametrize("mask_type", ["nvf", "me"])
def test_bundled_sample_goldens(name, mask_type):
    img_path, wm_path, rows, cols = CASES[name]
    rgb = jnp.asarray(load_image_rgb(img_path))
    gray = rgb_to_gray(rgb)
    watermark = jnp.asarray(load_watermark(wm_path, rows, cols))
    sf = strength_factor(40.0)

    marked, strength = embed_pipeline(gray, rgb, watermark, sf, mask_type,
                                      impl="xla")
    corr = detect_pipeline(rgb_to_gray(marked), watermark, mask_type,
                           impl="xla")
    clean = detect_pipeline(gray, watermark, mask_type, impl="xla")

    want = GOLDENS[name][mask_type]
    assert float(strength) == pytest.approx(want["strength"], rel=1e-4)
    assert float(corr) == pytest.approx(want["correlation"], abs=2e-4)
    assert float(clean) == pytest.approx(want["clean_correlation"], abs=2e-4)


@pytest.mark.skipif(not os.path.isdir(SAMPLES),
                    reason="reference samples unavailable")
@pytest.mark.parametrize("name", list(CASES))
@pytest.mark.parametrize("mask_type", ["nvf", "me"])
def test_goldens_vs_independent_oracle(name, mask_type):
    """The recorded goldens are NOT self-referential: a vectorized float64
    NumPy implementation sharing no code with the framework (oracle_vec.py)
    reproduces every strength/correlation on the real bundled samples.
    Measured f32-vs-f64 deltas are <=7.6e-4 (recorded in the tolerances)."""
    import numpy as np
    from PIL import Image

    import oracle_vec as ov

    img_path, wm_path, rows, cols = CASES[name]
    rgb = np.asarray(Image.open(img_path).convert("RGB"))
    watermark = np.fromfile(wm_path, dtype="<f4").reshape(rows, cols)
    gray = ov.rgb_to_gray(rgb)

    marked, strength = ov.embed(gray, rgb, watermark, mask_type, psnr=40.0)
    corr = ov.detect(ov.rgb_to_gray(marked), watermark, mask_type)
    clean = ov.detect(gray, watermark, mask_type)

    want = GOLDENS[name][mask_type]
    assert strength == pytest.approx(want["strength"], rel=1.5e-3)
    assert corr == pytest.approx(want["correlation"], abs=1.5e-3)
    assert clean == pytest.approx(want["clean_correlation"], abs=1e-4)


@pytest.mark.skipif(not os.path.isdir(SAMPLES),
                    reason="reference samples unavailable")
def test_4k_non_divisible_sample():
    """The reference ships 4k_non_divisible.png (3872x2160, width not a
    multiple of 64) specifically to stress the pad path
    (samples/make_w.bat); run the full embed->detect flow on it. (Its .dat
    is a missing LFS blob, so the watermark is generated at the reference
    seed.)"""
    import numpy as np

    from watermarking_gpu_tpu.io import load_image_gray
    from watermarking_gpu_tpu.io.matfile import generate_watermark

    gray = load_image_gray(f"{SAMPLES}/images/4k_non_divisible.png")
    rows, cols = gray.shape
    assert (rows, cols) == (2160, 3872)
    watermark = jnp.asarray(
        generate_watermark(rows, cols, seed=28390211).astype(np.float32))
    gray = jnp.asarray(gray)
    sf = strength_factor(40.0)

    marked, strength = embed_pipeline(gray, gray, watermark, sf, "me",
                                      impl="xla")
    corr = float(detect_pipeline(marked, watermark, "me", impl="xla"))
    clean = float(detect_pipeline(gray, watermark, "me", impl="xla"))
    assert float(strength) > 0
    assert corr > clean + 0.3
    assert abs(clean) < 0.05


@pytest.mark.skipif(not os.path.isdir(SAMPLES),
                    reason="reference samples unavailable")
@pytest.mark.parametrize("p", [5, 7, 9])
@pytest.mark.parametrize("mask_type", ["nvf", "me"])
def test_wide_window_goldens(p, mask_type):
    """Regression pin for the generalized wide windows (p in {5,7,9} — the
    capability the reference TODO'd away, main.cpp:88-89) on the real 512
    sample: recorded XLA-oracle outputs, CPU backend, jax 0.9. The
    cross-impl parity tests (test_pallas.py) catch pallas-vs-xla drift;
    this catches BOTH drifting together. ME tolerances are wider than
    p=3's: the wide Gram's conditioning amplifies f32 reduction-order
    noise to ~2e-3 rel in strength (see tools/check_goldens.py)."""
    img_path, wm_path, rows, cols = CASES["512"]
    rgb = jnp.asarray(load_image_rgb(img_path))
    gray = rgb_to_gray(rgb)
    watermark = jnp.asarray(load_watermark(wm_path, rows, cols))
    sf = strength_factor(40.0)

    marked, strength = embed_pipeline(gray, rgb, watermark, sf, mask_type,
                                      impl="xla", p=p)
    corr = detect_pipeline(rgb_to_gray(marked), watermark, mask_type,
                           impl="xla", p=p)
    clean = detect_pipeline(gray, watermark, mask_type, impl="xla", p=p)

    want = GOLDENS["wide_512"][f"p{p}"][mask_type]
    strength_rel = 2e-3 if mask_type == "me" else 1e-4
    assert float(strength) == pytest.approx(want["strength"],
                                            rel=strength_rel)
    assert float(corr) == pytest.approx(want["correlation"], abs=5e-4)
    assert float(clean) == pytest.approx(want["clean_correlation"],
                                         abs=5e-4)
