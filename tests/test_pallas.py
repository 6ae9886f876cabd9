"""Pallas strip kernels vs the jnp oracle ops (interpreter mode on CPU).

Real-TPU parity and performance are exercised by bench.py and the driver's
compile checks; here the same kernel code runs through the Pallas interpreter
on small shapes, including non-8/128-aligned and batched cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from watermarking_gpu_tpu.ops import me, nvf
from watermarking_gpu_tpu.ops.pallas.me_kernel import me_normal_equations_pallas
from watermarking_gpu_tpu.ops.pallas.nvf_kernel import nvf_mask_pallas
from watermarking_gpu_tpu.ops.pallas.predict_kernel import (
    prediction_error_pallas)


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(40961)
    return jnp.asarray(
        np.clip(rng.normal(128, 40, (40, 96)), 0, 255).astype(np.float32))


@pytest.fixture(scope="module")
def odd_image():
    """Rows/cols not multiples of 8/128 exercise padding + masking."""
    rng = np.random.default_rng(37831)
    return jnp.asarray(
        np.clip(rng.normal(128, 40, (37, 83)), 0, 255).astype(np.float32))


@pytest.mark.parametrize("p", [3, 5, 7, 9])
def test_nvf_kernel_matches_oracle(image, p):
    got = np.asarray(nvf_mask_pallas(image, p=p, strip=16))
    want = np.asarray(nvf.nvf_mask(image, p=p))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_nvf_kernel_odd_shape(odd_image):
    got = np.asarray(nvf_mask_pallas(odd_image, strip=16))
    want = np.asarray(nvf.nvf_mask(odd_image))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_me_gram_matches_oracle(image):
    rm, rv = me_normal_equations_pallas(image)
    rm2, rv2 = me.me_normal_equations(image)
    np.testing.assert_allclose(np.asarray(rm), np.asarray(rm2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rv), np.asarray(rv2), rtol=1e-4)


def test_me_gram_odd_shape_masks_padding(odd_image):
    rm, rv = me_normal_equations_pallas(odd_image)
    rm2, rv2 = me.me_normal_equations(odd_image)
    np.testing.assert_allclose(np.asarray(rm), np.asarray(rm2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rv), np.asarray(rv2), rtol=1e-4)


@pytest.mark.parametrize("p", [5, 7, 9])
def test_wide_gram_matches_oracle(rng, p):
    """Generalized-window lag-Gram kernel (me_gram_wide) vs the XLA lag
    formulation across raw-mode, padded-fallback, masked-bottom-strip and
    batched geometries."""
    from watermarking_gpu_tpu.ops.pallas.me_gram_wide import (
        me_normal_equations_wide, wide_gram_supported)
    h = p // 2
    for shape in [(72, 72),      # raw mode with masked bottom strips
                  (100, 130),    # padded fallback (rows % 8 != 0)
                  (64, 96),      # raw, strip divides rows
                  (6 * h, 6 * h)]:  # smallest supported geometry
        assert wide_gram_supported(*shape, p)
        img = jnp.asarray(np.clip(rng.normal(128, 40, shape), 0,
                                  255).astype(np.float32))
        rm, rv = me_normal_equations_wide(img, p)
        rm2, rv2 = me.me_normal_equations(img, p)
        np.testing.assert_allclose(np.asarray(rm), np.asarray(rm2),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(rv), np.asarray(rv2),
                                   rtol=1e-4)
    # batched
    imgs = jnp.asarray(np.clip(rng.normal(128, 40, (3, 64, 96)), 0,
                               255).astype(np.float32))
    rm, rv = me_normal_equations_wide(imgs, p)
    rm2, rv2 = me.me_normal_equations(imgs, p)
    np.testing.assert_allclose(np.asarray(rm), np.asarray(rm2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rv), np.asarray(rv2), rtol=1e-4)
    # tiny images fall outside the supported geometry (XLA path covers them)
    assert not wide_gram_supported(6 * h - 1, 96, p)


def test_prediction_error_matches_oracle(image):
    rm, rv = me.me_normal_equations(image)
    coeffs, valid = me.solve_coefficients(rm, rv)
    assert bool(valid)
    got = np.asarray(prediction_error_pallas(image, coeffs))
    want = np.asarray(me.prediction_error(image, coeffs))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_batched_kernels(image, rng):
    batch = jnp.stack([image, image[::-1], image * 0.5 + 32.0])
    rm_b, rv_b = me_normal_equations_pallas(batch)
    assert rm_b.shape == (3, 8, 8) and rv_b.shape == (3, 8)
    for i in range(3):
        rm, rv = me.me_normal_equations(batch[i])
        np.testing.assert_allclose(np.asarray(rm_b[i]), np.asarray(rm),
                                   rtol=1e-4)
    coeffs = jnp.asarray(rng.normal(0, 0.2, (3, 8)).astype(np.float32))
    got = np.asarray(prediction_error_pallas(batch, coeffs))
    for i in range(3):
        want = np.asarray(me.prediction_error(batch[i], coeffs[i]))
        np.testing.assert_allclose(got[i], want, atol=1e-3)
    got_nvf = np.asarray(nvf_mask_pallas(batch, strip=16))
    for i in range(3):
        np.testing.assert_allclose(got_nvf[i],
                                   np.asarray(nvf.nvf_mask(batch[i])),
                                   atol=5e-3)


def test_pallas_pipeline_matches_xla(image, rng):
    from watermarking_gpu_tpu.ops.pipelines import (detect_pipeline,
                                                    embed_pipeline)
    wm = jnp.asarray(rng.normal(size=image.shape).astype(np.float32))
    for mask_type in ("me", "nvf"):
        ref = float(detect_pipeline(image, wm, mask_type, impl="xla"))
        got = float(detect_pipeline(image, wm, mask_type, impl="pallas"))
        assert got == pytest.approx(ref, abs=1e-4)
        ref_o, ref_s = embed_pipeline(image, image, wm, 2.55, mask_type,
                                      impl="xla")
        got_o, got_s = embed_pipeline(image, image, wm, 2.55, mask_type,
                                      impl="pallas")
        assert float(got_s) == pytest.approx(float(ref_s), rel=1e-4)
        np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                                   atol=5e-2)


@pytest.mark.parametrize("p", [5, 9])
def test_pallas_pipeline_nvf_wide_windows(image, rng, p):
    """p=9 exercises the pad=8 geometry in the fused detect tail."""
    from watermarking_gpu_tpu.ops.pipelines import detect_pipeline
    wm = jnp.asarray(rng.normal(size=image.shape).astype(np.float32))
    ref = float(detect_pipeline(image, wm, "nvf", p=p, impl="xla"))
    got = float(detect_pipeline(image, wm, "nvf", p=p, impl="pallas"))
    assert got == pytest.approx(ref, abs=2e-4)


def test_pallas_fuzz_shapes(rng):
    """Random odd shapes through both fused pipelines vs the oracle."""
    from watermarking_gpu_tpu.ops.pipelines import (detect_pipeline,
                                                    embed_pipeline)
    # 3872 is the 4k_non_divisible sample width (not a multiple of 64 or
    # 128): stresses the lane-misaligned pad path at a real-world width
    for rows, cols in [(17, 131), (64, 64), (33, 257), (96, 140),
                       (24, 3872)]:
        img = jnp.asarray(np.clip(rng.normal(128, 40, (rows, cols)), 0,
                                  255).astype(np.float32))
        wm = jnp.asarray(rng.normal(size=(rows, cols)).astype(np.float32))
        ref = float(detect_pipeline(img, wm, "me", impl="xla"))
        got = float(detect_pipeline(img, wm, "me", impl="pallas"))
        assert got == pytest.approx(ref, abs=3e-4), (rows, cols)
        ref_o, ref_s = embed_pipeline(img, img, wm, 2.55, "me", impl="xla")
        got_o, got_s = embed_pipeline(img, img, wm, 2.55, "me", impl="pallas")
        assert float(got_s) == pytest.approx(float(ref_s), rel=2e-4)
        np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                                   atol=0.1)


def test_raw_mode_matches_oracle(rng):
    """Raw-input kernels (in-kernel halo staging, no XLA pad copy)
    reproduce the oracle on raw-capable geometries, including one with
    bottom padding (last-strip realignment + masking) and NVF."""
    from watermarking_gpu_tpu.ops.pallas.common import raw_mode_ok
    from watermarking_gpu_tpu.ops.pallas.fused import pipeline_geometry
    from watermarking_gpu_tpu.ops.pipelines import (detect_pipeline,
                                                    embed_pipeline)

    tested_raw = 0
    for rows, cols, mask_type in [(512, 512, "me"), (1048, 512, "me"),
                                  (1024, 512, "me"), (1048, 512, "nvf"),
                                  (530, 512, "me")]:
        pad, strip, rows_padded = pipeline_geometry(rows, cols, mask_type, 3)
        is_raw = raw_mode_ok(rows, strip, rows_padded)
        img = jnp.asarray(np.clip(rng.normal(128, 40, (rows, cols)), 0,
                                  255).astype(np.float32))
        wm = jnp.asarray(rng.normal(size=(rows, cols)).astype(np.float32))
        ref = float(detect_pipeline(img, wm, mask_type, impl="xla"))
        got = float(detect_pipeline(img, wm, mask_type, impl="pallas"))
        assert got == pytest.approx(ref, abs=3e-4), (rows, cols, mask_type)
        ref_o, ref_s = embed_pipeline(img, img, wm, 2.55, mask_type,
                                      impl="xla")
        got_o, got_s = embed_pipeline(img, img, wm, 2.55, mask_type,
                                      impl="pallas")
        assert float(got_s) == pytest.approx(float(ref_s), rel=2e-4)
        np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                                   atol=0.1)
        tested_raw += is_raw
    assert tested_raw >= 4  # the geometries above must exercise raw mode,
    # including a masked one (1048 pads to 1056: last-strip realignment)


def test_precomputed_padded_watermark_identical(rng):
    """Passing the engine-style pre-padded watermark (pad copy paid once)
    is bit-identical to letting the pipeline pad per call — both on a
    raw-capable geometry and on one where raw mode does not apply
    (precompute returns None there)."""
    from watermarking_gpu_tpu.ops.pipelines import (
        detect_pipeline, embed_pipeline, precompute_padded_watermark)

    saw_padded = saw_none = False
    for rows, cols in [(512, 256), (17, 131)]:
        img = jnp.asarray(np.clip(rng.normal(128, 40, (rows, cols)), 0,
                                  255).astype(np.float32))
        wm = jnp.asarray(rng.normal(size=(rows, cols)).astype(np.float32))
        wm_p = precompute_padded_watermark(wm, "me")
        saw_padded |= wm_p is not None
        saw_none |= wm_p is None
        base = detect_pipeline(img, wm, "me", impl="pallas")
        with_p = detect_pipeline(img, wm, "me", impl="pallas",
                                 watermark_padded=wm_p)
        assert float(base) == float(with_p)
        base_o, base_s = embed_pipeline(img, img, wm, 2.55, "me",
                                        impl="pallas")
        got_o, got_s = embed_pipeline(img, img, wm, 2.55, "me",
                                      impl="pallas", watermark_padded=wm_p)
        assert float(base_s) == float(got_s)
        np.testing.assert_array_equal(np.asarray(base_o), np.asarray(got_o))
    assert saw_padded and saw_none


def test_precompute_padded_watermark_host_producer(rng):
    """The padded watermark is edge-padded on the HOST and uploaded with
    an explicit row-major Format (no compile): values must match the
    in-jit pad_image exactly and the tag must be row-major — the pre-r5
    jitted producer force-pinned the same tag but paid an uncacheable
    live compile on every process start (utils/layouts.py)."""
    from watermarking_gpu_tpu.ops.pallas.common import RAW_PAD, pad_image
    from watermarking_gpu_tpu.ops.pallas.fused import pipeline_geometry
    from watermarking_gpu_tpu.ops.pipelines import \
        precompute_padded_watermark

    rows, cols = 512, 260
    wm = rng.normal(size=(rows, cols)).astype(np.float32)
    got = precompute_padded_watermark(jnp.asarray(wm), "me")
    assert got is not None
    _, _, rows_padded = pipeline_geometry(rows, cols, "me", 3)
    want = pad_image(jnp.asarray(wm), RAW_PAD, rows_padded)
    assert got.shape == want.shape and got.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert tuple(got.format.layout.major_to_minor) == (0, 1)


@pytest.mark.parametrize("p,rows", [(5, 72), (7, 72), (9, 20)])
def test_mixed_wide_me_matches_xla(rng, p, rows):
    """impl='pallas' at ME p>3 runs the FUSED wide pipeline (wide lag-Gram
    kernel + wide-ring fused tails) at supported geometries and must match
    the pure-XLA path to f32-reduction-order noise. p=9 at rows=20 sits
    below the wide Gram's lag threshold — there the pipelines route to
    the pure-XLA formulation themselves (pipelines._wide_me_fallback), so
    that row pins the fallback's trivial parity."""
    from watermarking_gpu_tpu.ops.pipelines import (detect_pipeline,
                                                    embed_pipeline)

    img = jnp.asarray(np.clip(rng.normal(128, 30, (rows, 96)), 0,
                              255).astype(np.float32))
    wm = jnp.asarray(rng.normal(size=(rows, 96)).astype(np.float32))
    ref_out, ref_s = embed_pipeline(img, img, wm, 2.55, "me", p=p,
                                    impl="xla")
    got_out, got_s = embed_pipeline(img, img, wm, 2.55, "me", p=p,
                                    impl="pallas")
    np.testing.assert_allclose(float(got_s), float(ref_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=1e-3)
    ref_c = detect_pipeline(jnp.asarray(got_out), wm, "me", p=p, impl="xla")
    got_c = detect_pipeline(jnp.asarray(got_out), wm, "me", p=p,
                            impl="pallas")
    np.testing.assert_allclose(float(got_c), float(ref_c), atol=2e-4)


@pytest.mark.parametrize("p", [7, 9])
def test_wide_tail_bf16_ring_tolerance(rng, p, monkeypatch):
    """Tolerance bound for the opt-in bf16 ring staging of the wide detect
    tail (the p=7/9 VMEM-budget lever, fused.WIDE_TAIL_BF16): detector
    correlations on an embedded image must stay within the ~1e-3 class —
    the reference's own fp16 Gram staging noise floor (me_p3.hpp:27,
    docs/PARITY.md) — of the all-f32 fused path AND of the f64-solve XLA
    formulation. Pins the numerics so the on-chip budget recalibration
    only has to measure VMEM/fps, not correctness."""
    import watermarking_gpu_tpu.ops.pallas.fused as fused
    from watermarking_gpu_tpu.ops.pipelines import (detect_pipeline,
                                                    embed_pipeline)

    rows, cols = 72, 96
    img = jnp.asarray(np.clip(rng.normal(128, 30, (rows, cols)), 0,
                              255).astype(np.float32))
    wm = jnp.asarray(rng.normal(size=(rows, cols)).astype(np.float32))
    marked, _ = embed_pipeline(img, img, wm, 2.55, "me", p=p, impl="xla")
    marked = jnp.asarray(marked)
    f32 = float(detect_pipeline(marked, wm, "me", p=p, impl="pallas"))
    xla = float(detect_pipeline(marked, wm, "me", p=p, impl="xla"))
    monkeypatch.setattr(fused, "WIDE_TAIL_BF16", True)
    bf16 = float(detect_pipeline(marked, wm, "me", p=p, impl="pallas"))
    assert bf16 == pytest.approx(f32, abs=2e-3)
    assert bf16 == pytest.approx(xla, abs=2e-3)
    # the bf16 ring must separate marked from clean exactly like f32 does
    # (marked corr ~0.16 on this small weakly-embedded image, clean ~0.002;
    # measured bf16-vs-f32 delta is ~1e-4)
    clean = float(detect_pipeline(img, wm, "me", p=p, impl="pallas"))
    assert bf16 > clean + 0.1


@pytest.mark.parametrize("p", [5, 7, 9])
def test_fused_nvf_wide_windows(rng, p):
    """Fused NVF pipelines at p in {5,7,9}: wider halos through both the
    raw-capable and fallback geometries."""
    from watermarking_gpu_tpu.ops.pipelines import (detect_pipeline,
                                                    embed_pipeline)
    for rows, cols in [(512, 256), (96, 128)]:   # raw mode / fallback
        img = jnp.asarray(np.clip(rng.normal(128, 40, (rows, cols)), 0,
                                  255).astype(np.float32))
        wm = jnp.asarray(rng.normal(size=(rows, cols)).astype(np.float32))
        ref = float(detect_pipeline(img, wm, "nvf", p=p, impl="xla"))
        got = float(detect_pipeline(img, wm, "nvf", p=p, impl="pallas"))
        assert got == pytest.approx(ref, abs=3e-4), (rows, cols, p)
        ref_o, ref_s = embed_pipeline(img, img, wm, 2.55, "nvf", p=p,
                                      impl="xla")
        got_o, got_s = embed_pipeline(img, img, wm, 2.55, "nvf", p=p,
                                      impl="pallas")
        assert float(got_s) == pytest.approx(float(ref_s), rel=2e-4)
        np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                                   atol=0.1)


def test_wide_predict_budget_guard():
    """p=9 on wide images cannot satisfy the predict kernel's VMEM strip
    budget even at the 8-row minimum strip (one (strip+2*PAD)-row plane
    per tap); the kernel must refuse with an actionable error instead of
    hitting the 16 MB Mosaic scoped-VMEM compile failure."""
    from watermarking_gpu_tpu.ops.pallas.predict_kernel import (
        prediction_error_pallas)
    img = jnp.zeros((16, 1536), jnp.float32)
    coeffs = jnp.zeros((80,), jnp.float32)
    with pytest.raises(ValueError, match="VMEM strip budget"):
        prediction_error_pallas(img, coeffs, p=9)


def test_mixed_batch_singular_frame(rng):
    """A batch where one frame has a singular system: only that frame
    soft-fails (corr 0, embed passthrough), through the fused raw path."""
    from watermarking_gpu_tpu.ops.pipelines import (detect_pipeline,
                                                    embed_pipeline)
    rows, cols = 512, 256   # raw-capable geometry
    good = np.clip(rng.normal(128, 40, (rows, cols)), 0,
                   255).astype(np.float32)
    flat = np.full((rows, cols), 77.0, dtype=np.float32)
    imgs = jnp.asarray(np.stack([good, flat, good + 1.0]))
    wm = jnp.asarray(rng.normal(size=(rows, cols)).astype(np.float32))

    corr = np.asarray(detect_pipeline(imgs, wm, "me", impl="pallas"))
    assert corr[1] == 0.0
    assert np.isfinite(corr[[0, 2]]).all() and (corr[[0, 2]] != 0).all()

    marked, strength = embed_pipeline(imgs, imgs, wm, 2.55, "me",
                                      impl="pallas")
    strength = np.asarray(strength)
    assert strength[1] == 0.0 and (strength[[0, 2]] > 0).all()
    np.testing.assert_array_equal(np.asarray(marked)[1], flat)
    assert np.abs(np.asarray(marked)[0] - good).max() > 0


def test_pallas_singular_system(rng):
    """Constant image -> singular Rx -> detect 0, embed passthrough."""
    from watermarking_gpu_tpu.ops.pipelines import (detect_pipeline,
                                                    embed_pipeline)
    const = jnp.full((40, 96), 77.0, dtype=jnp.float32)
    wm = jnp.asarray(rng.normal(size=(40, 96)).astype(np.float32))
    corr = detect_pipeline(const, wm, "me", impl="pallas")
    out, strength = embed_pipeline(const, const, wm, 2.55, "me",
                                   impl="pallas")
    corr_x = detect_pipeline(const, wm, "me", impl="xla")
    # either both impls flag singularity (0.0) or both produce a finite
    # garbage solution; they must agree on the contract
    assert (float(corr) == 0.0) == (float(corr_x) == 0.0)
    if float(strength) == 0.0:
        np.testing.assert_array_equal(np.asarray(out), np.asarray(const))


@pytest.mark.parametrize("p", [5, 9])
def test_wide_predict_kernel_matches_oracle(rng, p):
    """Direct parity of the wide-window ((p*p-1)-tap) Pallas predict
    kernel vs the XLA stencil — the kernel's remaining pipeline user is
    detect_many's small-frame ME fallback, so this pins it directly
    (p=9 is the PAD == p//2 stencil-reach boundary)."""
    k = p * p - 1
    img = jnp.asarray(np.clip(rng.normal(128, 40, (48, 96)), 0,
                              255).astype(np.float32))
    coeffs = jnp.asarray(rng.normal(0, 1.0 / k, (k,)).astype(np.float32))
    got = np.asarray(prediction_error_pallas(img, coeffs, p=p))
    want = np.asarray(me.prediction_error(img, coeffs, p))
    np.testing.assert_allclose(got, want, atol=1e-3)
