"""pinned_jit (utils/layouts.py): jit-equivalent semantics with row-major
boundary layouts.

The layout effect itself is TPU-only (XLA:CPU has no tiled layouts to
flip), so these tests pin the wrapper's *semantics*: parity with jax.jit,
None/kwarg handling, per-structure caching, and the _cache_size probe the
serving warmup test relies on. The TPU effect is compile-verified in
tools/profile_roundtrip.py's workflow (zero full-frame relayout copies at
the reference's 3872-wide 4K sample; docs/PERFORMANCE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from watermarking_gpu_tpu.utils.layouts import pinned_jit


def test_matches_jit_with_kwargs_and_none(rng):
    def f(a, b, extra=None, scale=None):
        out = a @ b
        if extra is not None:
            out = out + extra
        if scale is not None:
            out = out * scale
        return out, jnp.sum(out, axis=-1)

    a = jnp.asarray(rng.normal(size=(5, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32))
    extra = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))

    pinned = pinned_jit(f)
    for kwargs in ({}, {"extra": extra}, {"extra": None},
                   {"extra": extra, "scale": jnp.float32(2.0)}):
        want = jax.jit(f)(a, b, **kwargs)
        got = pinned(a, b, **kwargs)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-6)


def test_one_entry_per_structure(rng):
    def f(a, b=None):
        return a * 2 if b is None else a + b

    pinned = pinned_jit(f)
    a2 = jnp.ones((4, 6), jnp.float32)
    a3 = jnp.ones((2, 4, 6), jnp.float32)
    pinned(a2)
    pinned(a2 + 1)          # same structure: reuses the cached entry
    assert pinned._cache_size() == 1
    pinned(a3)              # new rank: new entry
    pinned(a2, b=a2)        # new kwarg structure: new entry
    assert pinned._cache_size() == 3


def test_pinned_aot_side_cache_reuses_executable(rng, tmp_path,
                                                 monkeypatch):
    """A second pinned_jit instance (a fresh process in miniature: the
    in-memory cache is gone) must reuse the serialized AOT executable from
    the side-cache instead of recompiling — the warm-start story pinned
    programs lose by opting out of jax's persistent cache (r3 VERDICT
    item 2). The reloaded executable's output layout tags must still be
    the pinned row-major ones, and a cache entry whose tags came back
    mangled must be discarded and recompiled."""
    import watermarking_gpu_tpu.utils.layouts as layouts

    monkeypatch.setenv("WMTPU_PINNED_CACHE", str(tmp_path))

    def f(a, b):
        return a @ b + 1.0

    a = jnp.asarray(rng.normal(size=(48, 32)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(32, 24)).astype(np.float32))
    want = np.asarray(jax.jit(f)(a, b))

    events = []
    real_load, real_store = layouts._aot_load, layouts._aot_store
    monkeypatch.setattr(layouts, "_aot_load",
                        lambda *args: events.append("load") or
                        real_load(*args))
    monkeypatch.setattr(layouts, "_aot_store",
                        lambda *args: events.append("store") or
                        real_store(*args))

    got_cold = layouts.pinned_jit(f, force_pin=True)(a, b)
    np.testing.assert_allclose(np.asarray(got_cold), want, rtol=1e-6)
    assert events == ["store"]
    files = list(tmp_path.glob("*.aot"))
    assert len(files) == 1

    got_warm = layouts.pinned_jit(f, force_pin=True)(a, b)   # new instance
    np.testing.assert_allclose(np.asarray(got_warm), want, rtol=1e-6)
    assert events == ["store", "load"]
    # the reloaded program's result still carries the pinned row-major tag
    assert tuple(got_warm.format.layout.major_to_minor) == (0, 1)

    # corrupt entry: discarded, recompiled, rewritten — never trusted
    files[0].write_bytes(b"not an executable")
    got_bad = layouts.pinned_jit(f, force_pin=True)(a, b)
    np.testing.assert_allclose(np.asarray(got_bad), want, rtol=1e-6)
    assert events == ["store", "load", "load", "store"]


def test_pinned_aot_side_cache_quarantines_mangled_reload(rng, tmp_path,
                                                          monkeypatch):
    """A reload whose PROBE EXECUTION returns arrays with non-pinned
    layout tags (the TPU/axon failure the metadata check cannot see —
    the r4 sweep's BatchedWatermark INVALID_ARGUMENT crashes) must be
    discarded, recompiled live, and its key quarantined so later
    processes skip deserialization entirely."""
    import watermarking_gpu_tpu.utils.layouts as layouts

    monkeypatch.setenv("WMTPU_PINNED_CACHE", str(tmp_path))

    def f(a):
        return a * 2.0

    a = jnp.asarray(rng.normal(size=(48, 32)).astype(np.float32))
    want = np.asarray(jax.jit(f)(a))

    np.testing.assert_allclose(
        np.asarray(layouts.pinned_jit(f, force_pin=True)(a)), want,
        rtol=1e-6)
    assert len(list(tmp_path.glob("*.aot"))) == 1

    # simulate the axon mangle: the reloaded executable "returns" arrays
    # whose tags fail the probe check
    events = []
    real_load = layouts._aot_load
    monkeypatch.setattr(layouts, "_aot_load",
                        lambda *args: events.append("load") or
                        real_load(*args))
    monkeypatch.setattr(layouts, "_outputs_well_tagged",
                        lambda result, out_s: False)
    got = layouts.pinned_jit(f, force_pin=True)(a)   # fresh instance
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    assert events == ["load"]
    # the entry is gone, a quarantine marker stands, nothing re-stored
    assert len(list(tmp_path.glob("*.aot"))) == 0
    assert len(list(tmp_path.glob("*.quarantine"))) == 1

    # a third instance (next process) must NOT attempt deserialization —
    # straight to the live compile, still correct
    monkeypatch.setattr(layouts, "_outputs_well_tagged",
                        lambda result, out_s: pytest.fail(
                            "probe ran despite quarantine"))
    got3 = layouts.pinned_jit(f, force_pin=True)(a)
    np.testing.assert_allclose(np.asarray(got3), want, rtol=1e-6)
    assert events == ["load"]
    assert len(list(tmp_path.glob("*.aot"))) == 0   # quarantined: no store


def test_pinned_aot_side_cache_transient_probe_error_not_quarantined(
        rng, tmp_path, monkeypatch):
    """A TRANSIENT probe failure (tunnel hiccup, RPC reset — anything
    without the INVALID_ARGUMENT/layout mangle signature) must NOT
    permanently quarantine the cache key: the process compiles live, the
    entry survives on disk, and the next process reloads it normally.
    Only genuine mangle evidence may forfeit the warm start forever."""
    import watermarking_gpu_tpu.utils.layouts as layouts

    monkeypatch.setenv("WMTPU_PINNED_CACHE", str(tmp_path))

    def f(a):
        return a + 1.0

    a = jnp.asarray(rng.normal(size=(40, 24)).astype(np.float32))
    want = np.asarray(jax.jit(f)(a))
    np.testing.assert_allclose(
        np.asarray(layouts.pinned_jit(f, force_pin=True)(a)), want,
        rtol=1e-6)
    assert len(list(tmp_path.glob("*.aot"))) == 1

    # transient: the probe's tag check dies on a network-class error
    def boom(result, out_s):
        raise ConnectionError("tunnel reset by peer")
    monkeypatch.setattr(layouts, "_outputs_well_tagged", boom)
    got = layouts.pinned_jit(f, force_pin=True)(a)   # fresh instance
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    assert len(list(tmp_path.glob("*.quarantine"))) == 0
    assert len(list(tmp_path.glob("*.aot"))) == 1    # entry survives

    # next process (healthy probe): the reload path still works
    events = []
    real_load = layouts._aot_load
    monkeypatch.setattr(layouts, "_aot_load",
                        lambda *args: events.append("load") or
                        real_load(*args))
    monkeypatch.setattr(
        layouts, "_outputs_well_tagged",
        lambda result, out_s: True)
    got2 = layouts.pinned_jit(f, force_pin=True)(a)
    np.testing.assert_allclose(np.asarray(got2), want, rtol=1e-6)
    assert events == ["load"]

    # a transient error that merely MENTIONS "layout" (no INVALID_ARGUMENT
    # status) must not quarantine either — the signature requires BOTH
    # (ADVICE r4: a bare substring match forfeited warm starts on RPC
    # errors that happened to contain the word)
    def layout_blip(result, out_s):
        raise ConnectionError("RPC channel to layout service reset by peer")
    monkeypatch.setattr(layouts, "_outputs_well_tagged", layout_blip)
    got2b = layouts.pinned_jit(f, force_pin=True)(a)
    np.testing.assert_allclose(np.asarray(got2b), want, rtol=1e-6)
    assert len(list(tmp_path.glob("*.quarantine"))) == 0
    assert len(list(tmp_path.glob("*.aot"))) == 1    # entry survives

    # but an exception CARRYING the mangle signature is real evidence:
    # the reloaded executable's first forced D2H dies INVALID_ARGUMENT
    def mangle(result, out_s):
        raise RuntimeError("INVALID_ARGUMENT: layout minor-to-major "
                           "mismatch on output 0")
    monkeypatch.setattr(layouts, "_outputs_well_tagged", mangle)
    got3 = layouts.pinned_jit(f, force_pin=True)(a)
    np.testing.assert_allclose(np.asarray(got3), want, rtol=1e-6)
    assert len(list(tmp_path.glob("*.quarantine"))) == 1
    assert len(list(tmp_path.glob("*.aot"))) == 0


def test_engine_pinned_programs_warm_start_from_side_cache(rng, tmp_path,
                                                           monkeypatch):
    """Engine-level integration: a FLIP-PRONE geometry (transposed layout
    pads less, e.g. a narrow 68-wide frame like the 3872-wide 4K sample's
    class) routes through pinned_jit's pin branch; a second engine in a
    fresh pinned_jit universe must reload the serialized executables
    instead of recompiling, with identical results."""
    import watermarking_gpu_tpu.utils.layouts as layouts
    from watermarking_gpu_tpu.models.watermark import Watermark
    from watermarking_gpu_tpu.utils.layouts import _flip_prone

    assert _flip_prone((256, 68))
    monkeypatch.setenv("WMTPU_PINNED_CACHE", str(tmp_path))
    events = []
    real_load, real_store = layouts._aot_load, layouts._aot_store
    monkeypatch.setattr(layouts, "_aot_load",
                        lambda *a: events.append("load") or real_load(*a))
    monkeypatch.setattr(layouts, "_aot_store",
                        lambda *a: events.append("store") or real_store(*a))

    img = np.clip(rng.normal(128, 40, (256, 68)), 0, 255).astype(np.float32)
    wm = rng.normal(size=(256, 68)).astype(np.float32)
    eng1 = Watermark(256, 68, wm, p=3, psnr=40.0, impl="xla")
    marked1, s1 = eng1.embed(img, mask_type="me")
    corr1 = float(eng1.detect(np.asarray(marked1), "me"))
    stores = events.count("store")
    assert stores >= 1 and events.count("load") == 0

    eng2 = Watermark(256, 68, wm, p=3, psnr=40.0, impl="xla")
    marked2, s2 = eng2.embed(img, mask_type="me")
    corr2 = float(eng2.detect(np.asarray(marked2), "me"))
    assert events.count("load") == stores      # every program reloaded
    assert events.count("store") == stores     # ... and none recompiled
    assert corr2 == corr1 and float(s2) == float(s1)
    np.testing.assert_array_equal(np.asarray(marked2), np.asarray(marked1))


def test_pinned_aot_side_cache_disable(rng, tmp_path, monkeypatch):
    """WMTPU_PINNED_CACHE=off keeps pinned compiles fully in-process."""
    import watermarking_gpu_tpu.utils.layouts as layouts

    monkeypatch.setenv("WMTPU_PINNED_CACHE", "off")
    assert layouts.pinned_cache_dir() is None
    out = layouts.pinned_jit(lambda x: x * 3, force_pin=True)(
        jnp.ones((8, 8), jnp.float32))
    np.testing.assert_allclose(np.asarray(out), 3.0)


def test_uint8_roundtrip(rng):
    """u8 ingest arrays (the video path's transfer dtype) pin fine."""
    def f(u):
        return (u.astype(jnp.float32) * 2).astype(jnp.uint8)

    u = jnp.asarray(rng.integers(0, 100, (3, 16, 32)).astype(np.uint8))
    got = pinned_jit(f)(u)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(u) * 2)
