"""Multi-chip tests on the virtual 8-device CPU mesh: DP and SP paths must
reproduce the single-device pipeline numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from watermarking_gpu_tpu.models.batched import batch_detect, batch_embed
from watermarking_gpu_tpu.ops import strength_factor
from watermarking_gpu_tpu.ops.pipelines import detect_pipeline, embed_pipeline
from watermarking_gpu_tpu.parallel import (make_dp_detect, make_dp_embed,
                                           make_mesh, make_spatial_detect,
                                           make_spatial_embed, replicate,
                                           shard_frames, shard_rows)

SF = strength_factor(40.0)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(83264)
    return np.clip(
        rng.normal(128.0, 40.0, size=(8, 32, 64)), 0, 255).astype(np.float32)


@pytest.fixture(scope="module")
def watermark32():
    rng = np.random.default_rng(3264)
    return rng.normal(size=(32, 64)).astype(np.float32)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_dp_detect_matches_single(frames, watermark32, impl):
    """shard_map DP: each chip runs the literal single-chip program on its
    local frames — including the fused Pallas kernels."""
    mesh = make_mesh(data=8)
    ref = batch_detect(jnp.asarray(frames), jnp.asarray(watermark32), "me")
    fn = make_dp_detect(mesh, "me", impl=impl)
    got = fn(shard_frames(mesh, jnp.asarray(frames)),
             replicate(mesh, jnp.asarray(watermark32)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_dp_embed_matches_single(frames, watermark32):
    mesh = make_mesh(data=8)
    ref_out, ref_s = batch_embed(jnp.asarray(frames), jnp.asarray(frames),
                                 jnp.asarray(watermark32), SF, "nvf")
    fn = make_dp_embed(mesh, "nvf", SF)
    sharded = shard_frames(mesh, jnp.asarray(frames))
    got_out, got_s = fn(sharded, sharded,
                        replicate(mesh, jnp.asarray(watermark32)))
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               rtol=1e-5)


@pytest.mark.parametrize("mask_type", ["me", "nvf"])
def test_spatial_detect_matches_single(frames, watermark32, mask_type):
    mesh = make_mesh(data=1, space=8)
    img = jnp.asarray(frames[0])
    wm = jnp.asarray(watermark32)
    ref = detect_pipeline(img, wm, mask_type)
    fn = make_spatial_detect(mesh, mask_type)
    got = fn(shard_rows(mesh, img), shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got), float(ref), atol=2e-4)


@pytest.mark.parametrize("mask_type", ["me", "nvf"])
def test_spatial_embed_matches_single(frames, watermark32, mask_type):
    mesh = make_mesh(data=1, space=8)
    img = jnp.asarray(frames[0])
    wm = jnp.asarray(watermark32)
    ref_out, ref_s = embed_pipeline(img, img, wm, SF, mask_type)
    fn = make_spatial_embed(mesh, mask_type, SF, *img.shape)
    img_sh = shard_rows(mesh, img)
    got_out, got_s = fn(img_sh, img_sh, shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got_s), float(ref_s), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=2e-3)


def test_spatial_nvf_p5_halo(frames, watermark32):
    """halo > 1 exercises multi-row ppermute exchange."""
    mesh = make_mesh(data=1, space=4)
    img = jnp.asarray(frames[0])
    wm = jnp.asarray(watermark32)
    ref = detect_pipeline(img, wm, "nvf", p=5)
    fn = make_spatial_detect(mesh, "nvf", p=5)
    got = fn(shard_rows(mesh, img), shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got), float(ref), atol=2e-4)


def test_batched_matches_per_frame(frames, watermark32):
    """vmap batching reproduces per-frame results."""
    wm = jnp.asarray(watermark32)
    batched = batch_detect(jnp.asarray(frames), wm, "me")
    singles = [float(detect_pipeline(jnp.asarray(f), wm, "me"))
               for f in frames]
    np.testing.assert_allclose(np.asarray(batched), singles, atol=1e-5)


def test_hybrid_dp_sp_matches_single(frames, watermark32):
    """2x4 mesh: frames over data, rows over space."""
    from watermarking_gpu_tpu.parallel import (make_hybrid_detect,
                                               make_hybrid_embed,
                                               shard_hybrid, shard_watermark)
    mesh = make_mesh(data=2, space=4)
    wm = jnp.asarray(watermark32)
    ref = batch_detect(jnp.asarray(frames), wm, "me")
    fn = make_hybrid_detect(mesh, "me")
    got = fn(shard_hybrid(mesh, jnp.asarray(frames)),
             shard_watermark(mesh, wm))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    ref_out, ref_s = batch_embed(jnp.asarray(frames), jnp.asarray(frames),
                                 wm, SF, "me")
    embed_fn = make_hybrid_embed(mesh, "me", SF, 32, 64)
    sharded = shard_hybrid(mesh, jnp.asarray(frames))
    got_out, got_s = embed_fn(sharded, sharded, shard_watermark(mesh, wm))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=2e-3)


@pytest.mark.parametrize("mask_type", ["me", "nvf"])
def test_spatial_pallas_detect_matches_single(frames, watermark32,
                                              mask_type):
    """The full fused Pallas path per shard (Gram kernel + detect tail with
    the shard's global row offset) + psum reproduces both the single-device
    fused pipeline and the XLA oracle."""
    mesh = make_mesh(data=1, space=4)
    img = jnp.asarray(frames[0])
    wm = jnp.asarray(watermark32)
    ref_xla = detect_pipeline(img, wm, mask_type, impl="xla")
    ref_fused = detect_pipeline(img, wm, mask_type, impl="pallas")
    fn = make_spatial_detect(mesh, mask_type, impl="pallas")
    got = fn(shard_rows(mesh, img), shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got), float(ref_xla), atol=2e-4)
    np.testing.assert_allclose(float(got), float(ref_fused), atol=2e-4)


@pytest.mark.parametrize("mask_type", ["me", "nvf"])
def test_spatial_pallas_embed_matches_single(frames, watermark32, mask_type):
    """Fused embed-field kernel per shard + psum/pmax reproduces the
    single-device embed."""
    mesh = make_mesh(data=1, space=4)
    img = jnp.asarray(frames[0])
    wm = jnp.asarray(watermark32)
    ref_out, ref_s = embed_pipeline(img, img, wm, SF, mask_type, impl="xla")
    fn = make_spatial_embed(mesh, mask_type, SF, *img.shape, impl="pallas")
    img_sh = shard_rows(mesh, img)
    got_out, got_s = fn(img_sh, img_sh, shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got_s), float(ref_s), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=2e-3)


def test_spatial_pallas_nvf_p5_halo(frames, watermark32):
    """NVF p=5 on the pallas shard path: halo = 1 + p//2 = 3 rows of true
    seam data spliced into the kernel padding."""
    mesh = make_mesh(data=1, space=4)
    img = jnp.asarray(frames[0])
    wm = jnp.asarray(watermark32)
    ref = detect_pipeline(img, wm, "nvf", p=5, impl="xla")
    fn = make_spatial_detect(mesh, "nvf", p=5, impl="pallas")
    got = fn(shard_rows(mesh, img), shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got), float(ref), atol=2e-4)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_hybrid_impl_matches_single(frames, watermark32, impl):
    """2x4 hybrid mesh with both shard implementations: batch-polymorphic
    shard functions process (B_local, h_local, W) blocks directly."""
    from watermarking_gpu_tpu.parallel import (make_hybrid_detect,
                                               make_hybrid_embed,
                                               shard_hybrid, shard_watermark)
    mesh = make_mesh(data=2, space=4)
    wm = jnp.asarray(watermark32)
    ref = batch_detect(jnp.asarray(frames), wm, "me", impl="xla")
    fn = make_hybrid_detect(mesh, "me", impl=impl)
    got = fn(shard_hybrid(mesh, jnp.asarray(frames)),
             shard_watermark(mesh, wm))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

    ref_out, ref_s = batch_embed(jnp.asarray(frames), jnp.asarray(frames),
                                 wm, SF, "me", impl="xla")
    embed_fn = make_hybrid_embed(mesh, "me", SF, 32, 64, impl=impl)
    sharded = shard_hybrid(mesh, jnp.asarray(frames))
    got_out, got_s = embed_fn(sharded, sharded, shard_watermark(mesh, wm))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=2e-3)


def test_spatial_embed_rgb_channels(frames, watermark32):
    """Row-sharded embed into an RGB output (channels=True path)."""
    mesh = make_mesh(data=1, space=4)
    img = jnp.asarray(frames[0])
    rgb = jnp.repeat(img[..., None], 3, axis=-1)
    wm = jnp.asarray(watermark32)
    ref_out, ref_s = embed_pipeline(img, rgb, wm, SF, "me")
    fn = make_spatial_embed(mesh, "me", SF, *img.shape, channels=True)
    got_out, got_s = fn(shard_rows(mesh, img), shard_rows(mesh, rgb),
                        shard_rows(mesh, wm))
    assert got_out.shape == rgb.shape
    np.testing.assert_allclose(float(got_s), float(ref_s), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=2e-3)


def test_halo_larger_than_shard_multi_hops(frames, watermark32):
    """A halo deeper than the local shard (NVF p=9 needs 5 rows on 4-row
    shards) gathers whole neighbor blocks over multiple ppermute hops
    instead of failing (pre-r4 this raised ValueError), and matches the
    unsharded pipeline."""
    mesh = make_mesh(data=1, space=8)   # 4-row shards; NVF p=9 needs halo 5
    img = jnp.asarray(frames[0])
    wm = jnp.asarray(watermark32)
    ref = detect_pipeline(img, wm, "nvf", p=9, impl="pallas")
    got = make_spatial_detect(mesh, "nvf", p=9, impl="pallas")(
        shard_rows(mesh, img), shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got), float(ref), atol=1e-4)


def test_generalized_me_dp_matches_single(frames, watermark32):
    """ME at p=5 (the generalized predictor, beyond the reference) shards
    data-parallel on the XLA path and matches the unsharded pipeline."""
    mesh = make_mesh(data=8)
    ref = batch_detect(jnp.asarray(frames), jnp.asarray(watermark32), "me",
                       p=5, impl="xla")
    fn = make_dp_detect(mesh, "me", p=5, impl="xla")
    got = fn(shard_frames(mesh, jnp.asarray(frames)),
             replicate(mesh, jnp.asarray(watermark32)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_generalized_me_spatial_matches_single(frames, watermark32):
    """Generalized ME (p=5) on the XLA shard path: the 2-row halo exchange
    feeds the 24-tap predictor; psum'd Gram/correlations match the
    unsharded pipeline."""
    mesh = make_mesh(data=1, space=4)
    img = jnp.asarray(frames[0])
    wm = jnp.asarray(watermark32)
    ref = detect_pipeline(img, wm, "me", p=5, impl="xla")
    got = make_spatial_detect(mesh, "me", p=5)(
        shard_rows(mesh, img), shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got), float(ref), atol=1e-5)

    ref_out, ref_s = embed_pipeline(img, img, wm, SF, "me", p=5, impl="xla")
    got_out, got_s = make_spatial_embed(mesh, "me", SF, *img.shape, p=5)(
        shard_rows(mesh, img), shard_rows(mesh, img), shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got_s), float(ref_s), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=2e-3)


@pytest.mark.parametrize("p", [5, 7])
def test_generalized_me_spatial_pallas_matches_single(frames, watermark32,
                                                      p):
    """The sharded FUSED wide pipeline (per-shard wide lag-Gram kernel
    partials + psum, p-scaled fused tails with ICI-spliced halos) matches
    the single-device fused wide pipeline."""
    mesh = make_mesh(data=1, space=4)
    img = jnp.asarray(frames[0])
    wm = jnp.asarray(watermark32)
    ref = detect_pipeline(img, wm, "me", p=p, impl="pallas")
    got = make_spatial_detect(mesh, "me", p=p, impl="pallas")(
        shard_rows(mesh, img), shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got), float(ref), atol=1e-4)

    ref_out, ref_s = embed_pipeline(img, img, wm, SF, "me", p=p,
                                    impl="pallas")
    got_out, got_s = make_spatial_embed(mesh, "me", SF, *img.shape, p=p,
                                        impl="pallas")(
        shard_rows(mesh, img), shard_rows(mesh, img), shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got_s), float(ref_s), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=2e-3)


def test_generalized_me_spatial_pallas_degrades_outside_envelope(
        frames, watermark32):
    """ME p=9 on 4-row shards (local rows < 2h = 8) is outside the wide
    kernels' envelope: the shards degrade to the XLA implementation
    instead of failing, and still match the unsharded XLA pipeline."""
    from watermarking_gpu_tpu.parallel.spatial import wide_shard_supported
    assert not wide_shard_supported(4, 32, 64, 9)
    mesh = make_mesh(data=1, space=8)
    img = jnp.asarray(frames[0])
    wm = jnp.asarray(watermark32)
    ref = detect_pipeline(img, wm, "me", p=9, impl="xla")
    got = make_spatial_detect(mesh, "me", p=9, impl="pallas")(
        shard_rows(mesh, img), shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got), float(ref), atol=1e-5)


@pytest.mark.parametrize("halo", [3, 4, 9, 11])
def test_exchange_row_halo_multi_hop_values(halo):
    """Value-level pin of the halo exchange at every depth class: within
    one shard (3 < 4 local rows), exactly one shard (4), deep multi-hop
    (9, 11 > 2 shards): the exchanged block must equal the corresponding
    rows of the edge-replicated GLOBAL image at every shard."""
    from functools import partial

    from watermarking_gpu_tpu.parallel import make_mesh, shard_rows
    from watermarking_gpu_tpu.parallel.spatial import (SPACE_AXIS,
                                                       exchange_row_halo,
                                                       shard_map)
    from jax.sharding import PartitionSpec as P

    n, h_local, w = 8, 4, 16
    rows = n * h_local
    img = np.arange(rows * w, dtype=np.float32).reshape(rows, w) + 1.0
    mesh = make_mesh(data=1, space=n)
    fn = jax.jit(shard_map(
        partial(exchange_row_halo, halo=halo),
        mesh=mesh, in_specs=(P(SPACE_AXIS, None),),
        out_specs=P(SPACE_AXIS, None), check_vma=False))
    got = np.asarray(fn(shard_rows(mesh, jnp.asarray(img))))
    got = got.reshape(n, h_local + 2 * halo, w)
    padded = np.pad(img, [(halo, halo), (0, 0)], mode="edge")
    for i in range(n):
        want = padded[i * h_local:i * h_local + h_local + 2 * halo]
        np.testing.assert_array_equal(got[i], want)


def test_wide_me_spatial_pallas_2h_shards_match_single(frames, watermark32):
    """ME p=9 on 8-row shards (local rows == 2h, < 3h): newly inside the
    fused wide envelope — the wide Gram's boundary banks come from a
    3h-row multi-hop halo exchange instead of requiring 3h local rows."""
    from watermarking_gpu_tpu.parallel.spatial import wide_shard_supported
    assert wide_shard_supported(8, 32, 64, 9)
    mesh = make_mesh(data=1, space=4)
    img = jnp.asarray(frames[0])
    wm = jnp.asarray(watermark32)
    ref = detect_pipeline(img, wm, "me", p=9, impl="pallas")
    got = make_spatial_detect(mesh, "me", p=9, impl="pallas")(
        shard_rows(mesh, img), shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got), float(ref), atol=1e-4)
    ref_out, ref_s = embed_pipeline(img, img, wm, SF, "me", p=9,
                                    impl="pallas")
    got_out, got_s = make_spatial_embed(mesh, "me", SF, *img.shape, p=9,
                                        impl="pallas")(
        shard_rows(mesh, img), shard_rows(mesh, img), shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got_s), float(ref_s), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=2e-3)


def _count_eqns(jaxpr) -> int:
    """Total equation count of a (Closed)Jaxpr including sub-jaxprs."""
    if hasattr(jaxpr, "jaxpr"):
        jaxpr = jaxpr.jaxpr
    total = len(jaxpr.eqns)
    for eqn in jaxpr.eqns:
        for value in eqn.params.values():
            items = value if isinstance(value, (list, tuple)) else [value]
            for item in items:
                if hasattr(item, "jaxpr") or hasattr(item, "eqns"):
                    total += _count_eqns(item)
    return total


def test_degenerate_shard_wide_analysis_stays_vectorized(frames,
                                                         watermark32):
    """ME p=9 on 4-row shards (local rows < h = 4's multi-hop territory):
    the XLA shard analysis must run the sharded VECTORIZED lag assembly —
    never the O(pairs) per-pair formulation, whose p=9 form is ~13k
    sibling ops and minutes of XLA compile (the r3 VERDICT's remaining
    compile trap). Pinned by a trace-time op-count bound plus numeric
    parity with the unsharded pipeline."""
    mesh = make_mesh(data=1, space=8)
    img = jnp.asarray(frames[0])        # 32 rows -> 4-row shards, 2h = 8
    wm = jnp.asarray(watermark32)
    fn = make_spatial_detect(mesh, "me", p=9, impl="xla")
    jaxpr = jax.make_jaxpr(fn)(shard_rows(mesh, img), shard_rows(mesh, wm))
    eqns = _count_eqns(jaxpr)
    # vectorized assembly: O(lags) = 145 lags x ~45 ops each (~9k traced
    # eqns, measured — the same order as the single-chip p=9 path, ~20 s
    # of XLA compile); the O(pairs) trap is 3321 pairs x 4 boundary
    # strips x ~2 ops >= 26k and minutes of compile
    assert eqns < 13_000, f"shard analysis traced {eqns} eqns (O(pairs)?)"
    ref = detect_pipeline(img, wm, "me", p=9, impl="xla")
    got = fn(shard_rows(mesh, img), shard_rows(mesh, wm))
    np.testing.assert_allclose(float(got), float(ref), atol=1e-5)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_dp_detect_many_matches_single(frames, watermark32, impl):
    """Candidate-sharded identification: the (N, H, W) bank shards over
    the data axis; each chip runs the shared-analysis detect_many on its
    slice, matching the single-device pipeline."""
    from watermarking_gpu_tpu.ops.pipelines import detect_many_pipeline
    from watermarking_gpu_tpu.parallel import make_dp_detect_many

    mesh = make_mesh(data=4)
    rng = np.random.default_rng(99)
    bank = jnp.asarray(
        np.stack([watermark32] + [rng.normal(size=watermark32.shape)
                                  for _ in range(7)]).astype(np.float32))
    marked, _ = embed_pipeline(jnp.asarray(frames[0]),
                               jnp.asarray(frames[0]),
                               jnp.asarray(watermark32), SF, "me")
    ref = detect_many_pipeline(marked, bank, "me", impl=impl)
    fn = make_dp_detect_many(mesh, "me", impl=impl)
    got = fn(replicate(mesh, marked), shard_frames(mesh, bank))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    assert int(np.argmax(np.asarray(got))) == 0   # the embedded one wins

    # batched form: (B, H, W) x (N, H, W) -> (B, N)
    imgs = jnp.stack([marked, jnp.asarray(frames[1])])
    ref_b = detect_many_pipeline(imgs, bank, "me", impl=impl)
    fn_b = make_dp_detect_many(mesh, "me", impl=impl, batched=True)
    got_b = fn_b(replicate(mesh, imgs), shard_frames(mesh, bank))
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               atol=1e-4)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("mask_type", ["me", "nvf"])
def test_mesh_detect_many_matches_single(frames, watermark32, mask_type,
                                         impl):
    """Full-mesh identification (rows over space, candidates over data)
    matches the single-device shared-analysis pipeline, including the
    generalized window (p=5 sizes the NVF variance window / ME
    predictor). impl='pallas' chains the fused multi-candidate kernel
    per shard with the shard's global row offset."""
    from watermarking_gpu_tpu.ops.pipelines import detect_many_pipeline
    from watermarking_gpu_tpu.parallel import (make_mesh_detect_many,
                                               shard_hybrid, shard_rows)

    mesh = make_mesh(data=2, space=4)
    rng = np.random.default_rng(7)
    bank = jnp.asarray(
        np.stack([watermark32] + [rng.normal(size=watermark32.shape)
                                  for _ in range(7)]).astype(np.float32))
    marked, _ = embed_pipeline(jnp.asarray(frames[0]),
                               jnp.asarray(frames[0]),
                               jnp.asarray(watermark32), SF, mask_type)
    for p in (3, 5):
        ref = detect_many_pipeline(marked, bank, mask_type, p=p)
        got = make_mesh_detect_many(mesh, mask_type, p=p, impl=impl)(
            shard_rows(mesh, marked), shard_hybrid(mesh, bank))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)
        assert int(np.argmax(np.asarray(got))) == 0

    # batched form: (B, H, W) images (replicated over data, rows over
    # space) x the sharded bank -> (B, N)
    imgs = jnp.stack([marked, jnp.asarray(frames[1])])
    ref_b = detect_many_pipeline(imgs, bank, mask_type)
    got_b = make_mesh_detect_many(mesh, mask_type, impl=impl,
                                  batched=True)(
        jax.device_put(imgs, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "space", None))),
        shard_hybrid(mesh, bank))
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               atol=1e-4)
