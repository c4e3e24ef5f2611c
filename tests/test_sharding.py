"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4d: sharded-vs-single-device equality)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rawphotoforge_tpu.core.params import EditParameters, pack_params
from rawphotoforge_tpu.ops import develop as dev
from rawphotoforge_tpu.ops.stats import histogram_rgbl
from rawphotoforge_tpu.parallel import mesh as pmesh

from conftest import random_linear_image

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def the_mesh():
    return pmesh.make_mesh(n_batch=4, n_spatial=2)


def _params():
    p = EditParameters()
    p.set_tone(exposure=0.8, contrast=25, shadow=10)
    p.set_whitebalance(temperature=20, tint=-10)
    p.set_vignette(35)
    return pack_params([p])


def test_mesh_shape(the_mesh):
    assert the_mesh.shape == {"batch": 4, "sp": 2}


def test_batch_develop_sharded_matches_single(rng, the_mesh):
    imgs = np.stack([random_linear_image(rng, 32, 128) for _ in range(8)])
    imgs = jnp.asarray(imgs.transpose(0, 3, 1, 2))
    packed = _params()
    masks = jnp.ones((1, 32, 128), dtype=jnp.float32)

    sharded = jax.jit(pmesh.batch_develop_sharded, static_argnums=3)(
        imgs, packed, masks, the_mesh
    )
    single = dev.develop_batch(imgs, packed, masks)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-6)


def test_spatial_develop_sharded_matches_single(rng, the_mesh):
    img = random_linear_image(rng, 64, 128)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    packed = _params()
    masks = jnp.ones((1, 64, 128), dtype=jnp.float32)

    sharded = jax.jit(pmesh.develop_spatial_sharded, static_argnums=3)(
        planes, packed, masks, the_mesh
    )
    single = dev.develop_jit(planes, packed, masks)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-6)


def test_histogram_sharded_matches_single(rng, the_mesh):
    img = random_linear_image(rng, 64, 128)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    h_sharded = jax.jit(pmesh.histogram_sharded, static_argnums=1)(planes, the_mesh)
    h_single = histogram_rgbl(planes)
    np.testing.assert_array_equal(np.asarray(h_sharded), np.asarray(h_single))


def test_full_step_runs(rng, the_mesh):
    img = random_linear_image(rng, 64, 128)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    packed = _params()
    masks = jnp.ones((1, 64, 128), dtype=jnp.float32)
    srgb, hist, clip = jax.jit(pmesh.full_step, static_argnums=3)(
        planes, packed, masks, the_mesh
    )
    assert srgb.shape == (3, 64, 128)
    assert hist.shape == (4, 256)
    assert hist.sum() == 4 * 64 * 128
    assert 0.0 <= float(clip) <= 1.0


def test_export_batch_step(rng, the_mesh):
    imgs = np.stack([random_linear_image(rng, 32, 128) for _ in range(8)])
    imgs = jnp.asarray(imgs.transpose(0, 3, 1, 2))
    packed = _params()
    masks = jnp.ones((1, 32, 128), dtype=jnp.float32)
    u8 = jax.jit(pmesh.export_batch_step, static_argnums=3)(
        imgs, packed, masks, the_mesh
    )
    assert u8.dtype == jnp.uint8
    assert u8.shape == (8, 3, 32, 128)


def test_entropy_batch_sharded_bit_exact(rng, the_mesh):
    """The batch-sharded entropy stage emits BIT-identical streams to
    the single-device wire when fed the same developed pixels (the wire
    is pure integer math after the u8-grid round — so this equality is
    exact by construction, unlike develop outputs which carry
    differently-compiled f32 ulp noise), and the native coder produces
    valid files from the sharded streams. Distinct per-image content so
    batch mixing cannot hide."""
    from rawphotoforge_tpu import native
    from rawphotoforge_tpu.io import jpegbits, jpegenc

    imgs = np.stack([random_linear_image(rng, 32, 128) * (0.5 + 0.06 * i)
                     for i in range(8)])
    imgs = jnp.asarray(imgs.transpose(0, 3, 1, 2))
    packed = _params()
    masks = jnp.ones((1, 32, 128), dtype=jnp.float32)
    qlum, qchr = (jnp.asarray(t) for t in jpegenc._quant_tables(90))
    srgb = dev.develop_batch(imgs, packed, masks)
    lens, words, totals = jax.jit(
        pmesh.entropy_batch_sharded, static_argnums=1
    )(srgb, the_mesh, qlum, qchr)
    nblocks = (32 // 16) * (128 // 16) * 6
    assert lens.shape == (8, nblocks)
    assert words.shape == (8, nblocks * jpegbits.BLOCK_WORDS)
    st = jpegbits._prepacked_jit()
    for i in range(8):
        s_lens, s_bands, s_totals = st.full(srgb[i], qlum, qchr)
        assert int(totals[i, 2]) == 0
        np.testing.assert_array_equal(np.asarray(lens[i]),
                                      np.asarray(s_lens))
        nw = int(s_totals[0])
        assert int(totals[i, 0]) == nw
        single_words = np.concatenate([np.asarray(b) for b in s_bands])
        np.testing.assert_array_equal(np.asarray(words[i])[:nw],
                                      single_words[:nw])
        if native.available():
            a = native.jpeg_encode_prepacked(
                np.asarray(lens[i]), np.asarray(words[i])[:nw], 32, 128,
                quality=90)
            assert a[:2] == b"\xff\xd8" and a[-2:] == b"\xff\xd9"


def test_entropy_batch_packed_sharded_bit_exact(rng, the_mesh):
    """The batch-sharded PACKED wire emits the finished contiguous scan
    per image, bit-identical to the single-device packed wire and the
    serial numpy oracle, and the native coder's file from the sharded
    stream is byte-identical to the prepacked wire's file."""
    from rawphotoforge_tpu import native
    from rawphotoforge_tpu.io import jpegbits, jpegenc

    imgs = np.stack([random_linear_image(rng, 32, 128) * (0.5 + 0.06 * i)
                     for i in range(8)])
    imgs = jnp.asarray(imgs.transpose(0, 3, 1, 2))
    packed = _params()
    masks = jnp.ones((1, 32, 128), dtype=jnp.float32)
    qlum, qchr = (jnp.asarray(t) for t in jpegenc._quant_tables(90))
    srgb = dev.develop_batch(imgs, packed, masks)
    words, totals = jax.jit(
        pmesh.entropy_batch_packed_sharded, static_argnums=1
    )(srgb, the_mesh, qlum, qchr)
    nblocks = (32 // 16) * (128 // 16) * 6
    assert words.shape == (8, nblocks * jpegbits.PACKED_OUT_WORDS)
    assert totals.shape == (8, 5)
    st = jpegbits._prepacked_jit()
    caps = (jpegbits.PACKED_ENT_WORDS, jpegbits.PACKED_OUT_WORDS)
    for i in range(8):
        nw, nbits, bad, n_ent, kept = (int(x) for x in totals[i])
        assert bad == 0
        assert n_ent <= nblocks * caps[0]
        assert kept == nw <= nblocks * caps[1]
        s_bands, s_totals = st.full_packed(srgb[i], qlum, qchr, *caps)
        sv = np.asarray(s_totals)
        assert (nw, nbits) == (int(sv[0]), int(sv[1]))
        single_words = np.concatenate([np.asarray(b) for b in s_bands])
        np.testing.assert_array_equal(np.asarray(words[i])[:nw],
                                      single_words[:nw])
        blocks = np.asarray(
            jpegenc._sparse_jit()[1](srgb[i], qlum, qchr))
        ref_words, ref_bits = jpegbits.packed_np(
            jpegenc._dc_delta_np(blocks))
        assert ref_bits == nbits
        np.testing.assert_array_equal(np.asarray(words[i])[:nw], ref_words)
        if native.available():
            a = native.jpeg_encode_packed(
                np.asarray(words[i])[:nw], nbits, 32, 128, quality=90)
            assert a[:2] == b"\xff\xd8" and a[-2:] == b"\xff\xd9"
            s_lens, s_wb, s_t = st.full(srgb[i], qlum, qchr)
            b = native.jpeg_encode_prepacked(
                np.asarray(s_lens),
                np.concatenate([np.asarray(x) for x in s_wb])[
                    : int(np.asarray(s_t)[0])], 32, 128, quality=90)
            assert a == b


def test_export_batch_jpeg_packed_step_runs(rng, the_mesh):
    """The composed packed step (sharded develop feeding the sharded
    packed wire) executes and emits structurally-sane streams."""
    from rawphotoforge_tpu.io import jpegbits, jpegenc

    imgs = np.stack([random_linear_image(rng, 32, 128) for _ in range(8)])
    imgs = jnp.asarray(imgs.transpose(0, 3, 1, 2))
    packed = _params()
    masks = jnp.ones((1, 32, 128), dtype=jnp.float32)
    qlum, qchr = (jnp.asarray(t) for t in jpegenc._quant_tables(90))
    words, totals = jax.jit(
        pmesh.export_batch_jpeg_packed_step, static_argnums=3
    )(imgs, packed, masks, the_mesh, qlum, qchr)
    nblocks = (32 // 16) * (128 // 16) * 6
    for i in range(8):
        nw, nbits, bad, n_ent, kept = (int(x) for x in totals[i])
        assert bad == 0
        assert 0 < nw == kept <= words.shape[1]
        assert nw == (nbits + 31) // 32
        assert n_ent <= nblocks * jpegbits.PACKED_ENT_WORDS
        # Trailing capacity is zeroed, so a fetch of nw words is the
        # whole stream.
        assert not np.asarray(words[i])[nw:].any()


def test_export_batch_jpeg_step_runs(rng, the_mesh):
    """The composed step (sharded develop feeding the sharded wire)
    executes and emits structurally-sane streams; its pixel agreement
    with the single develop is test_batch_develop_sharded's job."""
    from rawphotoforge_tpu.io import jpegenc

    imgs = np.stack([random_linear_image(rng, 32, 128) for _ in range(8)])
    imgs = jnp.asarray(imgs.transpose(0, 3, 1, 2))
    packed = _params()
    masks = jnp.ones((1, 32, 128), dtype=jnp.float32)
    qlum, qchr = (jnp.asarray(t) for t in jpegenc._quant_tables(90))
    lens, words, totals = jax.jit(
        pmesh.export_batch_jpeg_step, static_argnums=3
    )(imgs, packed, masks, the_mesh, qlum, qchr)
    for i in range(8):
        assert int(totals[i, 2]) == 0
        assert 0 < int(totals[i, 0]) <= words.shape[1]
        assert int(np.asarray(lens[i]).astype(np.int64).sum()) \
            == int(totals[i, 1])


def test_demosaic_sharded_matches_single(rng, the_mesh):
    """Halo-exchange demosaic over the 'sp' axis == single-device demosaic
    (both interior and the shard-boundary rows)."""
    from rawphotoforge_tpu.parallel import spatial
    from rawphotoforge_tpu.ops import demosaic as dm

    h, w = 64, 128  # 2 shards of 32 rows on sp
    mosaic = jnp.asarray(rng.random((h, w), dtype=np.float32))
    sharded = jax.jit(
        spatial.demosaic_sharded, static_argnums=(1, 2, 3)
    )(mosaic, the_mesh, "RGGB", "malvar")
    single = dm.demosaic_malvar(mosaic, "RGGB")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-6)


def test_demosaic_sharded_bilinear_and_pattern(rng, the_mesh):
    from rawphotoforge_tpu.parallel import spatial
    from rawphotoforge_tpu.ops import demosaic as dm

    mosaic = jnp.asarray(rng.random((32, 128), dtype=np.float32))
    sharded = jax.jit(
        spatial.demosaic_sharded, static_argnums=(1, 2, 3)
    )(mosaic, the_mesh, "GRBG", "bilinear")
    single = dm.demosaic_bilinear(mosaic, "GRBG")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-6)


def test_raw_develop_sharded_matches_single(rng, the_mesh):
    from rawphotoforge_tpu.parallel import spatial
    from rawphotoforge_tpu.ops import demosaic as dm
    from rawphotoforge_tpu.ops.sharpen import unsharp_mask

    h, w = 64, 128
    mosaic = jnp.asarray(rng.random((h, w), dtype=np.float32))
    wb = jnp.asarray([1.8, 1.0, 1.4])
    cam = jnp.asarray(dm.cam_matrix_to_srgb(
        np.array([[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]])
    ))
    sharded = jax.jit(
        spatial.raw_develop_sharded, static_argnums=(3, 4)
    )(mosaic, wb, cam, the_mesh, "RGGB", jnp.float32(0.7))

    balanced = dm.apply_wb_mosaic(mosaic, "RGGB", wb)
    single = jnp.clip(dm.camera_to_srgb(dm.demosaic_malvar(balanced, "RGGB"), cam), 0, 1)
    single = unsharp_mask(single, jnp.float32(0.7))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5)


def test_demosaic_sharded_rejects_odd_shards(rng, the_mesh):
    from rawphotoforge_tpu.parallel import spatial

    mosaic = jnp.asarray(rng.random((30, 128), dtype=np.float32))
    with pytest.raises(ValueError):
        spatial.demosaic_sharded(mosaic, the_mesh)


def test_distortion_sharded_matches_single(rng, the_mesh):
    """Row-sharded bounded-halo warp == single-device warp across
    barrel/pincushion/zero strengths (VERDICT r1 item 8).

    Tolerance note: the two programs compile separately, so XLA may
    contract the py = fv*(h-1) chain differently; a few-ulp difference in
    py is amplified absolutely by ty = py - floor(py) (|py| ~ h), giving
    ~h * 2^-23-level output differences. 5e-5 covers h=64."""
    from rawphotoforge_tpu.parallel import spatial

    h, w = 64, 128
    planes = jnp.asarray(
        random_linear_image(rng, h, w).transpose(2, 0, 1)
    )
    for d in (-100, -60, 0, 35, 100):
        dist = jnp.float32(d)
        sharded = jax.jit(
            spatial.distortion_sharded, static_argnums=2
        )(planes, dist, the_mesh)
        single = dev.geometry_stage(planes, dist)
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), atol=5e-5
        )


def test_distortion_sharded_many_shards(rng):
    """All 8 devices on 'sp': the halo spans multiple shards (multi-hop
    exchange with a trimmed outermost hop)."""
    from rawphotoforge_tpu.parallel import spatial

    mesh8 = pmesh.make_mesh(n_batch=1, n_spatial=8)
    h, w = 64, 96
    planes = jnp.asarray(random_linear_image(rng, h, w).transpose(2, 0, 1))
    for d in (-100, 80):
        dist = jnp.float32(d)
        sharded = jax.jit(
            spatial.distortion_sharded, static_argnums=2
        )(planes, dist, mesh8)
        single = dev.geometry_stage(planes, dist)
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), atol=5e-5
        )


def test_distortion_halo_bound_is_tight_enough(rng):
    """Empirically verify the static displacement bound against the actual
    warp over a dense grid (the correctness condition of the halo size)."""
    from rawphotoforge_tpu.ops.geometry import max_row_displacement, warp_coords

    for (h, w) in ((64, 96), (96, 64), (128, 128)):
        bound = max_row_displacement(h, w, 100.0)
        ys = jnp.arange(h, dtype=jnp.int32)[:, None].repeat(w, 1)
        xs = jnp.arange(w, dtype=jnp.int32)[None, :].repeat(h, 0)
        for d in (-100.0, 100.0):
            s = jnp.float32(-0.5 * d / 100.0)
            py, _, _ = warp_coords(ys, xs, jnp.float32(h), jnp.float32(w), s)
            disp = float(jnp.max(jnp.abs(py - ys.astype(jnp.float32))))
            assert disp + 1 <= bound, (h, w, d, disp, bound)


def test_full_step_has_no_replicated_geometry(rng, the_mesh):
    """The sharded interactive step still matches the single-device stack
    with a nonzero distortion (exercising the sharded gather inside
    full_step)."""
    img = random_linear_image(rng, 64, 128)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    masks = jnp.ones((1, 64, 128), dtype=jnp.float32)
    p = EditParameters()
    p.set_tone(exposure=0.5, contrast=15)
    p.set_lens_distortion(-70)
    params = pack_params([p])
    srgb, hist, clip = jax.jit(pmesh.full_step, static_argnums=3)(
        planes, params, masks, the_mesh
    )
    geo = dev.geometry_stage(planes, params.distortion)
    single = dev.develop_post_geo(geo, params, masks)
    # Warp ulp noise (see test_distortion_sharded_matches_single) further
    # amplified by the develop stack's tone/curve slopes.
    np.testing.assert_allclose(
        np.asarray(srgb), np.asarray(single), atol=5e-4
    )
    assert int(hist.sum()) == 4 * 64 * 128


def test_spatial_pallas_sharded_matches_single_kernel(rng):
    """The production multi-chip path — the fused Pallas kernel per shard
    under shard_map, with global-row-offset vignette coordinates — must
    match the single-device kernel exactly."""
    from rawphotoforge_tpu.kernels import fused

    sp_mesh = pmesh.make_mesh(n_batch=1, n_spatial=8)
    h, w = 64, 256
    img = random_linear_image(rng, h, w)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    p = EditParameters()
    p.set_tone(exposure=0.6, contrast=20)
    p.set_vignette(45)  # exercises the global pixel coordinates
    p.set_curve(1, [0, 30000, 65535], [5000, 33000, 62000])
    packed = pack_params([p], extent=(h, w))
    masks = jnp.asarray(
        (rng.random((1, h, w)) > 0.5).astype(np.float32))

    sharded = jax.jit(
        pmesh.develop_spatial_sharded, static_argnums=(3, 4)
    )(planes, packed, masks, sp_mesh, True)
    single = fused.develop_post_geo_fused(planes, packed, masks)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=1e-6)


def test_spatial_warp_uneven_height(rng, the_mesh):
    """Heights that don't divide the 'sp' axis pad internally instead of
    raising (review finding: regression vs the replicated-geometry path)."""
    from rawphotoforge_tpu.ops.develop import geometry_stage

    h, w = 71, 128  # 71 % 2 != 0
    img = random_linear_image(rng, h, w)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    from rawphotoforge_tpu.parallel import spatial

    d = jnp.float32(-60.0)
    sharded = jax.jit(
        spatial.distortion_sharded, static_argnums=2
    )(planes, d, the_mesh)
    single = geometry_stage(planes, d)
    assert sharded.shape == (3, h, w)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=h * 3e-6)


def test_spatial_pallas_uneven_height(rng):
    """The per-shard Pallas path pads uneven heights instead of failing
    at shard_map trace time (review finding)."""
    from rawphotoforge_tpu.kernels import fused

    sp_mesh = pmesh.make_mesh(n_batch=1, n_spatial=8)
    h, w = 67, 256  # 67 % 8 != 0
    img = random_linear_image(rng, h, w)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    p = EditParameters()
    p.set_vignette(40)
    packed = pack_params([p], extent=(h, w))
    masks = jnp.ones((1, h, w), dtype=jnp.float32)
    sharded = jax.jit(
        pmesh.develop_spatial_sharded, static_argnums=(3, 4)
    )(planes, packed, masks, sp_mesh, True)
    single = fused.develop_post_geo_fused(planes, packed, masks)
    assert sharded.shape == (3, h, w)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=1e-6)


def test_histogram_sharded_uneven_height(rng, the_mesh):
    """Heights not divisible by the 'sp' axis pad internally; the pad's
    known bin-255 contribution is subtracted (review regression: the
    shard_map used to raise a divisibility error)."""
    img = random_linear_image(rng, 63, 128)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    h_sharded = jax.jit(pmesh.histogram_sharded, static_argnums=1)(
        planes, the_mesh)
    np.testing.assert_array_equal(
        np.asarray(h_sharded), np.asarray(histogram_rgbl(planes)))


def test_full_step_uneven_height(rng, the_mesh):
    """The whole interactive frame step works for heights that don't
    divide the mesh (review regression)."""
    img = random_linear_image(rng, 62, 128)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    packed = _params()
    masks = jnp.ones((1, 62, 128), dtype=jnp.float32)
    srgb, hist, clip = jax.jit(pmesh.full_step, static_argnums=3)(
        planes, packed, masks, the_mesh)
    assert srgb.shape == (3, 62, 128)
    assert int(np.asarray(hist).sum()) == 4 * 62 * 128
    # Canonical clip semantics: fraction of pixels with ANY channel
    # clipped (ops/stats.clipping_stats).
    from rawphotoforge_tpu.ops.stats import clipping_stats

    want = float(np.asarray(clipping_stats(srgb)["highlight_clip_fraction"]))
    assert float(np.asarray(clip)) == pytest.approx(want, abs=1e-6)


def test_sharded_warp_respects_extent(rng, the_mesh):
    """Bucket-padded buffers: the sharded warp must normalize and clamp
    by the TRUE extent like the single-device geometry stage (review
    regression: it used the padded shape, warping every pixel
    differently)."""
    from rawphotoforge_tpu.parallel import spatial

    th, tw = 60, 120
    img = random_linear_image(rng, th, tw).transpose(2, 0, 1)
    padded = np.pad(img, [(0, 0), (0, 4), (0, 8)], mode="edge")
    planes = jnp.asarray(padded)
    ext = jnp.asarray([float(th), float(tw)], jnp.float32)

    sharded = jax.jit(
        spatial.distortion_sharded, static_argnums=2)(
        planes, jnp.float32(-55.0), the_mesh, extent=ext)
    single = dev.geometry_stage_jit(planes, jnp.float32(-55.0), ext)
    # ulp-level coordinate differences between differently-compiled
    # programs can amplify near pixel boundaries (CLAUDE.md); compare the
    # TRUE region with a height-scaled tolerance.
    a = np.asarray(sharded)[:, :th, :tw]
    b = np.asarray(single)[:, :th, :tw]
    close = np.isclose(a, b, atol=2e-4)
    assert close.mean() > 0.999
    np.testing.assert_allclose(np.sort(a.ravel()), np.sort(b.ravel()),
                               atol=2e-3)


def test_demosaic_sharded_thin_shard_rejected(the_mesh):
    from rawphotoforge_tpu.parallel import spatial

    mosaic = jnp.zeros((4, 128), jnp.float32)  # 2 rows/shard == HALO
    with pytest.raises(ValueError, match="halo"):
        spatial.demosaic_sharded(mosaic, the_mesh)


def test_make_mesh_too_many_devices_rejected():
    with pytest.raises(ValueError, match="devices"):
        pmesh.make_mesh(n_batch=64, n_spatial=2)
    with pytest.raises(ValueError, match="devices"):
        pmesh.make_mesh(n_spatial=16)  # n_batch floors to 0


def test_demosaic_sharded_odd_height_single_shard(rng):
    """A single-'sp'-shard mesh must accept odd heights (common after
    vendor border crops) exactly like the unsharded demosaic; multi-
    shard meshes keep the even-shard-start requirement."""
    from rawphotoforge_tpu.ops import demosaic as dm
    from rawphotoforge_tpu.parallel import spatial

    mesh1 = pmesh.make_mesh(n_batch=8, n_spatial=1)
    mosaic = jnp.asarray(rng.random((33, 48), dtype=np.float32))
    out = spatial.demosaic_sharded(mosaic, mesh1, "RGGB")
    want = dm.demosaic_malvar(mosaic, "RGGB")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-6)
    mesh2 = pmesh.make_mesh(n_batch=4, n_spatial=2)
    with pytest.raises(ValueError):
        spatial.demosaic_sharded(jnp.zeros((34, 48)), mesh2, "RGGB")


def test_export_batch_raw_fused_packed_matches_single(rng, the_mesh):
    """The c5 mesh step (per-shard fused RAW kernel + packed wire under
    shard_map, one image per device) emits scans byte-identical to the
    single-device packed wire of the same per-image pipeline."""
    from rawphotoforge_tpu.io import jpegbits, jpegenc
    from rawphotoforge_tpu.kernels.raw_pipeline import raw_develop_fused
    from rawphotoforge_tpu.ops import demosaic as dm

    n = the_mesh.shape["batch"]
    mosaics = jnp.asarray(rng.random((n, 32, 128), dtype=np.float32))
    wb = jnp.asarray([1.8, 1.0, 1.4])
    cam = jnp.asarray(dm.cam_matrix_to_srgb(
        np.array([[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15],
                  [-0.05, 0.15, 0.65]])))
    packed = _params()
    sharpen = jnp.float32(0.5)
    qlum, qchr = (jnp.asarray(t) for t in jpegenc._quant_tables(92))
    caps = (jpegbits.PACKED_ENT_WORDS, jpegbits.PACKED_OUT_WORDS)

    words, totals = jax.jit(
        pmesh.export_batch_raw_fused_packed_step,
        static_argnums=(5, 8, 9, 10),
    )(mosaics, wb, cam, packed, sharpen, the_mesh, qlum, qchr,
      "RGGB", *caps)
    st = jpegbits._prepacked_jit()
    for i in range(n):
        nw, nbits, bad, n_ent, kept = (int(x) for x in totals[i])
        assert bad == 0 and kept == nw > 0
        srgb = raw_develop_fused(mosaics[i], wb, cam, packed, sharpen)
        s_bands, s_tot = st.full_packed(srgb, qlum, qchr, *caps)
        sv = np.asarray(s_tot)
        assert (nw, nbits) == (int(sv[0]), int(sv[1]))
        np.testing.assert_array_equal(
            np.asarray(words[i])[:nw],
            np.concatenate([np.asarray(b) for b in s_bands])[:nw])
        assert not np.asarray(words[i])[nw:].any()
