"""PhotoEditor session tests: pyramid, masks, presets, caching, histogram."""

import numpy as np
import jax.numpy as jnp
import pytest

from rawphotoforge_tpu.core.params import BRIGHTNESS, HUE, SATURATION
from rawphotoforge_tpu.engine.editor import PhotoEditor, MaskNotFound, FULL, MID, LOW
from rawphotoforge_tpu.io import image_io

from conftest import random_linear_image


def make_editor(rng, h=40, w=64, **kw):
    img = random_linear_image(rng, h, w)
    kw.setdefault("use_pallas", False)  # jnp path: fast for small CPU tests
    kw.setdefault("mid_long_edge", 32)
    kw.setdefault("low_long_edge", 16)
    return PhotoEditor.from_rgb_f32(img, **kw)


def test_pyramid_shapes(rng):
    ed = make_editor(rng, h=40, w=64)
    assert ed.shape == (40, 64)
    assert ed.level_shape(MID) == (20, 32)
    assert ed.level_shape(LOW) == (10, 16)


def test_apply_default_near_input(rng):
    ed = make_editor(rng)
    out = ed.get_srgb_f32(FULL)
    assert out.shape == (40, 64, 3)
    assert out.min() >= 0 and out.max() <= 1


def test_render_cache_and_invalidation(rng):
    ed = make_editor(rng)
    a = ed.apply(LOW)
    b = ed.apply(LOW)
    assert a is b  # cached object, no recompute
    ed.set_tone(exposure=1.0)
    c = ed.apply(LOW)
    assert c is not b
    assert not np.allclose(np.asarray(c), np.asarray(b))


def test_edit_changes_output_monotonically(rng):
    ed = make_editor(rng)
    base = np.asarray(ed.apply(MID))
    ed.set_tone(exposure=2.0)
    brighter = np.asarray(ed.apply(MID))
    assert brighter.mean() > base.mean()


def test_mask_lifecycle(rng):
    ed = make_editor(rng)
    h, w = ed.shape
    data = np.zeros((h, w), dtype=np.float32)
    data[: h // 2] = 1.0
    # Reference semantics: binarization is v >= mask_range (lib.rs:485), so
    # with the default mask_range of 0.0 even zero pixels pass — set a real
    # threshold first, as the UI does.
    ed.set_mask_range(0.5)
    ed.add_mask("sky", data)
    assert ed.mask_names() == ["main", "sky"]

    base = np.asarray(ed.apply(FULL))
    ed.set_tone(exposure=2.0, mask_name="sky")
    out = np.asarray(ed.apply(FULL))
    top = out[:, : h // 2 - 1, :]
    bottom_diff = np.abs(out[:, h // 2 + 1 :, :] - base[:, h // 2 + 1 :, :])
    # Bottom (unmasked) unchanged; top brightened.
    assert bottom_diff.max() < 1e-6
    assert top.mean() > base[:, : h // 2 - 1, :].mean()

    ed.remove_mask("sky")
    assert ed.mask_names() == ["main"]
    ed.remove_mask("main")  # no-op
    assert ed.mask_names() == ["main"]


def test_mask_threshold_binarization(rng):
    ed = make_editor(rng)
    h, w = ed.shape
    ed.set_mask_range(0.5)
    grad = np.linspace(0, 1, h * w, dtype=np.float32).reshape(h, w)
    ed.add_mask("m", grad)
    stack = ed._masks_at(FULL)
    m = np.asarray(stack[1])[:h, :w]  # drop compile-bucket padding
    np.testing.assert_array_equal(np.unique(m), [0.0, 1.0])
    np.testing.assert_array_equal(m, (grad >= 0.5).astype(np.float32))


def test_mask_invert(rng):
    ed = make_editor(rng)
    h, w = ed.shape
    data = np.zeros((h, w), dtype=np.float32)
    data[:, : w // 2] = 1.0
    ed.add_mask("m", data)
    before = np.asarray(ed._find("m").data_full)
    ed.invert_mask("m")
    after = np.asarray(ed._find("m").data_full)
    np.testing.assert_array_equal(after, 1.0 - before)


def test_missing_mask_raises(rng):
    ed = make_editor(rng)
    with pytest.raises(MaskNotFound):
        ed.set_tone(exposure=1.0, mask_name="nope")


def test_reset(rng):
    img = random_linear_image(rng, 40, 64)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=False, mid_long_edge=32, low_long_edge=16)
    fresh = PhotoEditor.from_rgb_f32(img, use_pallas=False, mid_long_edge=32, low_long_edge=16)
    ed.add_mask("m", np.ones(ed.shape, dtype=np.float32))
    ed.set_tone(exposure=3.0)
    ed.reset()
    assert ed.mask_names() == ["main"]
    np.testing.assert_allclose(
        np.asarray(ed.apply(FULL)), np.asarray(fresh.apply(FULL)), atol=1e-6
    )


def test_preset_roundtrip(rng):
    img = random_linear_image(rng, 40, 64)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=False, mid_long_edge=32, low_long_edge=16)
    ed.set_tone(exposure=1.25, contrast=40, shadow=-10)
    ed.set_whitebalance(temperature=25, tint=-15)
    ed.set_vignette(30)
    ed.set_curve(BRIGHTNESS, [0, 30000, 65535], [0, 40000, 65535])
    ed.set_curve(SATURATION, [0, 65535], [40000, 40000])
    rendered = np.asarray(ed.apply(FULL))

    blob = ed.preset_json()
    ed2 = PhotoEditor.from_rgb_f32(img, use_pallas=False, mid_long_edge=32, low_long_edge=16)
    ed2.load_preset_json(blob)
    p = ed2.params()
    assert p.exposure == 1.25 and p.contrast == 40 and p.shadow == -10
    assert p.wb_temperature == 25 and p.vignette == 30
    np.testing.assert_allclose(np.asarray(ed2.apply(FULL)), rendered, atol=1e-6)


def test_geo_cache_reused_across_edits(rng):
    ed = make_editor(rng)
    ed.set_lens_distortion(50)
    ed.apply(MID)
    geo1 = ed._geo_cache[MID][1]
    ed.set_tone(exposure=0.5)  # non-geometry edit
    ed.apply(MID)
    assert ed._geo_cache[MID][1] is geo1
    ed.set_lens_distortion(60)
    ed.apply(MID)
    assert ed._geo_cache[MID][1] is not geo1


def test_histogram_shape_and_mass(rng):
    ed = make_editor(rng)
    hist = ed.histogram(MID)
    assert hist.shape == (4, 256)
    h, w = ed.level_shape(MID)
    np.testing.assert_array_equal(hist.sum(axis=1), [h * w] * 4)


def test_clipping_stats(rng):
    ed = make_editor(rng)
    ed.set_tone(exposure=6.0)
    clip = ed.clipping(MID)
    assert clip["highlight_clip_fraction"] > 0.5


def test_save_and_open(rng, tmp_path):
    ed = make_editor(rng)
    ed.set_tone(exposure=0.5)
    p = tmp_path / "out.png"
    ed.save(str(p))
    ed2 = PhotoEditor.open(str(p), mid_long_edge=32, low_long_edge=16, use_pallas=False)
    assert ed2.shape == ed.shape
    # Decode(encode(srgb)) -> linear; re-encoding the new original should
    # give back the same u8s (u8 -> EOTF -> OETF -> u8 is lossless).
    h, w = ed2.shape
    re_encoded = image_io.linear_planes_to_srgb_u8(ed2._originals[FULL][:, :h, :w])
    original_u8 = (np.asarray(ed.apply(FULL)).transpose(1, 2, 0) * 255).astype(np.uint8)
    assert np.abs(re_encoded.astype(int) - original_u8.astype(int)).max() <= 1


def test_pallas_editor_matches_jnp_editor(rng):
    img = random_linear_image(rng, 32, 48)
    ed_a = PhotoEditor.from_rgb_f32(img, use_pallas=False, mid_long_edge=32, low_long_edge=16)
    ed_b = PhotoEditor.from_rgb_f32(img, use_pallas=True, mid_long_edge=32, low_long_edge=16)
    for ed in (ed_a, ed_b):
        ed.set_tone(exposure=0.8, contrast=20)
        ed.set_whitebalance(temperature=30)
    # Slider-only state: the kernel path takes the identity_oklch variant
    # (skips the OKLCH round trip the anchor still performs with exact
    # trig), so the deviation profile is a broad ~1e-4 haze rather than
    # sparse curve-evaluation error — gate max + a loose rate.
    a = np.asarray(ed_a.apply(FULL))
    b = np.asarray(ed_b.apply(FULL))
    assert np.abs(a - b).max() < 2e-3
    assert (np.abs(a - b) > 1e-3).mean() < 5e-3
    # A touched BRIGHTNESS curve stays on the identity_oklch variant
    # (per-family shortcut flags: the OKLCH curves are still default),
    # so the haze profile persists — gate max + the loose rate, like the
    # slider-only state above (CLAUDE.md kernel-flag notes).
    for ed in (ed_a, ed_b):
        ed.set_curve(BRIGHTNESS, [0, 30000, 65535], [0, 24000, 65535])
    a = np.asarray(ed_a.apply(FULL))
    b = np.asarray(ed_b.apply(FULL))
    assert np.abs(a - b).max() < 5e-3
    assert (np.abs(a - b) > 1e-3).mean() < 5e-3
    # With an OKLCH-family curve set, both paths evaluate the full OKLCH
    # stack: the original strict gates apply (sparse curve-eval
    # tolerance only).
    for ed in (ed_a, ed_b):
        ed.set_curve(HUE, [0, 30000, 65535], [0, 29000, 65535])
    a = np.asarray(ed_a.apply(FULL))
    b = np.asarray(ed_b.apply(FULL))
    assert np.abs(a - b).max() < 5e-3
    assert (np.abs(a - b) > 1e-4).mean() < 2e-3


def test_bucket_padding_matches_unpadded_compute(rng):
    """Bucket-padded editor render must equal direct develop on the true
    (unpadded) image — vignette/distortion normalize by the true extent."""
    from rawphotoforge_tpu.core.params import pack_params
    from rawphotoforge_tpu.ops import develop as dev
    import jax.numpy as jnp

    img = random_linear_image(rng, 40, 64)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=False, mid_long_edge=32, low_long_edge=16)
    ed.set_tone(exposure=0.6, contrast=20)
    ed.set_vignette(70)
    ed.set_lens_distortion(-40)
    out = np.asarray(ed.apply(FULL))
    assert out.shape == (3, 40, 64)

    packed = pack_params([ed.params()])
    direct = np.asarray(
        dev.develop_jit(
            jnp.asarray(img.transpose(2, 0, 1)),
            packed,
            jnp.ones((1, 40, 64), dtype=jnp.float32),
        )
    )
    np.testing.assert_allclose(out, direct, atol=1e-5)


def test_bucketed_shapes_share_padded_shape(rng):
    """Two images with different true dims in the same bucket produce the
    same padded device shapes (the compile-cache reuse property)."""
    ed_a = PhotoEditor.from_rgb_f32(random_linear_image(rng, 40, 64),
                                    use_pallas=False, mid_long_edge=32, low_long_edge=16)
    ed_b = PhotoEditor.from_rgb_f32(random_linear_image(rng, 100, 120),
                                    use_pallas=False, mid_long_edge=32, low_long_edge=16)
    assert ed_a._originals[FULL].shape == (3, 128, 128)
    assert ed_b._originals[FULL].shape == (3, 128, 128)
    assert ed_a.shape == (40, 64) and ed_b.shape == (100, 120)


def test_crop_nondestructive(rng):
    ed = make_editor(rng, h=40, w=64)
    full = np.asarray(ed.apply(FULL))
    ed.set_crop(8, 4, 40, 28)
    cropped = np.asarray(ed.apply(FULL))
    assert cropped.shape == (3, 24, 32)
    np.testing.assert_allclose(cropped, full[:, 4:28, 8:40], atol=1e-6)
    assert ed.cropped_shape == (24, 32)
    ed.clear_crop()
    assert np.asarray(ed.apply(FULL)).shape == (3, 40, 64)


def test_crop_in_preset(rng):
    ed = make_editor(rng)
    ed.set_crop(0, 0, 32, 20)
    blob = ed.preset_json()
    ed2 = make_editor(rng)
    ed2.load_preset_json(blob)
    assert ed2.crop_rect == (0, 0, 32, 20)


def test_crop_validation(rng):
    ed = make_editor(rng)
    with pytest.raises(ValueError):
        ed.set_crop(5, 5, 5, 20)
    ed.set_crop(-10, -10, 1000, 1000)  # clamped to image
    assert ed.crop_rect == (0, 0, 64, 40)


def test_raw_lut_renders_exactly_on_pallas_editor(rng):
    """A curve supplied as a raw 65536-entry LUT must render bit-identically
    on the default (use_pallas=True) editor and the jnp anchor editor: raw
    LUTs route through the exact gather path, never the packed-PCHIP
    approximation (VERDICT r1 weak #3)."""
    from rawphotoforge_tpu.core.tonelut import tone_lut_i32

    img = random_linear_image(rng, 32, 48)
    luts = [
        tone_lut_i32(exposure=0.9, contrast=35, shadow=20, black=-15),
        tone_lut_i32(exposure=-0.5, highlight=-40, white=25),
        # Jagged LUT no 32-knot PCHIP can reproduce.
        np.clip(
            np.arange(65536) + (rng.integers(0, 4000, 65536) - 2000), 0, 65535
        ).astype(np.int32),
    ]
    for lut in luts:
        eds = []
        for use_pallas in (False, True):
            ed = PhotoEditor.from_rgb_f32(
                img, use_pallas=use_pallas, mid_long_edge=32, low_long_edge=16
            )
            ed.set_tone(exposure=0.2, contrast=10)
            ed.set_curve(BRIGHTNESS, raw_lut=lut)
            eds.append(ed)
        assert eds[1]._use_exact_path()
        a = np.asarray(eds[0].apply(FULL))
        b = np.asarray(eds[1].apply(FULL))
        np.testing.assert_array_equal(a, b)


def test_pallas_editor_reverts_to_kernel_after_raw_lut_cleared(rng):
    img = random_linear_image(rng, 32, 48)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=True,
                                  mid_long_edge=32, low_long_edge=16)
    assert not ed._use_exact_path()
    ed.set_curve(BRIGHTNESS, raw_lut=np.arange(65536, dtype=np.int32))
    assert ed._use_exact_path()
    ed.set_curve(BRIGHTNESS, [0, 65535], [0, 65535])
    assert not ed._use_exact_path()


def test_preset_crop_validated_against_current_image(rng):
    ed_big = make_editor(rng, h=200, w=300)
    ed_big.set_crop(250, 150, 300, 200)
    blob = ed_big.preset_json()

    ed_small = make_editor(rng, h=40, w=64)  # rect fully outside
    with pytest.raises(ValueError):
        ed_small.load_preset_json(blob)
    assert ed_small.crop_rect is None

    ed_mid = make_editor(rng, h=180, w=280)  # rect partially outside: clamp
    ed_mid.load_preset_json(blob)
    assert ed_mid.crop_rect == (250, 150, 280, 180)


def test_preset_load_is_atomic_on_invalid_crop(rng):
    """A rejected preset must leave the session EXACTLY as it was — no
    half-applied mask params, no stale caches (review finding)."""
    import json

    from rawphotoforge_tpu.engine.editor import PhotoEditor

    img = random_linear_image(rng, 30, 40)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=False)
    ed.set_tone(exposure=0.5, contrast=20)
    before_params = ed.preset_json()
    before_render = np.asarray(ed.apply())

    bad = json.loads(before_params)
    bad["masks"][0]["params"]["exposure"] = 3.0
    bad["crop"] = [500, 500, 900, 900]  # outside this 40x30 image
    with pytest.raises(ValueError):
        ed.load_preset_json(json.dumps(bad))

    assert ed.preset_json() == before_params
    np.testing.assert_array_equal(np.asarray(ed.apply()), before_render)


def test_save_hdr_dng_round_trip(rng, tmp_path):
    """HDR export: the edited linear render round-trips through a float
    LinearRaw DNG — reopening and developing with identity WB/matrix
    reproduces the session's output within fp16 quantization."""
    from rawphotoforge_tpu.core.color import srgb_to_linear
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.io.raw import read_raw

    img = random_linear_image(rng, 24, 32)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=False)
    ed.set_tone(exposure=0.6, contrast=25)
    ed.set_vignette(30)
    p = tmp_path / "hdr.dng"
    ed.save_hdr_dng(str(p))

    want = np.asarray(srgb_to_linear(ed.apply()))
    got, exif = read_raw(str(p))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)  # fp16
    # fp32 export is exact up to the develop clip.
    ed.save_hdr_dng(str(p), dtype=np.float32)
    got32, _ = read_raw(str(p))
    np.testing.assert_allclose(np.asarray(got32), np.clip(want, 0, 1),
                               atol=1e-6)


def test_cli_develop_hdr_dng_output(rng, tmp_path):
    from PIL import Image as PILImage

    from rawphotoforge_tpu.app.cli import main
    from rawphotoforge_tpu.io import dng

    src = tmp_path / "in.png"
    arr = (random_linear_image(rng, 20, 28) * 255).astype(np.uint8)
    PILImage.fromarray(arr).save(src)
    out = tmp_path / "out.dng"
    assert main(["develop", str(src), str(out), "--exposure", "0.4",
                 "--jnp-path"]) == 0
    raw = dng.read_dng(out.read_bytes())
    assert raw.pattern == "RGB" and raw.mosaic.dtype == np.float32


def test_editor_review_fixes(rng, tmp_path):
    """Round-2 editor-review regressions in one sweep."""
    import json

    from rawphotoforge_tpu.core import curve as curve_mod
    from rawphotoforge_tpu.engine.editor import MaskNotFound, PhotoEditor

    img = random_linear_image(rng, 30, 40)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=False)

    # Preset with a non-monotone curve is rejected BEFORE any mutation.
    before = ed.preset_json()
    bad = json.loads(before)
    bad["masks"][0]["params"]["curves"]["brightness"] = {
        "x": [0, 0], "y": [0, 65535]}
    with pytest.raises(curve_mod.CurveError):
        ed.load_preset_json(json.dumps(bad))
    assert ed.preset_json() == before
    # ...and a wrong-length raw LUT too.
    bad["masks"][0]["params"]["curves"]["brightness"] = {"raw_lut": [1, 2, 3]}
    with pytest.raises(curve_mod.CurveError):
        ed.load_preset_json(json.dumps(bad))

    # save() must not truncate an existing file when encoding fails.
    out = tmp_path / "keep.dng"
    out.write_bytes(b"precious")
    with pytest.raises(Exception):
        ed.save(str(out))  # DNG is not a display-encode target
    assert out.read_bytes() == b"precious"

    # Duplicate / reserved mask names are rejected.
    ed.add_mask("m1", (rng.random((30, 40)) > 0.5).astype(np.float32))
    with pytest.raises(ValueError):
        ed.add_mask("m1", np.ones((30, 40), np.float32))
    with pytest.raises(ValueError):
        ed.add_mask("main", np.ones((30, 40), np.float32))

    # remove_mask raises for typos (consistent with invert_mask).
    with pytest.raises(MaskNotFound):
        ed.remove_mask("nope")

    # Crop adjustments reuse the cached render (no version bump).
    ed.apply(FULL)
    v = ed._version
    ed.set_crop(2, 2, 20, 20)
    ed.clear_crop()
    assert ed._version == v
    ed.set_crop(1, 1, 30, 25)

    # reset() clears the crop along with masks/params.
    ed.reset()
    assert ed.crop_rect is None and ed.mask_names() == ["main"]


def test_mask_range_rethresholds_existing_masks(rng):
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    img = random_linear_image(rng, 20, 24)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=False)
    logits = np.linspace(-1.0, 1.0, 20 * 24, dtype=np.float32).reshape(20, 24)
    ed.add_mask("grad", logits)  # threshold 0.0 -> upper half selected
    m = ed.masks[1]
    sel_lo = float(np.asarray(m.data_full).mean())
    ed.set_mask_range(0.9)  # live re-threshold (v1 semantics)
    sel_hi = float(np.asarray(ed.masks[1].data_full).mean())
    assert sel_hi < sel_lo
    # Inversion detaches from logits: further range moves leave it alone.
    ed.invert_mask("grad")
    frozen = np.asarray(ed.masks[1].data_full).copy()
    ed.set_mask_range(0.1)
    np.testing.assert_array_equal(np.asarray(ed.masks[1].data_full), frozen)


def test_warp_plus_sharpen_matches_unpadded_oracle():
    """The warp blackens the bucket pad (OOB); without re-replication the
    sharpen stencil bled that black into the last true rows (~0.25
    error). The padded geometry+sharpen stage must now match the same
    stage run on exactly-sized planes (review regression)."""
    import jax.numpy as jnp

    from rawphotoforge_tpu.engine.editor import FULL, PhotoEditor
    from rawphotoforge_tpu.ops import develop as dev
    from rawphotoforge_tpu.ops.sharpen import unsharp_mask

    # 120x150 -> bucket-padded to 128x256 internally.
    img = np.full((120, 150, 3), 0.5, np.float32)
    ed = PhotoEditor.from_rgb_f32(img)
    ed.set_lens_distortion(1)
    ed.set_sharpness(50)
    got = np.asarray(ed._geo_at(FULL))[:, :120, :150]

    planes = jnp.asarray(np.full((3, 120, 150), 0.5, np.float32))
    oracle = dev.geometry_stage_jit(planes, jnp.float32(1.0), None)
    oracle = np.asarray(unsharp_mask(oracle, jnp.float32(50 / 100.0 * 2.0)))
    np.testing.assert_allclose(got, oracle, atol=1e-6)


def test_use_pallas_toggle_invalidates_packed_luts(rng):
    """Toggling use_pallas after a render must rebuild packed params with
    the exact LUTs — the kernel-path pack holds placeholder zero LUTs
    that render black on the anchor path (review regression)."""
    from rawphotoforge_tpu.core.params import BRIGHTNESS
    from rawphotoforge_tpu.engine.editor import FULL, PhotoEditor

    img = np.clip(rng.random((24, 32, 3)), 0.05, 1).astype(np.float32)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=True,
                                  mid_long_edge=16, low_long_edge=8)
    ed.set_curve(BRIGHTNESS, [0, 65535], [10000, 65535])
    a = np.asarray(ed.apply(FULL))
    ed.use_pallas = False
    b = np.asarray(ed.apply(FULL))
    assert b.mean() > 0.05, "anchor path rendered black (stale packed LUTs)"
    assert np.abs(a - b).max() < 5e-3


def test_preset_restores_mask_range_rethreshold(rng):
    """A preset carrying mask_range must re-binarize logit-backed masks,
    like a live set_mask_range call (review regression)."""
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    img = np.full((16, 24, 3), 0.5, np.float32)

    def fresh():
        ed = PhotoEditor.from_rgb_f32(img, mid_long_edge=16, low_long_edge=8)
        logits = np.linspace(0, 1, 16 * 24, dtype=np.float32).reshape(16, 24)
        ed.add_mask("grad", logits)
        return ed

    ed1 = fresh()
    ed1.set_mask_range(0.8)
    preset = ed1.preset_json()
    want = np.asarray(ed1._find("grad").data_full)

    ed2 = fresh()  # binarized at the default threshold
    ed2.load_preset_json(preset)
    got = np.asarray(ed2._find("grad").data_full)
    np.testing.assert_array_equal(got, want)


def test_add_mask_rejects_empty_name(rng):
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    ed = PhotoEditor.from_rgb_f32(np.full((8, 8, 3), 0.5, np.float32),
                                  mid_long_edge=8, low_long_edge=8)
    with pytest.raises(ValueError, match="non-empty"):
        ed.add_mask("", np.ones((8, 8), np.float32))


def test_use_pallas_toggle_invalidates_render_cache(rng):
    """The kernel and anchor paths agree only to tolerance; a cached
    render from the other path must not be served after a toggle
    (campaign regression: ulp-stale renders)."""
    from rawphotoforge_tpu.engine.editor import MID, PhotoEditor

    img = np.clip(rng.random((40, 56, 3)), 0.05, 1).astype(np.float32)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=True,
                                  mid_long_edge=32, low_long_edge=16)
    ed.set_tone(exposure=0.6, contrast=15)
    ed.apply(MID)  # cache a kernel-path render
    ed.use_pallas = False
    a = np.asarray(ed.apply(MID))
    fresh = PhotoEditor.from_rgb_f32(img, use_pallas=False,
                                     mid_long_edge=32, low_long_edge=16)
    fresh.set_tone(exposure=0.6, contrast=15)
    np.testing.assert_array_equal(a, np.asarray(fresh.apply(MID)))


def test_rect_stats_match_sliced(rng):
    """The rect-parameterized histogram/clipping (one compiled program
    per shape, not per crop rect) must equal the sliced-array versions
    exactly."""
    from rawphotoforge_tpu.ops.stats import (
        clipping_stats, clipping_stats_rect, histogram_rgbl,
        histogram_rgbl_rect)

    planes = jnp.asarray(
        rng.random((3, 40, 56), dtype=np.float32))
    rect = (7, 31, 9, 50)
    sliced = planes[:, rect[0]:rect[1], rect[2]:rect[3]]
    ra = jnp.asarray(rect, jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(histogram_rgbl_rect(planes, ra)),
        np.asarray(histogram_rgbl(sliced)))
    a = {k: float(v) for k, v in clipping_stats_rect(planes, ra).items()}
    b = {k: float(v) for k, v in clipping_stats(sliced).items()}
    assert a == pytest.approx(b)


def test_cropped_histogram_and_clipping_match_cropped_render(rng):
    """editor.histogram()/clipping() under a crop must equal the stats of
    the cropped render — while dispatching on the stable uncropped
    shape (no per-rect remote compiles)."""
    from rawphotoforge_tpu.ops.stats import clipping_stats, histogram_rgbl

    ed = PhotoEditor(random_linear_image(rng, 40, 60).transpose(2, 0, 1),
                     mid_long_edge=32, use_pallas=False)
    ed.set_tone(exposure=0.6, contrast=20)
    ed.set_crop(8, 5, 52, 35)
    want_h = np.asarray(histogram_rgbl(ed.apply(MID)))
    np.testing.assert_array_equal(ed.histogram(MID), want_h)
    want_c = {k: float(v) for k, v in clipping_stats(ed.apply(MID)).items()}
    assert ed.clipping(MID) == pytest.approx(want_c)


def test_cropped_save_bytes_match_device_sliced_encode(rng):
    """save_bytes under a crop (host-side slice of the full-frame
    quantize) must be byte-identical to encoding the device-sliced
    render — truncating u8 quantize commutes with slicing."""
    ed = PhotoEditor(random_linear_image(rng, 40, 60).transpose(2, 0, 1),
                     mid_long_edge=32, use_pallas=False)
    ed.set_tone(exposure=0.4)
    ed.set_crop(6, 4, 50, 30)
    got = ed.save_bytes("PNG")
    want = image_io.encode_image(ed.apply(FULL), "PNG",
                                 exif_bytes=ed.export_exif_bytes())
    assert got == want


def test_uncropped_jpeg_save_bytes_takes_padded_sparse_route(rng):
    """save_bytes('JPEG') with no crop must hand the editor's OWN
    bucket-padded render + true extent to the sparse export (the async
    /export worker's route) — byte-identical to calling encode_jpeg on
    apply_padded directly, and decodable at the true extent. Re-padding
    the true-extent render inside encode_jpeg would mint a per-extent
    pad program (remote compiles, CLAUDE.md)."""
    import io as _io

    from PIL import Image

    from rawphotoforge_tpu.io import jpegenc

    ed = make_editor(rng, h=40, w=64)
    ed.set_tone(exposure=0.5)
    got = ed.save_bytes("JPEG", quality=90)
    img, true_shape = ed.apply_padded(FULL)
    want = jpegenc.encode_jpeg(img, quality=90,
                               exif_bytes=ed.export_exif_bytes(),
                               true_shape=true_shape)
    assert got == want
    assert Image.open(_io.BytesIO(got)).size == (64, 40)
    # cropped JPEG keeps the full-frame-render + host-slice route
    ed.set_crop(4, 4, 36, 24)  # (x0,y0)-(x1,y1) exclusive -> 32x20 px
    cropped = ed.save_bytes("JPEG", quality=90)
    assert Image.open(_io.BytesIO(cropped)).size == (32, 20)


def test_exact_path_single_mask_elision_matches(rng):
    """develop_post_geo with masks=None (single-mask session) must match
    the explicit all-ones mask stack to XLA re-fusion noise (the where
    elision changes fusion decisions; same math, ulp-level deltas)."""
    from rawphotoforge_tpu.core.params import EditParameters, pack_params
    from rawphotoforge_tpu.ops import develop as dev

    p = EditParameters()
    p.set_tone(exposure=0.7, contrast=25, shadow=10)
    p.set_whitebalance(20, -10)
    p.set_curve(BRIGHTNESS, [0, 30000, 65535], [0, 40000, 65535])
    params = pack_params([p])
    planes = jnp.asarray(rng.random((3, 24, 40), dtype=np.float32))
    ones = jnp.ones((1, 24, 40), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dev.develop_post_geo_jit(planes, params, None)),
        np.asarray(dev.develop_post_geo_jit(planes, params, ones)),
        atol=5e-5)


def test_instant_preview_jpeg_honors_quality(rng):
    ed = PhotoEditor.from_rgb_f32(
        random_linear_image(rng, 30, 40), use_pallas=False)
    ed.instant_srgb_u8 = (rng.random((30, 40, 3)) * 255).astype(np.uint8)
    hi = ed.instant_preview_jpeg(quality=95)
    lo = ed.instant_preview_jpeg(quality=30)
    assert len(lo) < len(hi)  # a cache hit must not ignore quality
    assert ed.instant_preview_jpeg(quality=30) == lo  # and still caches


def test_instant_histogram_luma_matches_device_weights():
    """Saturated red: BT.601 luma bin 76 on BOTH the instant and device
    histograms — Rec.709 weights here made the luma row jump at the
    era swap (bin ~54 vs ~76)."""
    from rawphotoforge_tpu.engine.instant import instant_histogram
    from rawphotoforge_tpu.ops.stats import histogram_rgbl

    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :, 0] = 255
    inst = instant_histogram(img)
    assert inst[3].argmax() == 76 and inst[3, 76] == 64
    planes = jnp.asarray(
        img.astype(np.float32).transpose(2, 0, 1) / 255.0)
    dev_h = np.asarray(histogram_rgbl(planes))
    assert dev_h[3].argmax() == 76


def test_apply_padded_matches_apply(rng):
    """apply_padded returns the bucket-padded render whose true region
    is exactly apply(cropped=False) — the bucket-stable export seam
    (io/jpegenc sparse JPEG)."""
    ed = make_editor(rng, h=40, w=64)
    ed.set_tone(exposure=0.6, contrast=20)
    ed.set_vignette(30)
    padded, (h, w) = ed.apply_padded(FULL)
    assert (h, w) == (40, 64)
    assert padded.shape[1] % 128 == 0 and padded.shape[2] % 128 == 0
    np.testing.assert_array_equal(
        np.asarray(padded[:, :h, :w]),
        np.asarray(ed.apply(FULL, cropped=False)))
    # crop rects do not leak into the padded render
    ed.set_crop(4, 4, 32, 24)
    padded2, _ = ed.apply_padded(FULL)
    assert padded2.shape == padded.shape
