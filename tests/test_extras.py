"""Tests: v1 tone-LUT builder, lens-correction profiles, masking tools."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import interpolate

from rawphotoforge_tpu.core.tonelut import tone_lut_from_params, tone_lut_i32
from rawphotoforge_tpu.core.params import BRIGHTNESS, EditParameters
from rawphotoforge_tpu.ops import lenscorr, masking
from rawphotoforge_tpu.engine.editor import PhotoEditor, FULL

from conftest import random_linear_image


# -- v1 tone LUT -------------------------------------------------------------

def test_tone_lut_identity_defaults():
    lut = tone_lut_from_params()
    x = np.linspace(0, 1, 65536, dtype=np.float32)
    np.testing.assert_allclose(lut / 65535.0, x, atol=2e-3)


def test_tone_lut_exposure_shifts_up():
    lut0 = tone_lut_from_params()
    lut1 = tone_lut_from_params(exposure=1.0)
    assert (lut1 >= lut0 - 1).all()
    assert lut1[20000] > lut0[20000]


def test_tone_lut_matches_v1_formula():
    """Re-derive the v1 math independently for one parameter set."""
    exposure, contrast, shadow, highlight, black, white = 0.5, 20, 30, -10, 15, -5
    x = np.linspace(0, 1, 65536, dtype=np.float32)
    x_ev = np.clip(x * 2.0 ** exposure, 0, 1)
    p5, p25, p50, p75, p95 = 0.05, 0.25, 0.5, 0.75, 0.95
    ys = np.clip(
        [0.0,
         p5 + (p50 - p5) * black / 100,
         p25 + (p50 - p25) * shadow / 100,
         p50,
         p75 + (p95 - p75) * highlight / 100,
         p95 + (p95 - p50) * white / 100,
         1.0], 0, 1)
    curve = interpolate.PchipInterpolator([0, p5, p25, p50, p75, p95, 1.0], ys)
    expected = np.clip(0.5 + (curve(x_ev) - 0.5) * (1 + contrast / 100), 0, 1) * 65535
    got = tone_lut_from_params(exposure, contrast, shadow, highlight, black, white)
    np.testing.assert_allclose(got, expected.astype(np.float32), atol=1.0)


def test_tone_lut_feeds_brightness_curve(rng):
    p = EditParameters()
    p.set_curve(BRIGHTNESS, raw_lut=tone_lut_i32(exposure=1.0, contrast=25))
    assert p.curves[BRIGHTNESS].raw_lut is not None
    lut = p.curves[BRIGHTNESS].lut(BRIGHTNESS)
    assert lut.shape == (65536,)
    assert lut.max() <= 65535


# -- lens profiles -----------------------------------------------------------

def test_devignette_inverts_falloff(rng):
    h, w = 64, 96
    flat = np.full((3, h, w), 0.5, dtype=np.float32)
    k = (-0.3, -0.1, 0.0)
    # Simulate vignetting: multiply by gain.
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = (w - 1) / 2, (h - 1) / 2
    hd = np.hypot(cx, cy)
    r2 = (((xs - cx) / hd) ** 2 + ((ys - cy) / hd) ** 2).astype(np.float32)
    gain = 1 + k[0] * r2 + k[1] * r2**2
    vignetted = flat * gain[None]
    out = np.asarray(
        lenscorr.devignette(jnp.asarray(vignetted), jnp.asarray(k, dtype=jnp.float32))
    )
    np.testing.assert_allclose(out, flat, atol=1e-4)


def test_distortion_correction_matches_analytic_remap():
    """On a linear ramp, bilinear resampling is exact, so the corrected
    image must equal the ramp evaluated at the analytically remapped
    coordinates r_src = r (1 - k1 + k1 r^2)."""
    h, w = 64, 64
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    ramp = (0.3 + 0.4 * xs / w + 0.2 * ys / h).astype(np.float32)
    img = jnp.asarray(np.stack([ramp] * 3))

    ident = np.asarray(lenscorr.correct_distortion(img, jnp.asarray([0.0]), "poly3"))
    np.testing.assert_allclose(ident, np.asarray(img), atol=1e-4)

    k1 = 0.15
    out = np.asarray(lenscorr.correct_distortion(img, jnp.asarray([k1]), "poly3"))
    cx, cy = (w - 1) / 2, (h - 1) / 2
    hd = np.hypot(cx, cy)
    dx, dy = (xs - cx) / hd, (ys - cy) / hd
    r2 = dx * dx + dy * dy
    scale = 1 - k1 + k1 * r2
    sx = np.clip(dx * scale * hd + cx, 0, w - 1)
    sy = np.clip(dy * scale * hd + cy, 0, h - 1)
    expected = 0.3 + 0.4 * sx / w + 0.2 * sy / h
    np.testing.assert_allclose(out[0], expected, atol=2e-3)


def test_ptlens_identity():
    img = jnp.asarray(np.random.default_rng(0).random((3, 32, 32), dtype=np.float32))
    out = np.asarray(
        lenscorr.correct_distortion(img, jnp.asarray([0.0, 0.0, 0.0]), "ptlens")
    )
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-5)


def test_tca_identity_and_shift():
    img = jnp.asarray(np.random.default_rng(1).random((3, 32, 48), dtype=np.float32))
    # scale==1 resampling is exact up to one-ulp coordinate rounding times
    # the neighbor contrast of random noise.
    ident = np.asarray(lenscorr.correct_tca(img, jnp.float32(1.0), jnp.float32(1.0)))
    np.testing.assert_allclose(ident, np.asarray(img), atol=1e-4)
    shifted = np.asarray(lenscorr.correct_tca(img, jnp.float32(1.01), jnp.float32(1.0)))
    assert not np.allclose(shifted[0], np.asarray(img)[0], atol=1e-3)
    np.testing.assert_allclose(shifted[1], np.asarray(img)[1], atol=1e-6)


def test_profile_json_roundtrip():
    p = lenscorr.LensProfile(
        name="Test 35mm", vignetting=(-0.3, -0.1, 0.0),
        distortion_model="ptlens", distortion=(0.01, -0.02, 0.0),
        tca=(1.0005, 0.9995),
    )
    q = lenscorr.LensProfile.from_json(p.to_json())
    assert q == p


def test_editor_lens_profile(rng):
    # Uniform mid-gray so the corner/center gain comparison is meaningful.
    img = np.full((40, 64, 3), 0.4, dtype=np.float32)
    ed = PhotoEditor.from_rgb_f32(img,
                                  use_pallas=False, mid_long_edge=32, low_long_edge=16)
    base = np.asarray(ed.apply(FULL))
    ed.apply_lens_profile(lenscorr.LensProfile(vignetting=(-0.4, 0.0, 0.0)))
    out = np.asarray(ed.apply(FULL))
    assert not np.allclose(base, out)
    # Devignetting brightens corners relative to center.
    corner_gain = out[:, :4, :4].mean() / max(base[:, :4, :4].mean(), 1e-6)
    center_gain = out[:, 18:22, 30:34].mean() / max(base[:, 18:22, 30:34].mean(), 1e-6)
    assert corner_gain > center_gain


# -- masking tools -----------------------------------------------------------

def test_similarity_mask_selects_same_color_region():
    h, w = 48, 64
    img = np.full((3, h, w), 0.2, dtype=np.float32)
    img[:, :24, :] = np.array([0.8, 0.2, 0.1])[:, None, None]  # distinct top
    logits = np.asarray(
        masking.similarity_mask(
            jnp.asarray(img), jnp.asarray([5, 10]), jnp.float32(0.1),
            jnp.float32(1.0), spatial_falloff=False,
        )
    )
    assert (logits[:24] > 0).mean() > 0.99
    assert (logits[26:] < 0).mean() > 0.99


def test_similarity_mask_spatial_falloff():
    img = np.full((3, 64, 64), 0.5, dtype=np.float32)  # uniform color
    logits = np.asarray(
        masking.similarity_mask(
            jnp.asarray(img), jnp.asarray([8, 8]), jnp.float32(0.1),
            jnp.float32(6.0), spatial_falloff=True,
        )
    )
    assert logits[8, 8] > 0
    assert logits[60, 60] < 0  # far away excluded despite same color


def test_editor_similarity_mask_flow(rng):
    h, w = 40, 64
    img = np.full((h, w, 3), 0.2, dtype=np.float32)
    img[:20] = [0.7, 0.3, 0.1]
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=False, mid_long_edge=32, low_long_edge=16)
    ed.add_similarity_mask("region", (10, 5), color_tolerance=0.1)
    assert "region" in ed.mask_names()
    ed.set_tone(exposure=2.0, mask_name="region")
    out = np.asarray(ed.apply(FULL))
    base = PhotoEditor.from_rgb_f32(img, use_pallas=False, mid_long_edge=32, low_long_edge=16)
    ref = np.asarray(base.apply(FULL))
    assert out[:, :18].mean() > ref[:, :18].mean() + 0.05
    np.testing.assert_allclose(out[:, 22:], ref[:, 22:], atol=1e-6)


def test_similarity_mask_prompts_rendered_image():
    """Point prompts must select by the *rendered* color, not the
    undeveloped base (v1 re-applies edits before predicting,
    raw_photo_forge.py:2409-2411). A strong vignette darkens corners only
    in the render — the base (and geometry stage) stays uniform — so a
    tight-tolerance prompt at the center must exclude the corners."""
    h, w = 48, 48
    img = np.full((h, w, 3), 0.5, dtype=np.float32)
    ed = PhotoEditor.from_rgb_f32(
        img, use_pallas=False, mid_long_edge=32, low_long_edge=16)
    ed.set_vignette(-100)
    ed.add_similarity_mask("m", (w // 2, h // 2), color_tolerance=0.05)
    mask = np.asarray(ed._find("m").data_full)
    assert mask[h // 2, w // 2] == 1.0
    assert mask[0, 0] == 0.0 and mask[-1, -1] == 0.0
    # Sanity: without the edit the uniform image selects everywhere.
    ed2 = PhotoEditor.from_rgb_f32(
        img, use_pallas=False, mid_long_edge=32, low_long_edge=16)
    ed2.add_similarity_mask("m", (w // 2, h // 2), color_tolerance=0.05)
    assert np.asarray(ed2._find("m").data_full).mean() > 0.99


def test_smart_mask_prompts_rendered_image():
    """Same contract for the geodesic smart select: the flood runs over
    the rendered image, so a rendered-only boundary (vignette ring)
    stops it before the corners."""
    h, w = 48, 48
    img = np.full((h, w, 3), 0.5, dtype=np.float32)
    ed = PhotoEditor.from_rgb_f32(
        img, use_pallas=False, mid_long_edge=32, low_long_edge=16)
    ed.set_vignette(-100)
    ed.add_smart_mask("m", (w // 2, h // 2), tolerance=0.08)
    mask = np.asarray(ed._find("m").data_full)
    assert mask[h // 2, w // 2] == 1.0
    assert mask[0, 0] == 0.0 and mask[-1, -1] == 0.0


def test_mask_logits_stay_on_host():
    """Full-res pre-threshold logits are host np arrays (re-binarize
    support must not pin ~180 MB/mask of device memory at 45MP)."""
    h, w = 24, 32
    ed = PhotoEditor.from_rgb_f32(
        np.full((h, w, 3), 0.4, dtype=np.float32), use_pallas=False,
        mid_long_edge=32, low_long_edge=16)
    ed.add_mask("m", np.linspace(-1, 1, h * w, dtype=np.float32).reshape(h, w))
    assert isinstance(ed._find("m").logits, np.ndarray)
    before = float(np.asarray(ed._find("m").data_full).mean())
    ed.set_mask_range(0.9)
    after = float(np.asarray(ed._find("m").data_full).mean())
    assert after < before  # re-threshold from host logits still works


def test_feather_and_luminance_masks(rng):
    m = jnp.zeros((32, 32), dtype=jnp.float32).at[8:24, 8:24].set(1.0)
    f = np.asarray(masking.feather_mask(m, radius=3))
    assert 0 < f[7, 15] < 1  # softened edge
    img = jnp.asarray(random_linear_image(rng, 16, 16).transpose(2, 0, 1))
    lm = np.asarray(masking.luminance_range_mask(img, 0.2, 0.6))
    assert lm.shape == (16, 16)
    assert lm.min() >= -1 and lm.max() <= 1


def test_mask_overlay(rng):
    srgb = jnp.asarray(random_linear_image(rng, 16, 16).transpose(2, 0, 1))
    mask = jnp.ones((16, 16), dtype=jnp.float32)
    out = np.asarray(masking.mask_overlay(srgb, mask, tint=(1, 0, 0), alpha=1.0))
    np.testing.assert_allclose(out[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)


def test_settings_device_index_selects_device():
    """Settings.device_index is consumed: it selects the default jax
    device (the reference's adapter picker, settings_window.gd:46-49)."""
    import jax
    from rawphotoforge_tpu.engine.session import Settings

    try:
        dev = Settings(device_index=3).select_device()
        assert dev is jax.devices()[3]
        x = jax.numpy.zeros(4) + 1
        assert x.devices() == {jax.devices()[3]}
        assert Settings(device_index=99).select_device() is None
    finally:
        jax.config.update("jax_default_device", None)


def test_settings_path_not_in_site_packages(tmp_path, monkeypatch):
    """Installed packages must not default settings into the Python lib
    dir (read-only / shared); source checkouts keep the repo-root file
    (review regression)."""
    from rawphotoforge_tpu.engine import session

    monkeypatch.delenv("RPF_SETTINGS", raising=False)
    # Source checkout: pyproject.toml three levels up -> repo root.
    p = session.default_settings_path()
    assert p.endswith(".settings.json")
    # Simulated installed layout: no pyproject -> per-user config dir.
    fake_pkg = tmp_path / "site-packages" / "rawphotoforge_tpu" / "engine"
    fake_pkg.mkdir(parents=True)
    monkeypatch.setattr(session, "__file__",
                        str(fake_pkg / "session.py"))
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    p = session.default_settings_path()
    assert str(tmp_path / "cfg") in p
    assert "site-packages" not in p
    # save() creates the config dir on first use.
    s = session.Settings()
    s.save(p)
    assert session.Settings.load(p).ui_preview_size == s.ui_preview_size


def test_settings_env_override(tmp_path, monkeypatch):
    from rawphotoforge_tpu.engine import session

    monkeypatch.setenv("RPF_SETTINGS", str(tmp_path / "x.json"))
    assert session.default_settings_path() == str(tmp_path / "x.json")


def test_gaussian_blur_thin_image_no_crash():
    """Blur radius >= image dim degrades to edge padding instead of the
    reflect-mode trace error (review regression)."""
    import jax.numpy as jnp

    from rawphotoforge_tpu.ops.sharpen import gaussian_blur

    thin = jnp.ones((3, 2, 40), jnp.float32) * 0.25
    out = np.asarray(gaussian_blur(thin, sigma=2.0, radius=4))
    np.testing.assert_allclose(out, 0.25, atol=1e-6)
