"""engine/hostdev.py: the pure-numpy main-mask develop mirror that renders
live edits during the instant era of an async open.

Contract under test: develop_np must track the device anchor pipeline
(geometry warp -> unsharp -> develop_post_geo) within fuzz-grade f32
tolerances across the full parameter space — it is a stand-in, but one
carrying the same formula sequences and the exact 65536-LUT gathers.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rawphotoforge_tpu.core.params import (
    BRIGHTNESS, HUE, SATURATION, LIGHTNESS, EditParameters, pack_params,
)
from rawphotoforge_tpu.engine import hostdev
from rawphotoforge_tpu.ops import develop as dev
from rawphotoforge_tpu.ops.sharpen import unsharp_mask

from test_fuzz import _random_params, assert_fuzz_close


def _anchor_full(img_planes: np.ndarray, p: EditParameters) -> np.ndarray:
    """The device pipeline exactly as PhotoEditor.apply runs it for a
    single-mask session: warp -> unsharp -> develop_post_geo."""
    packed = pack_params([p])
    geo = dev.geometry_stage_jit(jnp.asarray(img_planes), packed.distortion)
    geo = unsharp_mask(geo, jnp.float32(p.sharpness / 100.0 * 2.0))
    masks = jnp.ones((1,) + img_planes.shape[1:], dtype=jnp.float32)
    return np.asarray(dev.develop_post_geo_jit(geo, packed, masks))


@pytest.mark.parametrize("seed", range(5))
def test_develop_np_matches_anchor_fuzz(seed):
    r = np.random.default_rng(7000 + seed)
    img = (r.random((3, 40, 56), dtype=np.float32) ** 1.8).astype(np.float32)
    p = _random_params(r, allow_geometry=True)
    p.set_sharpness(int(r.integers(0, 101)))
    got = hostdev.develop_np(img, p)
    want = _anchor_full(img, p)
    assert_fuzz_close(got.transpose(1, 2, 0), want.transpose(1, 2, 0))


@pytest.mark.parametrize("seed", range(3))
def test_develop_np_multimask_matches_anchor(seed):
    """Per-mask develop (the era's regional masks): develop_np with M
    masks must track the anchor's per-mask where-select chains."""
    import jax.numpy as jnp

    r = np.random.default_rng(7700 + seed)
    img = (r.random((3, 36, 48), dtype=np.float32) ** 1.8).astype(np.float32)
    n = int(r.integers(2, 4))
    plist = [_random_params(r, allow_geometry=(k == 0)) for k in range(n)]
    for p in plist:
        p.set_sharpness(0)
    plist[0].set_lens_distortion(0)
    masks = np.zeros((n, 36, 48), dtype=np.float32)
    masks[0] = 1.0
    for k in range(1, n):
        masks[k] = (r.random((36, 48)) > 0.5).astype(np.float32)

    got = hostdev.develop_np(img, plist, masks)
    packed = pack_params(plist)
    want = np.asarray(dev.develop_post_geo_jit(
        jnp.asarray(img), packed, jnp.asarray(masks)))
    assert_fuzz_close(got.transpose(1, 2, 0), want.transpose(1, 2, 0))


@pytest.mark.parametrize("native", [False, True])
def test_similarity_logits_np_matches_device(native):
    from rawphotoforge_tpu import native as native_mod
    from rawphotoforge_tpu.ops.masking import similarity_mask
    import jax.numpy as jnp

    if native and not native_mod.available():
        pytest.skip("native library unavailable")
    r = np.random.default_rng(81)
    img = (0.1 + 0.8 * r.random((3, 30, 42), dtype=np.float32)).astype(
        np.float32)
    for sigma in (0.0, 6.0):
        got = hostdev.similarity_logits_np(img, (11, 23), 0.15, sigma,
                                           native=native)
        want = np.asarray(similarity_mask(
            jnp.asarray(img), jnp.asarray([11, 23], dtype=jnp.int32),
            jnp.float32(0.15), jnp.float32(sigma if sigma > 0 else 1.0),
            spatial_falloff=sigma > 0))
        np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.parametrize("native", [False, True])
def test_smart_logits_np_matches_device(native):
    """The era's host geodesic flood vs ops.masking.smart_select_mask:
    same Toivanen sweeps, same costs — bit-close (both the numpy mirror
    and the native C++ sweeps)."""
    from rawphotoforge_tpu import native as native_mod
    from rawphotoforge_tpu.ops.masking import smart_select_mask
    import jax.numpy as jnp

    if native and not native_mod.available():
        pytest.skip("native library unavailable")
    r = np.random.default_rng(87)
    # Two regions split by a hard edge + noise: connectivity matters.
    img = np.full((3, 28, 40), 0.2, dtype=np.float32)
    img[:, :, 20:] = 0.7
    img += (r.random((3, 28, 40), dtype=np.float32) - 0.5) * 0.01
    img = np.clip(img, 0.0, 1.0)
    got = hostdev.smart_logits_np(img, (14, 8), 1.0, 12.0, native=native)
    want = np.asarray(smart_select_mask(jnp.asarray(img), (14, 8),
                                        tolerance=1.0, edge_weight=12.0))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # And it actually respects the edge: left floods, right does not.
    assert (got[:, :20] >= 0).all() and (got[:, 20:] < 0).all()


@pytest.mark.parametrize("seed", range(3))
def test_selection_native_matches_numpy_fuzz(seed):
    """Native selection mirrors vs the numpy oracles on random images and
    prompt points: cbrt ulp noise + the separable spatial exp only."""
    from rawphotoforge_tpu import native as native_mod

    if not native_mod.available():
        pytest.skip("native library unavailable")
    r = np.random.default_rng(8100 + seed)
    h, w = int(r.integers(8, 70)), int(r.integers(8, 70))
    img = r.random((3, h, w), dtype=np.float32)
    pt = (int(r.integers(0, h)), int(r.integers(0, w)))
    tol = float(r.uniform(0.02, 1.0))
    sig = float(r.choice([0.0, 2.0, 9.0]))
    a = hostdev.similarity_logits_np(img, pt, tol, sig, native=True)
    b = hostdev.similarity_logits_np(img, pt, tol, sig, native=False)
    np.testing.assert_allclose(a, b, atol=2e-4)
    ew = float(r.uniform(1.0, 20.0))
    a = hostdev.smart_logits_np(img, pt, tol, ew, native=True)
    b = hostdev.smart_logits_np(img, pt, tol, ew, native=False)
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_develop_np_default_params_near_identity_encode():
    """All-default params: develop_np must reduce to the sRGB encode (it
    skips the default-curve staircase/OKLCH round trip, <= ~2e-3 — the
    same shortcut the identity_oklch kernel variant takes)."""
    r = np.random.default_rng(71)
    img = (r.random((3, 24, 32), dtype=np.float32) ** 1.8).astype(np.float32)
    p = EditParameters()
    got = hostdev.develop_np(img, p)
    want = _anchor_full(img, p)
    assert np.abs(got - want).max() < 2.5e-3


def test_develop_np_sliders_only():
    """Slider edits with default curves — the common era frame."""
    r = np.random.default_rng(72)
    img = (r.random((3, 32, 44), dtype=np.float32) ** 1.8).astype(np.float32)
    p = EditParameters()
    p.set_tone(exposure=0.8, contrast=30, shadow=-20, highlight=10,
               black=8, white=-5)
    p.set_whitebalance(25, -10)
    p.set_vignette(40)
    got = hostdev.develop_np(img, p)
    want = _anchor_full(img, p)
    assert np.abs(got - want).max() < 2.5e-3


def test_warp_np_matches_geometry_stage():
    r = np.random.default_rng(73)
    img = r.random((3, 48, 64), dtype=np.float32)
    for d in (-80, -15, 40, 100):
        got = hostdev.warp_np(img, float(d))
        want = np.asarray(dev.geometry_stage_jit(
            jnp.asarray(img), jnp.float32(d)))
        # Bilinear weights amplify ulp-level coordinate differences; the
        # images are O(1) so 1e-4 is still a tight gate.
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_warp_np_zero_is_identity():
    r = np.random.default_rng(74)
    img = r.random((3, 20, 30), dtype=np.float32)
    assert hostdev.warp_np(img, 0.0) is img


def test_unsharp_np_matches_device():
    r = np.random.default_rng(75)
    img = r.random((3, 40, 52), dtype=np.float32)
    for s in (10, 55, 100):
        amount = s / 100.0 * 2.0
        got = hostdev.unsharp_np(img, amount)
        want = np.asarray(unsharp_mask(jnp.asarray(img), jnp.float32(amount)))
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_brightness_channel_selector():
    """v1 channel arg: a strong curve on channel 0 must move R only."""
    r = np.random.default_rng(76)
    img = (r.random((3, 24, 32), dtype=np.float32) * 0.8).astype(np.float32)
    p = EditParameters()
    p.set_curve(BRIGHTNESS, [0, 30000, 65535], [0, 52000, 65535], channel=0)
    got = hostdev.develop_np(img, p)
    want = _anchor_full(img, p)
    assert_fuzz_close(got.transpose(1, 2, 0), want.transpose(1, 2, 0))
    base = hostdev.develop_np(img, EditParameters())
    assert np.abs(got[0] - base[0]).max() > 0.05      # R moved
    assert np.abs(got[1:] - base[1:]).max() < 2.5e-3  # G/B untouched


def test_oklch_curves_apply():
    r = np.random.default_rng(77)
    img = (0.2 + 0.6 * r.random((3, 24, 32), dtype=np.float32)).astype(
        np.float32)
    p = EditParameters()
    p.set_curve(HUE, [0, 20000, 65535], [8000, 30000, 60000])
    p.set_curve(SATURATION, [0, 65535], [45000, 45000])
    p.set_curve(LIGHTNESS, [0, 65535], [28000, 28000])
    got = hostdev.develop_np(img, p)
    want = _anchor_full(img, p)
    assert_fuzz_close(got.transpose(1, 2, 0), want.transpose(1, 2, 0))


def test_render_u8_hwc_truncates():
    img = np.full((3, 4, 6), 0.5, dtype=np.float32)
    out = hostdev.render_u8_hwc(img, EditParameters())
    assert out.shape == (4, 6, 3) and out.dtype == np.uint8
    # 0.5 linear -> sRGB ~0.7354 -> *255 = 187.52 -> truncating store 187.
    assert int(out[0, 0, 0]) == 187


# --- the fused native develop (rpf_hostdev_develop) vs the numpy mirror ---

from rawphotoforge_tpu import native as _native  # noqa: E402

_NATIVE_MISSING = not _native.available()


def _assert_u8_close(got: np.ndarray, want: np.ndarray, wrap_rate=1e-3):
    """u8 comparison for the native-vs-numpy pair: the polynomial
    transcendentals (ktrig family) sit ~1e-7 from numpy's libm, so almost
    every pixel agrees exactly or by one truncation step; steep random
    curves turn rare ulp-straddled LUT indices into one staircase step,
    and a hue-wrap-straddled pixel (H ~ 1.0 with a wrap-discontinuous
    hue curve) can land anywhere — both sides are valid reads of a
    circular quantity, so bound the *rate*, not the max."""
    d = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert np.median(d) == 0
    assert (d > 0).mean() < 0.05, f"flip rate {(d > 0).mean():.2e}"
    assert (d > 16).mean() < wrap_rate, f"big-diff rate {(d > 16).mean():.2e}"


@pytest.mark.skipif(_NATIVE_MISSING, reason="native library unavailable")
@pytest.mark.parametrize("seed", range(6))
def test_render_u8_native_matches_numpy_fuzz(seed):
    r = np.random.default_rng(7900 + seed)
    img = (r.random((3, 40, 56), dtype=np.float32) ** 1.8).astype(np.float32)
    n = int(r.integers(1, 4))
    plist = [_random_params(r, allow_geometry=(k == 0)) for k in range(n)]
    plist[0].set_sharpness(int(r.integers(0, 101)))
    masks = None
    if n > 1:
        masks = np.zeros((n, 40, 56), dtype=np.float32)
        masks[0] = 1.0
        for k in range(1, n):
            masks[k] = (r.random((40, 56)) > 0.5).astype(np.float32)
    got = hostdev.render_u8_hwc(img, plist, masks, native=True)
    want = hostdev.render_u8_hwc(img, plist, masks, native=False)
    _assert_u8_close(got, want)


@pytest.mark.skipif(_NATIVE_MISSING, reason="native library unavailable")
def test_render_u8_native_edge_params():
    """The uniform-branch corners the SIMD kernel hoists as blends:
    contrast -100 (multiplier exactly 0 — must still apply), black/white
    at 0 (unconditional +0.0 lift must be identity), a default-curve
    brightness LUT forced active by the v1 channel selector, and
    vignette at both rails."""
    r = np.random.default_rng(7950)
    img = (r.random((3, 32, 40), dtype=np.float32) * 1.4).astype(np.float32)
    img[:, 0, 0] = 0.0
    img[:, 0, 1] = 1.0
    for build in (
        lambda p: p.set_tone(contrast=-100),
        lambda p: p.set_tone(exposure=6.0, black=0, white=0),
        lambda p: p.set_curve(BRIGHTNESS, [0, 65535], [0, 65535], channel=2),
        lambda p: p.set_vignette(-100),
        lambda p: p.set_vignette(100),
    ):
        p = EditParameters()
        build(p)
        got = hostdev.render_u8_hwc(img, p, native=True)
        want = hostdev.render_u8_hwc(img, p, native=False)
        d = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert d.max() <= 1, f"max {d.max()} for {build}"


@pytest.mark.skipif(_NATIVE_MISSING, reason="native library unavailable")
def test_render_u8_native_default_exact():
    """Default params reduce both paths to the sRGB encode; away from
    truncation boundaries they must agree exactly."""
    img = np.full((3, 6, 8), 0.5, dtype=np.float32)
    got = hostdev.render_u8_hwc(img, EditParameters(), native=True)
    assert int(got[0, 0, 0]) == 187
    want = hostdev.render_u8_hwc(img, EditParameters(), native=False)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(_NATIVE_MISSING, reason="native library unavailable")
@pytest.mark.parametrize("distortion", [-80, -15, 40, 100])
def test_native_warp_bit_identical(distortion):
    """rpf_warp_f32 is pure IEEE f32 arithmetic in warp_np's exact
    operation order — outputs must be bit-equal, not just close."""
    r = np.random.default_rng(7960)
    img = r.random((3, 37, 53), dtype=np.float32)
    got = _native.warp_f32(img, np.float32(-0.5 * (distortion / 100.0)))
    want = hostdev.warp_np(img, float(distortion))
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(_NATIVE_MISSING, reason="native library unavailable")
@pytest.mark.parametrize("amount", [0.2, 1.1, 2.0])
def test_native_unsharp_bit_identical(amount):
    from rawphotoforge_tpu.ops.sharpen import _gauss_taps

    r = np.random.default_rng(7970)
    img = r.random((3, 29, 41), dtype=np.float32)
    got = _native.unsharp_f32(img, _gauss_taps(1.0, 2), amount)
    want = hostdev.unsharp_np(img, amount)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(_NATIVE_MISSING, reason="native library unavailable")
def test_native_unsharp_tiny_image_edge_mode():
    """Axes shorter than the tap radius switch numpy's pad to edge-clamp;
    the native mirror must follow."""
    from rawphotoforge_tpu.ops.sharpen import _gauss_taps

    r = np.random.default_rng(7971)
    img = r.random((3, 2, 2), dtype=np.float32)
    got = _native.unsharp_f32(img, _gauss_taps(1.0, 2), 1.0)
    want = hostdev.unsharp_np(img, 1.0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(_NATIVE_MISSING, reason="native library unavailable")
def test_render_u8_native_geometry_sliders():
    """The full native era frame with distortion + sharpness active:
    geometry is bit-identical, so the u8 gate stays the pointwise one."""
    r = np.random.default_rng(7980)
    img = (r.random((3, 40, 56), dtype=np.float32) ** 1.8).astype(np.float32)
    p = EditParameters()
    p.set_tone(exposure=0.5, contrast=20)
    p.set_lens_distortion(35)
    p.set_sharpness(60)
    got = hostdev.render_u8_hwc(img, p, native=True)
    want = hostdev.render_u8_hwc(img, p, native=False)
    d = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert d.max() <= 1


@pytest.mark.skipif(_NATIVE_MISSING, reason="native library unavailable")
def test_native_degenerate_shapes():
    """1-pixel-thin planes through every native era routine: the chunk
    and sweep loops must handle h==1 / w==1 without reading out of
    bounds (numpy equivalence is the oracle as usual)."""
    r = np.random.default_rng(8200)
    p = EditParameters()
    p.set_tone(exposure=0.4, contrast=15)
    p.set_vignette(25)
    p.set_curve(HUE, [0, 65535], [5000, 60000])
    for shape in [(3, 1, 37), (3, 37, 1), (3, 1, 1), (3, 2, 300)]:
        img = r.random(shape, dtype=np.float32)
        got = hostdev.render_u8_hwc(img, p, native=True)
        want = hostdev.render_u8_hwc(img, p, native=False)
        d = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert d.max() <= 1, f"shape {shape}: max {d.max()}"
        pt = (0, 0)
        a = hostdev.smart_logits_np(img, pt, 0.3, 8.0, native=True)
        b = hostdev.smart_logits_np(img, pt, 0.3, 8.0, native=False)
        np.testing.assert_allclose(a, b, atol=2e-4)
        a = hostdev.similarity_logits_np(img, pt, 0.2, 3.0, native=True)
        b = hostdev.similarity_logits_np(img, pt, 0.2, 3.0, native=False)
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_render_u8_native_false_forces_numpy():
    """native=False must not touch the native library (the numpy mirror
    stays the testable semantics oracle)."""
    img = np.full((3, 4, 4), 0.25, dtype=np.float32)
    out = hostdev.render_u8_hwc(img, EditParameters(), native=False)
    assert out.shape == (4, 4, 3)
