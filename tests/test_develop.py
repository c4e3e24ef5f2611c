"""Develop-stack tests: jnp anchor path vs the independent numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from rawphotoforge_tpu.core.params import EditParameters, pack_params, BRIGHTNESS, HUE, SATURATION, LIGHTNESS
from rawphotoforge_tpu.ops import develop as dev

import oracle
from conftest import random_linear_image


def assert_close(ours, ref, tight=1e-4, loose=5e-3, frac=2e-3):
    """Robust image comparison: ulp-level f32 differences between XLA and
    numpy transcendentals can flip a LUT index at a step boundary (moving
    isolated pixels by one LUT step, amplified by the sRGB OETF slope), and
    a lens-distortion source coordinate landing exactly on the image border
    can flip in/out of bounds. Require: almost all pixels within ``tight``;
    no pixel beyond ``loose`` — except a tiny count of border-flip pixels,
    identified as exactly-black on exactly one side (wgsl:137-139)."""
    ours = np.asarray(ours, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    black_flip = (ours == 0.0).all(axis=-1) ^ (ref == 0.0).all(axis=-1)
    assert black_flip.mean() < 1e-3, (
        f"{black_flip.sum()} pixels disagree on out-of-bounds blackness"
    )
    diff = np.abs(ours - ref)[~black_flip]
    assert np.mean(diff > tight) <= frac, (
        f"{100 * np.mean(diff > tight):.3f}% of pixels deviate > {tight}"
    )
    assert diff.max() <= loose, f"max deviation {diff.max():.3e} > {loose}"


def _oracle_params(p: EditParameters) -> dict:
    return {
        "wb_temperature": p.wb_temperature,
        "wb_tint": p.wb_tint,
        "exposure": p.exposure,
        "contrast": p.contrast,
        "shadow": p.shadow,
        "highlight": p.highlight,
        "black": p.black,
        "white": p.white,
        "vignette": p.vignette,
        "lens_distortion": p.lens_distortion,
        "luts": [np.asarray(p.curves[s].lut(s), dtype=np.int64) for s in range(4)],
        "brightness_channel": p.brightness_channel,
    }


def _run_both(img_hwc, param_list, masks):
    packed = pack_params(param_list)
    planes = jnp.asarray(img_hwc.transpose(2, 0, 1))
    ours = np.asarray(dev.develop_jit(planes, packed, jnp.asarray(masks)))
    ours_hwc = ours.transpose(1, 2, 0)
    ref = oracle.develop(img_hwc, [_oracle_params(p) for p in param_list], masks)
    return ours_hwc, ref


def _full_mask(h, w):
    return np.ones((1, h, w), dtype=np.float32)


def test_default_params_is_near_identity(rng):
    """Defaults still quantize via the identity LUT and apply the
    32767/32767.5 sat/light gain — output equals oracle exactly and input
    within ~2 LUT steps after encode."""
    img = random_linear_image(rng)
    ours, ref = _run_both(img, [EditParameters()], _full_mask(*img.shape[:2]))
    assert_close(ours, ref)
    srgb_in = np.clip(oracle.linear_to_srgb(np.clip(img, 0, 1)), 0, 1)
    assert np.abs(ours - srgb_in).max() < 2e-3


@pytest.mark.parametrize(
    "edit",
    [
        dict(exposure=1.5),
        dict(exposure=-2.0),
        dict(contrast=55),
        dict(shadow=70, highlight=-40),
        dict(black=30, white=-25),
        dict(exposure=0.7, contrast=-30, shadow=20, highlight=15, black=-10, white=5),
    ],
)
def test_tone_edits_match_oracle(rng, edit):
    img = random_linear_image(rng)
    p = EditParameters()
    p.set_tone(**edit)
    ours, ref = _run_both(img, [p], _full_mask(*img.shape[:2]))
    assert_close(ours, ref)


def test_whitebalance_matches_oracle(rng):
    img = random_linear_image(rng)
    p = EditParameters()
    p.set_whitebalance(temperature=60, tint=-45)
    ours, ref = _run_both(img, [p], _full_mask(*img.shape[:2]))
    assert_close(ours, ref)


def test_vignette_matches_oracle(rng):
    img = random_linear_image(rng, h=80, w=120)
    p = EditParameters()
    p.set_vignette(65)
    ours, ref = _run_both(img, [p], _full_mask(*img.shape[:2]))
    assert_close(ours, ref)
    p.set_vignette(-80)
    ours, ref = _run_both(img, [p], _full_mask(*img.shape[:2]))
    assert_close(ours, ref)


def test_lens_distortion_matches_oracle(rng):
    img = random_linear_image(rng, h=60, w=90)
    for d in (40, -70):
        p = EditParameters()
        p.set_lens_distortion(d)
        ours, ref = _run_both(img, [p], _full_mask(*img.shape[:2]))
        assert_close(ours, ref)


def test_brightness_curve_matches_oracle(rng):
    img = random_linear_image(rng)
    p = EditParameters()
    p.set_curve(BRIGHTNESS, [0, 20000, 45000, 65535], [0, 30000, 40000, 65535])
    ours, ref = _run_both(img, [p], _full_mask(*img.shape[:2]))
    assert_close(ours, ref)


def test_oklch_curves_match_oracle(rng):
    img = random_linear_image(rng)
    p = EditParameters()
    p.set_curve(HUE, [0, 30000, 65535], [10000, 40000, 60000])
    p.set_curve(SATURATION, [0, 65535], [45000, 20000])
    p.set_curve(LIGHTNESS, [0, 32000, 65535], [30000, 36000, 30000])
    ours, ref = _run_both(img, [p], _full_mask(*img.shape[:2]))
    assert_close(ours, ref)


def test_multi_mask_sequential_semantics(rng):
    """Two regional masks on top of main; overlapping region gets both edits
    applied in order (wgsl:279-308 loops are sequential)."""
    img = random_linear_image(rng, h=48, w=64)
    h, w = img.shape[:2]
    main = EditParameters()
    main.set_tone(exposure=0.5)
    m1 = EditParameters()
    m1.set_tone(contrast=40)
    m1.set_curve(SATURATION, [0, 65535], [50000, 50000])
    m2 = EditParameters()
    m2.set_whitebalance(temperature=-50)
    masks = np.zeros((3, h, w), dtype=np.float32)
    masks[0] = 1.0
    masks[1, : h // 2] = 1.0
    masks[2, :, : w // 2] = 1.0
    ours, ref = _run_both(img, [main, m1, m2], masks)
    assert_close(ours, ref)


def test_everything_at_once(rng):
    img = random_linear_image(rng, h=72, w=56)
    h, w = img.shape[:2]
    main = EditParameters()
    main.set_tone(exposure=0.8, contrast=25, shadow=30, highlight=-20, black=5, white=-5)
    main.set_whitebalance(temperature=30, tint=10)
    main.set_vignette(40)
    main.set_lens_distortion(-35)
    main.set_curve(BRIGHTNESS, [0, 32768, 65535], [5000, 30000, 65535])
    main.set_curve(HUE, [0, 65535], [5000, 60000])
    main.set_curve(SATURATION, [0, 40000, 65535], [35000, 30000, 35000])
    main.set_curve(LIGHTNESS, [0, 65535], [34000, 34000])
    reg = EditParameters()
    reg.set_tone(exposure=-0.5, black=20)
    masks = np.zeros((2, h, w), dtype=np.float32)
    masks[0] = 1.0
    masks[1, 10:40, 5:30] = 1.0
    ours, ref = _run_both(img, [main, reg], masks)
    assert_close(ours, ref)


def test_output_range_and_dtype(rng):
    img = random_linear_image(rng)
    p = EditParameters()
    p.set_tone(exposure=4.0, white=80)
    packed = pack_params([p])
    out = dev.develop_jit(
        jnp.asarray(img.transpose(2, 0, 1)), packed, jnp.asarray(_full_mask(*img.shape[:2]))
    )
    out = np.asarray(out)
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_encode_u8_truncates():
    planes = jnp.asarray(np.array([[[0.0, 0.999, 1.0, 0.5, 2.0, -1.0]]] * 3, dtype=np.float32))
    u8 = np.asarray(dev.encode_u8(planes))
    np.testing.assert_array_equal(u8[0, 0], [0, 254, 255, 127, 255, 0])


def test_batch_develop_matches_single(rng):
    imgs = np.stack([random_linear_image(rng, 32, 40) for _ in range(3)])
    p = EditParameters()
    p.set_tone(exposure=1.0, contrast=20)
    packed = pack_params([p])
    masks = jnp.asarray(_full_mask(32, 40))
    batch = dev.develop_batch(jnp.asarray(imgs.transpose(0, 3, 1, 2)), packed, masks)
    for i in range(3):
        single = dev.develop_jit(jnp.asarray(imgs[i].transpose(2, 0, 1)), packed, masks)
        np.testing.assert_allclose(np.asarray(batch[i]), np.asarray(single), atol=1e-6)


def test_pack_params_skip_luts(rng):
    """build_luts=False packs placeholder LUTs; the kernel path output is
    unchanged (it evaluates curves from packed coefficients)."""
    import jax.numpy as jnp
    from rawphotoforge_tpu.kernels import fused

    img = random_linear_image(rng, 32, 128)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    masks = jnp.ones((1, 32, 128), dtype=jnp.float32)
    p = EditParameters()
    p.set_tone(exposure=0.8, contrast=20)
    p.set_curve(BRIGHTNESS, [0, 30000, 65535], [2000, 35000, 65535])
    full = pack_params([p])
    lean = pack_params([p], build_luts=False)
    assert lean.luts.shape == (1, 4, 1)
    a = np.asarray(fused.develop_post_geo_fused(planes, full, masks))
    b = np.asarray(fused.develop_post_geo_fused(planes, lean, masks))
    np.testing.assert_array_equal(a, b)


def test_brightness_curve_channel_selector_matches_oracle(rng):
    """v1 tone_curve_lut channel argument: the brightness curve targets one
    RGB channel; gated against the numpy oracle for every selector."""
    img = random_linear_image(rng, 16, 24)
    masks = _full_mask(16, 24)
    outs = []
    for channel in (0, 1, 2, 3):
        p = EditParameters()
        p.set_tone(exposure=0.3, contrast=10)
        p.set_curve(BRIGHTNESS, [0, 32000, 65535], [0, 45000, 65535],
                    channel=channel)
        ours, ref = _run_both(img, [p], masks)
        assert_close(ours, ref)
        outs.append(ours)
    # Each selector produces a genuinely different render.
    for i in range(3):
        assert np.abs(outs[i] - outs[3]).max() > 1e-3


def test_brightness_channel_validation_and_json():
    from rawphotoforge_tpu.core.curve import CurveError
    from rawphotoforge_tpu.core.params import (
        BRIGHTNESS, SATURATION, EditParameters,
    )

    p = EditParameters()
    p.set_curve(BRIGHTNESS, [0, 65535], [0, 60000], channel=2)
    assert p.brightness_channel == 2
    q = EditParameters.from_json(p.to_json())
    assert q.brightness_channel == 2
    with pytest.raises(CurveError):
        p.set_curve(SATURATION, [0, 65535], [0, 60000], channel=1)
    with pytest.raises(CurveError):
        p.set_curve(BRIGHTNESS, [0, 65535], [0, 60000], channel=7)


def test_editor_channel_curve_stays_on_kernel_path(rng):
    """The fused kernel implements the brightness-curve channel selector
    (kernels/fused._channel_select), so channel curves no longer force
    the exact-LUT path — and the render matches the anchor."""
    import jax.numpy as jnp

    from rawphotoforge_tpu.core.params import BRIGHTNESS, pack_params
    from rawphotoforge_tpu.engine.editor import FULL, PhotoEditor
    from rawphotoforge_tpu.ops import develop as dev

    img = random_linear_image(rng, 16, 24)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=True,
                                  mid_long_edge=16, low_long_edge=8)
    assert not ed._use_exact_path()
    ed.set_curve(BRIGHTNESS, [0, 65535], [0, 60000], channel=0)
    assert not ed._use_exact_path()
    got = np.asarray(ed.apply(FULL))
    # Anchor oracle: pack WITH the exact LUTs (the kernel-path pack
    # skips building them).
    import dataclasses

    anchor_params = dataclasses.replace(
        pack_params([m.params for m in ed.masks], build_luts=True),
        extent=jnp.asarray(ed._extents[FULL], jnp.float32))
    want = np.asarray(dev.develop_post_geo_jit(
        ed._geo_at(FULL), anchor_params, ed._masks_at(FULL)
    ))[:, :16, :24]
    assert np.abs(got - want).max() < 5e-3
    # Only the red channel is curved: green/blue must match an
    # un-curved render exactly on those channels.
    ed2 = PhotoEditor.from_rgb_f32(img, use_pallas=True,
                                   mid_long_edge=16, low_long_edge=8)
    base = np.asarray(ed2.apply(FULL))
    assert np.abs(got[1:] - base[1:]).max() < 5e-3
    assert np.abs(got[0] - base[0]).max() > 0.02


def test_set_curve_rejected_call_leaves_state_unchanged():
    """A rejected set_curve call must not half-apply (advisor: channel was
    mutated before validation)."""
    from rawphotoforge_tpu.core.curve import CurveError
    from rawphotoforge_tpu.core.params import BRIGHTNESS, EditParameters

    p = EditParameters()
    with pytest.raises(CurveError):
        p.set_curve(BRIGHTNESS, channel=0)  # no points: invalid
    assert p.brightness_channel == 3
    assert p.curves[BRIGHTNESS].control_x is None
    with pytest.raises(CurveError):
        p.set_curve(BRIGHTNESS, [0, 100, 50], [0, 1, 2], channel=1)
    assert p.brightness_channel == 3


def test_applied_lens_profile_default_on_all_constructors(rng):
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    ed = PhotoEditor.from_rgb_f32(random_linear_image(rng, 8, 8),
                                  use_pallas=False,
                                  mid_long_edge=8, low_long_edge=8)
    assert ed.applied_lens_profile is None
