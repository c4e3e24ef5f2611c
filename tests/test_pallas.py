"""Fused Pallas kernel vs the exact-LUT jnp anchor path.

Runs in Pallas interpret mode on CPU (the 'fake backend' of SURVEY.md §4c);
the same kernel compiles with Mosaic on real TPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rawphotoforge_tpu.core.params import (
    BRIGHTNESS, HUE, SATURATION, LIGHTNESS, EditParameters, pack_params,
)
from rawphotoforge_tpu.kernels import fused
from rawphotoforge_tpu.ops import develop as dev

from conftest import random_linear_image
from test_develop import assert_close


def _run_both(rng, param_list, masks=None, h=48, w=160, tile=(16, 128)):
    img = random_linear_image(rng, h, w)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    if masks is None:
        masks = np.ones((len(param_list), h, w), dtype=np.float32)
    masks = jnp.asarray(masks)
    packed = pack_params(param_list)
    anchor = np.asarray(dev.develop_post_geo_jit(planes, packed, masks))
    kern = np.asarray(
        fused.develop_post_geo_fused(planes, packed, masks, tile_h=tile[0], tile_w=tile[1])
    )
    return kern.transpose(1, 2, 0), anchor.transpose(1, 2, 0)


def test_defaults_match(rng):
    kern, anchor = _run_both(rng, [EditParameters()])
    assert_close(kern, anchor)


def test_full_stack_match(rng):
    p = EditParameters()
    p.set_tone(exposure=0.9, contrast=30, shadow=25, highlight=-15, black=8, white=-6)
    p.set_whitebalance(temperature=40, tint=-20)
    p.set_vignette(55)
    p.set_curve(BRIGHTNESS, [0, 20000, 45000, 65535], [2000, 28000, 43000, 65535])
    p.set_curve(HUE, [0, 30000, 65535], [8000, 35000, 62000])
    p.set_curve(SATURATION, [0, 40000, 65535], [36000, 28000, 36000])
    p.set_curve(LIGHTNESS, [0, 65535], [30000, 36000])
    kern, anchor = _run_both(rng, [p])
    assert_close(kern, anchor)


def test_multi_mask_match(rng):
    h, w = 48, 160
    main = EditParameters()
    main.set_tone(exposure=0.4)
    reg = EditParameters()
    reg.set_tone(contrast=50)
    reg.set_curve(SATURATION, [0, 65535], [45000, 45000])
    masks = np.zeros((2, h, w), dtype=np.float32)
    masks[0] = 1.0
    masks[1, 8:30, 20:100] = 1.0
    kern, anchor = _run_both(rng, [main, reg], masks=masks, h=h, w=w)
    assert_close(kern, anchor)


def test_non_divisible_tiles(rng):
    """Image dims not multiples of the tile: edge tiles must still write the
    correct region."""
    p = EditParameters()
    p.set_tone(exposure=1.2, contrast=-20)
    p.set_vignette(-45)
    kern, anchor = _run_both(rng, [p], h=37, w=150, tile=(16, 128))
    assert_close(kern, anchor)


def test_vignette_tile_offsets(rng):
    """Vignette depends on absolute pixel coordinates — verify tiling does
    not reset them per tile."""
    p = EditParameters()
    p.set_vignette(90)
    kern, anchor = _run_both(rng, [p], h=64, w=256, tile=(16, 128))
    assert_close(kern, anchor)


@pytest.mark.parametrize("steep", [True, False])
def test_brightness_curve_staircase(rng, steep):
    p = EditParameters()
    if steep:
        p.set_curve(BRIGHTNESS, [0, 8000, 12000, 65535], [0, 2000, 60000, 65535])
    else:
        p.set_curve(BRIGHTNESS, [0, 65535], [20000, 40000])
    kern, anchor = _run_both(rng, [p])
    # Steep segments amplify the Hermite-vs-monomial f32 reassociation into
    # more one-index flips; allow larger outlier bounds there.
    if steep:
        assert_close(kern, anchor, loose=2e-2, frac=2e-2)
    else:
        assert_close(kern, anchor)


def test_ktrig_fast_powers_accuracy():
    """cbrt_fast / linear_to_srgb_fast match the pow-based forms to ~2e-7
    incl. the -0.0 / subnormal / FTZ edge cases (kept as utilities; the
    fused kernels measured faster with Mosaic's native pow lowering)."""
    import numpy as np
    import jax.numpy as jnp
    from rawphotoforge_tpu.kernels import ktrig

    xs = np.concatenate([
        [-1.0, -0.0, 0.0, 1e-45, 1e-38, 1e-30, 0.0031308, 1.3],
        np.logspace(-12, 0.2, 5000),
    ]).astype(np.float32)
    out = np.asarray(ktrig.cbrt_fast(jnp.asarray(xs)))
    assert not np.isnan(out).any()
    ref = np.cbrt(np.maximum(xs, 0).astype(np.float64))
    rel = np.abs(out - ref) / np.maximum(ref, 1e-30)
    assert rel[xs > 1e-20].max() < 1e-6

    s = np.asarray(ktrig.linear_to_srgb_fast(jnp.asarray(xs)))
    xx = np.maximum(xs.astype(np.float64), 0)
    sref = np.where(xs <= 0.0031308, xs * 12.92,
                    1.055 * xx ** (1 / 2.4) - 0.055)
    assert np.abs(s - sref).max() < 1e-6


def test_default_curves_variant_bit_identical(rng):
    """The default-curve staircase-shortcut variants must be BIT-identical
    to the general kernel path with default curves (it skips evaluation,
    not semantics)."""
    img = random_linear_image(rng, 48, 160)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    masks = jnp.ones((1, 48, 160), dtype=np.float32)
    p = EditParameters()
    p.set_tone(exposure=0.8, contrast=20, shadow=15)
    p.set_whitebalance(temperature=30)
    p.set_vignette(40)
    packed = pack_params([p])
    general = np.asarray(fused.develop_post_geo_fused(
        planes, packed, masks, tile_h=16, tile_w=128))
    fast = np.asarray(fused.develop_post_geo_fused(
        planes, packed, masks, tile_h=16, tile_w=128,
        default_bright_curves=True, default_oklch_curves=True))
    np.testing.assert_array_equal(general, fast)
    # Multi-mask too (regional mask with default curves but tone edits).
    reg = EditParameters()
    reg.set_tone(exposure=-0.6)
    m2 = np.ones((2, 48, 160), dtype=np.float32)
    m2[1, :20] = 0.0
    packed2 = pack_params([p, reg])
    general = np.asarray(fused.develop_post_geo_fused(
        planes, packed2, jnp.asarray(m2), tile_h=16, tile_w=128))
    fast = np.asarray(fused.develop_post_geo_fused(
        planes, packed2, jnp.asarray(m2), tile_h=16, tile_w=128,
        default_bright_curves=True, default_oklch_curves=True))
    np.testing.assert_array_equal(general, fast)
    # The flags are independent: a custom brightness curve with default
    # hue/sat/light must be able to skip just the OKLCH sweeps (and vice
    # versa) with BIT-identical output.
    pb = EditParameters()
    pb.set_tone(exposure=0.4)
    pb.set_curve(BRIGHTNESS, [0, 20000, 65535], [3000, 26000, 65535])
    packedb = pack_params([pb])
    general = np.asarray(fused.develop_post_geo_fused(
        planes, packedb, masks, tile_h=16, tile_w=128))
    fast = np.asarray(fused.develop_post_geo_fused(
        planes, packedb, masks, tile_h=16, tile_w=128,
        default_oklch_curves=True))
    np.testing.assert_array_equal(general, fast)
    ph = EditParameters()
    ph.set_curve(HUE, [0, 30000, 65535], [5000, 32000, 64000])
    packedh = pack_params([ph])
    general = np.asarray(fused.develop_post_geo_fused(
        planes, packedh, masks, tile_h=16, tile_w=128))
    fast = np.asarray(fused.develop_post_geo_fused(
        planes, packedh, masks, tile_h=16, tile_w=128,
        default_bright_curves=True))
    np.testing.assert_array_equal(general, fast)


def test_editor_uses_default_curve_variant(rng):
    """Editor renders identically whether or not any curve was ever set
    (the flag only selects the shortcut)."""
    from rawphotoforge_tpu.engine.editor import PhotoEditor, FULL

    img = random_linear_image(rng, 32, 128)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=True,
                                  mid_long_edge=32, low_long_edge=16)
    ed.set_tone(exposure=0.5, contrast=10)
    a = np.asarray(ed.apply(FULL))
    # Setting then resetting a curve to the explicit default must not
    # change the render (flag flips, semantics identical).
    ed.set_curve(BRIGHTNESS, [0, 30000, 65535], [0, 20000, 65535])
    ed.set_curve(BRIGHTNESS, [0, 65535], [0, 65535])
    b = np.asarray(ed.apply(FULL))
    np.testing.assert_array_equal(a, b)


def test_identity_oklch_variant_near_exact(rng):
    """identity_oklch skips the OKLCH round trip the default hue/sat/light
    curves barely perturb: H quantized to 1/65536, C and L scaled by
    floor(32767)/32767.5, plus the polynomial-trig round-trip error — all
    sub-u8-quantization after encode. Bounded, NOT bit-identical."""
    img = random_linear_image(rng, 48, 160)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    masks = jnp.ones((1, 48, 160), dtype=np.float32)
    p = EditParameters()
    p.set_tone(exposure=0.8, contrast=20, shadow=15)
    p.set_whitebalance(temperature=30)
    p.set_vignette(40)
    packed = pack_params([p])
    full = np.asarray(fused.develop_post_geo_fused(
        planes, packed, masks, tile_h=16, tile_w=128,
        default_bright_curves=True, default_oklch_curves=True))
    fast = np.asarray(fused.develop_post_geo_fused(
        planes, packed, masks, tile_h=16, tile_w=128,
        default_bright_curves=True, default_oklch_curves=True,
        identity_oklch=True))
    assert np.abs(full - fast).max() < 3e-3
    # identity_oklch composes with a CUSTOM brightness curve (the curve
    # runs before the OKLCH stage): same bound vs the general kernel.
    pb = EditParameters()
    pb.set_tone(exposure=0.8, contrast=20, shadow=15)
    pb.set_whitebalance(temperature=30)
    pb.set_curve(BRIGHTNESS, [0, 20000, 65535], [3000, 26000, 65535])
    packedb = pack_params([pb])
    full = np.asarray(fused.develop_post_geo_fused(
        planes, packedb, masks, tile_h=16, tile_w=128))
    fast = np.asarray(fused.develop_post_geo_fused(
        planes, packedb, masks, tile_h=16, tile_w=128,
        default_oklch_curves=True, identity_oklch=True))
    assert np.abs(full - fast).max() < 3e-3


def test_identity_oklch_requires_default_oklch_curves(rng):
    img = random_linear_image(rng, 32, 128)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    packed = pack_params([EditParameters()])
    with pytest.raises(ValueError, match="default_oklch_curves"):
        fused.develop_post_geo_fused(
            planes, packed, None, main_mask_all_ones=True,
            identity_oklch=True)
    # default_bright_curves alone does NOT license the OKLCH skip.
    with pytest.raises(ValueError, match="default_oklch_curves"):
        fused.develop_post_geo_fused(
            planes, packed, None, main_mask_all_ones=True,
            default_bright_curves=True, identity_oklch=True)


def test_raw_kernel_identity_oklch_near_exact(rng):
    from rawphotoforge_tpu.kernels import raw_pipeline as rp
    from rawphotoforge_tpu.ops import demosaic as dm

    mosaic = jnp.asarray(rng.random((64, 256), dtype=np.float32))
    wb = jnp.asarray([1.8, 1.0, 1.4])
    cam = jnp.asarray(dm.cam_matrix_to_srgb(np.array(
        [[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]])))
    p = EditParameters()
    p.set_tone(exposure=0.6, contrast=20)
    packed = pack_params([p], extent=(64, 256))
    full = np.asarray(rp.raw_develop_fused(
        mosaic, wb, cam, packed, jnp.float32(0.5), tile_h=16, tile_w=128,
        default_bright_curves=True, default_oklch_curves=True))
    fast = np.asarray(rp.raw_develop_fused(
        mosaic, wb, cam, packed, jnp.float32(0.5), tile_h=16, tile_w=128,
        default_bright_curves=True, default_oklch_curves=True,
        identity_oklch=True))
    assert np.abs(full - fast).max() < 3e-3
    with pytest.raises(ValueError, match="default_oklch_curves"):
        rp.raw_develop_fused(mosaic, wb, cam, packed, jnp.float32(0.5),
                             identity_oklch=True)


def test_editor_slider_only_render_close_to_anchor(rng):
    """The editor's slider-only kernel render (identity_oklch) stays
    within the kernel-vs-anchor gate of the exact-LUT jnp path."""
    from rawphotoforge_tpu.engine.editor import PhotoEditor, FULL

    img = random_linear_image(rng, 40, 144)
    kw = dict(mid_long_edge=32, low_long_edge=16)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=True, **kw)
    ed.set_tone(exposure=0.5, contrast=10)
    ed.set_vignette(30)
    a = np.asarray(ed.apply(FULL))
    ed2 = PhotoEditor.from_rgb_f32(img, use_pallas=False, **kw)
    ed2.set_tone(exposure=0.5, contrast=10)
    ed2.set_vignette(30)
    b = np.asarray(ed2.apply(FULL))
    assert np.abs(a - b).max() < 5e-3


def test_fused_rejects_mismatched_mask_count():
    """A mask stack whose row count disagrees with the packed params
    must fail loudly — both directions silently mis-render otherwise
    (dropped param rows / garbage SMEM reads)."""
    import pytest

    from rawphotoforge_tpu.core.params import EditParameters, pack_params
    from rawphotoforge_tpu.kernels import fused

    params2 = pack_params([EditParameters(), EditParameters()],
                          build_luts=False)
    planes = jnp.zeros((3, 16, 128), jnp.float32)
    with pytest.raises(ValueError, match="packed mask count"):
        fused.develop_post_geo_fused(
            planes, params2, jnp.ones((1, 16, 128), jnp.float32))
    with pytest.raises(ValueError, match="packed mask count"):
        fused.develop_post_geo_fused(
            planes, params2, jnp.ones((3, 16, 128), jnp.float32))


def test_default_curve_slots_bit_identical(rng):
    """Per-mask per-slot staircase shortcuts (VERDICT r4 #2): a regional
    stack where each mask edited a different single curve family renders
    BIT-identically to the general kernel — the elided sweeps are
    replaced by exactly what the default curves evaluate to."""
    from rawphotoforge_tpu.core.params import default_curve_slots

    main = EditParameters()
    main.set_tone(exposure=0.4, contrast=15)
    main.set_curve(BRIGHTNESS, [0, 30000, 65535], [2000, 35000, 65535])
    m1 = EditParameters()
    m1.set_tone(exposure=-0.3)
    m1.set_curve(SATURATION, [0, 65535], [30000, 36000])
    m2 = EditParameters()
    m2.set_curve(HUE, [0, 20000, 65535], [3000, 24000, 65535])
    params = [main, m1, m2]
    slots = default_curve_slots(params)
    # main: custom bright only; m1: custom sat only; m2: custom hue only.
    assert slots == ((False, True, True, True),
                     (True, True, False, True),
                     (True, False, True, True))

    h, w = 48, 160
    img = random_linear_image(rng, h, w)
    planes = jnp.asarray(img.transpose(2, 0, 1))
    masks = np.ones((3, h, w), dtype=np.float32)
    masks[1] = (np.arange(w) % 2 == 0)[None, :]
    masks[2] = (np.arange(h) % 3 == 0)[:, None]
    masks = jnp.asarray(masks)
    packed = pack_params(params)
    general = np.asarray(fused.develop_post_geo_fused(
        planes, packed, masks, tile_h=16, tile_w=128))
    elided = np.asarray(fused.develop_post_geo_fused(
        planes, packed, masks, tile_h=16, tile_w=128,
        default_curve_slots=slots))
    np.testing.assert_array_equal(elided, general)
    # And it still matches the exact-LUT anchor within kernel tolerance.
    anchor = np.asarray(dev.develop_post_geo_jit(planes, packed, masks))
    assert_close(elided.transpose(1, 2, 0), anchor.transpose(1, 2, 0))


def test_default_curve_slots_validated():
    p = pack_params([EditParameters(), EditParameters()])
    planes = jnp.zeros((3, 16, 128), jnp.float32)
    masks = jnp.ones((2, 16, 128), jnp.float32)
    with pytest.raises(ValueError, match="default_curve_slots"):
        fused.develop_post_geo_fused(
            planes, p, masks, default_curve_slots=((True, True, True, True),))


def test_editor_multi_mask_uses_slot_shortcuts(rng):
    """The editor derives per-mask slot flags and its multi-mask render
    stays equal to the anchor path."""
    from rawphotoforge_tpu.engine.editor import FULL, PhotoEditor

    img = random_linear_image(rng, 48, 64)
    ed = PhotoEditor.from_rgb_f32(img, mid_long_edge=64, low_long_edge=32)
    ed.add_mask("stripe",
                np.tile((np.arange(64) % 2 == 0).astype(np.float32),
                        (48, 1)))
    ed.set_curve(SATURATION, [0, 65535], [30000, 36000],
                 mask_name="stripe")
    ed.set_tone(exposure=0.5)
    out = np.asarray(ed.apply(FULL))

    ed2 = PhotoEditor.from_rgb_f32(img, mid_long_edge=64, low_long_edge=32,
                                   use_pallas=False)
    ed2.add_mask("stripe",
                 np.tile((np.arange(64) % 2 == 0).astype(np.float32),
                         (48, 1)))
    ed2.set_curve(SATURATION, [0, 65535], [30000, 36000],
                  mask_name="stripe")
    ed2.set_tone(exposure=0.5)
    anchor = np.asarray(ed2.apply(FULL))
    assert_close(out.transpose(1, 2, 0), anchor.transpose(1, 2, 0))
