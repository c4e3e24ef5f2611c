"""Fully-fused RAW pipeline kernel vs the composed multi-op path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rawphotoforge_tpu.core.params import EditParameters, pack_params, BRIGHTNESS, SATURATION
from rawphotoforge_tpu.kernels import fused, raw_pipeline
from rawphotoforge_tpu.ops import demosaic as dm
from rawphotoforge_tpu.ops.sharpen import unsharp_mask

from test_develop import assert_close


def _inputs(h=64, w=512, seed=0):
    key = jax.random.PRNGKey(seed)
    mosaic = jax.random.uniform(key, (h, w), dtype=jnp.float32)
    wb = jnp.asarray([1.8, 1.0, 1.4])
    cam = jnp.asarray(dm.cam_matrix_to_srgb(
        np.array([[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]])
    ))
    p = EditParameters()
    p.set_tone(exposure=0.6, contrast=25, shadow=20, highlight=-10, black=5, white=-5)
    p.set_whitebalance(temperature=20, tint=-10)
    p.set_vignette(35)
    p.set_curve(BRIGHTNESS, [0, 20000, 65535], [2000, 30000, 65535])
    p.set_curve(SATURATION, [0, 65535], [36000, 36000])
    params = pack_params([p])
    return mosaic, wb, cam, params


def _composed(mosaic, wb, cam, params, sharpen, pattern="RGGB"):
    rgb = dm.develop_raw(mosaic, wb, cam, pattern=pattern, method="malvar")
    if float(sharpen) != 0.0:
        rgb = unsharp_mask(rgb, jnp.float32(sharpen))
    masks = jnp.ones((1,) + mosaic.shape, dtype=jnp.float32)
    return np.asarray(
        fused.develop_post_geo_fused(rgb, params, masks, main_mask_all_ones=True)
    )


@pytest.mark.parametrize("sharpen", [0.0, 0.8])
def test_fused_raw_matches_composed(sharpen):
    mosaic, wb, cam, params = _inputs()
    one_pass = np.asarray(
        raw_pipeline.raw_develop_fused(
            mosaic, wb, cam, params, jnp.float32(sharpen), tile_h=16, tile_w=128
        )
    )
    multi = _composed(mosaic, wb, cam, params, sharpen)
    assert_close(
        one_pass.transpose(1, 2, 0), multi.transpose(1, 2, 0), loose=1e-2
    )


def test_fused_raw_non_tile_multiple():
    mosaic, wb, cam, params = _inputs(h=50, w=300)
    out = np.asarray(
        raw_pipeline.raw_develop_fused(
            mosaic, wb, cam, params, jnp.float32(0.5), tile_h=16, tile_w=128
        )
    )
    assert out.shape == (3, 50, 300)
    multi = _composed(mosaic, wb, cam, params, 0.5)
    # Interior must match; the tile-rounding pad changes nothing inside.
    assert_close(
        out[:, 4:-4, 4:-4].transpose(1, 2, 0),
        multi[:, 4:-4, 4:-4].transpose(1, 2, 0),
        loose=1e-2,
    )


def test_fused_raw_other_pattern():
    mosaic, wb, cam, params = _inputs(h=32, w=256, seed=3)
    one_pass = np.asarray(
        raw_pipeline.raw_develop_fused(
            mosaic, wb, cam, params, jnp.float32(0.0), pattern="GRBG",
            tile_h=16, tile_w=128,
        )
    )
    multi = _composed(mosaic, wb, cam, params, 0.0, pattern="GRBG")
    assert_close(one_pass.transpose(1, 2, 0), multi.transpose(1, 2, 0), loose=1e-2)


def test_fused_raw_with_regional_masks():
    """One-pass kernel with a regional mask matches the composed path
    (demosaic -> fused develop with masks)."""
    mosaic, wb, cam, _ = _inputs(h=64, w=256, seed=5)
    main = EditParameters()
    main.set_tone(exposure=0.5, contrast=20)
    main.set_vignette(30)
    reg = EditParameters()
    reg.set_tone(contrast=60)
    reg.set_curve(SATURATION, [0, 65535], [45000, 45000])
    params = pack_params([main, reg])

    masks = np.zeros((2, 64, 256), dtype=np.float32)
    masks[0] = 1.0
    masks[1, 10:40, 30:200] = 1.0
    masks = jnp.asarray(masks)

    one_pass = np.asarray(
        raw_pipeline.raw_develop_fused(
            mosaic, wb, cam, params, jnp.float32(0.0),
            tile_h=16, tile_w=128, masks=masks,
        )
    )
    rgb = dm.develop_raw(mosaic, wb, cam, pattern="RGGB", method="malvar")
    multi = np.asarray(fused.develop_post_geo_fused(rgb, params, masks))
    assert_close(one_pass.transpose(1, 2, 0), multi.transpose(1, 2, 0), loose=1e-2)


def test_raw_kernel_default_curves_variant_bit_identical(rng):
    """The staircase-shortcut variant of the one-pass RAW kernel is
    bit-identical to the general path with default curves."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from rawphotoforge_tpu.core.params import EditParameters, pack_params
    from rawphotoforge_tpu.kernels import raw_pipeline as rp
    from rawphotoforge_tpu.ops import demosaic as dm

    mosaic = jnp.asarray(rng.random((64, 256), dtype=np.float32))
    wb = jnp.asarray([1.8, 1.0, 1.4])
    cam = jnp.asarray(dm.cam_matrix_to_srgb(np.array(
        [[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]])))
    p = EditParameters()
    p.set_tone(exposure=0.6, contrast=20)
    p.set_vignette(30)
    packed = pack_params([p], extent=(64, 256))
    a = np.asarray(rp.raw_develop_fused(mosaic, wb, cam, packed,
                                        jnp.float32(0.5)))
    b = np.asarray(rp.raw_develop_fused(mosaic, wb, cam, packed,
                                        jnp.float32(0.5),
                                        default_bright_curves=True,
                                        default_oklch_curves=True))
    np.testing.assert_array_equal(a, b)


class TestXTransFused:
    """One-pass X-Trans kernel vs the composed path (demosaic_cfa residual
    -> sharpen -> fused develop). Interiors match bit-comparably; the
    outer 12 px use a phase-preserving periodic border (the jnp path
    uses masked-NC zero boundaries — the validity-mask semantics the
    bucket-stable open needs) so borders are compared only on smooth
    content, where any sane boundary policy must agree to a few
    percent."""

    def _compare(self, h, w, sharpen, seed=0):
        mosaic, wb, cam, params = _inputs(h=h, w=w, seed=seed)
        one = np.asarray(raw_pipeline.raw_develop_fused(
            mosaic, wb, cam, params, jnp.float32(sharpen),
            pattern="XTRANS", tile_h=48, tile_w=384))
        rgb = dm.develop_raw(mosaic, wb, cam, pattern="XTRANS",
                             method="residual")
        if float(sharpen) != 0.0:
            rgb = unsharp_mask(rgb, jnp.float32(sharpen))
        masks = jnp.ones((1, h, w), dtype=jnp.float32)
        multi = np.asarray(fused.develop_post_geo_fused(
            rgb, params, masks, main_mask_all_ones=True))
        return one, multi

    @pytest.mark.parametrize("sharpen", [0.0, 0.8])
    def test_interior_matches_composed(self, sharpen):
        one, multi = self._compare(96, 768, sharpen)
        assert_close(
            one[:, 14:-14, 14:-14].transpose(1, 2, 0),
            multi[:, 14:-14, 14:-14].transpose(1, 2, 0), loose=1e-2,
        )

    def test_non_tile_multiple_interior(self):
        one, multi = self._compare(100, 700, 0.5, seed=2)
        assert one.shape == (3, 100, 700)
        assert_close(
            one[:, 14:-14, 14:-14].transpose(1, 2, 0),
            multi[:, 14:-14, 14:-14].transpose(1, 2, 0), loose=1e-2,
        )

    def test_smooth_borders_match(self):
        """On smooth content the kernel's phase-preserving border must
        track the jnp path's masked-NC border closely, everywhere incl.
        corners (measured 0.021 max on this gradient — two legitimate
        boundary policies, not an interior defect: the 14-px-trimmed
        interior tests gate at 1e-2)."""
        h, w = 96, 768
        yy, xx = jnp.mgrid[0:h, 0:w]
        mosaic = 0.2 + 0.5 * (yy.astype(jnp.float32) / h) * (
            xx.astype(jnp.float32) / w)
        wb = jnp.asarray([1.2, 1.0, 1.3])
        cam = jnp.asarray(dm.cam_matrix_to_srgb(np.array(
            [[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]])))
        params = pack_params([EditParameters()])
        one = np.asarray(raw_pipeline.raw_develop_fused(
            mosaic, wb, cam, params, jnp.float32(0.0), pattern="XTRANS"))
        rgb = dm.develop_raw(mosaic, wb, cam, pattern="XTRANS",
                             method="residual")
        multi = np.asarray(fused.develop_post_geo_fused(
            rgb, params, jnp.ones((1, h, w), dtype=jnp.float32),
            main_mask_all_ones=True))
        assert np.abs(one - multi).max() < 3e-2

    def test_bad_tile_geometry_rejected(self):
        mosaic, wb, cam, params = _inputs(h=48, w=384)
        with pytest.raises(ValueError, match="multiples of 6"):
            raw_pipeline.raw_develop_fused(
                mosaic, wb, cam, params, jnp.float32(0.0),
                pattern="XTRANS", tile_h=16, tile_w=128)
