"""RAW pipeline tests: demosaic, camera matrix, DNG container, sharpen."""

import numpy as np
import jax.numpy as jnp
import pytest

from rawphotoforge_tpu.ops import demosaic as dm
from rawphotoforge_tpu.ops.sharpen import gaussian_blur, unsharp_mask
from rawphotoforge_tpu.io import dng as dng_mod
from rawphotoforge_tpu.io.raw import develop_raw_image, read_raw, synthetic_raw
from rawphotoforge_tpu.engine.editor import PhotoEditor, FULL

from conftest import random_linear_image


def _mosaic_from_rgb(rgb_chw, pattern):
    """Sample a CFA mosaic from full RGB planes."""
    tile = dm.BAYER_PATTERNS[pattern]
    _, h, w = rgb_chw.shape
    m = np.zeros((h, w), dtype=np.float32)
    for dy in range(2):
        for dx in range(2):
            m[dy::2, dx::2] = rgb_chw[tile[dy][dx], dy::2, dx::2]
    return m


@pytest.mark.parametrize("pattern", ["RGGB", "BGGR", "GRBG", "GBRG"])
@pytest.mark.parametrize("method", ["bilinear", "malvar"])
def test_demosaic_recovers_smooth_image(pattern, method):
    """A smooth gradient is reconstructed almost exactly by any linear
    demosaic (the classic correctness check)."""
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.stack([
        0.2 + 0.5 * xx / w,
        0.3 + 0.4 * yy / h,
        0.5 - 0.2 * (xx + yy) / (h + w),
    ]).astype(np.float32)
    mosaic = _mosaic_from_rgb(rgb, pattern)
    fn = dm.demosaic_malvar if method == "malvar" else dm.demosaic_bilinear
    out = np.asarray(fn(jnp.asarray(mosaic), pattern))
    # Interior (borders use reflected samples).
    d = np.abs(out - rgb)[:, 4:-4, 4:-4]
    assert d.max() < 5e-3, f"{pattern}/{method}: max err {d.max()}"


def test_demosaic_preserves_sampled_values():
    """At each CFA site the sampled channel must pass through untouched."""
    rng = np.random.default_rng(7)
    rgb = rng.random((3, 32, 48)).astype(np.float32)
    mosaic = _mosaic_from_rgb(rgb, "RGGB")
    out = np.asarray(dm.demosaic_bilinear(jnp.asarray(mosaic), "RGGB"))
    np.testing.assert_allclose(out[0, 0::2, 0::2], rgb[0, 0::2, 0::2], atol=0)
    np.testing.assert_allclose(out[1, 0::2, 1::2], rgb[1, 0::2, 1::2], atol=0)
    np.testing.assert_allclose(out[1, 1::2, 0::2], rgb[1, 1::2, 0::2], atol=0)
    np.testing.assert_allclose(out[2, 1::2, 1::2], rgb[2, 1::2, 1::2], atol=0)


def test_malvar_less_false_color_than_bilinear():
    """On a gray edge (equal channels) any demosaic error shows up as false
    color (R != G fringing). Malvar's gradient correction must reduce it
    substantially vs bilinear — the reason it's the quality default."""
    h, w = 64, 64
    xx = np.tile(np.arange(w, dtype=np.float32), (h, 1))
    edge = (xx > w / 2).astype(np.float32) * 0.8 + 0.1
    rgb = np.stack([edge, edge, edge])
    mosaic = _mosaic_from_rgb(rgb, "RGGB")
    out_b = np.asarray(dm.demosaic_bilinear(jnp.asarray(mosaic), "RGGB"))
    out_m = np.asarray(dm.demosaic_malvar(jnp.asarray(mosaic), "RGGB"))
    fringe_b = np.abs(out_b[0] - out_b[1])[4:-4, 4:-4].max()
    fringe_m = np.abs(out_m[0] - out_m[1])[4:-4, 4:-4].max()
    assert fringe_m < 0.5 * fringe_b, (fringe_b, fringe_m)


def test_normalize_mosaic():
    v = jnp.asarray(np.array([512, 512 + 100, 16383, 20000, 0], dtype=np.uint16))
    out = np.asarray(dm.normalize_mosaic(v, 512.0, 16383.0))
    assert out[0] == 0.0
    np.testing.assert_allclose(out[1], 100 / (16383 - 512), rtol=1e-6)
    assert out[2] == 1.0
    assert out[3] == 1.0  # clipped
    assert out[4] == 0.0  # clipped below black


def test_cam_matrix_white_preserving():
    """Row-normalized dcraw recipe: camera white (1,1,1) maps to sRGB white."""
    xyz_to_cam = np.array([
        [0.9, -0.2, -0.1],
        [-0.4, 1.2, 0.2],
        [-0.1, 0.2, 0.7],
    ])
    m = dm.cam_matrix_to_srgb(xyz_to_cam)
    white = m @ np.ones(3)
    np.testing.assert_allclose(white, np.ones(3), atol=1e-5)


def test_develop_raw_roundtrip_synthetic(rng):
    """Mosaic a smooth image with WB + matrix simulation, develop it back:
    result must match the original to demosaic tolerance."""
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.stack([
        0.2 + 0.4 * xx / w, 0.3 + 0.3 * yy / h, 0.45 - 0.15 * xx / w,
    ]).astype(np.float32)
    xyz_to_cam = np.array(
        [[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]]
    )
    raw = synthetic_raw(rgb, pattern="RGGB", wb_gains=(1.9, 1.0, 1.4),
                        xyz_to_cam=xyz_to_cam)
    planes, exif = develop_raw_image(raw)
    assert exif["Make"] == "Synthetic"
    d = np.abs(np.asarray(planes) - rgb)[:, 4:-4, 4:-4]
    assert d.max() < 0.02, d.max()


@pytest.mark.parametrize("pattern", ["RGGB", "GBRG"])
def test_bucket_stable_develop_bit_identical(rng, pattern):
    """develop_raw_image_padded (the bucket-stable open) must reproduce
    develop_raw_image BIT-for-bit in the true region: the host reflect
    pad generates exactly the values the Malvar stencil's internal
    reflect would."""
    from rawphotoforge_tpu.io.raw import (bucket_stable_eligible,
                                          develop_raw_image_padded)

    h, w = 70, 106  # buckets to (128, 128)
    rgb = random_linear_image(rng, h, w).transpose(2, 0, 1)
    xyz_to_cam = np.array(
        [[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]]
    )
    raw = synthetic_raw(rgb, pattern=pattern, wb_gains=(1.8, 1.0, 1.45),
                        xyz_to_cam=xyz_to_cam)
    assert bucket_stable_eligible(raw)
    legacy, _ = develop_raw_image(raw)
    padded = develop_raw_image_padded(raw)
    assert padded.shape == (3, 128, 128)
    np.testing.assert_array_equal(np.asarray(padded)[:, :h, :w],
                                  np.asarray(legacy))


def test_bucket_stable_develop_linear_raw(rng):
    from rawphotoforge_tpu.io.dng import RawImage
    from rawphotoforge_tpu.io.raw import (bucket_stable_eligible,
                                          develop_raw_image_padded)

    h, w = 40, 60
    vals = (rng.random((h, w, 3)) * 60000).astype(np.uint16)
    raw = RawImage(mosaic=vals, pattern="RGB", black_level=0.0,
                   white_level=65535.0, wb_gains=(1.5, 1.0, 1.2),
                   xyz_to_cam=None)
    assert bucket_stable_eligible(raw)
    legacy, _ = develop_raw_image(raw)
    padded = develop_raw_image_padded(raw)
    assert padded.shape == (3, 128, 128)
    np.testing.assert_array_equal(np.asarray(padded)[:, :h, :w],
                                  np.asarray(legacy))


def test_bucket_stable_develop_default_crop_bit_identical(rng):
    """A DefaultCrop through the bucket-stable path (traced-origin
    dynamic_slice of bucket size) must equal the legacy post-demosaic
    crop bit-for-bit — including a rect touching the mosaic's bottom
    edge, where the in-bounds pad guarantee matters."""
    import dataclasses

    from rawphotoforge_tpu.engine.editor import bucket_shape
    from rawphotoforge_tpu.io.raw import (bucket_stable_eligible,
                                          develop_raw_image_padded)

    h, w = 90, 140
    rgb = random_linear_image(rng, h, w).transpose(2, 0, 1)
    base = synthetic_raw(rgb, pattern="RGGB", wb_gains=(1.7, 1.0, 1.3))
    for crop in [(6, 4, 120, 80),      # interior
                 (10, 40, 128, 50),    # bottom-right corner touch
                 (0, 0, 140, 90)]:     # full-frame rect
        raw = dataclasses.replace(base, default_crop=crop)
        assert bucket_stable_eligible(raw)
        legacy, _ = develop_raw_image(raw)
        padded = develop_raw_image_padded(raw)
        cx, cy, cw, ch = crop
        assert padded.shape == (3,) + bucket_shape(ch, cw)
        np.testing.assert_array_equal(np.asarray(padded)[:, :ch, :cw],
                                      np.asarray(legacy))


def test_demosaic_cfa_true_shape_bit_identical(rng):
    """demosaic_cfa(true_shape=...) on a garbage-padded grid equals the
    exact-shape demosaic BIT-for-bit in the true region (the masked-NC
    zero-contribution argument the X-Trans bucket-stable open relies
    on) — for both methods."""
    import jax.numpy as jnp

    from rawphotoforge_tpu.ops.demosaic import XTRANS, demosaic_cfa

    h, w = 53, 77          # deliberately not multiples of 6
    hp, wp = 128, 128
    mosaic = rng.random((h, w), dtype=np.float32)
    grid = rng.random((hp, wp), dtype=np.float32) * 7.0  # garbage pad
    grid[:h, :w] = mosaic
    ts = jnp.asarray([h, w], dtype=jnp.int32)
    for method in ("residual", "nc"):
        exact = np.asarray(demosaic_cfa(jnp.asarray(mosaic), XTRANS,
                                        method=method))
        padded = np.asarray(demosaic_cfa(jnp.asarray(grid), XTRANS,
                                         method=method, true_shape=ts))
        np.testing.assert_array_equal(padded[:, :h, :w], exact)


def test_bucket_stable_develop_xtrans_bit_identical(rng):
    """X-Trans through the bucket-stable open (masked-NC demosaic with
    the true extent traced) must equal the per-extent develop
    bit-for-bit in the true region."""
    from rawphotoforge_tpu.io.raw import (bucket_stable_eligible,
                                          develop_raw_image_padded)

    h, w = 70, 106  # not multiples of 6; buckets to (128, 128)
    rgb = random_linear_image(rng, h, w).transpose(2, 0, 1)
    xyz_to_cam = np.array(
        [[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]]
    )
    raw = synthetic_raw(rgb, pattern="XTRANS", wb_gains=(1.8, 1.0, 1.45),
                        xyz_to_cam=xyz_to_cam)
    assert bucket_stable_eligible(raw)
    legacy, _ = develop_raw_image(raw)
    padded = develop_raw_image_padded(raw)
    assert padded.shape == (3, 128, 128)
    np.testing.assert_array_equal(np.asarray(padded)[:, :h, :w],
                                  np.asarray(legacy))


def test_bucket_stable_develop_xtrans_crop_bit_identical(rng):
    import dataclasses

    from rawphotoforge_tpu.engine.editor import bucket_shape
    from rawphotoforge_tpu.io.raw import (bucket_stable_eligible,
                                          develop_raw_image_padded)

    h, w = 90, 140
    rgb = random_linear_image(rng, h, w).transpose(2, 0, 1)
    base = synthetic_raw(rgb, pattern="XTRANS", wb_gains=(1.7, 1.0, 1.3))
    raw = dataclasses.replace(base, default_crop=(6, 4, 120, 80))
    assert bucket_stable_eligible(raw)
    legacy, _ = develop_raw_image(raw)
    padded = develop_raw_image_padded(raw)
    assert padded.shape == (3,) + bucket_shape(80, 120)
    np.testing.assert_array_equal(np.asarray(padded)[:, :80, :120],
                                  np.asarray(legacy))


@pytest.mark.parametrize("orientation", [5, 6, 3, 8])
def test_bucket_stable_xtrans_every_orientation(rng, orientation):
    """X-Trans is bucket-stable for EVERY orientation (r4): top/left
    pads use the traced-origin channel map so every true site keeps its
    absolute 6x6 CFA phase — bit-identical to the legacy develop."""
    import dataclasses

    from rawphotoforge_tpu.io.raw import (bucket_stable_eligible,
                                          develop_raw_image_padded)

    rgb = random_linear_image(rng, 70, 106).transpose(2, 0, 1)
    base = synthetic_raw(rgb, pattern="XTRANS", wb_gains=(1.8, 1.0, 1.45))
    raw = dataclasses.replace(base, orientation=orientation)
    assert bucket_stable_eligible(raw)
    legacy, _ = develop_raw_image(raw)
    oh, ow = legacy.shape[1:]
    padded = develop_raw_image_padded(raw)
    np.testing.assert_array_equal(np.asarray(padded)[:, :oh, :ow],
                                  np.asarray(legacy))


@pytest.mark.parametrize("orientation", [2, 3, 4, 5, 6, 7, 8])
def test_bucket_stable_develop_oriented_bit_identical(rng, orientation):
    """Every EXIF orientation through the bucket-stable path (side-aware
    reflect pad + post-develop orient_exif relocation) must equal the
    legacy develop+orient bit-for-bit in the true region."""
    import dataclasses

    from rawphotoforge_tpu.io.raw import (bucket_stable_eligible,
                                          develop_raw_image_padded)

    h, w = 70, 106
    rgb = random_linear_image(rng, h, w).transpose(2, 0, 1)
    raw = dataclasses.replace(
        synthetic_raw(rgb, pattern="RGGB", wb_gains=(1.8, 1.0, 1.45)),
        orientation=orientation)
    assert bucket_stable_eligible(raw)
    legacy, _ = develop_raw_image(raw)
    oh, ow = legacy.shape[1:]
    padded = develop_raw_image_padded(raw)
    assert padded.shape == (3, 128, 128)
    np.testing.assert_array_equal(np.asarray(padded)[:, :oh, :ow],
                                  np.asarray(legacy))


def test_bucket_stable_eligibility_fallbacks(rng):
    import dataclasses

    from rawphotoforge_tpu.io.raw import bucket_stable_eligible

    rgb = random_linear_image(rng, 24, 36).transpose(2, 0, 1)
    raw = synthetic_raw(rgb, pattern="RGGB")
    assert bucket_stable_eligible(raw)
    # Orientation is bucket-stable, but not combined with a crop, and a
    # top/left pad must be even (Bayer phase) — 24 rows pads by 104
    # (even, ok); the odd-height variant below falls back.
    assert bucket_stable_eligible(dataclasses.replace(raw, orientation=6))
    assert not bucket_stable_eligible(dataclasses.replace(
        raw, orientation=6, default_crop=(2, 2, 20, 16)))
    odd = synthetic_raw(random_linear_image(rng, 23, 36).transpose(2, 0, 1))
    assert not bucket_stable_eligible(
        dataclasses.replace(odd, orientation=6))
    # DefaultCrop IS bucket-stable (traced dynamic_slice); malformed
    # rects fall back to the legacy path's validation.
    assert bucket_stable_eligible(
        dataclasses.replace(raw, default_crop=(2, 2, 20, 16)))
    assert not bucket_stable_eligible(
        dataclasses.replace(raw, default_crop=(2, 2, 40, 16)))
    # X-Trans is bucket-stable for every orientation since the
    # traced-origin masked-NC demosaic (r4).
    assert bucket_stable_eligible(
        dataclasses.replace(raw, pattern="XTRANS"))
    assert bucket_stable_eligible(
        dataclasses.replace(raw, pattern="XTRANS", orientation=6))
    # A 1-px pad would break Malvar bit-exactness at the true edge.
    raw127 = synthetic_raw(
        random_linear_image(rng, 127, 36).transpose(2, 0, 1))
    assert not bucket_stable_eligible(raw127)


def test_bucket_stable_randomized_sweep(rng):
    """Randomized invariant sweep: for random (pattern, shape,
    orientation | crop) combinations, every ELIGIBLE file develops
    bit-identically to the legacy chain; ineligible ones just fall
    back (upload_padded is None)."""
    import dataclasses

    from rawphotoforge_tpu.io.raw import (bucket_stable_eligible,
                                          develop_raw_image_padded)

    patterns = ["RGGB", "BGGR", "GRBG", "GBRG", "XTRANS"]
    n_eligible = 0
    for trial in range(15):
        h = int(rng.integers(12, 70)) * 2  # even sensor dims
        w = int(rng.integers(12, 70)) * 2
        pattern = patterns[int(rng.integers(0, len(patterns)))]
        rgb = random_linear_image(rng, h, w).transpose(2, 0, 1)
        raw = synthetic_raw(rgb, pattern=pattern,
                            wb_gains=(1.0 + rng.random(), 1.0,
                                      1.0 + rng.random()))
        if trial % 3 == 1:
            raw = dataclasses.replace(
                raw, orientation=int(rng.integers(2, 9)))
        elif trial % 3 == 2:
            ch = int(rng.integers(4, h - 4))
            cw = int(rng.integers(4, w - 4))
            cy = int(rng.integers(0, h - ch + 1))
            cx = int(rng.integers(0, w - cw + 1))
            raw = dataclasses.replace(raw, default_crop=(cx, cy, cw, ch))
        if not bucket_stable_eligible(raw):
            continue
        n_eligible += 1
        legacy, _ = develop_raw_image(raw)
        padded = np.asarray(develop_raw_image_padded(raw))
        th, tw = legacy.shape[1:]
        np.testing.assert_array_equal(
            padded[:, :th, :tw], np.asarray(legacy),
            err_msg=f"trial {trial}: {pattern} {h}x{w} "
                    f"o={raw.orientation} crop={raw.default_crop}")
    assert n_eligible >= 7  # the sweep actually exercised the path


def test_bucket_stable_pad_is_edge_replicated(rng):
    """The padded develop must hand the editor mode='edge' pad content
    (replicate_true_edges_traced at the end) — the sharpen/warp stencils
    read pad rows, and reflect-demosaiced (or crop-sliced) pad values
    made sharpened borders diverge from a legacy open (found by review:
    max dev 0.356 at sharpness 60)."""
    import dataclasses

    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.raw import develop_raw_image_padded

    h, w = 70, 106
    rgb = random_linear_image(rng, h, w).transpose(2, 0, 1)
    base = synthetic_raw(rgb, pattern="RGGB", wb_gains=(1.8, 1.0, 1.45))
    for raw, (th, tw) in [
        (base, (h, w)),
        (dataclasses.replace(base, default_crop=(6, 4, 96, 60)), (60, 96)),
        (dataclasses.replace(base, orientation=6), (w, h)),
    ]:
        padded = np.asarray(develop_raw_image_padded(raw))
        np.testing.assert_array_equal(
            padded[:, th:, :tw],
            np.broadcast_to(padded[:, th - 1:th, :tw],
                            padded[:, th:, :tw].shape))
        np.testing.assert_array_equal(
            padded[:, :, tw:],
            np.broadcast_to(padded[:, :, tw - 1:tw],
                            padded[:, :, tw:].shape))

    # End-to-end: a sharpened FULL render from the bucket-stable open
    # equals the legacy open's (the review's reproduction).
    data = write_dng(base)
    ed = PhotoEditor.from_bytes(data, "DNG")
    from rawphotoforge_tpu.io.raw import read_raw

    legacy = PhotoEditor(read_raw(data)[0])
    ed.set_sharpness(60)
    legacy.set_sharpness(60)
    d = np.abs(np.asarray(ed.apply(FULL)) - np.asarray(legacy.apply(FULL)))
    assert d.max() < 1e-5, d.max()


def test_editor_dng_open_uses_bucket_stable_path(rng):
    """from_bytes on an eligible DNG must take the padded upload and
    render identically to the legacy device phase."""
    from rawphotoforge_tpu.io.raw import decode_raw_host

    rgb = random_linear_image(rng, 44, 66).transpose(2, 0, 1)
    raw = synthetic_raw(rgb, pattern="RGGB", wb_gains=(2.0, 1.0, 1.5))
    data = dng_mod.write_dng(raw)
    hd = decode_raw_host(data)
    assert hd.upload_padded is not None
    ed = PhotoEditor.from_bytes(data, "DNG")
    assert ed.shape == (44, 66)
    assert ed._originals["full"].shape == (3, 128, 128)
    legacy = PhotoEditor(hd.upload())
    np.testing.assert_array_equal(np.asarray(ed.apply(FULL)),
                                  np.asarray(legacy.apply(FULL)))


def test_dng_write_read_roundtrip(rng):
    rgb = random_linear_image(rng, 32, 48).transpose(2, 0, 1)
    xyz_to_cam = np.array(
        [[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]]
    )
    raw = synthetic_raw(rgb, pattern="GRBG", wb_gains=(2.1, 1.0, 1.3),
                        xyz_to_cam=xyz_to_cam)
    data = dng_mod.write_dng(raw)
    back = dng_mod.read_dng(data)
    np.testing.assert_array_equal(back.mosaic, raw.mosaic)
    assert back.pattern == "GRBG"
    assert back.black_level == raw.black_level
    assert back.white_level == raw.white_level
    np.testing.assert_allclose(back.wb_gains, raw.wb_gains, rtol=1e-4)
    np.testing.assert_allclose(back.xyz_to_cam, xyz_to_cam, atol=1e-6)
    assert back.exif["Make"] == "Synthetic"


def test_dng_rejects_non_tiff():
    with pytest.raises(dng_mod.DngError):
        dng_mod.read_dng(b"NOTATIFF")


def test_editor_opens_dng(rng, tmp_path):
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.stack(
        [0.2 + 0.4 * xx / w, 0.3 + 0.3 * yy / h, 0.4 - 0.1 * xx / w]
    ).astype(np.float32)
    raw = synthetic_raw(rgb, wb_gains=(1.8, 1.0, 1.5))
    p = tmp_path / "test.dng"
    p.write_bytes(dng_mod.write_dng(raw))

    ed = PhotoEditor.open(str(p), use_pallas=False, mid_long_edge=32, low_long_edge=16)
    assert ed.shape == (h, w)
    assert ed.exif.get("Make") == "Synthetic"
    out = ed.get_srgb_f32(FULL)
    assert out.shape == (h, w, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_dng_12bit_unpack():
    vals = np.array([0xABC, 0x123, 0xFFF, 0x000], dtype=np.uint16)
    # Pack manually: 12-bit big-endian stream.
    bits = "".join(format(v, "012b") for v in vals)
    packed = np.packbits([int(b) for b in bits])
    out = dng_mod._unpack_bits(packed, 12, 4)
    np.testing.assert_array_equal(out, vals)


def test_gaussian_blur_preserves_mean(rng):
    x = jnp.asarray(rng.random((3, 32, 32), dtype=np.float32))
    b = gaussian_blur(x, sigma=1.2, radius=3)
    np.testing.assert_allclose(float(b.mean()), float(x.mean()), atol=1e-3)
    assert float(jnp.var(b)) < float(jnp.var(x))


def test_unsharp_mask_zero_amount_identity(rng):
    x = jnp.asarray(rng.random((3, 16, 16), dtype=np.float32))
    out = unsharp_mask(x, jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_unsharp_mask_increases_edge_contrast():
    xx = np.tile(np.arange(32, dtype=np.float32), (16, 1))
    edge = (xx > 16).astype(np.float32) * 0.5 + 0.25
    x = jnp.asarray(np.stack([edge] * 3))
    out = np.asarray(unsharp_mask(x, jnp.float32(1.5)))
    assert np.ptp(out[:, :, 14:18]) > np.ptp(np.asarray(x)[:, :, 14:18])


def test_editor_sharpness_stage(rng):
    img = random_linear_image(rng, 32, 48)
    ed = PhotoEditor.from_rgb_f32(img, use_pallas=False, mid_long_edge=32, low_long_edge=16)
    base = np.asarray(ed.apply(FULL))
    ed.set_sharpness(80)
    sharp = np.asarray(ed.apply(FULL))
    assert not np.allclose(base, sharp)
    ed.set_sharpness(0)
    np.testing.assert_allclose(np.asarray(ed.apply(FULL)), base, atol=1e-6)


def test_raw_extension_registry(tmp_path, rng):
    from rawphotoforge_tpu.io.raw import is_raw_image, RAW_EXTENSIONS

    assert is_raw_image("a.ARW") and is_raw_image("b.dng") and is_raw_image("c.nef")
    assert not is_raw_image("d.jpg")
    assert len(RAW_EXTENSIONS) >= 26

    # A TIFF-structured vendor RAW with uncompressed CFA decodes through
    # the generic walker (here: our DNG bytes under an .arw name).
    rgb = random_linear_image(rng, 32, 48).transpose(2, 0, 1)
    raw = synthetic_raw(rgb)
    p = tmp_path / "shot.arw"
    p.write_bytes(dng_mod.write_dng(raw))
    from rawphotoforge_tpu.io import image_io

    planes, exif = image_io.read_image(str(p))
    assert planes.shape == (3, 32, 48)
    assert exif["Make"] == "Synthetic"


def test_dng_lossless_jpeg_strip_roundtrip(rng):
    """Compression=7 single-strip DNG: mosaic round-trips bit-exactly."""
    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    yy, xx = np.mgrid[0:84, 0:106].astype(np.float32)
    rgb = np.stack([0.2 + 0.5 * xx / 106, 0.3 + 0.4 * yy / 84, 0.5 - 0.2 * xx / 106])
    raw = synthetic_raw(rgb, pattern="GBRG", wb_gains=(1.7, 1.0, 1.45))
    blob = write_dng(raw, compression=7)
    assert len(blob) < len(write_dng(raw))  # actually compressed
    got = read_dng(blob)
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    assert got.pattern == raw.pattern
    assert got.black_level == raw.black_level
    np.testing.assert_allclose(got.wb_gains, raw.wb_gains, rtol=1e-4)


def test_dng_lossless_jpeg_tiled_roundtrip(rng):
    """Tiled compression=7 DNG with non-aligned edges (pad crop) across
    predictors."""
    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    img = rng.random((3, 90, 118)).astype(np.float32) ** 2
    raw = synthetic_raw(img)
    for predictor in (1, 4, 7):
        blob = write_dng(raw, compression=7, tile=(32, 48), predictor=predictor)
        got = read_dng(blob)
        np.testing.assert_array_equal(got.mosaic, raw.mosaic)


def test_dng_unsupported_compression_message():
    """Unknown compression raises a typed error naming the scheme."""
    from rawphotoforge_tpu.io.dng import DngError, read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    raw = synthetic_raw(np.full((3, 8, 8), 0.5, dtype=np.float32))
    blob = bytearray(write_dng(raw))
    # Patch the COMPRESSION short (tag 259, type 3) to 34892 (lossy DNG).
    import struct
    n = struct.unpack_from("<H", blob, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack_from("<H", blob, off)[0] == 259:
            struct.pack_into("<H", blob, off + 8, 34892)
    with pytest.raises(DngError, match="34892"):
        read_dng(bytes(blob))


def test_editor_opens_compressed_dng(rng, tmp_path):
    """PhotoEditor.open on a lossless-JPEG DNG produces the same session
    as the uncompressed variant of the same mosaic."""
    from rawphotoforge_tpu.engine.editor import PhotoEditor, FULL
    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    img = rng.random((3, 40, 64)).astype(np.float32) ** 2
    raw = synthetic_raw(img)
    p1 = tmp_path / "u.dng"
    p7 = tmp_path / "c.dng"
    p1.write_bytes(write_dng(raw))
    p7.write_bytes(write_dng(raw, compression=7, tile=(16, 32)))
    ed1 = PhotoEditor.open(str(p1), use_pallas=False,
                           mid_long_edge=32, low_long_edge=16)
    ed7 = PhotoEditor.open(str(p7), use_pallas=False,
                           mid_long_edge=32, low_long_edge=16)
    np.testing.assert_array_equal(
        np.asarray(ed1.apply(FULL)), np.asarray(ed7.apply(FULL))
    )


def test_dng_linearization_table(rng):
    """DNG LinearizationTable (tag 50712): raw values index the table
    before black/white scaling."""
    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw
    import dataclasses

    raw = synthetic_raw(rng.random((3, 16, 24)).astype(np.float32),
                        black_level=0, white_level=4095)
    # Store companded 12-bit codes; table expands to 16-bit-ish values.
    codes = np.minimum(raw.mosaic, 4095).astype(np.uint16)
    table = (np.arange(4096, dtype=np.uint32) * 13 // 3).astype(np.uint16)
    stored = dataclasses.replace(raw, mosaic=codes)
    blob = write_dng(stored, linearization_table=table)
    got = read_dng(blob)
    np.testing.assert_array_equal(got.mosaic, table[codes])


def test_dng_active_area_crop_and_phase(rng):
    """ActiveArea (tag 50829) crops masked borders and shifts the CFA
    phase by the origin parity."""
    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw
    import dataclasses

    inner = synthetic_raw(rng.random((3, 20, 28)).astype(np.float32))
    full = np.zeros((26, 36), dtype=np.uint16)
    # Odd origin (3, 5): the active area's CFA phase flips both ways.
    full[3:23, 5:33] = inner.mosaic
    stored = dataclasses.replace(inner, mosaic=full)
    blob = write_dng(stored, active_area=(3, 5, 23, 33))
    got = read_dng(blob)
    np.testing.assert_array_equal(got.mosaic, inner.mosaic)
    assert got.pattern == "BGGR"  # RGGB shifted by (1, 1)

    blob = write_dng(stored, active_area=(2, 6, 22, 34))  # even origin
    got = read_dng(blob)
    assert got.pattern == "RGGB"
    np.testing.assert_array_equal(got.mosaic, full[2:22, 6:34])


def test_dng_default_crop_applied_after_demosaic(rng):
    """DefaultCropOrigin/Size round-trips through the container and crops
    the developed output (v1's auto-crop), not the mosaic."""
    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import develop_raw_image, synthetic_raw
    import dataclasses

    raw = synthetic_raw(rng.random((3, 24, 32)).astype(np.float32))
    cropped = dataclasses.replace(raw, default_crop=(4, 2, 24, 18))
    got = read_dng(write_dng(cropped))
    assert got.default_crop == (4, 2, 24, 18)
    assert got.mosaic.shape == (24, 32)  # mosaic untouched

    planes, _ = develop_raw_image(got)
    assert planes.shape == (3, 18, 24)
    full_planes, _ = develop_raw_image(read_dng(write_dng(raw)))
    np.testing.assert_allclose(
        np.asarray(planes), np.asarray(full_planes)[:, 2:20, 4:28], atol=1e-6
    )


def test_demosaic_cfa_xtrans_smooth_recovery(rng):
    """X-Trans mosaic of a smooth image: normalized-convolution demosaic
    recovers it closely away from hard edges."""
    from rawphotoforge_tpu.ops.demosaic import XTRANS, demosaic_cfa

    h, w = 48, 60
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.stack([
        0.25 + 0.5 * xx / w,
        0.35 + 0.3 * yy / h,
        0.55 - 0.3 * xx / w,
    ])
    tile = np.asarray(XTRANS)
    chan = tile[yy.astype(int) % 6, xx.astype(int) % 6]
    mosaic = np.take_along_axis(rgb.reshape(3, -1), chan.reshape(1, -1), 0
                                ).reshape(h, w)
    out = np.asarray(demosaic_cfa(jnp.asarray(mosaic), XTRANS))
    err = np.abs(out[:, 8:-8, 8:-8] - rgb[:, 8:-8, 8:-8])
    assert err.max() < 0.02, err.max()


def test_demosaic_cfa_preserves_samples(rng):
    from rawphotoforge_tpu.ops.demosaic import XTRANS, demosaic_cfa, _cfa_channel_map

    mosaic = rng.random((24, 30), dtype=np.float32)
    out = np.asarray(demosaic_cfa(jnp.asarray(mosaic), XTRANS))
    chan = np.asarray(_cfa_channel_map(24, 30, np.asarray(XTRANS)))
    for c in range(3):
        m = chan == c
        np.testing.assert_array_equal(out[c][m], mosaic[m])


def test_demosaic_cfa_arbitrary_layout(rng):
    """The machinery is layout-agnostic: a made-up 3x3 periodic CFA works."""
    from rawphotoforge_tpu.ops.demosaic import demosaic_cfa

    layout = np.array([[0, 1, 2], [1, 2, 0], [2, 0, 1]], dtype=np.int32)
    h, w = 27, 36
    rgb = np.stack([np.full((h, w), v, dtype=np.float32)
                    for v in (0.2, 0.5, 0.8)])
    yy, xx = np.mgrid[0:h, 0:w]
    chan = layout[yy % 3, xx % 3]
    mosaic = np.take_along_axis(rgb.reshape(3, -1), chan.reshape(1, -1), 0
                                ).reshape(h, w)
    out = np.asarray(demosaic_cfa(jnp.asarray(mosaic), layout))
    for c, v in enumerate((0.2, 0.5, 0.8)):
        np.testing.assert_allclose(out[c], v, atol=1e-5)


def test_xtrans_dng_roundtrip_and_develop(rng, tmp_path):
    """6x6-CFA DNG round trips; the editor opens and develops it."""
    from rawphotoforge_tpu.engine.editor import PhotoEditor, FULL
    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    img = rng.random((3, 36, 48)).astype(np.float32) ** 2
    raw = synthetic_raw(img, pattern="XTRANS", wb_gains=(1.6, 1.0, 1.3))
    blob = write_dng(raw, compression=7)
    got = read_dng(blob)
    assert got.pattern == "XTRANS"
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)

    p = tmp_path / "x.dng"
    p.write_bytes(blob)
    ed = PhotoEditor.open(str(p), use_pallas=False,
                          mid_long_edge=32, low_long_edge=16)
    out = np.asarray(ed.apply(FULL))
    assert out.shape == (3, 36, 48)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_xtrans_active_area_phase(rng):
    """ActiveArea with a non-multiple-of-6 origin still resolves the
    canonical X-Trans layout via the modulo phase shift."""
    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw
    from rawphotoforge_tpu.ops.demosaic import XTRANS
    import dataclasses

    inner_h, inner_w = 24, 30
    top, left = 7, 5
    full = np.zeros((top + inner_h + 3, left + inner_w + 1), dtype=np.uint16)
    # Build a full-sensor X-Trans mosaic, then describe the STORED layout
    # as seen from the sensor origin so the active crop shifts back to
    # canonical.
    sensor_layout = np.empty((6, 6), dtype=np.int32)
    for y in range(6):
        for x in range(6):
            # stored[(y+top)%6, (x+left)%6] must equal XTRANS[y, x].
            sensor_layout[(y + top) % 6, (x + left) % 6] = XTRANS[y, x]
    # Values: put the canonical-XTRANS mosaic in the active area.
    raw_inner = synthetic_raw(
        rng.random((3, inner_h, inner_w)).astype(np.float32),
        pattern="XTRANS",
    )
    full[top : top + inner_h, left : left + inner_w] = raw_inner.mosaic
    stored = dataclasses.replace(raw_inner, mosaic=full)
    blob = bytearray(write_dng(
        stored, active_area=(top, left, top + inner_h, left + inner_w)))
    # Patch the CFAPattern payload to the sensor-origin layout.
    canon = bytes(int(v) for v in XTRANS.reshape(-1))
    idx = bytes(blob).find(canon)
    assert idx > 0
    blob[idx : idx + 36] = bytes(int(v) for v in sensor_layout.reshape(-1))
    got = read_dng(bytes(blob))
    assert got.pattern == "XTRANS"
    np.testing.assert_array_equal(got.mosaic, raw_inner.mosaic)


def test_orf_magic_accepted(rng):
    """Olympus ORF keeps TIFF structure under an 'RO'/'SR' magic; the
    walker accepts it (uncompressed CFA ORFs then parse normally)."""
    import struct
    from rawphotoforge_tpu.io.dng import DngError, read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    raw = synthetic_raw(rng.random((3, 16, 24)).astype(np.float32))
    for magic in (0x4F52, 0x5352):
        blob = bytearray(write_dng(raw))
        struct.pack_into("<H", blob, 2, magic)
        got = read_dng(bytes(blob))
        np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    blob = bytearray(write_dng(raw))
    struct.pack_into("<H", blob, 2, 0x1234)
    with pytest.raises(DngError, match="magic"):
        read_dng(bytes(blob))


def test_xtrans_residual_beats_nc_on_gray_edge():
    """Green-guided residual interpolation must cut the false color plain
    NC produces on a sharp gray edge (the Malvar-vs-bilinear analog for
    the generic CFA path)."""
    from rawphotoforge_tpu.ops.demosaic import XTRANS, demosaic_cfa

    h, w = 48, 60
    xx = np.tile(np.arange(w, dtype=np.float32), (h, 1))
    edge = (xx > w / 2).astype(np.float32) * 0.8 + 0.1
    tile = np.asarray(XTRANS)
    yy = np.arange(h)[:, None]
    chan = tile[yy % 6, np.arange(w)[None, :] % 6]
    # Gray image: every CFA site samples the same edge value.
    mosaic = jnp.asarray(edge)
    out_nc = np.asarray(demosaic_cfa(mosaic, XTRANS, method="nc"))
    out_ri = np.asarray(demosaic_cfa(mosaic, XTRANS))
    interior = (slice(None), slice(8, -8), slice(8, -8))
    fringe_nc = np.abs(out_nc[0] - out_nc[1])[interior[1:]].max()
    fringe_ri = np.abs(out_ri[0] - out_ri[1])[interior[1:]].max()
    assert fringe_ri < 0.35 * fringe_nc, (fringe_nc, fringe_ri)


def test_bayer_residual_method_available_and_sharp(rng):
    """develop_raw(method='residual') routes Bayer through the
    directional-green residual demosaic: matches the smooth-recovery gate
    and beats Malvar's gray-edge fringe."""
    h, w = 64, 64
    xx = np.tile(np.arange(w, dtype=np.float32), (h, 1))
    edge = (xx > w / 2).astype(np.float32) * 0.8 + 0.1
    rgb = np.stack([edge] * 3)
    mosaic = _mosaic_from_rgb(rgb, "RGGB")
    wb = jnp.asarray([1.0, 1.0, 1.0])
    cam = jnp.eye(3, dtype=jnp.float32)
    out_m = np.asarray(dm.develop_raw(jnp.asarray(mosaic), wb, cam,
                                      pattern="RGGB", method="malvar"))
    out_r = np.asarray(dm.develop_raw(jnp.asarray(mosaic), wb, cam,
                                      pattern="RGGB", method="residual"))
    fr = lambda o: np.abs(o[0] - o[1])[4:-4, 4:-4].max()
    assert fr(out_r) < 0.2 * fr(out_m), (fr(out_m), fr(out_r))


def test_dng_exif_subifd_fields(rng):
    """Real DNGs keep ExposureTime/FNumber/FocalLength/LensModel in the
    EXIF sub-IFD (34665); the walker must find them there so
    lens_correct can resolve profiles."""
    import struct
    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    raw = synthetic_raw(rng.random((3, 16, 24)).astype(np.float32))
    base = bytearray(write_dng(raw))
    # Append an EXIF sub-IFD with FocalLength (rational) and LensModel.
    lens = b"Canon EF 50mm f/1.8 II\x00"
    lens_off = len(base)
    base += lens
    if len(base) % 2:
        base += b"\x00"
    fl_off = len(base)
    base += struct.pack("<II", 50, 1)
    exif_ifd_off = len(base)
    base += struct.pack("<H", 2)
    base += struct.pack("<HHII", 37386, 5, 1, fl_off)          # FocalLength
    base += struct.pack("<HHII", 42036, 2, len(lens), lens_off)  # LensModel
    base += struct.pack("<I", 0)
    # Rewrite IFD0 with an added ExifIFD (34665) entry.
    n = struct.unpack_from("<H", base, 8)[0]
    entries = [bytes(base[10 + 12 * i: 22 + 12 * i]) for i in range(n)]
    entries.append(struct.pack("<HHII", 34665, 4, 1, exif_ifd_off))
    entries.sort(key=lambda e: struct.unpack_from("<H", e)[0])
    new_ifd0_off = len(base)
    base += struct.pack("<H", n + 1) + b"".join(entries) + struct.pack("<I", 0)
    struct.pack_into("<I", base, 4, new_ifd0_off)

    got = read_dng(bytes(base))
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    assert got.exif.get("LensModel") == "Canon EF 50mm f/1.8 II"
    assert got.exif.get("FocalLength", "").startswith("50")

    # And the bundled lens database resolves it.
    from rawphotoforge_tpu.io.lensdb import LensDatabase
    prof = LensDatabase.load().profile_from_exif(got.exif | {"Make": "Canon"})
    assert prof is not None and prof.name == "Canon EF 50mm f/1.8 II"


def test_develop_raw_method_routing(rng):
    """method='nc' reaches demosaic_cfa (not silently 'residual'), and
    unknown method names raise (review finding)."""
    import jax.numpy as jnp

    from rawphotoforge_tpu.ops import demosaic as dm

    m = jnp.asarray(rng.random((24, 24)).astype(np.float32))
    wb = jnp.ones(3)
    cam = jnp.eye(3, dtype=jnp.float32)
    nc = dm.develop_raw(m, wb, cam, pattern="RGGB", method="nc")
    res = dm.develop_raw(m, wb, cam, pattern="RGGB", method="residual")
    assert float(jnp.abs(nc - res).max()) > 1e-4  # genuinely different paths
    with pytest.raises(ValueError, match="unknown demosaic method"):
        dm.develop_raw(m, wb, cam, pattern="RGGB", method="malvarr")


def test_write_dng_extreme_wb_gains_stay_typed(rng):
    """Zero/huge AsShotNeutral gains must serialize (clamped into the
    unsigned-RATIONAL range) instead of escaping as struct.error."""
    import dataclasses
    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    raw = synthetic_raw(rng.random((3, 16, 24)).astype(np.float32))
    for gains in ((0.0, 1.0, 1.5), (1e9, 1.0, 1e-9)):
        data = write_dng(dataclasses.replace(raw, wb_gains=gains))
        got = read_dng(data)
        for g in got.wb_gains:
            assert np.isfinite(g) and g > 0


def test_write_dng_preview_bps_count_matches_samples(rng):
    """TIFF 6.0 requires BitsPerSample count == SamplesPerPixel: the
    YCbCr preview IFD must declare three 8s, not one."""
    import io
    import struct

    from PIL import Image as PILImage

    from rawphotoforge_tpu.io.dng import extract_preview, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    buf = io.BytesIO()
    PILImage.fromarray(
        (rng.random((20, 30, 3)) * 255).astype(np.uint8)).save(buf, "JPEG")
    jpeg = buf.getvalue()
    raw = synthetic_raw(rng.random((3, 16, 24)).astype(np.float32))
    data = write_dng(raw, preview_jpeg=jpeg)
    (off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, off)
    entries = {}
    for i in range(n):
        t, ty, cnt, val = struct.unpack_from("<HHII", data,
                                             off + 2 + 12 * i)
        entries[t] = (ty, cnt, val)
    ty, cnt, val = entries[258]
    assert (ty, cnt) == (3, 3)
    assert struct.unpack_from("<3H", data, val) == (8, 8, 8)
    assert entries[277][2] == 3  # SamplesPerPixel
    assert extract_preview(data) == jpeg  # layout shift kept offsets right


def test_dng_corrupt_exif_value_offset_drops_field_only(rng):
    """Corruption confined to one EXIF tag's out-of-line value must not
    abort the sensor decode — the field drops, everything else stays."""
    import dataclasses
    import struct

    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    raw = synthetic_raw(rng.random((3, 16, 24)).astype(np.float32))
    raw = dataclasses.replace(
        raw, exif={**raw.exif, "Make": "Maker", "Model": "Body",
                   "ExposureTime": "1/250"})
    blob = bytearray(write_dng(raw))
    i = blob.find(struct.pack("<HHI", 33434, 5, 1))  # ExposureTime entry
    assert i >= 0
    struct.pack_into("<I", blob, i + 8, len(blob) + 64)  # value past EOF
    got = read_dng(bytes(blob))
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    assert "ExposureTime" not in got.exif
    assert got.exif.get("Model") == "Body"


def test_dng_corrupt_subifd_pointer_skipped(rng):
    """An out-of-range SubIFDs pointer is skipped, not fatal: the raw
    IFD elsewhere in the chain still decodes."""
    import struct

    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    raw = synthetic_raw(rng.random((3, 16, 24)).astype(np.float32))
    base = bytearray(write_dng(raw))
    n = struct.unpack_from("<H", base, 8)[0]
    entries = [bytes(base[10 + 12 * i: 22 + 12 * i]) for i in range(n)]
    entries.append(struct.pack("<HHII", 330, 4, 1, len(base) + 4096))
    entries.sort(key=lambda e: struct.unpack_from("<H", e)[0])
    new_off = len(base)
    base += struct.pack("<H", n + 1) + b"".join(entries) \
        + struct.pack("<I", 0)
    struct.pack_into("<I", base, 4, new_off)
    got = read_dng(bytes(base))
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)


def test_focal_35mm_produced_and_round_tripped(rng):
    """FocalLengthIn35mmFilm must flow from both EXIF producers (the
    lens-DB crop-factor rescale keys on it) and survive a DNG
    transcode."""
    import dataclasses
    import io

    from PIL import Image as PILImage

    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.exif import parse_exif
    from rawphotoforge_tpu.io.raw import synthetic_raw

    raw = synthetic_raw(rng.random((3, 16, 24)).astype(np.float32))
    raw = dataclasses.replace(
        raw, exif={**raw.exif, "FocalLength": "35",
                   "FocalLengthIn35mmFilm": "52"})
    got = read_dng(write_dng(raw))
    assert got.exif.get("FocalLengthIn35mmFilm") == "52"

    ex = PILImage.Exif()
    ex[37386] = 35.0   # FocalLength
    ex[41989] = 52     # FocalLengthIn35mmFilm
    buf = io.BytesIO()
    PILImage.fromarray(
        (rng.random((8, 10, 3)) * 255).astype(np.uint8)).save(
        buf, "JPEG", exif=ex.tobytes())
    d = parse_exif(PILImage.open(io.BytesIO(buf.getvalue())))
    assert d.get("FocalLengthIn35mmFilm") == "52"


def test_bucket_stable_develop_opcode_files_bit_identical(rng):
    """Opcode-carrying DNGs (WarpRectilinear / FixVignetteRadial — the
    phone/ProRAW class) develop bucket-stable (VERDICT r3 #4): eligible
    for the padded path, true region identical to the unpadded develop,
    both opcode orders."""
    import dataclasses

    from rawphotoforge_tpu.io.raw import (bucket_stable_eligible,
                                          develop_raw_image,
                                          develop_raw_image_padded,
                                          synthetic_raw)

    h, w = 70, 106
    rgb = random_linear_image(rng, h, w).transpose(2, 0, 1)
    base = synthetic_raw(rgb, pattern="RGGB", wb_gains=(1.8, 1.0, 1.45))
    warp = (np.asarray([[0.9, 0.05, 0.0, 0.0, 0.0, 0.0]], np.float32),
            np.asarray([0.5, 0.5], np.float32))
    vig = (np.asarray([0.3, -0.1, 0.0, 0.0, 0.0], np.float32),
           np.asarray([0.45, 0.55], np.float32))
    for kwargs in (
        {"warp_rectilinear": warp},
        {"vignette_radial": vig},
        {"warp_rectilinear": warp, "vignette_radial": vig},
        {"warp_rectilinear": warp, "vignette_radial": vig,
         "vignette_first": True},
        {"vignette_radial": vig, "default_crop": (8, 4, 64, 48)},
        {"warp_rectilinear": warp, "orientation": 5},
    ):
        raw = dataclasses.replace(base, **kwargs)
        assert bucket_stable_eligible(raw), kwargs
        legacy, _ = develop_raw_image(raw)
        padded = develop_raw_image_padded(raw)
        lh, lw = legacy.shape[1:]
        np.testing.assert_array_equal(
            np.asarray(padded)[:, :lh, :lw], np.asarray(legacy),
            err_msg=str(kwargs))


def test_bucket_stable_opcode_rotated_falls_back(rng):
    """Opcode files with top/left-pad orientations keep the per-extent
    fallback (the traced-extent coordinates assume origin-anchored
    true regions)."""
    import dataclasses

    from rawphotoforge_tpu.io.raw import (bucket_stable_eligible,
                                          synthetic_raw)

    rgb = random_linear_image(rng, 70, 106).transpose(2, 0, 1)
    warp = (np.asarray([[0.9, 0.05, 0.0, 0.0, 0.0, 0.0]], np.float32),
            np.asarray([0.5, 0.5], np.float32))
    base = synthetic_raw(rgb, pattern="RGGB")
    for orient, ok in ((1, True), (5, True), (6, False), (3, False)):
        raw = dataclasses.replace(base, warp_rectilinear=warp,
                                  orientation=orient)
        assert bucket_stable_eligible(raw) == ok, orient
