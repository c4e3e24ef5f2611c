"""Deflate-compressed DNG (Compression=8): integer + floating-point HDR.

Round trips gate our reader against our writer; the predictor byte/sample
conventions are additionally gated against Pillow's independent TIFF
decoder (so a consistent-but-wrong diff direction or axis cannot pass).
"""

import io
import struct

import numpy as np
import pytest

from rawphotoforge_tpu.io import dng


def _mosaic(h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(120, 16000, size=(h, w), dtype=np.uint16)


def _raw(mosaic, **kw):
    defaults = dict(
        pattern="RGGB", black_level=128.0, white_level=16383.0,
        wb_gains=(2.1, 1.0, 1.4), xyz_to_cam=None,
        exif={"Make": "T", "Model": "T"},
    )
    defaults.update(kw)
    return dng.RawImage(mosaic=mosaic, **defaults)


@pytest.mark.parametrize("predictor", [1, 2, 34892, 34893])
@pytest.mark.parametrize("tile", [None, (8, 16)])
def test_integer_deflate_round_trip(predictor, tile):
    raw = _raw(_mosaic(22, 30))  # non-multiple of the tile -> edge padding
    data = dng.write_dng(raw, compression=8, predictor=predictor, tile=tile)
    back = dng.read_dng(data)
    np.testing.assert_array_equal(back.mosaic, raw.mosaic)
    assert back.pattern == "RGGB"
    assert back.black_level == 128.0 and back.white_level == 16383.0


def test_legacy_deflate_code_32946():
    raw = _raw(_mosaic())
    data = dng.write_dng(raw, compression=8, predictor=2)
    entry8 = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 8, 0)
    entry_legacy = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 32946, 0)
    assert data.count(entry8) == 1
    back = dng.read_dng(data.replace(entry8, entry_legacy))
    np.testing.assert_array_equal(back.mosaic, raw.mosaic)


def test_predictor2_matches_pillow():
    """Independent convention check: a grayscale TIFF built from our
    deflate+predictor-2 encoder must decode identically in Pillow."""
    from PIL import Image as PILImage

    h, w = 9, 13
    rng = np.random.default_rng(3)
    img = rng.integers(0, 65535, size=(h, w), dtype=np.uint16)
    strip = dng._deflate_encode_block(img, predictor=2)

    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 16), (259, 3, 1, 8),
        (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (278, 4, 1, h),
        (279, 4, 1, len(strip)), (317, 3, 1, 2),
    ]
    data_off = 8 + 2 + len(entries) * 12 + 4
    ifd = struct.pack("<H", len(entries))
    for tag, typ, n, val in entries:
        if tag == 273:
            val = data_off
        ifd += struct.pack("<HHII", tag, typ, n, val)
    ifd += struct.pack("<I", 0)
    buf = b"II" + struct.pack("<HI", 42, 8) + ifd + strip
    got = np.array(PILImage.open(io.BytesIO(buf)))
    np.testing.assert_array_equal(got, img)
    # ...and our own block decoder agrees with both.
    ours = dng._deflate_decode_block(strip, h, w, 16, 2, 1, "<")
    np.testing.assert_array_equal(ours, img)


@pytest.mark.parametrize("dtype,predictor", [
    (np.float32, 3), (np.float16, 3), (np.float32, 1),
])
def test_float_deflate_round_trip(dtype, predictor):
    rng = np.random.default_rng(7)
    vals = (rng.random((18, 26)) * 4.0).astype(dtype)  # HDR range > 1
    raw = _raw(vals, black_level=0.0, white_level=2.5)
    data = dng.write_dng(raw, compression=8, predictor=predictor)
    back = dng.read_dng(data)
    assert back.mosaic.dtype == np.float32
    np.testing.assert_array_equal(back.mosaic, vals.astype(np.float32))
    assert back.black_level == pytest.approx(0.0)
    assert back.white_level == pytest.approx(2.5)


def test_float_deflate_tiled_round_trip():
    rng = np.random.default_rng(9)
    vals = (rng.random((20, 28)) * 2.0).astype(np.float32)
    raw = _raw(vals, black_level=0.0, white_level=1.0)
    data = dng.write_dng(raw, compression=8, tile=(8, 12))
    back = dng.read_dng(data)
    np.testing.assert_array_equal(back.mosaic, vals)


def test_float_develops_end_to_end():
    from rawphotoforge_tpu.io.raw import develop_raw_image, synthetic_raw

    base = synthetic_raw(
        np.clip(np.random.default_rng(1).random((3, 16, 24)), 0, 1)
        .astype(np.float32)
    )
    fraw = _raw(
        (base.mosaic.astype(np.float32) - base.black_level)
        / (base.white_level - base.black_level),
        black_level=0.0, white_level=1.0, wb_gains=base.wb_gains,
    )
    planes_f, _ = develop_raw_image(fraw)
    planes_u, _ = develop_raw_image(base)
    np.testing.assert_allclose(
        np.asarray(planes_f), np.asarray(planes_u), atol=2e-4
    )


def test_fp24_rejected_with_typed_error():
    with pytest.raises(dng.DngError, match="fp24|float DNG depth"):
        dng._deflate_decode_block(b"x" * 4, 2, 2, 24, 3, 3, "<")


def test_float_rejects_ljpeg_compression():
    raw = _raw(np.ones((8, 8), dtype=np.float32),
               black_level=0.0, white_level=1.0)
    with pytest.raises(dng.DngError):
        dng.write_dng(raw, compression=7)


@pytest.mark.parametrize("dtype", [np.float16, np.float32])
def test_uncompressed_float_round_trip(dtype):
    """Compression=1 + SampleFormat=3 is legal DNG 1.4; decode the IEEE
    bits directly rather than reinterpreting them as u16 (review
    finding: the old behavior developed such files as solid white)."""
    vals = (np.random.default_rng(2).random((10, 14)) * 3.0).astype(dtype)
    raw = _raw(vals, black_level=0.0, white_level=2.0)
    back = dng.read_dng(dng.write_dng(raw, compression=1))
    assert back.mosaic.dtype == np.float32
    np.testing.assert_array_equal(back.mosaic, vals.astype(np.float32))


def test_float_with_entropy_compression_rejected():
    """SampleFormat=3 under lossless-JPEG must raise, not decode
    half-float bits as u16."""
    vals = np.random.default_rng(2).random((8, 8)).astype(np.float32)
    raw = _raw(vals, black_level=0.0, white_level=1.0)
    data = dng.write_dng(raw, compression=8)
    entry8 = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 8, 0)
    entry7 = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 7, 0)
    assert data.count(entry8) == 1
    with pytest.raises(dng.DngError, match="SampleFormat=3"):
        dng.read_dng(data.replace(entry8, entry7))


def test_float_write_remaps_integer_predictor():
    """cli convert --codec deflate passes predictor=34892; float mosaics
    must remap it to the TN3 predictor instead of failing."""
    vals = (np.random.default_rng(4).random((12, 16)) * 3.0).astype(np.float32)
    raw = _raw(vals, black_level=0.0, white_level=2.0)
    data = dng.write_dng(raw, compression=8, predictor=34892)
    back = dng.read_dng(data)
    np.testing.assert_array_equal(back.mosaic, vals)


def test_float_large_white_level_rational():
    """Levels > ~4294 must not overflow the u32 rational numerator."""
    vals = np.random.default_rng(6).random((8, 8)).astype(np.float32) * 16000
    raw = _raw(vals, black_level=512.0, white_level=16383.0)
    back = dng.read_dng(dng.write_dng(raw, compression=8))
    assert back.white_level == pytest.approx(16383.0, rel=1e-6)
    assert back.black_level == pytest.approx(512.0, rel=1e-6)
