"""Canon CR2 reader tests against synthetic containers built to the
public CR2 layout (4-IFD TIFF chain, sliced SOF3 RAW, Canon MakerNote
SensorInfo/ColorData)."""

import struct

import numpy as np
import pytest

from rawphotoforge_tpu.io import ljpeg
from rawphotoforge_tpu.io.cr2 import is_cr2, read_cr2, _unslice, _bayer_pattern_at
from rawphotoforge_tpu.io.dng import DngError
from rawphotoforge_tpu.io.raw import parse_raw


def build_cr2(
    mosaic_full: np.ndarray,
    slices=(1, 20, 28),
    sensor_border=(8, 4, 47, 31),   # left, top, right(incl), bottom(incl)
    wb_rggb=(2100, 1024, 1024, 1500),
    colordata_count=1312,           # ColorData7 -> WB at word 0x3F
    wb_word_offset=0x3F,
    predictor=1,
    lens_model=None,
):
    """Assemble a minimal spec-shaped CR2 around a full-sensor mosaic."""
    h, w = mosaic_full.shape
    out = bytearray(b"II\x2a\x00" + b"\x00" * 4 + b"CR\x02\x00" + b"\x00" * 4)

    def add_blob(b: bytes) -> int:
        off = len(out)
        out.extend(b)
        if len(out) % 2:
            out.append(0)
        return off

    def add_ifd(entries, next_off=0) -> int:
        off = len(out)
        out.extend(struct.pack("<H", len(entries)))
        for tag, typ, cnt, val in sorted(entries):
            out.extend(struct.pack("<HHI", tag, typ, cnt))
            if isinstance(val, int):
                out.extend(struct.pack("<I", val))
            else:
                out.extend(val.ljust(4, b"\x00")[:4])
        out.extend(struct.pack("<I", next_off))
        return off

    # Sliced sample stream: slice columns fill top-to-bottom, in stream order.
    if slices and slices[0]:
        n, w_a, w_b = slices
        parts = []
        x0 = 0
        for ws in [w_a] * n + [w_b]:
            parts.append(mosaic_full[:, x0 : x0 + ws].reshape(-1))
            x0 += ws
        stream = np.concatenate(parts)
    else:
        stream = mosaic_full.reshape(-1)
    scan = ljpeg.encode(
        stream.reshape(h, w // 2, 2), precision=14, predictor=predictor
    )
    scan_off = add_blob(scan)

    sensor_info = [17, w, h, 0, 0, *sensor_border, 0, 0, 0, 0, 0, 0, 0, 0]
    si_off = add_blob(struct.pack(f"<{len(sensor_info)}H", *sensor_info))
    cd = np.zeros(colordata_count, dtype="<u2")
    cd[wb_word_offset : wb_word_offset + 4] = wb_rggb
    cd_off = add_blob(cd.tobytes())
    maker_entries = [
        (0x00E0, 3, len(sensor_info), si_off),
        (0x4001, 3, colordata_count, cd_off),
    ]
    if lens_model:
        lm = lens_model.encode() + b"\x00"
        maker_entries.append((0x0095, 2, len(lm), add_blob(lm)))
    maker_off = add_ifd(maker_entries)
    exp_off = add_blob(struct.pack("<II", 1, 125))
    fl_off = add_blob(struct.pack("<II", 50, 1))
    exif_off = add_ifd([
        (0x829A, 5, 1, exp_off),                       # ExposureTime 1/125
        (0x8827, 3, 1, struct.pack("<H", 400)),        # ISO
        (0x920A, 5, 1, fl_off),                        # FocalLength 50mm
        (0x927C, 7, 64, maker_off),                    # MakerNote
    ])
    slice_off = add_blob(struct.pack("<3H", *slices))
    raw_ifd = add_ifd([
        (259, 3, 1, struct.pack("<H", 6)),             # Compression = old JPEG
        (273, 4, 1, scan_off),
        (279, 4, 1, struct.pack("<I", len(scan))),
        (0xC640, 3, 3, slice_off),
    ])
    make_off = add_blob(b"Canon\x00")
    model_off = add_blob(b"Canon EOS synthetic\x00")
    dt = b"2026:08:17 09:00:00\x00"
    ifd0 = add_ifd([
        (271, 2, 6, make_off),
        (272, 2, 20, model_off),
        (274, 3, 1, struct.pack("<H", 1)),
        (306, 2, len(dt), add_blob(dt)),
        (34665, 4, 1, exif_off),
    ], next_off=raw_ifd)
    struct.pack_into("<I", out, 4, ifd0)
    struct.pack_into("<I", out, 12, raw_ifd)
    return bytes(out)


@pytest.fixture
def sensor(rng):
    """Full 32x48 sensor: masked left border at ~300, active area varied."""
    m = np.full((32, 48), 300, dtype=np.uint16)
    m += rng.integers(0, 9, (32, 48)).astype(np.uint16)  # read noise
    m[4:32, 8:48] = rng.integers(300, 15000, (28, 40)).astype(np.uint16)
    return m


def test_cr2_roundtrip(sensor):
    blob = build_cr2(sensor)
    assert is_cr2(blob)
    raw = read_cr2(blob)
    np.testing.assert_array_equal(raw.mosaic, sensor[4:32, 8:48])
    assert raw.pattern == "RGGB"
    assert abs(raw.black_level - sensor[4:32, :6].mean()) < 1e-6
    assert raw.white_level == (1 << 14) - 1
    np.testing.assert_allclose(raw.wb_gains, (2100 / 1024, 1.0, 1500 / 1024))
    assert raw.exif["Make"] == "Canon"
    assert raw.exif["ExposureTime"] == "1/125"
    assert raw.exif["ISO"] == "400"


def test_cr2_multiple_slices_and_predictors(sensor):
    for slices in ((2, 16, 16), (3, 10, 18), (0, 0, 0)):
        for predictor in (1, 4):
            blob = build_cr2(sensor, slices=slices, predictor=predictor)
            raw = read_cr2(blob)
            np.testing.assert_array_equal(raw.mosaic, sensor[4:32, 8:48])


def test_cr2_colordata_variants(sensor):
    for count, word in ((582, 0x19), (796, 0x3F), (1824, 0x47),
                        (2024, 0x55), (4528, 0x69)):
        blob = build_cr2(sensor, colordata_count=count, wb_word_offset=word,
                         wb_rggb=(1800, 1000, 1000, 1400))
        raw = read_cr2(blob)
        np.testing.assert_allclose(raw.wb_gains, (1.8, 1.0, 1.4))


def test_cr2_pattern_phase():
    assert _bayer_pattern_at(0, 0) == "RGGB"
    assert _bayer_pattern_at(0, 1) == "GRBG"
    assert _bayer_pattern_at(1, 0) == "GBRG"
    assert _bayer_pattern_at(1, 1) == "BGGR"


def test_cr2_unslice_inverse(rng):
    m = rng.integers(0, 1 << 14, (16, 30)).astype(np.uint16)
    parts = [m[:, :8].reshape(-1), m[:, 8:16].reshape(-1), m[:, 16:].reshape(-1)]
    stream = np.concatenate(parts).reshape(16, 30)
    np.testing.assert_array_equal(_unslice(stream, (2, 8, 14), 16, 30), m)
    with pytest.raises(DngError):
        _unslice(stream, (2, 8, 10), 16, 30)


def test_parse_raw_dispatch(sensor):
    raw = parse_raw(build_cr2(sensor))
    assert raw.exif.get("Make") == "Canon"
    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    d = synthetic_raw(np.full((3, 16, 16), 0.4, dtype=np.float32))
    assert parse_raw(write_dng(d)).pattern == d.pattern


def test_cr2_editor_end_to_end(sensor, tmp_path):
    from rawphotoforge_tpu.engine.editor import PhotoEditor, FULL

    p = tmp_path / "shot.cr2"
    p.write_bytes(build_cr2(sensor))
    ed = PhotoEditor.open(str(p), use_pallas=False,
                          mid_long_edge=32, low_long_edge=16)
    assert ed.shape == (28, 40)
    out = np.asarray(ed.apply(FULL))
    assert out.shape == (3, 28, 40)
    assert 0.0 <= out.min() and out.max() <= 1.0
    assert ed.exif["Model"] == "Canon EOS synthetic"


def test_cr2_lens_model_and_focal_length(sensor):
    """Canon LensModel (MakerNote 0x95) and EXIF FocalLength surface in
    the exif dict, enabling lens-profile auto-resolution on CR2s."""
    raw = read_cr2(build_cr2(sensor, lens_model="EF 50mm f/1.8 II"))
    assert raw.exif["LensModel"] == "EF 50mm f/1.8 II"
    assert raw.exif.get("FocalLength", "").startswith("50")
    from rawphotoforge_tpu.io.lensdb import LensDatabase
    prof = LensDatabase.load().profile_from_exif(raw.exif)
    assert prof is not None and "50mm" in prof.name
    # Absent fields stay absent.
    raw2 = read_cr2(build_cr2(sensor))
    assert "LensModel" not in raw2.exif


def test_cr2_datetime_from_ifd0(sensor):
    """IFD0 DateTime is the fallback when DateTimeOriginal is absent
    (the synthetic fixture's EXIF sub-IFD carries no 36867)."""
    from rawphotoforge_tpu.io.cr2 import read_cr2

    raw = read_cr2(build_cr2(sensor))
    assert raw.exif["DateTime"] == "2026:08:17 09:00:00"


def test_cr2_corrupt_exif_pointer_keeps_sensor_decode(sensor):
    """A mis-pointed EXIF IFD must drop the shooting metadata, not abort
    a sensor decode whose strips are fine (the DNG walker's posture)."""
    blob = bytearray(build_cr2(sensor))
    i = blob.find(struct.pack("<HHI", 34665, 4, 1))
    assert i >= 0
    struct.pack_into("<I", blob, i + 8, 0xFFFFFFF0)
    raw = read_cr2(bytes(blob))
    # Without the EXIF IFD the Canon MakerNote (and its SensorInfo
    # borders) is gone too: the decode degrades to the full sensor
    # instead of failing outright.
    assert raw.mosaic.shape == (32, 48)
    assert raw.exif.get("Make") == "Canon"
    assert "ExposureTime" not in raw.exif
