"""Sony ARW2 + Panasonic RAW4 packed-bitstream codecs (io/vendor_packed).

Both schemes are memory-derived re-implementations of documented dcraw
behavior, so the test posture is layered (VERDICT r4 #1):
  1. encoder/decoder self-consistency (round trips, vectorized-vs-scalar
     oracles, native-vs-Python oracles),
  2. container plumbing (tags, white levels, CFA phase, needs_verification),
  3. mutation fuzz (typed errors only, never crashes or silent junk),
  4. the AUTOMATIC preview-correlation gate: a decode that disagrees with
     the file's own embedded camera preview is refused loudly and the
     open degrades to the preview fallback.
"""

import io as _io
import zlib

import numpy as np
import pytest
from PIL import Image as PILImage

from rawphotoforge_tpu._errbase import PhotoEditorError
from rawphotoforge_tpu.engine import instant
from rawphotoforge_tpu.io.dng import DngError, RawImage
from rawphotoforge_tpu.io.raw import parse_raw
from rawphotoforge_tpu.io.vendor_packed import (
    _PanaBits, _PanaBitWriter, decode_arw2, decode_arw2_py,
    decode_pana_raw4_py, encode_arw2, encode_pana_raw4, sony_arw2_curve)
from rawphotoforge_tpu.io.vendor_raw import write_rw2, write_tiff_ep

IDENT = np.arange(4096, dtype=np.uint16)


def _smooth12(rng, h, w, step=30, lo=16, hi=4095, base=1000):
    """RAW4-fixture-representable content: same-parity steps stay inside
    the sh=0 continuation window."""
    return (base + np.cumsum(rng.integers(-step, step + 1, (h, w)),
                             axis=1)).clip(lo, hi).astype(np.uint16)


# ---------------------------------------------------------------------------
# Sony ARW2 codec
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_arw2_vectorized_matches_scalar_oracle(seed):
    """The block-vectorized decoder equals the direct transliteration on
    arbitrary payloads — including degenerate blocks (imax == imin, shift
    saturation, cross-block delta reads)."""
    rng = np.random.default_rng(seed)
    h, w = 6, 128
    payload = rng.integers(0, 256, h * w, dtype=np.uint8).tobytes()
    knots = sorted(int(k) << 2 for k in rng.integers(0, 4096, 4))
    curve = sony_arw2_curve(knots)
    np.testing.assert_array_equal(
        decode_arw2(payload, w, h, curve), decode_arw2_py(payload, w, h, curve)
    )


def test_arw2_roundtrip_exact_when_blocks_fit():
    """Blocks whose range fits 7 bits (sh == 0) round-trip bit-exactly."""
    rng = np.random.default_rng(1)
    m = (600 + rng.integers(0, 120, (8, 96))).astype(np.uint16)
    dec = decode_arw2(encode_arw2(m), 96, 8, IDENT)
    np.testing.assert_array_equal(dec.astype(np.int64) >> 1, m)


def test_arw2_roundtrip_bounded_error_full_range():
    """Full-range content quantizes within (1 << sh) <= 16, extremes
    (max/min of each block) exactly — the scheme's own loss bound."""
    rng = np.random.default_rng(2)
    m = rng.integers(0, 2048, (8, 128)).astype(np.uint16)
    dec = decode_arw2(encode_arw2(m), 128, 8, IDENT).astype(np.int64) >> 1
    err = np.abs(dec - m.astype(np.int64))
    assert err.max() <= 15
    # Per-block extremes survive exactly.
    cols = (32 * np.arange(4)[:, None, None] + np.arange(2)[None, :, None]
            + 2 * np.arange(16)[None, None, :])
    px = m[:, cols.reshape(-1)].reshape(8, -1, 16)
    dx = dec[:, cols.reshape(-1)].reshape(8, -1, 16)
    np.testing.assert_array_equal(px.max(-1), dx.max(-1))
    np.testing.assert_array_equal(px.min(-1), dx.min(-1))


def test_sony_curve_semantics():
    """Slope doubling between knots; identity outside covered ranges;
    default = slope 16 everywhere; junk knots cannot crash."""
    c = sony_arw2_curve(None)
    assert c[0] == 0 and c[1] == 16 and c[4094] == 4094 * 16
    knots = [1000 << 2, 2000 << 2, 3000 << 2, 4000 << 2]
    c2 = sony_arw2_curve(knots)
    # Segment slopes: 1 up to 1000, then 2, 4, 8, 16.
    assert c2[1000] == 1000
    assert c2[2000] == 1000 + 2 * 1000
    assert c2[3000] == 3000 + 4 * 1000
    assert c2[4000] == 7000 + 8 * 1000
    assert c2[4095] == 15000 + 16 * 95
    sony_arw2_curve([0xFFFF, 0, 0xFFFF, 3])  # unsorted junk: no crash


def test_arw2_container_end_to_end():
    """write_tiff_ep(compression=32767) -> parse_raw: curve-mapped
    mosaic, Sony black/white/WB tags, needs_verification set."""
    rng = np.random.default_rng(3)
    codes = (300 + rng.integers(0, 100, (24, 96))).astype(np.uint16)
    knots = [800 << 2, 1600 << 2, 2400 << 2, 3200 << 2]
    curve = sony_arw2_curve(knots)
    raw_in = RawImage(mosaic=codes, pattern="RGGB", black_level=512,
                      white_level=int(curve[4094]), wb_gains=(2.0, 1.0, 1.5),
                      xyz_to_cam=None, exif={"Model": "ILCE-FIXTURE"})
    blob = write_tiff_ep(raw_in, bits=8, make="SONY", compression=32767,
                         sony_tags=True, arw2_curve_knots=knots)
    out = parse_raw(blob)
    np.testing.assert_array_equal(out.mosaic,
                                  curve[codes.astype(np.int64) << 1])
    assert out.pattern == "RGGB"
    assert out.needs_verification
    assert out.black_level == 512.0
    assert out.white_level == float(curve[4094])
    assert abs(out.wb_gains[0] - 2.0) < 1e-3
    assert abs(out.wb_gains[2] - 1.5) < 1e-3


def test_arw2_width_not_multiple_of_32_rejected():
    with pytest.raises(DngError):
        decode_arw2(b"\x00" * 240, 48, 5, IDENT)
    with pytest.raises(DngError):
        decode_arw2(b"\x00" * 16, 32, 4, IDENT)  # truncated payload


# ---------------------------------------------------------------------------
# Panasonic RAW4 codec
# ---------------------------------------------------------------------------


def test_pana_bit_writer_reader_inverse():
    """The writer computes the exact window positions the reader consumes
    — inverse over the canonical 128-bit group pattern, crossing block
    boundaries."""
    rng = np.random.default_rng(4)
    seq = []
    for _ in range(2500):  # > 2 blocks
        for i in range(14):
            if i % 3 == 2:
                seq.append((2, int(rng.integers(4))))
            if i in (0, 1):
                seq.append((8, int(rng.integers(1, 256))))
                seq.append((4, int(rng.integers(16))))
            else:
                seq.append((8, int(rng.integers(256))))
    wr = _PanaBitWriter()
    for n, v in seq:
        wr.put(n, v)
    rd = _PanaBits(wr.tobytes())
    assert all(rd.get(n) == v for n, v in seq)


def test_raw4_roundtrip_small_and_multiblock():
    rng = np.random.default_rng(5)
    m = _smooth12(rng, 6, 56, base=500, step=40)
    np.testing.assert_array_equal(
        decode_pana_raw4_py(encode_pana_raw4(m), 56, 6), m)
    m2 = _smooth12(rng, 40, 1400, step=50)
    enc = encode_pana_raw4(m2)
    assert len(enc) % 0x4000 == 0 and len(enc) >= 2 * 0x4000
    np.testing.assert_array_equal(decode_pana_raw4_py(enc, 1400, 40), m2)


def test_raw4_native_matches_python_oracle():
    from rawphotoforge_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(6)
    m = _smooth12(rng, 60, 700, step=45)
    enc = encode_pana_raw4(m)
    a = native.pana_decode_raw4(enc, 700, 60)
    np.testing.assert_array_equal(a, decode_pana_raw4_py(enc, 700, 60))
    np.testing.assert_array_equal(a, m)
    # Truncated stream: same typed error as the oracle.
    with pytest.raises(DngError):
        native.pana_decode_raw4(enc[: 0x4000], 700, 60)
    with pytest.raises(DngError):
        decode_pana_raw4_py(enc[: 0x4000], 700, 60)


def test_raw4_container_end_to_end():
    """write_rw2(raw_format=4) -> parse_raw: bit-exact mosaic, RW2 tag
    plumbing (black +15, CFA, WB), needs_verification set — and the
    RawFormat tag takes precedence over the payload-size heuristic
    (a tiny packed payload is LARGER than its plain-16-bit size)."""
    rng = np.random.default_rng(7)
    m = _smooth12(rng, 28, 56, base=500, step=30)
    raw_in = RawImage(mosaic=m, pattern="GBRG", black_level=142 + 15,
                      white_level=4095, wb_gains=(1.8, 1.0, 1.4),
                      xyz_to_cam=None, exif={"Model": "DMC-FIXTURE"})
    blob = write_rw2(raw_in, raw_format=4)
    assert len(blob) > m.size * 2  # the precedence case, by construction
    out = parse_raw(blob)
    np.testing.assert_array_equal(out.mosaic, m)
    assert out.pattern == "GBRG"
    assert out.needs_verification
    assert out.black_level == 157.0
    assert abs(out.wb_gains[0] - 1.8) < 2e-3
    assert out.wb_known


def test_raw4_14bit_still_rejected():
    """The 14-bit v5/v6 entropy streams keep the typed-rejection posture
    (no offline ground truth)."""
    rng = np.random.default_rng(8)
    m = _smooth12(rng, 12, 28)
    raw_in = RawImage(mosaic=m, pattern="RGGB", black_level=15,
                      white_level=4095, wb_gains=(1.0, 1.0, 1.0),
                      xyz_to_cam=None, exif={})
    blob = bytearray(write_rw2(raw_in, raw_format=4))
    # Patch the bits tag (0x000A) value to 14 in place.
    import struct

    n = struct.unpack_from("<H", blob, 8)[0]
    for k in range(n):
        off = 10 + 12 * k
        tag, typ, cnt = struct.unpack_from("<HHI", blob, off)
        if tag == 0x000A:
            struct.pack_into("<H", blob, off + 8, 14)
    with pytest.raises(DngError, match="v5/v6"):
        parse_raw(bytes(blob))


# ---------------------------------------------------------------------------
# Mutation fuzz: malformed packed containers raise typed errors only.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fmt", ["arw2", "raw4"])
def test_packed_mutations_raise_typed_errors(fmt):
    rng_m = np.random.default_rng(9)
    if fmt == "arw2":
        codes = (300 + rng_m.integers(0, 100, (12, 64))).astype(np.uint16)
        raw_in = RawImage(mosaic=codes, pattern="RGGB", black_level=512,
                          white_level=16300, wb_gains=(2.0, 1.0, 1.5),
                          xyz_to_cam=None, exif={})
        data = write_tiff_ep(raw_in, bits=8, make="SONY", compression=32767,
                             sony_tags=True,
                             arw2_curve_knots=[4000, 8000, 12000, 16000])
    else:
        m = _smooth12(rng_m, 14, 28)
        raw_in = RawImage(mosaic=m, pattern="RGGB", black_level=15,
                          white_level=4095, wb_gains=(1.0, 1.0, 1.0),
                          xyz_to_cam=None, exif={})
        data = write_rw2(raw_in, raw_format=4)
    parse_raw(data)  # the unmutated fixture decodes

    rng = np.random.default_rng(zlib.crc32(fmt.encode()))
    for trial in range(90):
        buf = bytearray(data)
        kind = trial % 3
        if kind == 0:
            buf = buf[: int(rng.integers(1, len(buf)))]
        elif kind == 1:
            for _ in range(int(rng.integers(1, 8))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        else:
            a = int(rng.integers(0, len(buf) - 1))
            b = min(len(buf), a + int(rng.integers(1, 64)))
            buf[a:b] = bytes(b - a)
        try:
            parse_raw(bytes(buf))
        except PhotoEditorError:
            pass  # typed rejection is the contract
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"trial {trial}: non-typed {type(e).__name__}: {e}")


# ---------------------------------------------------------------------------
# The automatic preview-correlation gate (parse_raw).
# ---------------------------------------------------------------------------


def _scene_raw(rng):
    h, w = 112, 140
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    scene = 600 + 800 * np.sin(xx / 40) ** 2 + 900 * (yy / h)
    m = np.clip(scene + rng.integers(-15, 16, (h, w)), 16, 4095
                ).astype(np.uint16)
    return RawImage(mosaic=m, pattern="RGGB", black_level=15,
                    white_level=4095, wb_gains=(1.0, 1.0, 1.0),
                    xyz_to_cam=None, exif={"Model": "DMC-FIXTURE"})


def _jpeg(arr_u8):
    buf = _io.BytesIO()
    PILImage.fromarray(arr_u8).save(buf, "JPEG", quality=92)
    return buf.getvalue()


def test_gate_accepts_consistent_preview():
    rng = np.random.default_rng(10)
    raw_in = _scene_raw(rng)
    blob = write_rw2(raw_in, raw_format=4,
                     jpg_from_raw=_jpeg(instant.quick_from_raw(raw_in, 128)))
    out = parse_raw(blob)  # gate runs (preview present) and passes
    np.testing.assert_array_equal(out.mosaic, raw_in.mosaic)


def test_gate_refuses_mismatched_decode_and_editor_falls_back():
    """A decode that does not correlate with the camera's own preview is
    refused with a typed error, and PhotoEditor opens the preview
    instead — loudly (opened_from_preview carries the gate message)."""
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    rng = np.random.default_rng(11)
    raw_in = _scene_raw(rng)
    noise = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    blob = write_rw2(raw_in, raw_format=4, jpg_from_raw=_jpeg(noise))
    with pytest.raises(DngError, match="correlation gate"):
        parse_raw(blob)
    ed = PhotoEditor.from_bytes(blob, "DNG", use_pallas=False,
                                mid_long_edge=48, low_long_edge=24)
    assert ed.opened_from_preview is not None
    assert "correlation gate" in str(ed.opened_from_preview)


def test_gate_skipped_without_preview():
    """Fixtures without an embedded preview decode unverified (every real
    camera writes one; info --verify-decode stays the explicit check)."""
    rng = np.random.default_rng(12)
    raw_in = _scene_raw(rng)
    out = parse_raw(write_rw2(raw_in, raw_format=4))
    np.testing.assert_array_equal(out.mosaic, raw_in.mosaic)


def test_arw2_native_matches_oracles():
    from rawphotoforge_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(13)
    h, w = 10, 160
    payload = rng.integers(0, 256, h * w, dtype=np.uint8).tobytes()
    curve = sony_arw2_curve(
        [int(k) << 2 for k in sorted(rng.integers(0, 4096, 4))])
    a = native.arw2_decode(payload, w, h, curve)
    np.testing.assert_array_equal(a, decode_arw2_py(payload, w, h, curve))
    np.testing.assert_array_equal(a, decode_arw2(payload, w, h, curve))


def test_convert_packed_vendor_to_dng(tmp_path):
    """`cli convert` transcodes ARW2 and RAW4 sources to lossless DNG:
    the DECODED sensor values (the curve-mapped / unpacked domain — the
    packed streams are lossy codecs, so this is the archival form) carry
    over bit-identically with black/white/WB preserved."""
    from rawphotoforge_tpu.app.cli import main
    from rawphotoforge_tpu.io.dng import read_dng

    rng = np.random.default_rng(17)
    codes = (300 + rng.integers(0, 100, (24, 96))).astype(np.uint16)
    knots = [800 << 2, 1600 << 2, 2400 << 2, 3200 << 2]
    curve = sony_arw2_curve(knots)
    arw = RawImage(mosaic=codes, pattern="RGGB", black_level=512,
                   white_level=int(curve[4094]), wb_gains=(2.0, 1.0, 1.5),
                   xyz_to_cam=None, exif={"Model": "ILCE-FIXTURE"})
    src = tmp_path / "t.arw"
    dst = tmp_path / "t.dng"
    src.write_bytes(write_tiff_ep(arw, bits=8, make="SONY",
                                  compression=32767, sony_tags=True,
                                  arw2_curve_knots=knots))
    assert main(["convert", str(src), str(dst)]) == 0
    got = read_dng(dst.read_bytes())
    np.testing.assert_array_equal(got.mosaic,
                                  curve[codes.astype(np.int64) << 1])
    assert got.black_level == 512.0
    assert abs(got.wb_gains[0] - 2.0) < 1e-3

    m = _smooth12(rng, 28, 56, base=500, step=30)
    rw2 = RawImage(mosaic=m, pattern="GBRG", black_level=157,
                   white_level=4095, wb_gains=(1.8, 1.0, 1.4),
                   xyz_to_cam=None, exif={"Model": "DMC-FIXTURE"})
    src2 = tmp_path / "t.rw2"
    dst2 = tmp_path / "t2.dng"
    src2.write_bytes(write_rw2(rw2, raw_format=4))
    assert main(["convert", str(src2), str(dst2)]) == 0
    got2 = read_dng(dst2.read_bytes())
    np.testing.assert_array_equal(got2.mosaic, m)
    assert got2.pattern == "GBRG"
