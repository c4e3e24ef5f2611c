"""Tier-2 vendor RAW coverage (VERDICT r3 #3, narrowing PARITY G1):

* lossless-JPEG (SOF3, Compression=7) TIFF-EP strips — the Sony
  lossless-class layout — decode through the generic walker + io/ljpeg;
* ORF ('RO'/'SR' TIFF magics), PEF, SRW, 3FR uncompressed/packed
  variants through the same TIFF-EP walker;
* Pentax/Olympus MakerNote black/WB extraction (parse_makernote_wb,
  formulas from dcraw/exiftool; real files stay gated by
  preview_correlation).

Same recipe as round 3: writer-side fixtures, bit-exact round trips,
mutation soak, gray-world fallback where no WB is parseable.
"""

import dataclasses
import struct

import numpy as np
import pytest

from rawphotoforge_tpu._errbase import PhotoEditorError
from rawphotoforge_tpu.io import vendor_raw as vr
from rawphotoforge_tpu.io.raw import parse_raw, synthetic_raw

from test_vendor_raw import preview_jpeg, scene


# -- lossless-JPEG (Sony lossless class) ------------------------------------

@pytest.mark.parametrize("bits,pattern", [(14, "RGGB"), (12, "BGGR")])
def test_tiff_ep_lossless_jpeg_roundtrip(bits, pattern):
    white = (1 << bits) - 1
    raw = synthetic_raw(scene(), pattern=pattern, black_level=white // 25,
                        white_level=white - 10)
    data = vr.write_tiff_ep(raw, bits=bits, make="SONY", sony_tags=True,
                            compression=7)
    got = parse_raw(data)
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    assert got.pattern == pattern
    assert got.wb_known
    assert got.black_level == pytest.approx(raw.black_level)
    np.testing.assert_allclose(got.wb_gains, raw.wb_gains, atol=1e-3)


def test_tiff_ep_lossless_jpeg_preview_gate():
    """The silent-wrong detector accepts a correct SOF3 decode."""
    img = scene(h=48, w=64, seed=7)
    raw = synthetic_raw(img, pattern="RGGB", black_level=200,
                        white_level=16000)
    data = vr.write_tiff_ep(raw, bits=14, make="SONY", sony_tags=True,
                            compression=7, preview_jpeg=preview_jpeg(img))
    corr = vr.preview_correlation(data)
    assert corr is not None and corr > 0.9, corr


# -- ORF / SRW / PEF / 3FR container shapes ---------------------------------

@pytest.mark.parametrize("magic,make,bits", [
    (0x4F52, "OLYMPUS IMAGING CORP.", 12),   # ORF 'RO'
    (0x5352, "OLYMPUS CORPORATION", 16),     # ORF 'SR'
    (42, "SAMSUNG", 12),                     # SRW (plain TIFF magic)
    (42, "PENTAX", 12),                      # PEF
    (42, "Hasselblad", 16),                  # 3FR
])
def test_vendor_tiff_ep_variants_roundtrip(magic, make, bits):
    white = (1 << bits) - 1
    raw = synthetic_raw(scene(seed=3), pattern="RGGB",
                        black_level=white // 40, white_level=white - 5)
    data = vr.write_tiff_ep(raw, bits=bits, make=make, magic=magic)
    got = parse_raw(data)
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    assert got.pattern == "RGGB"
    assert got.exif.get("Make") == make
    # No parseable WB: flagged so develop estimates gray-world gains.
    assert not got.wb_known


# -- MakerNote WB/black (Pentax AOC, Olympus new-style) ---------------------

def _pentax_makernote(abs_off, black=(80, 82, 81, 83),
                      white=(8200, 4096, 4096, 6900)):
    """'AOC\\x00' + II + IFD whose out-of-line values sit at
    FILE-ABSOLUTE offsets (the PEF convention parse_makernote_wb
    implements)."""
    base = abs_off + 6          # absolute offset of the IFD
    vals_off = base + 2 + 2 * 12 + 4   # after count + 2 entries + next
    ifd = struct.pack("<H", 2)
    ifd += struct.pack("<HHII", 0x0200, 3, 4, vals_off)
    ifd += struct.pack("<HHII", 0x0201, 3, 4, vals_off + 8)
    ifd += struct.pack("<I", 0)
    vals = struct.pack("<4H", *black) + struct.pack("<4H", *white)
    return b"AOC\x00" + b"II" + ifd + vals


def _olympus_makernote(rb=(436, 372), black=(64, 64, 66, 62)):
    """New-style 'OLYMPUS\\x00II' note: self-relative offsets, 0x2040
    ImageProcessing sub-IFD with 0x0100 WB_RBLevels (x256) and 0x0600
    BlackLevel2."""
    header = b"OLYMPUS\x00II\x03\x00"          # 12 bytes
    ifd_off = 12
    sub_off = ifd_off + 2 + 1 * 12 + 4         # right after the outer IFD
    outer = struct.pack("<H", 1)
    outer += struct.pack("<HHII", 0x2040, 13, 1, sub_off)
    outer += struct.pack("<I", 0)
    bl_off = sub_off + 2 + 2 * 12 + 4
    sub = struct.pack("<H", 2)
    sub += struct.pack("<HHI", 0x0100, 3, 2) + struct.pack("<2H", *rb)
    sub += struct.pack("<HHII", 0x0600, 3, 4, bl_off)
    sub += struct.pack("<I", 0)
    return header + outer + sub + struct.pack("<4H", *black)


def test_pef_makernote_wb_and_black():
    raw = synthetic_raw(scene(seed=5), pattern="RGGB", black_level=0,
                        white_level=4095)
    data = vr.write_tiff_ep(raw, bits=12, make="PENTAX Corporation",
                            makernote=_pentax_makernote)
    got = parse_raw(data)
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    assert got.wb_known
    assert got.black_level == pytest.approx(81.5)
    np.testing.assert_allclose(
        got.wb_gains, (8200 / 4096, 1.0, 6900 / 4096), atol=1e-6)


def test_orf_makernote_wb_and_black():
    raw = synthetic_raw(scene(seed=6), pattern="RGGB", black_level=0,
                        white_level=4095)
    data = vr.write_tiff_ep(raw, bits=12, make="OLYMPUS IMAGING CORP.",
                            magic=0x4F52, makernote=_olympus_makernote())
    got = parse_raw(data)
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    assert got.wb_known
    assert got.black_level == pytest.approx(64.0)
    np.testing.assert_allclose(
        got.wb_gains, (436 / 256, 1.0, 372 / 256), atol=1e-6)


def test_dng_tags_win_over_makernote():
    """Standard AsShotNeutral/BlackLevel (when present) take precedence
    over MakerNote-derived values."""
    raw = synthetic_raw(scene(seed=8), pattern="RGGB", black_level=100,
                        white_level=16000, wb_gains=(1.9, 1.0, 1.3))
    data = vr.write_tiff_ep(raw, bits=16, make="SONY", sony_tags=True,
                            makernote=_olympus_makernote())
    got = parse_raw(data)
    assert got.black_level == pytest.approx(100.0)
    np.testing.assert_allclose(got.wb_gains, (1.9, 1.0, 1.3), atol=1e-3)


def test_makernote_garbage_is_ignored():
    """A corrupt/unknown MakerNote never aborts the decode — it just
    yields no WB (gray-world flag)."""
    raw = synthetic_raw(scene(seed=9), pattern="RGGB", black_level=0,
                        white_level=4095)
    for blob in (b"JUNKJUNKJUNK", b"AOC\x00II" + b"\xff" * 30,
                 b"OLYMPUS\x00II\x03\x00" + b"\xff" * 20):
        data = vr.write_tiff_ep(raw, bits=12, make="PENTAX",
                                makernote=blob)
        got = parse_raw(data)
        np.testing.assert_array_equal(got.mosaic, raw.mosaic)
        assert not got.wb_known


# -- mutation soak over the new shapes --------------------------------------

def test_tier2_container_mutation_fuzz():
    img = scene(h=24, w=32)
    raw12 = synthetic_raw(img, pattern="RGGB", black_level=0,
                          white_level=4095)
    fixtures = [
        vr.write_tiff_ep(raw12, bits=12, make="SONY", sony_tags=True,
                         compression=7),
        vr.write_tiff_ep(raw12, bits=12, make="OLYMPUS", magic=0x4F52,
                         makernote=_olympus_makernote()),
        vr.write_tiff_ep(raw12, bits=12, make="PENTAX",
                         makernote=_pentax_makernote),
    ]
    rng = np.random.default_rng(13)
    for data in fixtures:
        buf = np.frombuffer(data, dtype=np.uint8).copy()
        for cut in (4, 17, 100, len(data) // 2, len(data) - 3):
            try:
                parse_raw(bytes(buf[:cut]))
            except PhotoEditorError:
                pass
        for _ in range(40):
            mut = buf.copy()
            k = int(rng.integers(1, 8))
            idx = rng.integers(0, len(mut), size=k)
            mut[idx] = rng.integers(0, 256, size=k)
            try:
                got = parse_raw(bytes(mut))
                assert got.mosaic.size > 0
            except PhotoEditorError:
                pass  # typed rejection is the contract


def test_convert_tier2_vendor_to_dng(tmp_path):
    """`cli convert` transcodes tier-2 vendor RAWs (ORF-magic, PEF with
    MakerNote WB) to lossless DNG with the mosaic bit-identical and the
    MakerNote-derived black/WB carried into the DNG develop path."""
    from rawphotoforge_tpu.app.cli import main
    from rawphotoforge_tpu.io.dng import read_dng

    raw = synthetic_raw(scene(seed=21), pattern="RGGB", black_level=0,
                        white_level=4095)
    src = tmp_path / "t.orf"
    dst = tmp_path / "t.dng"
    src.write_bytes(vr.write_tiff_ep(raw, bits=12, make="OLYMPUS",
                                     magic=0x4F52,
                                     makernote=_olympus_makernote()))
    assert main(["convert", str(src), str(dst), "--tile", "32x32"]) == 0
    got = read_dng(dst.read_bytes())
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    assert got.pattern == "RGGB"


@pytest.mark.parametrize("ext,make", [
    (".kdc", "KODAK"), (".dcr", "KODAK"), (".erf", "EPSON"),
    (".mef", "Mamiya"), (".mos", "Leaf"), (".iiq", "Phase One"),
    (".nrw", "NIKON"), (".rwl", "LEICA"), (".sr2", "SONY"),
])
def test_registry_extensions_route_through_walker(tmp_path, ext, make):
    """Every TIFF-structured extension in the registry opens end-to-end:
    uncompressed TIFF-EP sensor data under any of these names decodes
    through the generic walker (the r3 NEF/ARW plumbing is
    vendor-agnostic), and PhotoEditor.open develops it."""
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.io.raw import is_raw_image, parse_raw

    raw = synthetic_raw(scene(seed=7), pattern="RGGB", black_level=64,
                        white_level=4095)
    p = tmp_path / ("t" + ext)
    p.write_bytes(vr.write_tiff_ep(raw, bits=12, make=make))
    assert is_raw_image(str(p))
    got = parse_raw(p.read_bytes())
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    ed = PhotoEditor.open(str(p), use_pallas=False,
                          mid_long_edge=48, low_long_edge=24)
    assert ed.opened_from_preview is None
    assert ed.shape == raw.mosaic.shape
