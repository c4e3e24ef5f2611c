"""Embedded JPEG preview extraction (io/dng.extract_preview).

RAW containers embed rendered previews; the extractor must return the
largest decodable JPEG, skip CFA image data, and never raise on garbage.
"""

import io
import struct

import numpy as np
from PIL import Image as PILImage

from rawphotoforge_tpu.io import dng


def _jpeg(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    PILImage.fromarray(img).save(buf, format="JPEG", quality=85)
    return buf.getvalue()


def _tiff_with_previews(big_jpeg, small_jpeg):
    """IFD0 = Compression-7 YCbCr preview strip; IFD1 = EXIF thumbnail
    (JPEGInterchangeFormat tags)."""
    def ifd(entries, next_off):
        out = struct.pack("<H", len(entries))
        for tag, typ, n, val in entries:
            out += struct.pack("<HHI", tag, typ, n)
            out += struct.pack("<I", val) if typ == 4 else \
                struct.pack("<HH", val, 0)
        return out + struct.pack("<I", next_off)

    ifd0_entries = 6
    ifd1_entries = 2
    ifd0_off = 8
    ifd1_off = ifd0_off + 2 + ifd0_entries * 12 + 4
    data_off = ifd1_off + 2 + ifd1_entries * 12 + 4
    big_off = data_off
    small_off = big_off + len(big_jpeg)

    ifd0 = ifd(
        [
            (256, 4, 1, 160), (257, 4, 1, 120), (259, 3, 1, 7),
            (262, 3, 1, 6),  # YCbCr
            (273, 4, 1, big_off), (279, 4, 1, len(big_jpeg)),
        ],
        ifd1_off,
    )
    ifd1 = ifd(
        [(513, 4, 1, small_off), (514, 4, 1, len(small_jpeg))], 0
    )
    return (b"II" + struct.pack("<HI", 42, ifd0_off) + ifd0 + ifd1
            + big_jpeg + small_jpeg)


def test_largest_preview_wins_and_decodes():
    big = _jpeg(120, 160, seed=1)
    small = _jpeg(24, 32, seed=2)
    data = _tiff_with_previews(big, small)
    got = dng.extract_preview(data)
    assert got == big
    assert PILImage.open(io.BytesIO(got)).size == (160, 120)


def test_exif_thumbnail_found_when_alone():
    small = _jpeg(24, 32, seed=3)
    data = _tiff_with_previews(b"\x00" * 10, small)  # IFD0 strip not a JPEG
    assert dng.extract_preview(data) == small


def test_cfa_dng_without_preview_returns_none():
    raw = dng.RawImage(
        mosaic=np.random.default_rng(0).integers(
            0, 4000, size=(16, 16), dtype=np.uint16),
        pattern="RGGB", black_level=0.0, white_level=16383.0,
        wb_gains=(1.0, 1.0, 1.0), xyz_to_cam=None,
    )
    assert dng.extract_preview(dng.write_dng(raw)) is None


def test_garbage_returns_none():
    assert dng.extract_preview(b"not a tiff at all") is None
    assert dng.extract_preview(b"II" + b"\xff" * 40) is None


def test_cli_info_preview_flag(tmp_path, capsys):
    from rawphotoforge_tpu.app.cli import main

    big = _jpeg(60, 80, seed=5)
    # Wrap the preview container around a real decodable CFA DNG so the
    # info command itself still works: append preview IFDs is complex, so
    # use the preview-only fixture for extraction and a DNG for info.
    p = tmp_path / "x.dng"
    p.write_bytes(_tiff_with_previews(big, _jpeg(10, 12, seed=6)))
    out = tmp_path / "prev.jpg"
    rc = main(["info", str(p), "--preview", str(out)])
    assert rc != 0 or out.exists()  # extraction happens before decode
    assert out.read_bytes() == big
