"""EXIF write-back on export from RAW sources.

The reference preserves camera metadata in exports by copying it from
the source file with exiftool (python-legacy editor.py:307-355,
:345-350). RAW containers here are parsed into a plain dict, so exports
synthesize an equivalent EXIF APP1 payload
(io/image_io.build_exif_bytes) and splice it into both encode paths
(Pillow and the native baseline encoder).
"""

import dataclasses
import io

import numpy as np
from PIL import Image

EXIF = {
    "Make": "Canon",
    "Model": "Canon EOS R5",
    "ExposureTime": "1/250",
    "FNumber": "2.8",
    "ISO": "400",
    "FocalLength": "50.0",
    "LensModel": "RF50mm F1.2 L USM",
}


def test_build_exif_bytes_roundtrip():
    from rawphotoforge_tpu.io.image_io import build_exif_bytes

    b = build_exif_bytes(EXIF)
    ex = Image.Exif()
    ex.load(b)
    assert ex[271] == "Canon"
    assert ex[272] == "Canon EOS R5"
    sub = ex.get_ifd(0x8769)
    assert abs(float(sub[33434]) - 1 / 250) < 1e-9
    assert abs(float(sub[33437]) - 2.8) < 1e-6
    assert sub[34855] == 400
    assert abs(float(sub[37386]) - 50.0) < 1e-6
    assert sub[42036] == "RF50mm F1.2 L USM"


def test_build_exif_bytes_empty_and_junk():
    from rawphotoforge_tpu.io.image_io import build_exif_bytes

    assert build_exif_bytes(None) is None
    assert build_exif_bytes({}) is None
    # Nothing parseable -> nothing to write.
    assert build_exif_bytes({"ExposureTime": "garbage", "ISO": "n/a"}) is None
    # Junk numerics don't poison the valid fields.
    b = build_exif_bytes({"Make": "X", "FNumber": "n/a"})
    ex = Image.Exif()
    ex.load(b)
    assert ex[271] == "X"
    assert 33437 not in ex.get_ifd(0x8769)


def test_editor_save_bytes_carries_raw_exif(rng):
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    planes = rng.uniform(0.1, 0.9, (3, 32, 48)).astype(np.float32)
    ed = PhotoEditor(planes, exif=dict(EXIF))
    body = ed.save_bytes("JPEG")
    ex = Image.open(io.BytesIO(body)).getexif()
    assert ex.get(271) == "Canon"
    sub = ex.get_ifd(0x8769)
    assert sub[34855] == 400
    assert sub[42036] == "RF50mm F1.2 L USM"
    # Pixels are exported upright; Orientation must be normal/absent.
    assert ex.get(274, 1) == 1


def test_jpegenc_app1_splice_decodes():
    from rawphotoforge_tpu.io import jpegenc
    from rawphotoforge_tpu.io.image_io import build_exif_bytes

    planes = np.linspace(0, 1, 3 * 32 * 48, dtype=np.float32).reshape(3, 32, 48)
    body = jpegenc.encode_jpeg(planes, quality=90,
                               exif_bytes=build_exif_bytes(EXIF))
    img = Image.open(io.BytesIO(body))
    img.load()  # full decode: the spliced segment must not corrupt the scan
    assert img.size == (48, 32)
    assert img.getexif().get(272) == "Canon EOS R5"


def test_app1_splice_guards():
    from rawphotoforge_tpu.io.jpegenc import _splice_app1

    j = b"\xff\xd8rest"
    # Oversize payloads (16-bit segment length) are skipped, not truncated.
    assert _splice_app1(j, b"x" * 70000) == j
    # Non-JPEG bytes pass through untouched.
    assert _splice_app1(b"nope", b"abc") == b"nope"
    out = _splice_app1(j, b"abc")
    assert out.startswith(b"\xff\xd8\xff\xe1")
    assert b"Exif\x00\x00abc" in out


def test_batch_exports_carry_exif(tmp_path):
    from rawphotoforge_tpu.app.cli import main
    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    ind = tmp_path / "r"
    outd = tmp_path / "o"
    ind.mkdir()
    rgb = np.full((3, 32, 48), 0.5, np.float32)
    raw = dataclasses.replace(
        synthetic_raw(rgb), exif={"Make": "NikoCan", "Model": "Z9"}
    )
    (ind / "a.dng").write_bytes(write_dng(raw))
    assert main(["batch", str(ind), str(outd)]) == 0
    ex = Image.open(outd / "a.jpg").getexif()
    assert ex.get(271) == "NikoCan"
    assert ex.get(272) == "Z9"


def test_format_exif_datetime_preference():
    from rawphotoforge_tpu.io.dng import _format_exif

    both = {306: "2026:01:01 00:00:00", 36867: "2026:08:17 10:00:00"}
    assert _format_exif(both.get)["DateTime"] == "2026:08:17 10:00:00"
    only_306 = {306: "2026:01:01 00:00:00"}
    assert _format_exif(only_306.get)["DateTime"] == "2026:01:01 00:00:00"


def test_build_exif_bytes_datetime_roundtrip():
    from rawphotoforge_tpu.io.image_io import build_exif_bytes

    b = build_exif_bytes({"Make": "X", "DateTime": "2026:08:17 10:00:00"})
    ex = Image.Exif()
    ex.load(b)
    assert ex[306] == "2026:08:17 10:00:00"
    assert ex.get_ifd(0x8769)[36867] == "2026:08:17 10:00:00"


def test_write_dng_roundtrips_exif_subifd():
    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    rgb = np.full((3, 16, 24), 0.4, np.float32)
    full = dict(EXIF, DateTime="2026:08:17 11:22:33")
    raw = dataclasses.replace(synthetic_raw(rgb), exif=full)
    for compression in (1, 7, 8):
        got = read_dng(write_dng(raw, compression=compression)).exif
        assert got["Make"] == "Canon" and got["Model"] == "Canon EOS R5"
        assert got["ExposureTime"] == "1/250"
        assert float(got["FNumber"]) == 2.8
        assert got["ISO"] == "400"
        assert float(got["FocalLength"]) == 50.0
        assert got["LensModel"] == "RF50mm F1.2 L USM"
        assert got["DateTime"] == "2026:08:17 11:22:33"


def test_hdr_dng_export_carries_exif(rng):
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.io.dng import read_dng

    planes = rng.uniform(0.1, 0.9, (3, 16, 24)).astype(np.float32)
    ed = PhotoEditor(planes, exif=dict(EXIF))
    got = read_dng(ed.hdr_dng_bytes()).exif
    assert got["Make"] == "Canon" and got["ExposureTime"] == "1/250"


def test_write_dng_skips_malformed_exif_values():
    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    rgb = np.full((3, 16, 24), 0.4, np.float32)
    raw = dataclasses.replace(
        synthetic_raw(rgb),
        exif={"Make": "X", "ExposureTime": "junk", "ISO": "also junk",
              "FNumber": "1/0"},
    )
    got = read_dng(write_dng(raw)).exif
    assert got["Make"] == "X"
    assert "ExposureTime" not in got and "ISO" not in got
    assert "FNumber" not in got


def test_format_exif_mistyped_datetime_original_falls_back():
    """A truthy mis-typed DateTimeOriginal must not suppress a valid
    IFD0 DateTime string (review regression)."""
    from rawphotoforge_tpu.io.dng import _format_exif

    junk = {36867: 12345, 306: "2026:01:01 00:00:00"}
    assert _format_exif(junk.get)["DateTime"] == "2026:01:01 00:00:00"


def test_build_exif_bytes_accepts_datetime_original_key():
    """Container opens key capture time "DateTimeOriginal" (io/exif.py
    to_dict); synthesized payloads must carry it (review regression)."""
    from rawphotoforge_tpu.io.image_io import build_exif_bytes

    b = build_exif_bytes({"Make": "X",
                          "DateTimeOriginal": "2026:08:17 11:00:00"})
    ex = Image.Exif()
    ex.load(b)
    assert ex[306] == "2026:08:17 11:00:00"


def test_jpegenc_splice_resets_orientation():
    """The native fast path must reset Orientation like encode_image
    does — pixels are already upright at decode (review regression)."""
    from rawphotoforge_tpu.io.jpegenc import _splice_app1

    src = Image.Exif()
    src[271] = "RPF"
    src[274] = 6  # stored rotation from the camera
    blob = src.tobytes()

    buf = io.BytesIO()
    Image.new("RGB", (8, 8)).save(buf, format="JPEG")
    out = _splice_app1(buf.getvalue(), blob)
    ex = Image.open(io.BytesIO(out)).getexif()
    assert ex.get(271) == "RPF"
    assert ex.get(274, 1) == 1


def test_batch_preview_fallback_carries_exif(tmp_path):
    """Preview-fallback batch exports keep camera metadata: the sensor
    decode fails but the container's parsed EXIF must still reach the
    output JPEG (review regression)."""
    import struct

    from rawphotoforge_tpu.app.cli import main

    # TIFF container with EXIF tags + an embedded JPEG preview but NO
    # decodable sensor IFD -> parse_raw fails, preview fallback engages.
    pb = io.BytesIO()
    Image.new("RGB", (24, 16), (90, 120, 40)).save(pb, format="JPEG")
    preview = pb.getvalue()

    def tiff_with_preview_and_exif():
        make = b"NikoCan\x00"
        entries = []
        data_off = 8 + 2 + 12 * 4 + 4
        entries.append(struct.pack("<HHI4s", 271, 2, len(make), b"\x00" * 4))
        make_off = data_off
        entries.append(struct.pack("<HHII", 513, 4, 1,
                                   make_off + len(make)))  # JPEGInterchange
        entries.append(struct.pack("<HHII", 514, 4, 1, len(preview)))
        entries.append(struct.pack("<HHII", 256, 4, 1, 24))
        buf = struct.pack("<2sHI", b"II", 42, 8)
        buf += struct.pack("<H", 4)
        fixed = []
        for e in entries:
            tag = struct.unpack("<H", e[:2])[0]
            if tag == 271:
                fixed.append(struct.pack("<HHII", 271, 2, len(make),
                                         make_off))
            else:
                fixed.append(e)
        buf += b"".join(sorted(fixed, key=lambda x: struct.unpack("<H", x[:2])[0]))
        buf += struct.pack("<I", 0)
        buf += make + preview
        return buf

    ind = tmp_path / "r"
    outd = tmp_path / "o"
    ind.mkdir()
    (ind / "cam.nef").write_bytes(tiff_with_preview_and_exif())
    assert main(["batch", str(ind), str(outd)]) == 0
    ex = Image.open(outd / "cam.jpg").getexif()
    assert ex.get(271) == "NikoCan"


def test_mistyped_exif_pointer_does_not_abort_decode():
    """Tag 34665 stored with ASCII type must not abort the sensor decode
    of an otherwise valid DNG (review regression, reproduced)."""
    import struct

    from rawphotoforge_tpu.io import dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    rgb = np.full((3, 24, 32), 0.5, np.float32)
    data = bytearray(dng.write_dng(synthetic_raw(rgb)))
    # Rewrite the first IFD entry's tag to 34665 with ASCII type.
    (ifd0,) = struct.unpack_from("<I", data, 4)
    struct.pack_into("<HH", data, ifd0 + 2, 34665, 2)
    back = dng.read_dng(bytes(data))
    assert back.mosaic.shape == (24, 32)


def test_normalize_exif_blob_passthrough_when_upright():
    """Already-upright blobs pass through byte-identical (a PIL
    re-serialization relocates MakerNote offsets); rotated blobs get
    Orientation reset (review regression)."""
    from rawphotoforge_tpu.io.image_io import normalize_exif_blob

    up = Image.Exif()
    up[271] = "RPF"
    blob_up = up.tobytes()
    assert normalize_exif_blob(blob_up) == blob_up

    rot = Image.Exif()
    rot[271] = "RPF"
    rot[274] = 6
    out = normalize_exif_blob(rot.tobytes())
    ex = Image.Exif()
    ex.load(out)
    assert ex[274] == 1 and ex[271] == "RPF"
