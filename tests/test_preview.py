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


def test_editor_preview_fallback(tmp_path):
    """An un-decodable vendor RAW with an embedded preview opens as an
    editable session on the preview, with the decode error recorded."""
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu._errbase import PhotoEditorError
    import pytest as _pytest

    big = _jpeg(60, 80, seed=7)
    p = tmp_path / "vendor.nef"
    p.write_bytes(_tiff_with_previews(big, _jpeg(10, 12, seed=8)))

    ed = PhotoEditor.open(str(p))
    assert ed.opened_from_preview  # the DngError text
    assert ed.shape == (60, 80)
    ed.set_tone(exposure=0.5)
    assert ed.apply().shape == (3, 60, 80)

    with _pytest.raises(PhotoEditorError):
        PhotoEditor.open(str(p), preview_fallback=False)


def test_server_open_preview_fallback():
    import json as _json

    from rawphotoforge_tpu.app import server as srv

    big = _jpeg(40, 50, seed=9)
    blob = _tiff_with_previews(big, _jpeg(8, 10, seed=10))
    # Drive the handler logic at the function level via a live server.
    import threading
    import urllib.request

    import jax.numpy as jnp

    from rawphotoforge_tpu.engine.editor import PhotoEditor

    httpd = srv.serve(PhotoEditor(jnp.ones((3, 16, 16)) * 0.5), port=0,
                      prewarm=False)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/open?name=shot.nef", data=blob,
            method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            out = _json.loads(r.read())
        assert out["ok"] is True
        assert out["opened_from_preview"]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/preview?level=full", timeout=60
        ) as r:
            from PIL import Image as _PILImage

            img = _PILImage.open(io.BytesIO(r.read()))
        assert img.size == (50, 40)
    finally:
        httpd.shutdown()


def test_undecodable_soi_strip_rejected_as_preview():
    """A strip with a valid SOI marker but an undecodable body must be
    rejected by the Pillow full-decode validation (review finding:
    SOI-only checks accepted such strips, crashing callers later). A
    decodable smaller candidate is chosen instead."""
    truncated = _jpeg(60, 80, seed=12)[:60]  # valid SOI, cut-off body
    ok = _jpeg(10, 12, seed=13)
    data = _tiff_with_previews(truncated, ok)
    assert dng.extract_preview(data) == ok
    # With no decodable candidate at all: None, no exception.
    data = _tiff_with_previews(truncated, b"\xff\xd8garbage")
    assert dng.extract_preview(data) is None


def test_decode_embedded_preview_typed_errors():
    from rawphotoforge_tpu.io.raw import decode_embedded_preview

    assert decode_embedded_preview(b"garbage") is None
    big = _jpeg(20, 30, seed=11)
    res = decode_embedded_preview(_tiff_with_previews(big, b"\x00" * 4))
    assert res is not None and res[0].shape == (3, 20, 30)


def test_cli_info_preview_fallback_succeeds(tmp_path, capsys):
    """`info` on a vendor-codec RAW reports the embedded preview's
    dimensions instead of failing (review finding)."""
    from rawphotoforge_tpu.app.cli import main

    p = tmp_path / "vendor.nef"
    p.write_bytes(_tiff_with_previews(_jpeg(30, 44, seed=20),
                                      _jpeg(6, 8, seed=21)))
    rc = main(["info", str(p)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "44x30" in out and "embedded camera preview" in out


def test_write_dng_embeds_preview():
    """write_dng(preview_jpeg=...) emits a standard preview-IFD0 +
    SubIFDs layout: our extractor finds the preview, the reader still
    finds the CFA data, and `convert` carries previews through."""
    from rawphotoforge_tpu.io.raw import synthetic_raw

    rng = np.random.default_rng(0)
    rgb = np.clip(rng.random((3, 24, 32)), 0, 1).astype(np.float32)
    raw = synthetic_raw(rgb)
    jpeg = _jpeg(12, 16, seed=30)
    data = dng.write_dng(raw, compression=7, preview_jpeg=jpeg)
    assert dng.extract_preview(data) == jpeg
    back = dng.read_dng(data)
    np.testing.assert_array_equal(back.mosaic, raw.mosaic)
    assert back.pattern == raw.pattern
    # Odd-length previews keep the raw IFD word-aligned.
    jpeg_odd = jpeg + b"" if len(jpeg) % 2 else jpeg[:-1]
    data = dng.write_dng(raw, preview_jpeg=jpeg_odd)
    np.testing.assert_array_equal(dng.read_dng(data).mosaic, raw.mosaic)


def test_cli_convert_carries_preview(tmp_path, capsys):
    from rawphotoforge_tpu.app.cli import main
    from rawphotoforge_tpu.io.raw import synthetic_raw

    # Build a source DNG that itself embeds a preview.
    rng = np.random.default_rng(1)
    rgb = np.clip(rng.random((3, 24, 32)), 0, 1).astype(np.float32)
    jpeg = _jpeg(12, 16, seed=31)
    src = tmp_path / "in.dng"
    src.write_bytes(dng.write_dng(synthetic_raw(rgb), preview_jpeg=jpeg))
    out = tmp_path / "out.dng"
    assert main(["convert", str(src), str(out), "--codec", "deflate"]) == 0
    assert dng.extract_preview(out.read_bytes()) == jpeg
    a = dng.read_dng(src.read_bytes())
    b = dng.read_dng(out.read_bytes())
    np.testing.assert_array_equal(a.mosaic, b.mosaic)


# ---- non-TIFF vendor containers (io/vendor_preview) -----------------------

def _raf(jpeg, good_pointer=True):
    """Minimal Fujifilm RAF: magic header + (offset, length) at byte 84."""
    head = bytearray(148)
    head[0:16] = b"FUJIFILMCCD-RAW "
    head[16:20] = b"0201"
    head[28:60] = b"X-T5".ljust(32, b"\x00")
    if good_pointer:
        struct.pack_into(">II", head, 84, 148, len(jpeg))
    return bytes(head) + jpeg


def _box(fourcc, payload):
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _cr3(prvw_jpeg, mdat_jpeg, thumb_jpeg=None):
    """Minimal CR3-shaped BMFF: ftyp + uuid(PRVW) [+ moov>uuid(THMB)]
    + mdat led by the full-size JPEG chunk."""
    ftyp = _box(b"ftyp", b"crx \x00\x00\x00\x01isomcrx ")
    prvw = _box(b"PRVW", b"\x00" * 12 + struct.pack(">I", len(prvw_jpeg))
                + prvw_jpeg)
    uuid_prvw = _box(b"uuid",
                     bytes.fromhex("eaf42b5e1c984b88b9fbb7dc406e4d16")
                     + b"\x00" * 8 + prvw)
    parts = [ftyp, uuid_prvw]
    if thumb_jpeg is not None:
        thmb = _box(b"THMB", b"\x00" * 12 + thumb_jpeg)
        inner = _box(b"uuid",
                     bytes.fromhex("85c0b687820f11e08111f4ce462b6a48")
                     + thmb)
        parts.append(_box(b"moov", inner))
    parts.append(_box(b"mdat", mdat_jpeg + b"\x00" * 512))  # sensor payload
    return b"".join(parts)


def test_raf_preview_pointer():
    jpeg = _jpeg(20, 28, seed=41)
    assert dng.extract_preview(_raf(jpeg)) == jpeg


def test_raf_preview_scan_fallback():
    jpeg = _jpeg(20, 28, seed=42)
    got = dng.extract_preview(_raf(jpeg, good_pointer=False))
    # Scan finds the SOI; the slice runs to region end, and must decode
    # to the same pixels.
    assert got is not None and got.startswith(b"\xff\xd8\xff")
    a = PILImage.open(io.BytesIO(got))
    a.load()
    assert a.size == (28, 20)


def test_cr3_prefers_fullsize_mdat_jpeg():
    small, big = _jpeg(10, 14, seed=43), _jpeg(40, 56, seed=44)
    got = dng.extract_preview(_cr3(small, big, thumb_jpeg=_jpeg(6, 8)))
    img = PILImage.open(io.BytesIO(got))
    img.load()
    assert img.size == (56, 40)


def test_cr3_uuid_preview_when_mdat_opaque():
    small = _jpeg(10, 14, seed=45)
    data = _cr3(small, b"\x00" * 4096)  # mdat holds no leading JPEG
    got = dng.extract_preview(data)
    img = PILImage.open(io.BytesIO(got))
    img.load()
    assert img.size == (14, 10)


def test_vendor_garbage_returns_none():
    assert dng.extract_preview(b"FUJIFILMCCD-RAW " + b"\x00" * 64) is None
    assert dng.extract_preview(b"\x00\x00\x00\x08ftyp" + b"\x00" * 32) is None
    assert dng.extract_preview(b"\x00\x00\x00\x01ftyp") is None  # bad size64


def test_editor_opens_cr3_and_raf_via_preview(tmp_path):
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    jpeg = _jpeg(24, 32, seed=46)
    for name, blob in (("a.cr3", _cr3(_jpeg(8, 10), jpeg)),
                       ("b.raf", _raf(jpeg))):
        p = tmp_path / name
        p.write_bytes(blob)
        ed = PhotoEditor.open(str(p))
        assert ed.opened_from_preview  # sensor decode is a non-goal here
        assert ed.shape == (24, 32)


def test_vendor_extractor_fuzz_never_raises():
    rng = np.random.default_rng(7)
    base_raf = _raf(_jpeg(12, 16, seed=47))
    base_cr3 = _cr3(_jpeg(8, 10, seed=48), _jpeg(16, 20, seed=49))
    for base in (base_raf, base_cr3):
        for _ in range(150):
            b = bytearray(base)
            for _ in range(rng.integers(1, 8)):
                b[rng.integers(0, len(b))] = rng.integers(0, 256)
            cut = rng.integers(0, len(b) + 1)
            dng.extract_preview(bytes(b))        # whole mutant
            dng.extract_preview(bytes(b[:cut]))  # truncated mutant


def test_rw2_jpgfromraw_tag():
    """Panasonic RW2 stores a complete JPEG as IFD0 tag 0x002E."""
    jpeg = _jpeg(18, 24, seed=51)
    entry = struct.pack("<HHI", 0x002E, 7, len(jpeg))  # UNDEFINED
    data_off = 8 + 2 + 12 + 4
    ifd0 = struct.pack("<H", 1) + entry + struct.pack("<I", data_off) \
        + struct.pack("<I", 0)
    blob = b"II" + struct.pack("<H", 0x55) + struct.pack("<I", 8) \
        + ifd0 + jpeg
    assert dng.extract_preview(blob) == jpeg


def _x3f(sections, sensor_noise=b""):
    """Minimal Sigma X3F: FOVb header, optional opaque sensor payload,
    image sections, SECd directory, footer pointer. ``sections`` is a
    list of (entry_type, format, jpeg_bytes)."""
    blob = bytearray(b"FOVb" + struct.pack("<I", 0x00020003) + b"\x00" * 32)
    blob += sensor_noise
    entries = []
    for typ, fmt, payload in sections:
        off = len(blob)
        # SECi header is 28 bytes: magic, version, type, format,
        # columns, rows, rowSize.
        sec = (b"SECi" + struct.pack("<IIIIII", 0x00020003, 2, fmt,
                                     22, 16, 0) + payload)
        blob += sec
        entries.append((off, len(sec), typ))
    dir_off = len(blob)
    blob += b"SECd" + struct.pack("<II", 0x00020003, len(entries))
    for off, ln, typ in entries:
        blob += struct.pack("<II", off, ln) + typ
    blob += struct.pack("<I", dir_off)
    return bytes(blob)


def _fake_soi_noise(n_soi=12, seed=8):
    """Opaque payload salted with MANY undecodable SOI markers — a blind
    scan's candidate budget dies here."""
    rng = np.random.default_rng(seed)
    noise = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    noise = noise.replace(b"\xff\xd8", b"\x00\x00")
    return (b"\xff\xd8\xff\x00BAD!" + noise[:256]) * n_soi + noise


def test_x3f_directory_walk_finds_preview_past_fake_sois():
    """The structured X3F path reads the footer directory and goes
    straight to the IMA2/IMAG JPEG sections — even when the sensor
    payload before them carries more false SOI markers than the generic
    scan's whole candidate budget."""
    thumb, big = _jpeg(8, 10, seed=54), _jpeg(16, 22, seed=52)
    blob = _x3f([(b"IMA2", 18, thumb), (b"IMAG", 18, big)],
                sensor_noise=_fake_soi_noise())
    got = dng.extract_preview(blob)
    assert got is not None
    img = PILImage.open(io.BytesIO(got))
    img.load()
    assert img.size == (22, 16)  # largest preview wins


def test_x3f_damaged_directory_falls_back_to_scan():
    """A corrupt footer pointer degrades to the bounded generic scan;
    the PIL gate keeps false SOIs in sensor payload from surfacing."""
    jpeg = _jpeg(16, 22, seed=52)
    blob = _x3f([(b"IMA2", 18, jpeg)])
    blob = blob[:-4] + struct.pack("<I", 0xFFFFFFF0)  # dead pointer
    got = dng.extract_preview(blob)
    assert got is not None
    img = PILImage.open(io.BytesIO(got))
    img.load()
    assert img.size == (22, 16)


def test_x3f_skips_non_jpeg_sections():
    """Format-3 (uncompressed sensor) sections carry no SOI at their
    payload start and must be skipped, not surfaced as garbage."""
    rng = np.random.default_rng(11)
    sensor = rng.integers(0, 256, 2048, dtype=np.uint8).tobytes()
    sensor = sensor.replace(b"\xff\xd8", b"\x00\x00")
    jpeg = _jpeg(12, 14, seed=55)
    blob = _x3f([(b"IMAG", 3, sensor), (b"IMA2", 18, jpeg)])
    got = dng.extract_preview(blob)
    img = PILImage.open(io.BytesIO(got))
    img.load()
    assert img.size == (14, 12)


def test_editor_opens_x3f_via_preview(tmp_path):
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    jpeg = _jpeg(24, 32, seed=56)
    p = tmp_path / "c.x3f"
    p.write_bytes(_x3f([(b"IMA2", 18, jpeg)],
                       sensor_noise=_fake_soi_noise(seed=12)))
    ed = PhotoEditor.open(str(p))
    assert ed.opened_from_preview  # sensor decode is a non-goal here
    assert ed.shape == (24, 32)


def test_x3f_extractor_fuzz_never_raises():
    rng = np.random.default_rng(13)
    base = _x3f([(b"IMA2", 18, _jpeg(10, 12, seed=57))],
                sensor_noise=b"\x01" * 512)
    for _ in range(150):
        b = bytearray(base)
        for _ in range(rng.integers(1, 8)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        cut = rng.integers(0, len(b) + 1)
        dng.extract_preview(bytes(b))        # whole mutant
        dng.extract_preview(bytes(b[:cut]))  # truncated mutant


def test_generic_scan_rejects_jpegless_garbage():
    rng = np.random.default_rng(9)
    noise = rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
    noise = noise.replace(b"\xff\xd8", b"\x00\x00")
    assert dng.extract_preview(b"FOVb" + noise) is None


def test_bmff_adversarial_nesting_bounded():
    """Deep nested-moov chains and mass mdat boxes stay within the box
    budget and candidate cap (no CPU/memory blowup on crafted input)."""
    import time

    jpeg = _jpeg(6, 8, seed=53)
    # 64 mdat boxes each leading with a JPEG + deeply nested moovs.
    moov = _box(b"moov", b"")
    for _ in range(10):
        moov = _box(b"moov", moov * 4)
    blob = _box(b"ftyp", b"crx ") + moov + b"".join(
        _box(b"mdat", jpeg + b"\x00" * 32) for _ in range(64))
    from rawphotoforge_tpu.io.vendor_preview import bmff_preview_candidates

    t0 = time.perf_counter()
    cands = bmff_preview_candidates(blob)
    assert time.perf_counter() - t0 < 2.0
    assert len(cands) <= 16
    assert dng.extract_preview(blob) is not None  # still finds the JPEG


def test_write_dng_preview_keeps_exif_subifd():
    """EXIF capture metadata survives a preview-IFD0 layout: the EXIF
    sub-IFD pointer lives in the raw SubIFD (IFD0 is the preview), and
    the reader must find it there (regression: it only checked IFD0)."""
    from rawphotoforge_tpu.io.raw import synthetic_raw

    rng = np.random.default_rng(4)
    rgb = np.clip(rng.random((3, 24, 32)), 0, 1).astype(np.float32)
    raw = synthetic_raw(rgb)
    raw.exif.update({
        "Make": "RPF", "Model": "TestCam", "ExposureTime": "1/250",
        "FNumber": "2.8", "ISO": "400", "FocalLength": "35.0",
        "LensModel": "RPF 35mm", "DateTime": "2026:08:17 12:00:00",
    })
    jpeg = _jpeg(12, 16, seed=40)
    for comp, pred in ((1, 1), (7, 1), (8, 2)):
        data = dng.write_dng(raw, compression=comp, predictor=pred,
                             preview_jpeg=jpeg)
        back = dng.read_dng(data)
        for key, want in raw.exif.items():
            assert back.exif.get(key) == want, (comp, key, back.exif)
        assert dng.extract_preview(data) == jpeg


def _mini_tiff(entries_spec):
    """Hand-pack a little-endian TIFF stream with one IFD.

    entries_spec: list of (tag, type, count, inline_value_bytes or
    (payload_bytes,)) — tuples with payload go out-of-line."""
    n = len(entries_spec)
    ifd_size = 2 + n * 12 + 4
    data_off = 8 + ifd_size
    head = struct.pack("<2sHI", b"II", 42, 8)
    body = b""
    ool = b""
    for tag, typ, cnt, val in sorted(entries_spec):
        if isinstance(val, tuple):
            body += struct.pack("<HHII", tag, typ, cnt,
                                data_off + len(ool))
            ool += val[0]
        else:
            body += struct.pack("<HHI", tag, typ, cnt) + val.ljust(4, b"\x00")
    return head + struct.pack("<H", n) + body + struct.pack("<I", 0) + ool


def test_cr3_cmt_boxes_provide_exif():
    """CR3 metadata comes from the CMT1/CMT2 TIFF streams inside
    moov>uuid (the preview JPEG itself has no EXIF)."""
    from rawphotoforge_tpu.io.raw import container_exif, decode_embedded_preview

    make = b"Canon\x00"
    cmt1 = _mini_tiff([
        (271, 2, len(make), (make,)),
        (306, 2, 20, (b"2026:08:17 12:00:00\x00",)),
    ])
    cmt2 = _mini_tiff([
        (0x829A, 5, 1, (struct.pack("<II", 1, 250),)),  # ExposureTime
        (0x8827, 3, 1, struct.pack("<H", 400)),         # ISO
    ])
    canon_uuid = bytes.fromhex("85c0b687820f11e08111f4ce462b6a48")
    inner = _box(b"uuid", canon_uuid + _box(b"CMT1", cmt1)
                 + _box(b"CMT2", cmt2))
    big = _jpeg(20, 28, seed=50)
    ftyp = _box(b"ftyp", b"crx \x00\x00\x00\x01isomcrx ")
    data = (ftyp + _box(b"moov", inner)
            + _box(b"mdat", big + b"\x00" * 256))

    exif = container_exif(data)
    assert exif["Make"] == "Canon"
    assert exif["DateTime"] == "2026:08:17 12:00:00"
    assert exif["ExposureTime"] == "1/250"
    assert exif["ISO"] == "400"

    res = decode_embedded_preview(data)
    assert res is not None
    planes, merged = res
    assert planes.shape == (3, 20, 28)
    assert merged["Make"] == "Canon" and merged["ISO"] == "400"


def test_bmff_metadata_mutations_contained():
    """Mutated CR3 containers (truncation/flips/zeroed spans) must yield
    best-effort metadata or typed errors — never an unhandled exception
    from the CMT walk or the preview decode."""
    from rawphotoforge_tpu._errbase import PhotoEditorError
    from rawphotoforge_tpu.io.raw import container_exif, decode_embedded_preview

    make = b"Canon\x00"
    cmt1 = _mini_tiff([(271, 2, len(make), (make,))])
    cmt2 = _mini_tiff([(0x829A, 5, 1, (struct.pack("<II", 1, 250),))])
    canon_uuid = bytes.fromhex("85c0b687820f11e08111f4ce462b6a48")
    inner = _box(b"uuid", canon_uuid + _box(b"CMT1", cmt1)
                 + _box(b"CMT2", cmt2))
    ftyp = _box(b"ftyp", b"crx \x00\x00\x00\x01isomcrx ")
    data = (ftyp + _box(b"moov", inner)
            + _box(b"mdat", _jpeg(12, 16, seed=51) + b"\x00" * 128))

    rng = np.random.default_rng(51)
    for trial in range(150):
        buf = bytearray(data)
        kind = trial % 3
        if kind == 0:
            buf = buf[:int(rng.integers(1, len(buf)))]
        elif kind == 1:
            for _ in range(int(rng.integers(1, 8))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        else:
            a = int(rng.integers(0, len(buf) - 1))
            b = min(len(buf), a + int(rng.integers(1, 64)))
            buf[a:b] = bytes(b - a)
        try:
            assert isinstance(container_exif(bytes(buf)), dict)
            decode_embedded_preview(bytes(buf))
        except PhotoEditorError:
            pass


def test_cr3_datetime_original_wins_across_cmt_blocks():
    """CMT1 carries the file-modification DateTime, CMT2 the capture
    DateTimeOriginal; the merge must prefer the capture time even though
    the blocks are separate TIFF streams (review regression)."""
    from rawphotoforge_tpu.io.raw import container_exif

    cmt1 = _mini_tiff([(306, 2, 20, (b"2026:08:17 23:59:59\x00",))])
    cmt2 = _mini_tiff([(36867, 2, 20, (b"2020:01:01 10:00:00\x00",))])
    canon_uuid = bytes.fromhex("85c0b687820f11e08111f4ce462b6a48")
    inner = _box(b"uuid", canon_uuid + _box(b"CMT1", cmt1)
                 + _box(b"CMT2", cmt2))
    ftyp = _box(b"ftyp", b"crx \x00\x00\x00\x01isomcrx ")
    data = ftyp + _box(b"moov", inner) + _box(b"mdat", b"\x00" * 64)
    assert container_exif(data)["DateTime"] == "2020:01:01 10:00:00"
