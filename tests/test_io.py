"""Image I/O tests: containers, linearization, PPM16, EXIF, orientation."""

import io

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image as PILImage

from rawphotoforge_tpu.io import image_io
from rawphotoforge_tpu.io.exif import parse_exif
from rawphotoforge_tpu.ops.geometry import orient_exif, resize_bilinear, resize_long_edge_shape

import oracle


def _png_bytes(u8_hwc):
    buf = io.BytesIO()
    PILImage.fromarray(u8_hwc, mode="RGB").save(buf, format="PNG")
    return buf.getvalue()


def test_png_decode_linearizes(rng):
    u8 = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
    planes, _ = image_io.decode_image(_png_bytes(u8), "PNG")
    assert planes.shape == (3, 20, 30)
    expected = oracle.srgb_to_linear(u8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(
        np.asarray(planes).transpose(1, 2, 0), expected, atol=1e-6
    )


def test_png_roundtrip(rng):
    srgb = rng.random((16, 24, 3)).astype(np.float32)
    data = image_io.encode_image(jnp.asarray(srgb.transpose(2, 0, 1)), "PNG")
    img = PILImage.open(io.BytesIO(data))
    back = np.asarray(img)
    np.testing.assert_array_equal(back, (np.clip(srgb, 0, 1) * 255).astype(np.uint8))


def test_jpeg_roundtrip_close(rng, tmp_path):
    # Smooth gradient: JPEG chroma subsampling destroys per-pixel noise.
    yy, xx = np.mgrid[0:16, 0:24].astype(np.float32)
    srgb = np.stack([yy / 16, xx / 24, (yy + xx) / 40], axis=-1).astype(np.float32)
    p = tmp_path / "out.jpg"
    image_io.write_image(str(p), jnp.asarray(srgb.transpose(2, 0, 1)), quality=95)
    planes, _ = image_io.read_image(str(p))
    enc = np.asarray(image_io.linear_planes_to_srgb_u8(planes)) / 255.0
    assert np.abs(enc - np.clip(srgb, 0, 1)).mean() < 0.02


def test_ppm16_roundtrip(rng):
    hwc = rng.random((12, 17, 3)).astype(np.float32)
    data = image_io.encode_ppm16(hwc)
    back = image_io.decode_ppm16(data)
    np.testing.assert_allclose(back, np.round(hwc * 65535) / 65535, atol=1e-4)


def test_ppm16_is_linear_passthrough(rng):
    """PPM16 input is treated as already-linear (web-ts image.ts:146-195
    divides by 65535 with no EOTF)."""
    hwc = rng.random((8, 9, 3)).astype(np.float32)
    planes, exif = image_io.decode_image(image_io.encode_ppm16(hwc), "PPM16")
    assert exif == {}
    np.testing.assert_allclose(
        np.asarray(planes).transpose(1, 2, 0), hwc, atol=1e-4
    )


def test_ppm16_rejects_8bit():
    with pytest.raises(image_io.ImageIOError):
        image_io.decode_ppm16(b"P6\n4 4\n255\n" + b"\x00" * 48)


def test_unknown_extension():
    with pytest.raises(image_io.ImageIOError):
        image_io.format_for_path("foo.xyz")


def test_exif_parse():
    img = PILImage.new("RGB", (4, 4))
    ex = img.getexif()
    from PIL.ExifTags import Base

    ex[Base.Make] = "TestMake"
    ex[Base.Model] = "TestModel"
    buf = io.BytesIO()
    img.save(buf, format="JPEG", exif=ex)
    parsed = parse_exif(PILImage.open(io.BytesIO(buf.getvalue())))
    assert parsed["Make"] == "TestMake"
    assert parsed["Model"] == "TestModel"


def test_orientation_transforms():
    planes = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 4, 6))
    # Orientation 3 = rotate 180.
    out = np.asarray(orient_exif(planes, 3))
    np.testing.assert_array_equal(out[0], np.asarray(planes)[0][::-1, ::-1])
    # Orientation 6 (rotate 90 CW): top-left ends up at top-right.
    out6 = np.asarray(orient_exif(planes, 6))
    assert out6.shape == (1, 6, 4)
    assert out6[0, 0, -1] == np.asarray(planes)[0, 0, 0]


def test_resize_matches_reference_semantics(rng):
    """Bilinear long-edge resize must reproduce the TS pyramid resizer
    (web/main.ts:958-1026): half-texel centers, edge clamp, Math.round of
    the short edge."""
    src = rng.random((10, 20, 3)).astype(np.float32)
    dh, dw = resize_long_edge_shape(10, 20, 7)
    assert (dh, dw) == (4, 7)  # round(10 * 7/20) = round(3.5) = 4

    out = np.asarray(resize_bilinear(jnp.asarray(src.transpose(2, 0, 1)), dh, dw))

    # Reference loop, transcribed independently.
    expected = np.zeros((dh, dw, 3), dtype=np.float32)
    sy_scale, sx_scale = 10 / dh, 20 / dw
    for y in range(dh):
        sy = (y + 0.5) * sy_scale - 0.5
        y0 = max(int(np.floor(sy)), 0)
        y1 = min(y0 + 1, 9)
        ty = sy - y0
        for x in range(dw):
            sx = (x + 0.5) * sx_scale - 0.5
            x0 = max(int(np.floor(sx)), 0)
            x1 = min(x0 + 1, 19)
            tx = sx - x0
            c00, c10 = src[y0, x0], src[y0, x1]
            c01, c11 = src[y1, x0], src[y1, x1]
            expected[y, x] = (c00 * (1 - tx) + c10 * tx) * (1 - ty) + (
                c01 * (1 - tx) + c11 * tx
            ) * ty
    np.testing.assert_allclose(out.transpose(1, 2, 0), expected, atol=1e-6)


def test_resize_bilinear_extents_matches_static(rng):
    """The bucket-stable (extent-traced) resize must agree with the
    static-shape resize on the true region, and edge-replicate beyond
    the destination extent (the _pad_to_bucket mode='edge' contract)."""
    from rawphotoforge_tpu.engine.editor import (bucket_shape,
                                                 pad_to_bucket_np)
    from rawphotoforge_tpu.ops.geometry import resize_bilinear_extents

    for (h, w, dh, dw) in [(301, 467, 101, 157), (130, 257, 37, 73),
                           (128, 128, 50, 50), (97, 129, 96, 128)]:
        src = rng.random((3, h, w)).astype(np.float32)
        padded = jnp.asarray(pad_to_bucket_np(src, bucket=128))
        out_shape = bucket_shape(dh, dw, bucket=128)
        got = np.asarray(resize_bilinear_extents(
            padded, jnp.asarray([h, w, dh, dw], np.int32), out_shape))
        want = np.asarray(resize_bilinear(jnp.asarray(src), dh, dw))
        assert got.shape == (3,) + out_shape
        np.testing.assert_allclose(got[:, :dh, :dw], want, atol=2e-6)
        # Pad region replicates the last true row/col exactly.
        np.testing.assert_array_equal(
            got[:, dh:, :dw], np.broadcast_to(got[:, dh - 1:dh, :dw],
                                              got[:, dh:, :dw].shape))
        np.testing.assert_array_equal(
            got[:, :, dw:], np.broadcast_to(got[:, :, dw - 1:dw],
                                            got[:, :, dw:].shape))


def test_bucket_stable_open_matches_legacy(rng):
    """PhotoEditor(planes_padded, true_shape=...) — the from_host
    bucket-stable path — must render the same previews as the legacy
    unpadded construction."""
    from rawphotoforge_tpu.engine.editor import (PhotoEditor,
                                                 pad_to_bucket_np)

    src = rng.random((3, 151, 210)).astype(np.float32)
    legacy = PhotoEditor(jnp.asarray(src), mid_long_edge=100,
                         low_long_edge=40)
    fast = PhotoEditor(jnp.asarray(pad_to_bucket_np(src)),
                       true_shape=(151, 210), mid_long_edge=100,
                       low_long_edge=40)
    assert fast.shape == legacy.shape == (151, 210)
    for level in ("full", "mid", "low"):
        a = np.asarray(legacy.apply(level))
        b = np.asarray(fast.apply(level))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-6)
    with pytest.raises(ValueError):
        PhotoEditor(jnp.asarray(src), true_shape=(151, 210))


def test_exif_preserved_in_export(tmp_path):
    from PIL import Image as PILImage
    from PIL.ExifTags import Base
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    img = PILImage.new("RGB", (24, 16), (120, 80, 200))
    ex = img.getexif()
    ex[Base.Make] = "ParityCam"
    ex[Base.Model] = "X-1"
    src = tmp_path / "src.jpg"
    img.save(src, format="JPEG", exif=ex)

    ed = PhotoEditor.open(str(src), use_pallas=False, mid_long_edge=16, low_long_edge=8)
    assert ed.exif.get("Make") == "ParityCam"
    out = tmp_path / "out.jpg"
    ed.set_tone(exposure=0.5)
    ed.save(str(out))
    back = PILImage.open(out).getexif()
    assert back[Base.Make] == "ParityCam"
    assert back[Base.Model] == "X-1"
    assert back.get(274, 1) == 1  # orientation reset


def test_mode_i_32bit_tiff_does_not_wrap():
    """Pillow mode 'I' (32-bit) samples above 65535 must scale, not wrap
    modulo 65536 (review finding)."""
    import io as _io

    import numpy as np
    from PIL import Image as PILImage

    from rawphotoforge_tpu.io import image_io

    arr = np.full((6, 8), 70000, dtype=np.int32)  # > u16 range
    buf = _io.BytesIO()
    PILImage.fromarray(arr, mode="I").save(buf, format="TIFF")
    planes, _ = image_io.decode_image(buf.getvalue(), "TIFF")
    got = float(np.asarray(planes)[0, 0, 0])
    assert abs(got - 70000 / 65535.0) < 1e-3, got


def test_truncated_jpeg_raises_typed_error():
    """PIL surfaces truncated scans only at pixel access; the decode
    wrapper must map that to ImageIOError (callers branch on it)."""
    import io as _io

    import pytest
    from PIL import Image as PILImage

    from rawphotoforge_tpu.io.image_io import ImageIOError, decode_image

    buf = _io.BytesIO()
    PILImage.new("RGB", (64, 64), (90, 120, 50)).save(
        buf, format="JPEG", quality=95)
    whole = buf.getvalue()
    with pytest.raises(ImageIOError):
        decode_image(whole[: len(whole) // 2], "JPEG")


def test_malformed_ppm_raises_typed_error():
    import pytest

    from rawphotoforge_tpu.io.image_io import ImageIOError, decode_image

    for blob in (b"P6\n10", b"P6\n10 x\n65535\n", b"P6\n4 4\n65535\nshort",
                 b"P6\n-3 4\n65535\n" + b"\x00" * 200):
        with pytest.raises(ImageIOError):
            decode_image(blob, "PPM16")


def test_junk_orientation_tag_falls_back_to_upright():
    import dataclasses

    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import develop_raw_image, synthetic_raw

    rgb = np.full((3, 16, 24), 0.5, np.float32)
    raw = dataclasses.replace(synthetic_raw(rgb), orientation=99)
    parsed = read_dng(write_dng(raw))
    assert parsed.orientation == 1
    develop_raw_image(parsed)  # must not raise


def test_ppm16_export_roundtrips_linear(rng):
    """PPM16 is a linear container: encode_image must undo the render's
    sRGB OETF so a .ppm export reopens at the same brightness (review
    regression: double gamma)."""
    import jax.numpy as jnp

    from rawphotoforge_tpu.io import image_io

    srgb = jnp.asarray(
        np.clip(rng.random((3, 12, 16)), 0, 1).astype(np.float32))
    data = image_io.encode_image(srgb, "PPM16")
    planes, _ = image_io.decode_image(data, "PPM16")
    # decode treats PPM16 samples as linear; re-encoding to sRGB must
    # reproduce the original render (u16 quantization tolerance).
    from rawphotoforge_tpu.core.color import linear_to_srgb

    back = np.asarray(linear_to_srgb(jnp.asarray(planes)))
    np.testing.assert_allclose(back, np.asarray(srgb), atol=2e-3)


def test_ppm16_single_space_header(rng):
    """netpbm allows ANY single whitespace between header tokens and
    after maxval — a spec-legal 'P6 W H 65535 <data>' one-liner must
    decode identically to the newline layout."""
    hwc = rng.random((3, 4, 3)).astype(np.float32)
    newline = image_io.encode_ppm16(hwc)
    want = image_io.decode_ppm16(newline)
    body = newline.split(b"65535", 1)[1][1:]  # pixel bytes
    spaced = b"P6 4 3 65535 " + body
    np.testing.assert_array_equal(image_io.decode_ppm16(spaced), want)
    # Comments between tokens still parse.
    commented = b"P6 #c\n4 #c\n3\n65535\n" + body
    np.testing.assert_array_equal(image_io.decode_ppm16(commented), want)


def test_format_for_bytes_ppm_comment_tokens():
    """The nameless-upload sniffer must tokenize P6 headers exactly like
    _parse_ppm16: '#' terminates the current token and runs to end of
    line (review finding: '20#c\\n65535' merged tokens and misrouted a
    valid 16-bit PPM to the PIL path)."""
    from rawphotoforge_tpu.io.image_io import (
        _parse_ppm16, encode_ppm16, format_for_bytes,
    )

    base = encode_ppm16(np.zeros((4, 6, 3), np.float32))
    assert format_for_bytes(base) == "PPM16"
    # Comment immediately terminating the height token.
    weird = b"P6\n6 4#c\n65535\n" + base.split(b"\n", 3)[3]
    assert _parse_ppm16(weird).shape == (4, 6, 3)  # parser accepts it
    assert format_for_bytes(weird) == "PPM16"      # sniffer must agree
    # Long comment pushing maxval past byte 256.
    longc = (b"P6\n# " + b"x" * 300 + b"\n6 4\n65535\n"
             + base.split(b"\n", 3)[3])
    assert _parse_ppm16(longc).shape == (4, 6, 3)
    assert format_for_bytes(longc) == "PPM16"
    # 8-bit P6 still routes to PIL.
    import io as _io

    from PIL import Image as PILImage

    buf = _io.BytesIO()
    PILImage.fromarray(np.zeros((4, 6, 3), np.uint8)).save(buf, format="PPM")
    assert format_for_bytes(buf.getvalue()) == "JPEG"


# ---- 48-bit PNG export (encode_png16 / fmt="PNG16") ----


def _png16_decode_oracle(data: bytes) -> np.ndarray:
    """Independent minimal PNG reader for the filter-0 48-bit layout:
    walks chunks, validates CRCs, inflates IDAT, checks every row's
    filter byte, returns u16 HWC."""
    import struct
    import zlib

    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    ihdr = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        assert crc == zlib.crc32(tag + payload), tag
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    w, h, depth, ctype, comp, filt, ilace = ihdr
    assert (depth, ctype, comp, filt, ilace) == (16, 2, 0, 0, 0)
    raw = zlib.decompress(idat)
    stride = 1 + w * 6
    assert len(raw) == h * stride
    rows = []
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        assert row[0] == 0  # filter 0
        rows.append(np.frombuffer(row, ">u2", offset=1))
    return np.stack(rows).reshape(h, w, 3).astype(np.uint16)


def test_png16_roundtrips_16bit_values(rng):
    from rawphotoforge_tpu.io.image_io import encode_png16

    u16 = rng.integers(0, 65536, size=(20, 14, 3)).astype(np.uint16)
    back = _png16_decode_oracle(encode_png16(u16))
    np.testing.assert_array_equal(back, u16)


def test_png16_opens_in_pillow_as_8bit_view(rng):
    """Pillow (an independent PNG implementation) must accept the file;
    its 8-bit view equals the u16 high byte."""
    import io as _io

    from PIL import Image as PILImage

    from rawphotoforge_tpu.io.image_io import encode_png16

    u16 = rng.integers(0, 65536, size=(9, 11, 3)).astype(np.uint16)
    img = PILImage.open(_io.BytesIO(encode_png16(u16)))
    assert img.size == (11, 9)
    arr = np.asarray(img.convert("RGB"))
    np.testing.assert_array_equal(arr, (u16 >> 8).astype(np.uint8))


def test_png16_preserves_more_than_8_bits(rng):
    """The point of the format: two renders 1/65535 apart survive."""
    from rawphotoforge_tpu.io import image_io

    planes = np.full((3, 6, 8), 0.25, np.float32)
    a = image_io.encode_image(planes, "PNG16")
    b = image_io.encode_image(planes + 1.0 / 65535.0, "PNG16")
    da = _png16_decode_oracle(a).astype(np.int32)
    db = _png16_decode_oracle(b).astype(np.int32)
    assert (db - da == 1).all()


def test_png16_editor_save_and_bit_depth_gate(tmp_path, rng):
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.io import image_io

    hwc = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    import io as _io

    from PIL import Image as PILImage

    src = tmp_path / "t.png"
    PILImage.fromarray(hwc).save(src)
    ed = PhotoEditor.open(str(src))
    out = tmp_path / "o.png"
    ed.save(str(out), bit_depth=16)
    u16 = _png16_decode_oracle(out.read_bytes())
    assert u16.shape == (24, 32, 3)
    # The 8-bit save is the u16 high byte of the same render.
    out8 = tmp_path / "o8.png"
    ed.save(str(out8))
    arr8 = np.asarray(PILImage.open(out8))
    assert (np.abs(arr8.astype(np.int32)
                   - (u16 >> 8).astype(np.int32)) <= 1).all()
    with pytest.raises(image_io.ImageIOError):
        ed.save(str(tmp_path / "o.jpg"), bit_depth=16)


# ---- 48-bit PNG decode (_parse_png48 / native png_unfilter) ----


def _png_forward_filter(img_rows: np.ndarray, ftypes, bpp=6) -> bytes:
    """Independent FORWARD filter (the encoder direction the decoder
    must invert), straight from the PNG spec's Recon/Filt equations."""
    h, stride = img_rows.shape
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = img_rows[y].astype(np.int32)
        f = ftypes[y]
        filt = np.empty(stride, np.int32)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
            filt[x] = (cur[x] - pred) & 0xFF
        out.append(f)
        out += filt.astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


def _png48_wrap(w, h, raw_rows: bytes) -> bytes:
    import struct
    import zlib

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw_rows))
            + chunk(b"IEND", b""))


def test_png48_all_filter_types_decode(rng):
    """Every PNG filter type (0-4, mixed per row) inverts correctly —
    native hot loop and numpy oracle agree with the spec's forward
    filter."""
    from rawphotoforge_tpu import native
    from rawphotoforge_tpu.io.image_io import (_parse_png48,
                                               _png_unfilter_py)

    h, w = 10, 7
    u16 = rng.integers(0, 65536, size=(h, w, 3)).astype(np.uint16)
    rows = np.frombuffer(u16.astype(">u2").tobytes(),
                         np.uint8).reshape(h, w * 6)
    ftypes = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    raw = _png_forward_filter(rows, ftypes)
    got = _parse_png48(_png48_wrap(w, h, raw))
    np.testing.assert_array_equal(got, u16)
    # The numpy oracle agrees with whatever path _parse_png48 used.
    grid = np.frombuffer(raw, np.uint8).reshape(h, 1 + w * 6)
    ora = _png_unfilter_py(np.ascontiguousarray(grid[:, 1:]),
                           np.ascontiguousarray(grid[:, 0]), 6)
    np.testing.assert_array_equal(
        np.frombuffer(ora.tobytes(), ">u2").reshape(h, w, 3), u16)
    if native.available():
        nat = native.png_unfilter(np.ascontiguousarray(grid[:, 1:]),
                                  np.ascontiguousarray(grid[:, 0]), 6)
        np.testing.assert_array_equal(nat, ora)


def test_png48_full_depth_roundtrip_through_decode_image(rng):
    """encode PNG16 -> decode_image keeps all 16 bits (Pillow alone
    truncates to 8)."""
    from rawphotoforge_tpu.io import image_io

    u16 = rng.integers(0, 65536, size=(12, 9, 3)).astype(np.uint16)
    data = image_io.encode_png16(u16)
    hd = image_io.decode_image_host(data, "PNG")
    planes = np.asarray(hd.upload())  # linear f32 [3,H,W]
    # Invert the sRGB EOTF and re-quantize: must recover every code.
    from rawphotoforge_tpu.core.color import linear_to_srgb
    import jax.numpy as jnp

    enc = np.asarray(linear_to_srgb(jnp.asarray(planes)))
    back = np.clip(np.rint(enc * 65535.0), 0, 65535).astype(np.uint16)
    assert (np.abs(back.transpose(1, 2, 0).astype(np.int32)
                   - u16.astype(np.int32)) <= 1).all()


def test_png48_malformed_raises_typed():
    from rawphotoforge_tpu.io import image_io

    u16 = np.zeros((4, 5, 3), np.uint16)
    data = bytearray(image_io.encode_png16(u16))
    with pytest.raises(image_io.ImageIOError):
        image_io._parse_png48(bytes(data[:40]))  # cut inside the IDAT
    # Bad filter type inside the IDAT.
    rows = np.zeros((4, 30), np.uint8)
    raw = bytearray(_png_forward_filter(rows, [0, 0, 0, 0]))
    raw[0] = 9
    with pytest.raises(image_io.ImageIOError):
        image_io._parse_png48(_png48_wrap(5, 4, bytes(raw)))
    # 8-bit PNGs return None (Pillow path).
    import io as _io

    from PIL import Image as PILImage

    buf = _io.BytesIO()
    PILImage.fromarray(np.zeros((4, 5, 3), np.uint8)).save(buf, format="PNG")
    assert image_io._parse_png48(buf.getvalue()) is None


def _png16_wrap_any(w, h, raw: bytes, ctype: int, ilace: int = 0) -> bytes:
    """Wrap pre-filtered image data in a PNG of any depth-16 color type."""
    import struct
    import zlib

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR",
                    struct.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, ilace))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def test_png48_bad_crc_raises_typed(rng):
    """A bit-rotted chunk must fail loudly (ADVICE r3): flip one byte
    inside the IDAT payload without fixing its CRC."""
    from rawphotoforge_tpu.io import image_io

    u16 = rng.integers(0, 65536, size=(6, 5, 3)).astype(np.uint16)
    data = bytearray(image_io.encode_png16(u16))
    # Find the IDAT payload and corrupt one byte.
    idx = data.index(b"IDAT") + 10
    data[idx] ^= 0xFF
    with pytest.raises(image_io.ImageIOError, match="CRC"):
        image_io._parse_png48(bytes(data))


def test_png16_rgba_and_gray_alpha_decode_full_depth(rng):
    """Depth-16 RGBA (color type 6) and gray+alpha (4) decode at full
    depth — Pillow alone truncates both to 8 bits (ADVICE r3)."""
    from rawphotoforge_tpu.io.image_io import _parse_png48

    h, w = 7, 5
    rgba = rng.integers(0, 65536, size=(h, w, 4)).astype(np.uint16)
    rows = np.frombuffer(rgba.astype(">u2").tobytes(),
                         np.uint8).reshape(h, w * 8)
    raw = _png_forward_filter(rows, [0, 1, 2, 3, 4, 2, 1], bpp=8)
    got = _parse_png48(_png16_wrap_any(w, h, raw, ctype=6))
    np.testing.assert_array_equal(got, rgba[:, :, :3])

    la = rng.integers(0, 65536, size=(h, w, 2)).astype(np.uint16)
    rows = np.frombuffer(la.astype(">u2").tobytes(),
                         np.uint8).reshape(h, w * 4)
    raw = _png_forward_filter(rows, [0, 1, 2, 3, 4, 2, 1], bpp=4)
    got = _parse_png48(_png16_wrap_any(w, h, raw, ctype=4))
    np.testing.assert_array_equal(
        got, np.repeat(la[:, :, :1], 3, axis=2))


def _adam7_forward(img: np.ndarray, bpp: int) -> bytes:
    """Forward Adam7 interlace + per-pass filter-0 serialization: the
    layout the decoder's de-interlacer must invert (PNG spec 8.2)."""
    from rawphotoforge_tpu.io.image_io import _ADAM7

    h, w = img.shape[:2]
    out = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        ph = sub.shape[0]
        rows = np.frombuffer(sub.astype(">u2").tobytes(),
                             np.uint8).reshape(ph, -1)
        out += b"".join(b"\x00" + rows[y].tobytes() for y in range(ph))
    return out


def test_png48_adam7_interlaced_decodes_full_depth(rng):
    """Adam7-interlaced depth-16 RGB/RGBA/gray decode at full depth
    (previously fell back to Pillow's 8-bit raster, ADVICE r3).
    Dimensions chosen so some passes are empty (w<5 columns) and partial."""
    from rawphotoforge_tpu.io.image_io import _parse_png48

    for ctype, ch in ((2, 3), (6, 4), (0, 1)):
        for h, w in ((9, 11), (3, 2), (1, 1), (8, 8)):
            img = rng.integers(0, 65536, size=(h, w, ch)).astype(np.uint16)
            raw = _adam7_forward(img, bpp=2 * ch)
            got = _parse_png48(_png16_wrap_any(w, h, raw, ctype, ilace=1))
            want = (img[:, :, :3] if ch >= 3
                    else np.repeat(img[:, :, :1], 3, axis=2))
            np.testing.assert_array_equal(got, want, err_msg=f"{ctype}")


def test_png48_adam7_truncated_raises(rng):
    from rawphotoforge_tpu.io import image_io

    img = rng.integers(0, 65536, size=(8, 8, 3)).astype(np.uint16)
    raw = _adam7_forward(img, bpp=6)
    with pytest.raises(image_io.ImageIOError):
        image_io._parse_png48(
            _png16_wrap_any(8, 8, raw[:-5], ctype=2, ilace=1))
