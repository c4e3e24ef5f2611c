"""Lossy-JPEG DNG (Compression=34892, PhotometricInterpretation=LinearRaw).

The format Adobe's lossy DNGs use: demosaiced 8-bit camera RGB stored as
baseline-JPEG tiles/strips. Fixtures are assembled in-test from
Pillow-encoded JPEG streams, so the expected pixels come from the same
independent codec that real files were produced with.
"""

import io
import struct

import numpy as np
import pytest
from PIL import Image as PILImage

from rawphotoforge_tpu.io import dng


def _jpeg_bytes(arr_u8: np.ndarray, quality=95) -> bytes:
    buf = io.BytesIO()
    PILImage.fromarray(arr_u8, mode="RGB").save(
        buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _build_dng(h, w, chunks, chunk_tags, extra_tags=()):
    """Assemble a minimal little-endian LinearRaw DNG around JPEG chunks."""
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 3, None),  # bits [8,8,8]
        (259, 3, 1, 34892), (262, 3, 1, 34892), (277, 3, 1, 3),
        (274, 3, 1, 1),
    ]
    entries += list(chunk_tags) + list(extra_tags)
    entries.sort(key=lambda e: e[0])

    out_of_line = bytearray()
    data_off = 8 + 2 + len(entries) * 12 + 4
    payload_offsets = {}
    # first pass: place multi-value payloads
    packed = []
    for tag, typ, n, val in entries:
        if tag == 258:
            payload = struct.pack("<3H", 8, 8, 8)
        elif isinstance(val, list):
            fmt = {3: "H", 4: "I"}[typ]
            payload = struct.pack("<" + str(n) + fmt, *val)
        else:
            fmt = {3: "H", 4: "I"}[typ]
            payload = struct.pack("<" + fmt, val)
        if len(payload) > 4:
            payload_offsets[tag] = data_off + len(out_of_line)
            out_of_line += payload + (b"\x00" if len(payload) % 2 else b"")
            packed.append((tag, typ, n, struct.pack(
                "<I", payload_offsets[tag])))
        else:
            packed.append((tag, typ, n, payload.ljust(4, b"\x00")))

    chunk_start = data_off + len(out_of_line)
    # patch chunk offsets (tag 273 strips or 324 tiles)
    offs, pos = [], chunk_start
    for c in chunks:
        offs.append(pos)
        pos += len(c)
    final = []
    for tag, typ, n, payload in packed:
        if tag in (273, 324):
            if n == 1:
                payload = struct.pack("<I", offs[0])
            else:
                blob = struct.pack("<" + str(n) + "I", *offs)
                out_patch = payload_offsets[tag] - data_off
                out_of_line[out_patch : out_patch + len(blob)] = blob
        final.append((tag, typ, n, payload))

    buf = bytearray(b"II" + struct.pack("<HI", 42, 8))
    buf += struct.pack("<H", len(final))
    for tag, typ, n, payload in final:
        buf += struct.pack("<HHI", tag, typ, n) + payload
    buf += struct.pack("<I", 0)
    buf += out_of_line
    for c in chunks:
        buf += c
    return bytes(buf)


def _gradient_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack([
        yy / h * 255, xx / w * 255, (yy + xx) / (h + w) * 255,
    ], axis=-1).astype(np.uint8)


def test_lossy_strip_round_trip():
    h, w = 40, 56
    rgb = _gradient_rgb(h, w)
    jpg = _jpeg_bytes(rgb)
    data = _build_dng(
        h, w, [jpg],
        chunk_tags=[(273, 4, 1, 0), (278, 4, 1, h), (279, 4, 1, len(jpg))],
    )
    back = dng.read_dng(data)
    assert back.pattern == "RGB"
    assert back.mosaic.shape == (h, w, 3)
    want = np.array(PILImage.open(io.BytesIO(jpg))).astype(np.uint16)
    np.testing.assert_array_equal(back.mosaic, want)
    assert back.white_level == 255.0


def test_lossy_tiled_round_trip():
    h, w, th, tw = 40, 60, 24, 32
    rgb = _gradient_rgb(h, w)
    chunks, wants = [], np.zeros((h, w, 3), np.uint16)
    for y0 in range(0, h, th):
        for x0 in range(0, w, tw):
            block = rgb[y0 : y0 + th, x0 : x0 + tw]
            pad = np.pad(block, ((0, th - block.shape[0]),
                                 (0, tw - block.shape[1]), (0, 0)),
                         mode="edge")
            jpg = _jpeg_bytes(pad)
            chunks.append(jpg)
            dec = np.array(PILImage.open(io.BytesIO(jpg)))
            hh = min(th, h - y0)
            ww = min(tw, w - x0)
            wants[y0 : y0 + hh, x0 : x0 + ww] = dec[:hh, :ww]
    n = len(chunks)
    data = _build_dng(
        h, w, chunks,
        chunk_tags=[
            (322, 4, 1, tw), (323, 4, 1, th),
            (324, 4, n, [0] * n), (325, 4, n, [len(c) for c in chunks]),
        ],
    )
    back = dng.read_dng(data)
    np.testing.assert_array_equal(back.mosaic, wants)


def test_lossy_develops_end_to_end():
    from rawphotoforge_tpu.io.raw import develop_raw_image

    h, w = 24, 32
    rgb = _gradient_rgb(h, w)
    jpg = _jpeg_bytes(rgb, quality=100)
    data = _build_dng(
        h, w, [jpg],
        chunk_tags=[(273, 4, 1, 0), (278, 4, 1, h), (279, 4, 1, len(jpg))],
    )
    planes, _ = develop_raw_image(dng.read_dng(data))
    assert planes.shape == (3, h, w)
    # Identity WB + identity matrix: develop == decoded JPEG / 255.
    want = np.array(PILImage.open(io.BytesIO(jpg))).astype(np.float32) / 255.0
    np.testing.assert_allclose(
        np.asarray(planes), want.transpose(2, 0, 1), atol=1e-6
    )


def test_lossy_reencodes_as_lossless_linear_raw():
    """`convert` on a lossy DNG re-encodes it losslessly as a LinearRaw
    deflate DNG (archival recompression of an already-demosaiced file)."""
    h, w = 16, 16
    jpg = _jpeg_bytes(_gradient_rgb(h, w))
    data = _build_dng(
        h, w, [jpg],
        chunk_tags=[(273, 4, 1, 0), (278, 4, 1, h), (279, 4, 1, len(jpg))],
    )
    raw = dng.read_dng(data)
    for compression, predictor in ((8, 2), (8, 1), (1, 1)):
        back = dng.read_dng(
            dng.write_dng(raw, compression=compression, predictor=predictor))
        assert back.pattern == "RGB"
        np.testing.assert_array_equal(back.mosaic, raw.mosaic)
    with pytest.raises(dng.DngError):
        dng.write_dng(raw, compression=7)  # SOF3 stays CFA-only


def test_lossy_cfa_is_rejected():
    """Lossy JPEG under a CFA photometric has no demosaicable layout here."""
    rng = np.random.default_rng(0)
    raw = dng.RawImage(
        mosaic=rng.integers(0, 4000, size=(16, 16), dtype=np.uint16),
        pattern="RGGB", black_level=0.0, white_level=16383.0,
        wb_gains=(1.0, 1.0, 1.0), xyz_to_cam=None,
    )
    data = dng.write_dng(raw, compression=1)
    entry1 = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 1, 0)
    entry_lossy = struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 34892, 0)
    assert data.count(entry1) == 1
    with pytest.raises(dng.DngError, match="LinearRaw"):
        dng.read_dng(data.replace(entry1, entry_lossy))


def test_corrupt_embedded_jpeg_raises_typed_error():
    """PIL's own exception hierarchy (incl. DecompressionBombError) must
    not escape read_dng (review finding)."""
    h, w = 16, 16
    bad = b"\xff\xd8\xff\xe0" + b"garbage" * 10
    data = _build_dng(
        h, w, [bad],
        chunk_tags=[(273, 4, 1, 0), (278, 4, 1, h), (279, 4, 1, len(bad))],
    )
    with pytest.raises(dng.DngError):
        dng.read_dng(data)


def test_decompression_bomb_contained():
    """A lossy chunk whose SOF declares enormous dimensions must raise
    DngError, not PIL.Image.DecompressionBombError."""
    h, w = 16, 16
    jpg = bytearray(_jpeg_bytes(_gradient_rgb(h, w)))
    sof = jpg.find(b"\xff\xc0")
    assert sof > 0
    jpg[sof + 5 : sof + 9] = b"\xff\xff\xff\xff"  # 65535 x 65535
    data = _build_dng(
        h, w, [bytes(jpg)],
        chunk_tags=[(273, 4, 1, 0), (278, 4, 1, h), (279, 4, 1, len(jpg))],
    )
    with pytest.raises(dng.DngError):
        dng.read_dng(data)


def test_interleaved_predictor_matches_pillow():
    """The spp=3 predictor-2 pitch (one PIXEL = 3 samples) is gated
    against Pillow's independent TIFF decoder via a u8 RGB fixture."""
    import zlib

    h, w, spp = 5, 7, 3
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(h, w, spp), dtype=np.uint8)
    flat = img.reshape(h, w * spp).astype(np.int64)
    d = flat.copy()
    d[:, spp:] -= flat[:, :-spp]
    strip = zlib.compress(d.astype(np.uint8).tobytes())

    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 3, None), (259, 3, 1, 8),
        (262, 3, 1, 2), (273, 4, 1, 0), (277, 3, 1, 3), (278, 4, 1, h),
        (279, 4, 1, len(strip)), (317, 3, 1, 2),
    ]
    out_of_line = bytearray()
    data_off = 8 + 2 + len(entries) * 12 + 4
    packed = []
    for tag, typ, n, val in entries:
        payload = (struct.pack("<3H", 8, 8, 8) if tag == 258 else
                   struct.pack("<I" if typ == 4 else "<H", val))
        if len(payload) > 4:
            packed.append((tag, typ, n,
                           struct.pack("<I", data_off + len(out_of_line))))
            out_of_line += payload
        else:
            packed.append((tag, typ, n, payload.ljust(4, b"\x00")))
    strip_off = data_off + len(out_of_line)
    buf = bytearray(b"II" + struct.pack("<HI", 42, 8)
                    + struct.pack("<H", len(packed)))
    for tag, typ, n, payload in packed:
        if tag == 273:
            payload = struct.pack("<I", strip_off)
        buf += struct.pack("<HHI", tag, typ, n) + payload
    buf += struct.pack("<I", 0) + out_of_line + strip
    got_pil = np.array(PILImage.open(io.BytesIO(bytes(buf))))
    np.testing.assert_array_equal(got_pil, img)
    ours = dng._deflate_decode_block(strip, h, w, 8, 2, 1, "<", spp=3)
    np.testing.assert_array_equal(ours, img)


@pytest.mark.parametrize("dtype,predictor,tile", [
    (np.uint16, 2, None), (np.uint16, 1, (8, 12)),
    (np.float16, 3, None), (np.float32, 3, (8, 12)), (np.float32, 1, None),
])
def test_linear_raw_deflate_round_trip(dtype, predictor, tile):
    """Deflate LinearRaw (the Lightroom HDR-merge DNG layout: fp16
    demosaiced RGB) round trips through write_dng/read_dng, strips and
    tiles, integer and float."""
    h, w = 18, 26
    rng = np.random.default_rng(13)
    if np.issubdtype(dtype, np.integer):
        vals = rng.integers(0, 60000, size=(h, w, 3)).astype(dtype)
        kw = dict(black_level=0.0, white_level=65535.0)
    else:
        vals = (rng.random((h, w, 3)) * 4.0).astype(dtype)
        kw = dict(black_level=0.0, white_level=2.0)
    raw = dng.RawImage(
        mosaic=vals, pattern="RGB", wb_gains=(1.2, 1.0, 1.6),
        xyz_to_cam=None, **kw)
    data = dng.write_dng(raw, compression=8, predictor=predictor, tile=tile)
    back = dng.read_dng(data)
    assert back.pattern == "RGB"
    want = vals.astype(np.float32) if dtype != np.uint16 else vals
    np.testing.assert_array_equal(back.mosaic, want)
    # ...and it develops.
    from rawphotoforge_tpu.io.raw import develop_raw_image

    planes, _ = develop_raw_image(back)
    assert planes.shape == (3, h, w)
