"""Vendor RAW sensor decode tests: uncompressed NEF/ARW (TIFF-EP),
Panasonic RW2, Fujifilm RAF — writer-side fixtures, round trips,
gray-world WB fallback, the preview-correlation silent-wrong gate, and
mutation fuzz (VERDICT r2 #1; the reference routes these through rawler,
rust-godot-legacy/photo-editor/src/image.rs:14-179)."""

import dataclasses
import io as _io

import numpy as np
import pytest
from PIL import Image as PILImage

from rawphotoforge_tpu._errbase import PhotoEditorError
from rawphotoforge_tpu.io import vendor_raw as vr
from rawphotoforge_tpu.io.dng import DngError
from rawphotoforge_tpu.io.raw import (
    develop_raw_image, estimate_gray_world_gains, parse_raw, synthetic_raw,
)


def scene(h=64, w=96, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([0.1 + 0.5 * (yy / h), 0.2 + 0.4 * (xx / w),
                    0.15 + 0.3 * ((yy + xx) / (h + w))])
    return img + rng.random(img.shape, dtype=np.float32) * 0.05


def preview_jpeg(img):
    srgb = np.where(img <= 0.0031308, img * 12.92,
                    1.055 * np.clip(img, 0, 1) ** (1 / 2.4) - 0.055)
    buf = _io.BytesIO()
    PILImage.fromarray(
        (np.clip(srgb, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
    ).save(buf, format="JPEG", quality=92)
    return buf.getvalue()


# -- TIFF-EP (uncompressed NEF / ARW shapes) --------------------------------

@pytest.mark.parametrize("bits,pattern", [(16, "RGGB"), (12, "GRBG"),
                                          (14, "BGGR")])
def test_tiff_ep_roundtrip(bits, pattern):
    white = (1 << bits) - 1
    raw = synthetic_raw(scene(), pattern=pattern, black_level=white // 30,
                        white_level=white - 50)
    data = vr.write_tiff_ep(raw, bits=bits, make="NIKON CORPORATION")
    got = parse_raw(data)
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    assert got.pattern == pattern
    assert got.exif.get("Make") == "NIKON CORPORATION"
    # No DNG/vendor black tags in a bare NEF shape: bps-derived defaults.
    assert got.white_level == white
    assert not got.wb_known


def test_arw_sony_tags():
    """Sony black/white/WB vendor tags (0x7310/0x787F/0x7313) in the raw
    IFD are honored like their DNG counterparts."""
    raw = synthetic_raw(scene(), pattern="RGGB", black_level=512,
                        white_level=16300, wb_gains=(2.0, 1.0, 1.5))
    data = vr.write_tiff_ep(raw, bits=16, make="SONY", sony_tags=True)
    got = parse_raw(data)
    assert got.black_level == 512.0
    assert got.white_level == 16300.0
    np.testing.assert_allclose(got.wb_gains, (2.0, 1.0, 1.5), atol=1e-3)
    assert got.wb_known


def test_tiff_ep_lens_exif_resolves_bundled_profile():
    """Lens EXIF (Exif IFD: LensModel/FocalLength/FNumber) survives the
    TIFF-EP fixture round trip and feeds lens-profile auto-resolution —
    real NEF/ARW files carry it there, and the --lens-correct flow was
    previously only testable on DNG fixtures."""
    import dataclasses

    from rawphotoforge_tpu.io.lensdb import LensDatabase

    raw = synthetic_raw(scene(), pattern="RGGB", black_level=512,
                        white_level=16383)
    raw = dataclasses.replace(raw, exif=dict(raw.exif or {}, **{
        "Model": "NIKON Z 6",
        "LensModel": "Nikon AF-S Nikkor 50mm f/1.8G",
        "FocalLength": 50.0, "FNumber": 1.8}))
    got = parse_raw(vr.write_tiff_ep(raw, bits=14,
                                     make="NIKON CORPORATION"))
    assert got.exif.get("LensModel") == "Nikon AF-S Nikkor 50mm f/1.8G"
    assert float(got.exif.get("FocalLength")) == 50.0
    assert float(got.exif.get("FNumber")) == 1.8
    prof = LensDatabase.load().profile_from_exif(got.exif)
    assert prof is not None
    assert "50mm" in prof.name


def test_pack_bits_msb_matches_dng_unpack():
    from rawphotoforge_tpu.io.dng import _unpack_bits

    rng = np.random.default_rng(3)
    for bits in (12, 14):
        v = rng.integers(0, 1 << bits, size=256).astype(np.uint16)
        packed = np.frombuffer(vr.pack_bits_msb(v, bits), dtype=np.uint8)
        np.testing.assert_array_equal(_unpack_bits(packed, bits, 256), v)


def test_entropy_coded_nef_rejected_with_typed_error():
    raw = synthetic_raw(scene(), pattern="RGGB")
    data = vr.write_tiff_ep(raw, bits=12, make="NIKON", compression=34713)
    with pytest.raises(DngError, match="compression 34713"):
        parse_raw(data)


# -- Panasonic RW2 ----------------------------------------------------------

def test_rw2_roundtrip():
    raw = synthetic_raw(scene(), pattern="GBRG", black_level=143,
                        white_level=4095, wb_gains=(1.8, 1.0, 1.6))
    raw = dataclasses.replace(raw, exif={"Model": "DMC-GH5"})
    data = vr.write_rw2(raw)
    got = parse_raw(data)
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    assert got.pattern == "GBRG"
    # dcraw's +15 pedestal convention survives the round trip.
    assert got.black_level == pytest.approx(143.0)
    assert got.white_level == 4095.0
    np.testing.assert_allclose(got.wb_gains, (1.8, 1.0, 1.6), atol=2e-3)
    assert got.wb_known
    assert got.exif.get("Model") == "DMC-GH5"


def test_rw2_sensor_borders_shift_cfa_phase():
    """Border crops with odd origins keep the CFA phase: the decoded
    (cropped) mosaic develops with the pattern at the crop origin."""
    img = scene(h=40, w=48)
    raw_full = synthetic_raw(img, pattern="RGGB", black_level=15,
                             white_level=4095)
    # Crop origin (1, 1): the visible pattern there is RGGB; the full
    # sensor pattern is its roll.
    borders = (1, 1, 33, 41)
    crop = raw_full.mosaic[1:33, 1:41]
    # Re-mosaic so the cropped region is RGGB *at its own origin*.
    raw_vis = synthetic_raw(img[:, 1:33, 1:41], pattern="RGGB",
                            black_level=15, white_level=4095)
    full = raw_full.mosaic.copy()
    full[1:33, 1:41] = raw_vis.mosaic
    fixture = dataclasses.replace(raw_vis, mosaic=full)
    data = vr.write_rw2(fixture, borders=borders)
    got = parse_raw(data)
    assert got.mosaic.shape == (32, 40)
    np.testing.assert_array_equal(got.mosaic, raw_vis.mosaic)
    assert got.pattern == "RGGB"


def test_rw2_compressed_payload_rejected():
    raw = synthetic_raw(scene(), pattern="RGGB", black_level=15)
    data = bytearray(vr.write_rw2(raw))
    truncated = bytes(data[: len(data) - raw.mosaic.size])  # half payload
    with pytest.raises(DngError, match="16-bit"):
        parse_raw(truncated)


# -- Fujifilm RAF -----------------------------------------------------------

def test_raf_bayer_roundtrip():
    raw = synthetic_raw(scene(), pattern="RGGB", black_level=0,
                        white_level=16383, wb_gains=(2.1, 1.0, 1.4))
    data = vr.write_raf(raw)
    got = parse_raw(data)
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    assert got.pattern == "RGGB"
    np.testing.assert_allclose(got.wb_gains, (2.1, 1.0, 1.4), atol=5e-3)


def test_raf_xtrans_roundtrip_and_develop():
    img = scene(h=60, w=96)
    raw = synthetic_raw(img, pattern="XTRANS", black_level=0,
                        white_level=16383, wb_gains=(1.9, 1.0, 1.3))
    data = vr.write_raf(raw)
    got = parse_raw(data)
    assert got.pattern == "XTRANS"
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    planes, _ = develop_raw_image(got, method="nc")
    assert np.asarray(planes).shape == (3, 60, 96)


def test_raf_byte_order_sniff():
    """A big-endian CFA payload decodes identically (both conventions
    exist in the wild; the sniff picks the smooth in-range one)."""
    raw = synthetic_raw(scene(), pattern="RGGB", black_level=0,
                        white_level=16383)
    data = bytearray(vr.write_raf(raw))
    # Byteswap the payload in place (it is the file tail).
    n = raw.mosaic.size * 2
    tail = np.frombuffer(bytes(data[-n:]), dtype="<u2").astype(">u2")
    data[-n:] = tail.tobytes()
    got = parse_raw(bytes(data))
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)


def test_raf_superccd_rejected():
    raw = synthetic_raw(scene(), pattern="RGGB", black_level=0)
    data = bytearray(vr.write_raf(raw))
    # Zap the 0x0131 color-map record tag id so the layout is unknown.
    idx = bytes(data).find(b"\x01\x31", 148)
    assert idx > 0
    data[idx:idx + 2] = b"\x7f\x7f"
    with pytest.raises(DngError, match="SuperCCD|color map"):
        parse_raw(bytes(data))


# -- gray-world WB fallback -------------------------------------------------

def test_gray_world_wb_recovers_neutral_scene():
    """A neutral scene through unknown camera WB develops neutral: the
    estimator recovers the (simulated) channel response."""
    rng = np.random.default_rng(5)
    img = np.repeat(rng.random((1, 48, 64), dtype=np.float32) * 0.8, 3,
                    axis=0)  # gray scene
    raw = synthetic_raw(img, pattern="RGGB", black_level=100,
                        white_level=4000, wb_gains=(1.9, 1.0, 1.4))
    # Strip the WB (NEF shape: maker-note WB is unreadable).
    data = vr.write_tiff_ep(
        dataclasses.replace(raw, wb_gains=(1.0, 1.0, 1.0)), bits=12,
        make="NIKON")
    got = parse_raw(data)
    assert not got.wb_known
    est = estimate_gray_world_gains(got.mosaic, got.pattern,
                                    got.black_level, got.white_level)
    np.testing.assert_allclose(est, (1.9, 1.0, 1.4), rtol=0.05)
    planes, _ = develop_raw_image(got, method="bilinear")
    p = np.asarray(planes)[:, 8:-8, 8:-8]
    means = p.reshape(3, -1).mean(axis=1)
    # Residuals: 12-bit quantization + demosaic + highlight clipping.
    assert abs(means[0] - means[1]) < 0.05 * means[1]
    assert abs(means[2] - means[1]) < 0.05 * means[1]


# -- preview-correlation gate ----------------------------------------------

def test_preview_correlation_gate():
    img = scene(h=96, w=128)
    raw = synthetic_raw(img, pattern="RGGB", black_level=512,
                        white_level=16383, wb_gains=(2.0, 1.0, 1.5))
    jpeg = preview_jpeg(img)
    data = vr.write_tiff_ep(raw, bits=16, make="SONY", sony_tags=True,
                            preview_jpeg=jpeg)
    good = vr.preview_correlation(data)
    assert good is not None and good > vr.CORRELATION_GATE

    # A wrong decode (byte-swapped samples = wrong packing) craters it.
    bad = dataclasses.replace(
        raw, mosaic=raw.mosaic.byteswap().astype(np.uint16))
    assert vr.preview_correlation(data, raw=bad) < 0.5

    # Every vendor container exposes the same gate.
    assert vr.preview_correlation(
        vr.write_rw2(raw, jpg_from_raw=jpeg)) > vr.CORRELATION_GATE
    assert vr.preview_correlation(
        vr.write_raf(dataclasses.replace(raw, black_level=0.0),
                     jpeg_preview=jpeg)) > vr.CORRELATION_GATE
    # No preview -> None, not a crash.
    assert vr.preview_correlation(vr.write_tiff_ep(raw, bits=16)) is None


# -- editor / CLI end-to-end ------------------------------------------------

@pytest.mark.parametrize("ext", ["nef", "arw", "rw2", "raf"])
def test_editor_opens_vendor_raw_sensor_data(ext, tmp_path):
    from rawphotoforge_tpu.engine.editor import PhotoEditor, FULL

    img = scene(h=40, w=64)
    raw = synthetic_raw(img, pattern="RGGB",
                        black_level=0 if ext == "raf" else 200,
                        white_level=16383, wb_gains=(1.7, 1.0, 1.3))
    if ext == "nef":
        data = vr.write_tiff_ep(raw, bits=14, make="NIKON CORPORATION")
    elif ext == "arw":
        data = vr.write_tiff_ep(raw, bits=16, make="SONY", sony_tags=True)
    elif ext == "rw2":
        data = vr.write_rw2(dataclasses.replace(raw, black_level=200))
    else:
        data = vr.write_raf(raw)
    p = tmp_path / f"shot.{ext}"
    p.write_bytes(data)
    ed = PhotoEditor.open(str(p), use_pallas=False,
                          mid_long_edge=32, low_long_edge=16)
    assert ed.opened_from_preview is None  # real sensor decode, no fallback
    out = np.asarray(ed.apply(FULL))
    assert out.shape == (3, 40, 64)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_cli_info_verify_decode(tmp_path, capsys):
    from rawphotoforge_tpu.app.cli import main

    img = scene(h=48, w=64)
    raw = synthetic_raw(img, pattern="RGGB", black_level=512,
                        white_level=16383, wb_gains=(2.0, 1.0, 1.5))
    p = tmp_path / "shot.arw"
    p.write_bytes(vr.write_tiff_ep(raw, bits=16, make="SONY",
                                   sony_tags=True,
                                   preview_jpeg=preview_jpeg(img)))
    rc = main(["info", str(p), "--verify-decode"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "preview correlation" in out and "ok" in out


# -- mutation fuzz ----------------------------------------------------------

def test_vendor_container_mutation_fuzz():
    """Truncations and random byte flips decode or raise typed errors —
    never uncaught struct/index/unicode failures (same harness as the
    DNG fuzz)."""
    img = scene(h=24, w=32)
    raw = synthetic_raw(img, pattern="RGGB", black_level=0,
                        white_level=16383)
    raw12 = synthetic_raw(img, pattern="RGGB", black_level=0,
                          white_level=4095)
    fixtures = [
        vr.write_tiff_ep(raw12, bits=12, make="NIKON"),
        vr.write_tiff_ep(raw, bits=16, make="SONY", sony_tags=True),
        vr.write_rw2(dataclasses.replace(raw, black_level=100)),
        vr.write_raf(raw),
    ]
    rng = np.random.default_rng(11)
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


def test_preview_correlation_orientation_rotated():
    """Portrait captures: develop_raw_image applies the container's
    Orientation tag but vendor preview strips usually carry no EXIF of
    their own — the gate must pass a correct decode whose develop is
    90/180-degree rotated or mirrored relative to the preview (max over
    the 8 dihedral placements), and still crater on wrong unpacking."""
    img = scene(h=96, w=128)
    raw = synthetic_raw(img, pattern="RGGB", black_level=512,
                        white_level=16383, wb_gains=(2.0, 1.0, 1.5))
    jpeg = preview_jpeg(img)  # preview of the UNROTATED scene
    for orientation in (3, 6, 8):
        rot = dataclasses.replace(raw, orientation=orientation)
        data = vr.write_tiff_ep(rot, bits=16, make="SONY", sony_tags=True,
                                preview_jpeg=jpeg)
        good = vr.preview_correlation(data)
        assert good is not None and good > vr.CORRELATION_GATE, (
            orientation, good)
        bad = dataclasses.replace(
            rot, mosaic=rot.mosaic.byteswap().astype(np.uint16))
        assert vr.preview_correlation(data, raw=bad) < 0.5


def test_batch_cli_gray_world_matches_develop(tmp_path):
    """`cli batch` must apply the same gray-world WB fallback as
    `cli develop` for vendor RAWs with unreadable WB (unit gains would
    ship a green-cast JPEG only on the batch route)."""
    from rawphotoforge_tpu.app.cli import main as cli_main

    rng = np.random.default_rng(7)
    img = np.repeat(rng.random((1, 48, 64), dtype=np.float32) * 0.7, 3,
                    axis=0)  # neutral scene
    raw = synthetic_raw(img, pattern="RGGB", black_level=100,
                        white_level=4000, wb_gains=(1.9, 1.0, 1.4))
    data = vr.write_tiff_ep(
        dataclasses.replace(raw, wb_gains=(1.0, 1.0, 1.0)), bits=12,
        make="NIKON")
    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "shot.nef").write_bytes(data)
    outdir = tmp_path / "out"
    assert cli_main(["batch", str(indir), str(outdir)]) == 0
    out = np.asarray(PILImage.open(outdir / "shot.jpg"),
                     dtype=np.float32) / 255.0
    means = out[8:-8, 8:-8].reshape(-1, 3).mean(axis=0)
    # Gray-world balanced: channel means agree like the develop route's.
    assert abs(means[0] - means[1]) < 0.06 * means[1]
    assert abs(means[2] - means[1]) < 0.06 * means[1]
