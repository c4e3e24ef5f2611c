"""Instant host-side previews + the async /open split (engine/instant.py).

The contract under test: a file open must yield first pixels with ZERO
device work (the remote-tunnel cold-compile cost is minutes, CLAUDE.md),
the stand-in must approximate the device develop, and the server must
serve it — explicitly marked — until the background device phase lands.
"""

import io as _io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from conftest import random_linear_image


# ---------------------------------------------------------------------------
# numpy mirrors
# ---------------------------------------------------------------------------

def test_resize_bilinear_np_matches_device():
    from rawphotoforge_tpu.engine.instant import resize_bilinear_np
    from rawphotoforge_tpu.ops.geometry import resize_bilinear

    rng = np.random.default_rng(3)
    planes = rng.random((3, 37, 53), dtype=np.float32)
    got = resize_bilinear_np(planes, 17, 29)
    want = np.asarray(resize_bilinear(planes, 17, 29))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_linear_to_srgb_np_matches_device():
    from rawphotoforge_tpu.core.color import linear_to_srgb
    from rawphotoforge_tpu.engine.instant import linear_to_srgb_np

    x = np.linspace(0.0, 1.0, 513, dtype=np.float32)
    np.testing.assert_allclose(
        linear_to_srgb_np(x), np.asarray(linear_to_srgb(x)), atol=2e-6)


@pytest.mark.parametrize("orientation", [1, 2, 3, 4, 5, 6, 7, 8])
def test_orient_np_matches_device(orientation):
    from rawphotoforge_tpu.engine.instant import _orient_np
    from rawphotoforge_tpu.ops.geometry import orient_exif

    rng = np.random.default_rng(orientation)
    planes = rng.random((3, 6, 9), dtype=np.float32)
    np.testing.assert_array_equal(
        _orient_np(planes, orientation),
        np.asarray(orient_exif(planes, orientation)))


# ---------------------------------------------------------------------------
# superpixel RAW develop approximation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pattern", ["RGGB", "XTRANS"])
def test_quick_from_raw_approximates_develop(pattern):
    """The instant superpixel develop must track the real device develop:
    same WB/matrix/encode, demosaic replaced by block means — on a smooth
    image the two agree closely once both are at the same scale."""
    import jax.numpy as jnp

    from rawphotoforge_tpu.engine.instant import quick_from_raw
    from rawphotoforge_tpu.io.raw import develop_raw_image, synthetic_raw
    from rawphotoforge_tpu.core.color import linear_to_srgb
    from rawphotoforge_tpu.ops.geometry import resize_bilinear

    rng = np.random.default_rng(7)
    # Smooth low-frequency image: demosaic differences vanish, the
    # color-pipeline math dominates the comparison.
    h, w = 96, 132
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        0.2 + 0.5 * np.sin(yy / 31) ** 2,
        0.3 + 0.4 * np.cos(xx / 23) ** 2,
        0.25 + 0.3 * np.sin((xx + yy) / 41) ** 2,
    ])
    xyz_to_cam = np.asarray(
        [[0.7, 0.15, 0.1], [0.2, 0.9, -0.1], [0.05, -0.2, 0.8]],
        dtype=np.float32)
    raw = synthetic_raw(base, pattern=pattern, xyz_to_cam=xyz_to_cam)
    quick = quick_from_raw(raw, long_edge=1280)  # bigger than source: no resize
    assert quick is not None and quick.dtype == np.uint8

    planes, _ = develop_raw_image(raw)
    srgb = np.clip(np.asarray(
        linear_to_srgb(jnp.clip(planes, 0.0, 1.0))), 0.0, 1.0)
    # Bring the full-res develop down to the superpixel grid for comparison.
    qh, qw = quick.shape[:2]
    ref = np.asarray(resize_bilinear(srgb, qh, qw)).transpose(1, 2, 0)
    diff = np.abs(quick.astype(np.float32) / 255.0 - ref)
    assert diff.mean() < 0.02, diff.mean()
    assert np.quantile(diff, 0.99) < 0.08


def test_quick_from_raw_decimated_path():
    """When the superpixel grid exceeds long_edge the decimated gather
    path runs (only the shown tiles are touched): the output shape must
    match resize_long_edge_shape and, on a smooth image, the values must
    track the undecimated superpixel develop."""
    from rawphotoforge_tpu.engine.instant import quick_from_raw
    from rawphotoforge_tpu.io.raw import synthetic_raw
    from rawphotoforge_tpu.ops.geometry import resize_long_edge_shape

    h, w = 96, 132
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        0.2 + 0.5 * np.sin(yy / 37) ** 2,
        0.3 + 0.4 * np.cos(xx / 29) ** 2,
        0.25 + 0.3 * np.sin((xx + yy) / 47) ** 2,
    ])
    raw = synthetic_raw(base, pattern="RGGB")
    # Superpixel grid is 48x66; long_edge=24 forces decimation.
    small = quick_from_raw(raw, long_edge=24)
    assert small.shape[:2] == resize_long_edge_shape(48, 66, 24)
    # The undecimated path at full superpixel resolution, downsampled.
    full = quick_from_raw(raw, long_edge=1280).astype(np.float32)
    from rawphotoforge_tpu.engine.instant import resize_bilinear_np
    want = resize_bilinear_np(full.transpose(2, 0, 1),
                              *small.shape[:2]).transpose(1, 2, 0)
    diff = np.abs(small.astype(np.float32) - want) / 255.0
    assert diff.mean() < 0.02 and np.quantile(diff, 0.99) < 0.08


def test_native_cfa_block_means_matches_numpy():
    """The C++ instant hot loop vs the numpy strided accumulation —
    identical summation order, equal to a ulp of the normalize."""
    from rawphotoforge_tpu import native
    from rawphotoforge_tpu.ops.demosaic import NAMED_CFA

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(9)
    for pat in ("RGGB", "GBRG", "XTRANS"):
        tile = np.asarray(NAMED_CFA[pat])
        ph, pw = tile.shape
        t = rng.integers(0, 65535, size=(11 * ph, 13 * pw), dtype=np.uint16)
        got = native.cfa_block_means(t, ph, pw, tile.reshape(-1),
                                     512.0, 15871.0)
        tt = t.astype(np.float32)
        sums = np.zeros((3, 11, 13), np.float32)
        counts = np.zeros(3, np.float32)
        for dy in range(ph):
            for dx in range(pw):
                ch = int(tile[dy, dx])
                sums[ch] += tt[dy::ph, dx::pw]
                counts[ch] += 1.0
        want = np.clip((sums / counts[:, None, None] - 512.0) / 15871.0,
                       0.0, 1.0)
        np.testing.assert_allclose(got, want, atol=2e-7)
    with pytest.raises(ValueError):
        native.cfa_block_means(t[:-1], 6, 6, np.zeros(36, np.int32), 0, 1)


def test_quick_from_raw_respects_default_crop_and_orientation():
    from rawphotoforge_tpu.engine.instant import quick_from_raw
    from rawphotoforge_tpu.io.raw import synthetic_raw
    import dataclasses

    rng = np.random.default_rng(11)
    base = rng.random((3, 40, 64), dtype=np.float32)
    raw = synthetic_raw(base, pattern="RGGB")
    raw = dataclasses.replace(raw, default_crop=(4, 2, 56, 36), orientation=6)
    quick = quick_from_raw(raw, long_edge=1280)
    # 2x2 superpixels: crop (56, 36) -> (18, 28), orientation 6 swaps.
    assert quick.shape == (28, 18, 3)


def test_quick_from_raw_linear_raw_rgb():
    from rawphotoforge_tpu.engine.instant import quick_from_raw
    from rawphotoforge_tpu.io.dng import RawImage

    rng = np.random.default_rng(13)
    hwc = (rng.random((24, 36, 3)) * 60000).astype(np.uint16)
    raw = RawImage(mosaic=hwc, pattern="RGB", black_level=0.0,
                   white_level=65535.0, wb_gains=(1.0, 1.0, 1.0),
                   xyz_to_cam=None)
    quick = quick_from_raw(raw, long_edge=1280)
    assert quick is not None and quick.shape == (24, 36, 3)


def test_instant_histogram_mass():
    from rawphotoforge_tpu.engine.instant import instant_histogram

    rng = np.random.default_rng(5)
    img = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
    h = instant_histogram(img)
    assert h.shape == (4, 256)
    assert (h.sum(axis=1) == 20 * 30).all()


# ---------------------------------------------------------------------------
# editor integration: open_host / from_host split, lazy pyramid
# ---------------------------------------------------------------------------

def _png_bytes(rng, h, w):
    from PIL import Image as PILImage

    buf = _io.BytesIO()
    PILImage.fromarray(
        (rng.random((h, w, 3)) * 255).astype(np.uint8)).save(buf, "PNG")
    return buf.getvalue()


def test_open_host_from_host_equals_from_bytes():
    from rawphotoforge_tpu.engine.editor import MID, PhotoEditor

    rng = np.random.default_rng(17)
    data = _png_bytes(rng, 40, 60)
    ho = PhotoEditor.open_host(data, "PNG", mid_long_edge=32)
    assert ho.shape == (40, 60)
    # The instant is built at the MID long edge: 40x60 -> 21x32.
    assert ho.instant is not None and ho.instant.shape == (21, 32, 3)
    ed = PhotoEditor.from_host(ho, mid_long_edge=32, low_long_edge=16,
                               use_pallas=False)
    ed2 = PhotoEditor.from_bytes(data, "PNG", mid_long_edge=32,
                                 low_long_edge=16, use_pallas=False)
    np.testing.assert_array_equal(
        np.asarray(ed.apply(MID)), np.asarray(ed2.apply(MID)))
    assert ed2.instant_srgb_u8 is not None


def test_open_host_raises_on_junk():
    from rawphotoforge_tpu._errbase import PhotoEditorError
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    with pytest.raises(PhotoEditorError):
        PhotoEditor.open_host(b"not an image at all", "PNG")


def test_open_host_dng_and_instant():
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    rng = np.random.default_rng(19)
    img = rng.random((3, 32, 48)).astype(np.float32)
    blob = write_dng(synthetic_raw(img), compression=7)
    ho = PhotoEditor.open_host(blob, "DNG")
    assert ho.shape == (32, 48)
    assert ho.instant is not None and ho.instant.shape == (16, 24, 3)


def test_instant_preview_jpeg_and_crop():
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    rng = np.random.default_rng(23)
    ed = PhotoEditor.from_bytes(_png_bytes(rng, 40, 60), "PNG",
                                mid_long_edge=32, use_pallas=False)
    jpeg = ed.instant_preview_jpeg()
    assert jpeg[:2] == b"\xff\xd8"
    hist = ed.instant_histogram()
    assert hist is not None and (hist.sum(axis=1) > 0).all()
    ih, iw = ed.instant_srgb_u8.shape[:2]
    ed.set_crop(10, 5, 50, 35)
    cropped = ed._instant_cropped()
    # The FULL-coord crop rect scales onto the instant's resolution.
    assert cropped.shape == (max(1, round(30 / 40 * ih) - 1) + 1,
                             max(1, round(40 / 60 * iw) - 1) + 1, 3) or (
        0 < cropped.shape[0] < ih and 0 < cropped.shape[1] < iw)
    assert ed.instant_preview_jpeg()[:2] == b"\xff\xd8"


def test_pyramid_is_lazy():
    """MID/LOW device resizes must not run at construction (they are the
    cold-open compiles the async open exists to dodge); first access
    builds them and matches the eager construction."""
    from rawphotoforge_tpu.engine.editor import FULL, LOW, MID, PhotoEditor
    from rawphotoforge_tpu.ops.geometry import resize_bilinear

    rng = np.random.default_rng(29)
    planes = random_linear_image(rng, 50, 70)
    ed = PhotoEditor(planes.transpose(2, 0, 1), mid_long_edge=32,
                     low_long_edge=16, use_pallas=False)
    assert set(ed._originals) == {FULL}
    h, w = ed._extents[MID]
    mid = np.asarray(ed._original_at(MID))[:, :h, :w]
    assert set(ed._originals) >= {FULL, MID}
    fh, fw = ed._extents[FULL]
    want = np.asarray(resize_bilinear(
        ed._originals[FULL][:, :fh, :fw], h, w))
    np.testing.assert_array_equal(mid, want)
    # LOW still lazy until asked.
    assert LOW not in ed._originals
    ed.apply(LOW)
    assert LOW in ed._originals


def test_lens_profile_then_lazy_mid():
    """A lens profile applied before MID materializes must still be
    reflected in the lazily-built MID (it resizes the corrected FULL)."""
    from rawphotoforge_tpu.engine.editor import MID, PhotoEditor
    from rawphotoforge_tpu.io.lensdb import LensProfile

    rng = np.random.default_rng(31)
    planes = random_linear_image(rng, 48, 64)
    ed = PhotoEditor(planes.transpose(2, 0, 1), mid_long_edge=32,
                     use_pallas=False)
    before = np.asarray(ed.apply(MID))
    ed2 = PhotoEditor(planes.transpose(2, 0, 1), mid_long_edge=32,
                      use_pallas=False)
    prof = LensProfile(name="t", distortion=(0.08,))
    ed2.apply_lens_profile(prof)
    after = np.asarray(ed2.apply(MID))
    assert np.abs(after - before).max() > 1e-3  # the correction showed up


# ---------------------------------------------------------------------------
# server: instant era end-to-end
# ---------------------------------------------------------------------------

@pytest.fixture()
def gated_server(monkeypatch, tmp_path):
    """A live server whose /open device phase blocks on an event, freezing
    the instant era so its contract can be asserted deterministically."""
    from rawphotoforge_tpu.app import server as srvmod
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.engine.session import Settings

    gate = threading.Event()
    real_from_host = PhotoEditor.from_host.__func__

    def gated_from_host(cls, ho, **kwargs):
        gate.wait(timeout=60)
        return real_from_host(cls, ho, **kwargs)

    monkeypatch.setattr(PhotoEditor, "from_host",
                        classmethod(gated_from_host))
    rng = np.random.default_rng(42)
    ed = PhotoEditor(random_linear_image(rng, 30, 40).transpose(2, 0, 1),
                     mid_long_edge=24, use_pallas=False)
    httpd = srvmod.serve(ed, port=0, settings=Settings(),
                         settings_path=str(tmp_path / "s.json"),
                         prewarm=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", gate
    gate.set()
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, dict(r.headers), r.read()


def test_server_instant_era(gated_server):
    base, gate = gated_server
    rng = np.random.default_rng(33)
    req = urllib.request.Request(
        base + "/open?name=pic.png", data=_png_bytes(rng, 36, 54),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        out = json.loads(r.read())
    assert out["ok"] and out["instant"]

    # Instant era: preview is the marked host stand-in ...
    status, headers, body = _get(base + "/preview?level=mid")
    assert status == 200 and headers.get("X-RPF-Instant") == "1"
    assert body[:2] == b"\xff\xd8"
    # ... histogram/info/exif come from the host decode ...
    _, _, hist = _get(base + "/histogram")
    assert len(json.loads(hist)) == 4
    _, _, info = _get(base + "/info")
    assert json.loads(info)["shape"] == [36, 54]
    _, _, st = _get(base + "/open/status")
    assert json.loads(st) == {"ready": False, "error": None,
                              "opened_from_preview": None}
    # ... era edits are LIVE: a strong exposure push renders host-side
    # (still marked instant, visibly brighter) and /params reflects it ...
    _, _, pristine = _get(base + "/preview?level=mid")
    req = urllib.request.Request(base + "/edit",
                                 data=json.dumps({"exposure": 2.0}).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        out = json.loads(r.read())
    assert out["ok"] and out["instant"]
    status, headers, edited = _get(base + "/preview?level=mid")
    assert headers.get("X-RPF-Instant") == "1" and edited != pristine
    from PIL import Image as PILImage
    mean_a = np.asarray(PILImage.open(_io.BytesIO(pristine))).mean()
    mean_b = np.asarray(PILImage.open(_io.BytesIO(edited))).mean()
    assert mean_b > mean_a + 10  # +2 EV is unmistakably brighter
    _, _, params = _get(base + "/params")
    assert json.loads(params)["exposure"] == 2.0
    # ... drag frames render from the drag-preview-sized copy ...
    _, h3, lowimg = _get(base + "/preview?level=low")
    assert h3.get("X-RPF-Instant") == "1"
    li = PILImage.open(_io.BytesIO(lowimg))
    ei = PILImage.open(_io.BytesIO(edited))
    assert li.size[0] <= ei.size[0] and li.size[1] <= ei.size[1]
    assert np.asarray(li).mean() > mean_a + 10  # the edit shows at low too
    # ... the zoom viewport slices the era render like preview_jpeg ...
    _, h2, zoomed = _get(base + "/preview?level=mid&rect=0.25,0.25,0.75,0.75")
    assert h2.get("X-RPF-Instant") == "1"
    zi = PILImage.open(_io.BytesIO(zoomed))
    fi = PILImage.open(_io.BytesIO(edited))
    assert zi.size[0] <= fi.size[0] // 2 + 1 and zi.size[1] <= fi.size[1] // 2 + 1
    # ... export-job GETs route to the real handler through the era
    # (an unknown job answers the same typed 400 as outside it) ...
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(base + "/export/status?job=nope")
    assert ei.value.code == 400
    assert "unknown export job" in json.loads(ei.value.read())["error"]
    # ... era-invalid bodies still answer 400, and mask/preset/export
    # state stays locked behind 409 until the open lands.
    req = urllib.request.Request(base + "/edit",
                                 data=json.dumps({"exposur": 1.0}).encode(),
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    req = urllib.request.Request(
        base + "/mask/add",
        data=json.dumps({"name": "m", "point": [1, 1],
                         "smart": True}).encode(),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["instant"]  # geodesic runs host-side
    _, _, names = _get(base + "/masks")
    assert json.loads(names) == ["main", "m"]
    req = urllib.request.Request(
        base + "/mask/remove", data=json.dumps({"name": "m"}).encode(),
        method="POST")
    urllib.request.urlopen(req, timeout=30).read()
    # ... but session-global /settings stays writable during the era.
    req = urllib.request.Request(
        base + "/settings", data=json.dumps({"locale": "ja"}).encode(),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["locale"] == "ja"

    # Release the device phase: the real render takes over, unmarked.
    gate.set()
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        _, _, st = _get(base + "/open/status")
        if json.loads(st)["ready"]:
            break
        time.sleep(0.05)
    else:
        raise AssertionError("open never became ready")
    status, headers, body = _get(base + "/preview?level=mid")
    assert status == 200 and "X-RPF-Instant" not in headers
    assert body[:2] == b"\xff\xd8"
    # The era edit was replayed onto the device session at swap: the
    # exposure persists even without the client re-posting state.
    _, _, params = _get(base + "/params")
    assert json.loads(params)["exposure"] == 2.0


def test_server_era_crop_and_reset(gated_server):
    """Era /crop slices the host render (FULL coords scaled onto the
    instant resolution); /reset restores the pristine decode."""
    base, gate = gated_server
    rng = np.random.default_rng(53)
    req = urllib.request.Request(
        base + "/open?name=pic.png", data=_png_bytes(rng, 40, 80),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["instant"]
    _, _, pristine = _get(base + "/preview?level=mid")

    req = urllib.request.Request(
        base + "/crop",
        data=json.dumps({"x0": 20, "y0": 10, "x1": 60, "y1": 30}).encode(),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["ok"]
    from PIL import Image as PILImage
    _, headers, body = _get(base + "/preview?level=mid")
    assert headers.get("X-RPF-Instant") == "1"
    im = PILImage.open(_io.BytesIO(body))
    full = PILImage.open(_io.BytesIO(pristine))
    # Crop is half the width, half the height of the frame.
    assert im.size[0] < full.size[0] and im.size[1] < full.size[1]
    _, _, info = _get(base + "/info")
    assert json.loads(info)["crop"] == [20, 10, 60, 30]

    req = urllib.request.Request(base + "/reset", data=b"{}", method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["ok"]
    _, _, body = _get(base + "/preview?level=mid")
    assert body == pristine
    gate.set()


def test_server_era_endpoint_fuzz_malformed_bodies(gated_server):
    """Era POST handlers (live /edit, /crop, /preset, /reset plus the
    409 paths) must answer 4xx JSON to malformed bodies — never 500,
    never kill the server or corrupt the era state."""
    base, gate = gated_server
    rng = np.random.default_rng(71)
    req = urllib.request.Request(
        base + "/open?name=pic.png", data=_png_bytes(rng, 24, 30),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["instant"]

    endpoints = ["/edit", "/crop", "/preset", "/reset", "/mask/add",
                 "/settings", "/export/start"]
    bodies = [b"", b"null", b"[]", b'"str"', b"{", b"\xff\xfe\x00",
              json.dumps({"exposure": "NaN"}).encode(),
              json.dumps({"_target": "sky", "exposure": 1}).encode(),
              json.dumps({"curve_brightness": [[1]]}).encode(),
              json.dumps({"x0": -1, "y0": -1, "x1": -5, "y1": -5}).encode(),
              json.dumps({"masks": "nope"}).encode(),
              json.dumps({"masks": [{"name": "main"}]}).encode(),
              json.dumps({"crop": [9, 9], "masks": []}).encode()]
    bodies += [bytes(rng.integers(0, 256, size=int(rng.integers(1, 120)),
                                  dtype=np.uint8)) for _ in range(10)]
    for ep in endpoints:
        for body in bodies:
            req = urllib.request.Request(base + ep, data=body,
                                         method="POST")
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    status = r.status
            except urllib.error.HTTPError as e:
                status = e.code
            assert status < 500, (ep, body[:40], status)
    # Era still alive and pristine-renderable after the storm.
    status, headers, body = _get(base + "/preview?level=mid")
    assert status == 200 and headers.get("X-RPF-Instant") == "1"
    assert body[:2] == b"\xff\xd8"
    gate.set()


def test_server_era_similarity_masks(gated_server):
    """Similarity masks work DURING the era: point-prompted selection on
    the era render, per-mask edits, overlay, invert/remove — and the
    whole sequence replays on the real session at swap."""
    base, gate = gated_server
    rng = np.random.default_rng(79)
    # Two flat color halves: an unambiguous similarity selection.
    img = np.zeros((40, 80, 3), np.uint8)
    img[:, :40] = (200, 40, 40)
    img[:, 40:] = (40, 40, 200)
    buf = _io.BytesIO()
    from PIL import Image as PILImage
    PILImage.fromarray(img).save(buf, "PNG")
    req = urllib.request.Request(
        base + "/open?name=halves.png", data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["instant"]

    def post(path, body):
        req = urllib.request.Request(
            base + path, data=json.dumps(body).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            return json.loads(r.read())

    # Select the red half by point prompt (FULL coords).
    assert post("/mask/add", {"name": "red", "point": [10, 20],
                              "tolerance": 0.3})["instant"]
    _, _, names = _get(base + "/masks")
    assert json.loads(names) == ["main", "red"]
    # Overlay renders host-side, marked instant.
    status, headers, _ = _get(base + "/preview?overlay=red")
    assert status == 200 and headers.get("X-RPF-Instant") == "1"
    # Kill the red half's exposure through the mask.
    _, _, before = _get(base + "/preview?level=mid")
    assert post("/edit", {"_target": "red", "exposure": -6.0})["instant"]
    _, _, after = _get(base + "/preview?level=mid")
    a = np.asarray(PILImage.open(_io.BytesIO(before)).convert("RGB"),
                   dtype=np.float32)
    b = np.asarray(PILImage.open(_io.BytesIO(after)).convert("RGB"),
                   dtype=np.float32)
    w2 = a.shape[1] // 2
    assert a[:, :w2].mean() - b[:, :w2].mean() > 30   # red half darkened
    assert abs(a[:, w2:].mean() - b[:, w2:].mean()) < 8  # blue untouched
    _, _, params = _get(base + "/params?mask=red")
    assert json.loads(params)["exposure"] == -6.0

    # Invert: now the BLUE half darkens instead.
    assert post("/mask/invert", {"name": "red"})["instant"]
    _, _, inv = _get(base + "/preview?level=mid")
    c = np.asarray(PILImage.open(_io.BytesIO(inv)).convert("RGB"),
                   dtype=np.float32)
    assert a[:, w2:].mean() - c[:, w2:].mean() > 30
    assert post("/mask/invert", {"name": "red"})["instant"]  # back

    # Swap in the device session: the mask + its params persist.
    gate.set()
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        _, _, st = _get(base + "/open/status")
        if json.loads(st)["ready"]:
            break
        time.sleep(0.05)
    _, _, names = _get(base + "/masks")
    assert json.loads(names) == ["main", "red"]
    _, _, params = _get(base + "/params?mask=red")
    assert json.loads(params)["exposure"] == -6.0
    status, headers, body = _get(base + "/preview?level=mid")
    assert status == 200 and "X-RPF-Instant" not in headers
    d = np.asarray(PILImage.open(_io.BytesIO(body)).convert("RGB"),
                   dtype=np.float32)
    # The real render shows the same look: red half dark, blue intact.
    assert d[:, :w2].mean() < d[:, w2:].mean() - 30

    # remove replays too: do it in a fresh era over the same session.
    # (covered by the handler sharing era_mask_remove's replay path)


def test_finisher_claim_race(monkeypatch, tmp_path):
    """An edit posted WHILE the finisher is applying the previous edit
    must not be lost: the in-flight item is claimed, so the full-state
    collapse appends instead of popping it, and the drain loop picks the
    newcomer up before swapping."""
    from rawphotoforge_tpu.app.server import EditorApp
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.engine.session import Settings

    rng = np.random.default_rng(101)
    open_gate = threading.Event()
    real_from_host = PhotoEditor.from_host.__func__

    def gated_from_host(cls, ho, **kwargs):
        open_gate.wait(timeout=60)
        return real_from_host(cls, ho, **kwargs)

    monkeypatch.setattr(PhotoEditor, "from_host",
                        classmethod(gated_from_host))
    ed0 = PhotoEditor(random_linear_image(rng, 20, 26).transpose(2, 0, 1),
                      mid_long_edge=16, use_pallas=False)
    app = EditorApp(ed0, settings=Settings(),
                    settings_path=str(tmp_path / "s.json"), prewarm=False)
    out = app.start_open(
        open("/dev/null", "rb").read() or _png_bytes(rng, 20, 26),
        "p.png")
    assert out["instant"]

    in_replay = threading.Event()
    release_replay = threading.Event()
    applied = []
    real_replay = EditorApp._replay_item

    def slow_replay(self, ed, kind, body):
        applied.append((kind, dict(body) if isinstance(body, dict) else body))
        in_replay.set()
        release_replay.wait(timeout=60)
        return real_replay(self, ed, kind, body)

    monkeypatch.setattr(EditorApp, "_replay_item", slow_replay)
    with app.lock:
        app.era_edit({"exposure": 1.0})
    open_gate.set()               # device phase proceeds to the replay
    assert in_replay.wait(timeout=60)
    with app.lock:                # finisher is mid-apply of edit 1
        app.era_edit({"contrast": 40})
        assert len(app.opening["replay"]) == 2  # appended, NOT collapsed
    release_replay.set()
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if app.opening is None:
            break
        time.sleep(0.02)
    assert app.opening is None
    assert [k for k, _ in applied] == ["edit", "edit"]
    assert applied[1][1] == {"contrast": 40}
    assert app.editor.params().contrast == 40


def test_server_era_reset_replays_in_order(gated_server):
    """edit -> reset -> edit during the era must land on the device
    session as exactly the last edit (reset is a replay ITEM, so items
    a concurrent finisher already applied get undone too)."""
    base, gate = gated_server
    rng = np.random.default_rng(97)
    req = urllib.request.Request(
        base + "/open?name=pic.png", data=_png_bytes(rng, 30, 40),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["instant"]

    def post(path, body):
        req = urllib.request.Request(
            base + path, data=json.dumps(body).encode(), method="POST")
        urllib.request.urlopen(req, timeout=30).read()

    post("/edit", {"exposure": 1.0, "vignette": 50})
    post("/crop", {"x0": 5, "y0": 5, "x1": 30, "y1": 25})
    post("/reset", {})
    _, _, p = _get(base + "/params")
    assert json.loads(p)["exposure"] == 0.0  # era state reset
    post("/edit", {"contrast": 40})
    gate.set()
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        _, _, st = _get(base + "/open/status")
        if json.loads(st)["ready"]:
            break
        time.sleep(0.05)
    _, _, p = _get(base + "/params")
    p = json.loads(p)
    assert p["contrast"] == 40 and p["exposure"] == 0.0
    assert p["vignette"] == 0
    _, _, info = _get(base + "/info")
    assert json.loads(info)["crop"] is None


def test_server_era_model_mask(monkeypatch, tmp_path):
    """Model masks work during the era: the segmenter is a host process
    and only needs a render. The prompt runs on the era render at
    instant resolution and replays at full resolution on swap."""
    from rawphotoforge_tpu.app import server as srvmod
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.engine.segmenter import make_segmenter
    from rawphotoforge_tpu.engine.session import Settings

    def disk(rgb_u8, point_xy, radius=6):
        h, w = rgb_u8.shape[:2]
        yy, xx = np.mgrid[0:h, 0:w]
        x, y = point_xy
        return np.where((xx - x) ** 2 + (yy - y) ** 2 <= radius ** 2,
                        1.0, -1.0)

    gate = threading.Event()
    real_from_host = PhotoEditor.from_host.__func__

    def gated_from_host(cls, ho, **kwargs):
        gate.wait(timeout=60)
        return real_from_host(cls, ho, **kwargs)

    monkeypatch.setattr(PhotoEditor, "from_host",
                        classmethod(gated_from_host))
    rng = np.random.default_rng(83)
    ed = PhotoEditor(random_linear_image(rng, 30, 40).transpose(2, 0, 1),
                     mid_long_edge=24, use_pallas=False)
    httpd = srvmod.serve(ed, port=0, settings=Settings(),
                         settings_path=str(tmp_path / "s.json"),
                         prewarm=False,
                         segmenter=make_segmenter(disk))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        req = urllib.request.Request(
            base + "/open?name=pic.png", data=_png_bytes(rng, 40, 60),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["instant"]
        req = urllib.request.Request(
            base + "/mask/add",
            data=json.dumps({"name": "dog", "point": [30, 20],
                             "model": True}).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["instant"]
        _, _, names = _get(base + "/masks")
        assert json.loads(names) == ["main", "dog"]
        status, headers, _ = _get(base + "/preview?overlay=dog")
        assert status == 200 and headers.get("X-RPF-Instant") == "1"
        # Arbitrary specs are still rejected (CSRF → subprocess defense).
        req = urllib.request.Request(
            base + "/mask/add",
            data=json.dumps({"name": "evil", "point": [1, 1],
                             "model": "rm -rf /"}).encode(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

        gate.set()
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            _, _, st = _get(base + "/open/status")
            if json.loads(st)["ready"]:
                break
            time.sleep(0.05)
        _, _, names = _get(base + "/masks")
        assert json.loads(names) == ["main", "dog"]  # replayed full-res
    finally:
        gate.set()
        httpd.shutdown()


def test_server_era_preset_applies_and_replays(gated_server):
    """A preset loaded during the era renders its main-mask look
    host-side and replays in FULL (crop included) onto the device
    session at swap."""
    base, gate = gated_server
    rng = np.random.default_rng(67)
    req = urllib.request.Request(
        base + "/open?name=pic.png", data=_png_bytes(rng, 40, 80),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["instant"]
    _, _, pristine = _get(base + "/preview?level=mid")

    from rawphotoforge_tpu.core.params import EditParameters
    p = EditParameters()
    p.set_tone(exposure=1.5, contrast=20)
    preset = {"version": 1, "crop": [10, 5, 70, 35],
              "masks": [{"name": "main", "params": p.to_json()}]}
    req = urllib.request.Request(
        base + "/preset", data=json.dumps(preset).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["instant"]
    _, headers, body = _get(base + "/preview?level=mid")
    assert headers.get("X-RPF-Instant") == "1" and body != pristine
    _, _, params = _get(base + "/params")
    assert json.loads(params)["exposure"] == 1.5
    # Era GET /preset round-trips the era state.
    _, _, saved = _get(base + "/preset")
    saved = json.loads(saved)
    assert saved["crop"] == [10, 5, 70, 35]
    assert saved["masks"][0]["params"]["exposure"] == 1.5

    gate.set()
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        _, _, st = _get(base + "/open/status")
        if json.loads(st)["ready"]:
            break
        time.sleep(0.05)
    _, _, params = _get(base + "/params")
    assert json.loads(params)["exposure"] == 1.5
    _, _, info = _get(base + "/info")
    assert json.loads(info)["crop"] == [10, 5, 70, 35]


def test_server_instant_startup(monkeypatch, tmp_path):
    """serve(None, initial_file=...) listens during the initial file's
    device phase: the era carries the UI (preview + live edits) from
    t=0, then the session lands."""
    from rawphotoforge_tpu.app import server as srvmod
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.engine.session import Settings

    gate = threading.Event()
    real_from_host = PhotoEditor.from_host.__func__

    def gated_from_host(cls, ho, **kwargs):
        gate.wait(timeout=60)
        return real_from_host(cls, ho, **kwargs)

    monkeypatch.setattr(PhotoEditor, "from_host",
                        classmethod(gated_from_host))
    rng = np.random.default_rng(59)
    httpd = srvmod.serve(None, port=0, settings=Settings(),
                         settings_path=str(tmp_path / "s.json"),
                         prewarm=False,
                         initial_file=(_png_bytes(rng, 30, 44), "start.png"))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        status, headers, body = _get(base + "/preview?level=mid")
        assert status == 200 and headers.get("X-RPF-Instant") == "1"
        req = urllib.request.Request(
            base + "/edit", data=json.dumps({"contrast": 60}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["instant"]
        gate.set()
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            _, _, st = _get(base + "/open/status")
            if json.loads(st)["ready"]:
                break
            time.sleep(0.05)
        else:
            raise AssertionError("startup open never became ready")
        _, _, info = _get(base + "/info")
        assert json.loads(info)["shape"] == [30, 44]
        _, _, params = _get(base + "/params")
        assert json.loads(params)["contrast"] == 60  # era edit replayed
    finally:
        gate.set()
        httpd.shutdown()


def test_server_instant_startup_device_failure_503(monkeypatch, tmp_path):
    """If the STARTUP open's device phase fails there is no previous
    session to roll back to: endpoints answer 503 carrying the error,
    and a fresh POST /open recovers the server."""
    from rawphotoforge_tpu.app import server as srvmod
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.engine.session import Settings

    real_from_host = PhotoEditor.from_host.__func__
    fail = {"on": True}

    def flaky_from_host(cls, ho, **kwargs):
        if fail["on"]:
            raise RuntimeError("startup device failure")
        return real_from_host(cls, ho, **kwargs)

    monkeypatch.setattr(PhotoEditor, "from_host",
                        classmethod(flaky_from_host))
    rng = np.random.default_rng(61)
    httpd = srvmod.serve(None, port=0, settings=Settings(),
                         settings_path=str(tmp_path / "s.json"),
                         prewarm=False,
                         initial_file=(_png_bytes(rng, 30, 44), "start.png"))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            _, _, st = _get(base + "/open/status")
            if json.loads(st)["ready"]:
                break
            time.sleep(0.05)
        assert "startup device failure" in json.loads(st)["error"]
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(base + "/preview?level=mid")
        assert ei.value.code == 503
        assert "startup device failure" in json.loads(
            ei.value.read())["error"]
        # Recovery: a fresh open brings the server up.
        fail["on"] = False
        req = urllib.request.Request(
            base + "/open?name=pic.png", data=_png_bytes(rng, 20, 26),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["ok"]
        _wait = time.monotonic() + 60
        while time.monotonic() < _wait:
            _, _, st = _get(base + "/open/status")
            if json.loads(st)["ready"] and not json.loads(st)["error"]:
                break
            time.sleep(0.05)
        _, _, info = _get(base + "/info")
        assert json.loads(info)["shape"] == [20, 26]
    finally:
        httpd.shutdown()


def test_server_open_device_failure_rolls_back(monkeypatch, tmp_path):
    """A device-phase failure must END the instant era: the previous
    session (never replaced until success) serves again, the error
    surfaces once via /open/status, and edits work — not a permanent
    409 limbo."""
    from rawphotoforge_tpu.app import server as srvmod
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.engine.session import Settings

    def boom_from_host(cls, ho, **kwargs):
        raise RuntimeError("device exploded")

    monkeypatch.setattr(PhotoEditor, "from_host", classmethod(boom_from_host))
    rng = np.random.default_rng(47)
    ed = PhotoEditor(random_linear_image(rng, 30, 40).transpose(2, 0, 1),
                     mid_long_edge=24, use_pallas=False)
    httpd = srvmod.serve(ed, port=0, settings=Settings(),
                         settings_path=str(tmp_path / "s.json"),
                         prewarm=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        req = urllib.request.Request(
            base + "/open?name=pic.png", data=_png_bytes(rng, 36, 54),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["instant"]
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            _, _, st = _get(base + "/open/status")
            st = json.loads(st)
            if st["ready"]:
                break
            time.sleep(0.05)
        else:
            raise AssertionError("rollback never became ready")
        assert "device exploded" in st["error"]
        # The previous session is live again: unmarked preview + edits OK.
        status, headers, body = _get(base + "/preview?level=mid")
        assert status == 200 and "X-RPF-Instant" not in headers
        _, _, info = _get(base + "/info")
        assert json.loads(info)["shape"] == [30, 40]
        req = urllib.request.Request(
            base + "/edit", data=json.dumps({"exposure": 0.5}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["ok"]
    finally:
        httpd.shutdown()


def test_superseded_open_failure_keeps_device_ready_cleared(
        monkeypatch, tmp_path):
    """A superseded open's device-phase FAILURE must not set device_ready
    (a newer /open just cleared it for ITS era) and must not roll back
    the newer era or record an error for it."""
    from rawphotoforge_tpu.app.server import EditorApp
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.engine.session import Settings

    rng = np.random.default_rng(211)
    gates = {(20, 26): threading.Event(), (24, 30): threading.Event()}
    calls = []
    real_from_host = PhotoEditor.from_host.__func__

    def gated_from_host(cls, ho, **kwargs):
        # Keyed on the opened image's shape: thread scheduling must not
        # decide which open fails.
        calls.append(ho.shape)
        gates[ho.shape].wait(timeout=60)
        if ho.shape == (20, 26):
            raise RuntimeError("stale open exploded")
        return real_from_host(cls, ho, **kwargs)

    monkeypatch.setattr(PhotoEditor, "from_host",
                        classmethod(gated_from_host))
    ed0 = PhotoEditor(random_linear_image(rng, 20, 26).transpose(2, 0, 1),
                      mid_long_edge=16, use_pallas=False)
    app = EditorApp(ed0, settings=Settings(),
                    settings_path=str(tmp_path / "s.json"), prewarm=False)
    with app.lock:
        assert app.start_open(_png_bytes(rng, 20, 26), "a.png")["instant"]
    with app.lock:
        assert app.start_open(_png_bytes(rng, 24, 30), "b.png")["instant"]
    assert not app.device_ready.is_set()
    seq2 = app.opening["seq"]

    gates[(20, 26)].set()  # stale open #1 fails now
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline and len(calls) < 2:
        time.sleep(0.02)
    time.sleep(0.2)  # let open #1's failure path run to completion
    # Open #2 still owns the era: not ready, not rolled back, no error.
    assert not app.device_ready.is_set()
    assert app.opening is not None and app.opening["seq"] == seq2
    assert app.open_status() == {"ready": False, "error": None,
                                 "opened_from_preview": None}

    gates[(24, 30)].set()  # open #2 lands
    assert app.device_ready.wait(timeout=60)
    assert app.opening is None and app.last_open_error is None
    assert app.editor.shape == (24, 30)


def test_era_preset_get_includes_regional_masks(gated_server):
    """GET /preset during the era must serialize era regional masks'
    params (the editor.preset_json contract), not just main."""
    base, gate = gated_server
    rng = np.random.default_rng(223)
    req = urllib.request.Request(
        base + "/open?name=pic.png", data=_png_bytes(rng, 30, 40),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["instant"]

    def post(path, body):
        req = urllib.request.Request(
            base + path, data=json.dumps(body).encode(), method="POST")
        urllib.request.urlopen(req, timeout=30).read()

    post("/mask/add", {"name": "spot", "point": [10, 10],
                       "tolerance": 0.3})
    post("/edit", {"_target": "spot", "exposure": -2.0})
    _, _, p = _get(base + "/preset")
    p = json.loads(p)
    by_name = {m["name"]: m["params"] for m in p["masks"]}
    assert set(by_name) == {"main", "spot"}
    assert by_name["spot"]["exposure"] == -2.0
    gate.set()


def test_era_info_preview_shape_never_upscales(gated_server):
    """A small image's era preview_shape must match the post-swap
    pyramid (no upscale past the source size)."""
    base, gate = gated_server
    rng = np.random.default_rng(227)
    req = urllib.request.Request(
        base + "/open?name=pic.png", data=_png_bytes(rng, 30, 40),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["instant"]
    _, _, info = _get(base + "/info")
    info = json.loads(info)
    assert info["instant"] and info["preview_shape"] == [30, 40]
    gate.set()
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        _, _, st = _get(base + "/open/status")
        if json.loads(st)["ready"]:
            break
        time.sleep(0.05)
    _, _, info2 = _get(base + "/info")
    assert json.loads(info2)["preview_shape"] == [30, 40]


def test_quick_linear_from_raw_unknown_pattern_returns_none():
    from rawphotoforge_tpu.engine.instant import quick_linear_from_raw

    class FakeRaw:
        mosaic = np.zeros((32, 32), np.uint16)
        pattern = "NOT_A_CFA"
        black_level = 0.0
        white_level = 1023.0
        wb_gains = (1.0, 1.0, 1.0)
        wb_known = True
        xyz_to_cam = None
        default_crop = None
        orientation = 1

    assert quick_linear_from_raw(FakeRaw(), 64) is None


def test_async_open_prewarms_after_swap_without_era_edits(
        monkeypatch, tmp_path):
    """The no-edits-during-open case must still warm the new session's
    residual programs exactly once, after the swap."""
    from rawphotoforge_tpu.app.server import EditorApp
    from rawphotoforge_tpu.engine import prewarm as pw
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.engine.session import Settings

    warmed = []
    monkeypatch.setattr(pw, "warm_async",
                        lambda *a, **k: warmed.append((a, k)))
    rng = np.random.default_rng(229)
    ed0 = PhotoEditor(random_linear_image(rng, 20, 26).transpose(2, 0, 1),
                      mid_long_edge=16, use_pallas=False)
    app = EditorApp(ed0, settings=Settings(),
                    settings_path=str(tmp_path / "s.json"), prewarm=True)
    with app.lock:
        assert app.start_open(_png_bytes(rng, 24, 30), "b.png")["instant"]
    assert app.device_ready.wait(timeout=60)
    assert len(warmed) == 1
    assert warmed[0][1].get("editor") is app.editor


def test_server_concurrent_soak_across_era_transitions(
        monkeypatch, tmp_path):
    """Concurrency soak: worker threads fire random GET/POSTs while
    /open era transitions (start, swap, supersede, rollback) churn.
    Every response must be a well-formed HTTP status from the contract
    set — no hung requests, no dropped connections, no 500s — and the
    server must end in a consistent, editable state."""
    import urllib.error

    from rawphotoforge_tpu.app import server as srvmod
    from rawphotoforge_tpu.engine.editor import PhotoEditor
    from rawphotoforge_tpu.engine.session import Settings

    # Device phase artificially slowed (not gated: transitions churn on
    # their own) so opens overlap with traffic.
    real_from_host = PhotoEditor.from_host.__func__

    def slow_from_host(cls, ho, **kwargs):
        time.sleep(0.05)
        if ho.shape == (21, 27):   # one shape fails -> rollback path
            raise RuntimeError("boom")
        return real_from_host(cls, ho, **kwargs)

    monkeypatch.setattr(PhotoEditor, "from_host",
                        classmethod(slow_from_host))
    rng = np.random.default_rng(241)
    ed = PhotoEditor(random_linear_image(rng, 30, 40).transpose(2, 0, 1),
                     mid_long_edge=24, use_pallas=False)
    httpd = srvmod.serve(ed, port=0, settings=Settings(),
                         settings_path=str(tmp_path / "s.json"),
                         prewarm=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    pngs = {shape: _png_bytes(rng, *shape)
            for shape in ((20, 26), (21, 27), (24, 30))}
    errors: list = []
    OK = {200, 400, 404, 409, 503}

    def req(path, body=None):
        try:
            r = urllib.request.Request(
                base + path,
                data=(None if body is None else
                      body if isinstance(body, bytes)
                      else json.dumps(body).encode()),
                method="GET" if body is None else "POST")
            with urllib.request.urlopen(r, timeout=30) as resp:
                resp.read()
                return resp.status
        except urllib.error.HTTPError as e:
            e.read()
            return e.code
        except Exception as e:  # noqa: BLE001 — dropped conn = bug
            errors.append(f"{path}: {type(e).__name__} {e}")
            return -1

    def worker(seed):
        r = np.random.default_rng(seed)
        for _ in range(40):
            roll = r.integers(0, 10)
            if roll == 0:
                shape = list(pngs)[int(r.integers(0, 3))]
                code = req(f"/open?name=f{shape[0]}.png", pngs[shape])
            elif roll < 4:
                code = req("/edit", {"exposure": float(r.uniform(-2, 2))})
            elif roll == 4:
                code = req("/crop", {"x0": 1, "y0": 1, "x1": 15, "y1": 12})
            elif roll == 5:
                code = req("/reset", {})
            elif roll == 6:
                code = req("/preview?level=mid")
            elif roll == 7:
                code = req("/histogram")
            elif roll == 8:
                code = req("/params?mask=main")
            else:
                code = req("/open/status")
            if code not in OK:
                errors.append(f"unexpected status {code}")

    threads = [threading.Thread(target=worker, args=(300 + i,))
               for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
        assert not th.is_alive(), "soak worker hung"
    assert not errors, errors[:5]
    # Quiesce: let any in-flight open land, then the session must edit.
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        _, _, st = _get(base + "/open/status")
        if json.loads(st)["ready"]:
            break
        time.sleep(0.05)
    assert req("/edit", {"exposure": 0.5}) == 200
    assert req("/preview?level=mid") == 200
    httpd.shutdown()


def test_server_era_labeled_points_mask(gated_server):
    """Labeled multi-point selection during the era (r5): a wide-
    tolerance include grabs two similar bands, the exclude point carves
    the second out — asserted on the era render AND after the swap
    replays the same request on the device session."""
    base, gate = gated_server
    img = np.zeros((40, 80, 3), np.uint8)
    img[:, :40] = (200, 60, 60)     # band A (red)
    img[:, 40:] = (210, 120, 60)    # band B (orange: similar to A)
    buf = _io.BytesIO()
    from PIL import Image as PILImage
    PILImage.fromarray(img).save(buf, "PNG")
    req = urllib.request.Request(
        base + "/open?name=bands.png", data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["instant"]

    def post(path, body):
        req = urllib.request.Request(
            base + path, data=json.dumps(body).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            return json.loads(r.read())

    # Include on A with a tolerance wide enough to also take B; exclude
    # on B carves it back out.
    assert post("/mask/add", {"name": "sel",
                              "points": [[10, 20], [60, 20]],
                              "labels": [1, 0],
                              "tolerance": 0.8})["instant"]
    _, _, before = _get(base + "/preview?level=mid")
    assert post("/edit", {"_target": "sel", "exposure": -6.0})["instant"]
    _, _, after = _get(base + "/preview?level=mid")
    a = np.asarray(PILImage.open(_io.BytesIO(before)).convert("RGB"),
                   dtype=np.float32)
    b = np.asarray(PILImage.open(_io.BytesIO(after)).convert("RGB"),
                   dtype=np.float32)
    w2 = a.shape[1] // 2
    assert a[:, :w2].mean() - b[:, :w2].mean() > 30   # A darkened
    assert abs(a[:, w2:].mean() - b[:, w2:].mean()) < 8  # B carved out

    # Swap: the labeled request replays on the real session with the
    # same carve-out.
    gate.set()
    for _ in range(200):
        st = json.loads(_get(base + "/open/status")[2])
        if st["ready"]:
            break
        time.sleep(0.05)
    assert st["ready"] and not st["error"]
    _, headers, dev = _get(base + "/preview?level=mid")
    assert headers.get("X-RPF-Instant") is None
    d = np.asarray(PILImage.open(_io.BytesIO(dev)).convert("RGB"),
                   dtype=np.float32)
    assert d[:, :w2].mean() < d[:, w2:].mean() - 30


def test_server_era_smart_points_mask(gated_server):
    """Era smart selection with an exclude seed: competing geodesic
    floods split a flat region at the midline (hostdev
    smart_logits_points_np path through /mask/add)."""
    base, gate = gated_server
    img = np.full((40, 80, 3), 128, np.uint8)  # one flat region
    buf = _io.BytesIO()
    from PIL import Image as PILImage
    PILImage.fromarray(img).save(buf, "PNG")
    req = urllib.request.Request(
        base + "/open?name=flat.png", data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["instant"]

    def post(path, body):
        req = urllib.request.Request(
            base + path, data=json.dumps(body).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            return json.loads(r.read())

    assert post("/mask/add", {"name": "half", "smart": True,
                              "points": [[8, 20], [72, 20]],
                              "labels": [1, 0],
                              "tolerance": 5.0})["instant"]
    _, _, before = _get(base + "/preview?level=mid")
    assert post("/edit", {"_target": "half", "exposure": -6.0})["instant"]
    _, _, after = _get(base + "/preview?level=mid")
    a = np.asarray(PILImage.open(_io.BytesIO(before)).convert("RGB"),
                   dtype=np.float32)
    b = np.asarray(PILImage.open(_io.BytesIO(after)).convert("RGB"),
                   dtype=np.float32)
    w = a.shape[1]
    assert a[:, : w // 4].mean() - b[:, : w // 4].mean() > 30  # include side
    assert abs(a[:, -w // 4:].mean() - b[:, -w // 4:].mean()) < 8  # exclude
    gate.set()
