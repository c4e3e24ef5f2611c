"""Preview-server API tests (in-process, CPU backend)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from rawphotoforge_tpu.app.server import serve
from rawphotoforge_tpu.engine.editor import LOW, PhotoEditor

from conftest import random_linear_image


@pytest.fixture(scope="module")
def base_url(tmp_path_factory):
    from rawphotoforge_tpu.engine.session import Settings

    rng = np.random.default_rng(42)
    ed = PhotoEditor.from_rgb_f32(
        random_linear_image(rng, 60, 90),
        use_pallas=False, mid_long_edge=48, low_long_edge=24,
    )
    settings_path = str(tmp_path_factory.mktemp("settings") / "settings.json")
    httpd = serve(ed, port=0, settings=Settings(),
                  settings_path=settings_path, prewarm=False)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _post(url, obj):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read() or b"{}")


def test_index_page(base_url):
    status, ctype, body = _get(base_url + "/")
    assert status == 200 and "text/html" in ctype
    assert b"RawPhotoForge-TPU" in body


def test_preview_jpeg(base_url):
    for level in ("low", "mid", "full"):
        status, ctype, body = _get(base_url + f"/preview?level={level}")
        assert status == 200 and ctype == "image/jpeg"
        assert body[:2] == b"\xff\xd8"  # JPEG SOI


def test_edit_changes_preview(base_url):
    _, _, before = _get(base_url + "/preview?level=mid")
    status, _ = _post(base_url + "/edit", {"exposure": 2.0})
    assert status == 200
    _, _, after = _get(base_url + "/preview?level=mid")
    assert before != after
    _post(base_url + "/reset", {})


def test_histogram_endpoint(base_url):
    status, _, body = _get(base_url + "/histogram")
    h = json.loads(body)
    assert status == 200
    assert len(h) == 4 and len(h[0]) == 256


def test_curve_edit(base_url):
    status, _ = _post(
        base_url + "/edit",
        {"curve_brightness": [[0, 0], [30000, 45000], [65535, 65535]]},
    )
    assert status == 200
    _post(base_url + "/reset", {})


def test_mask_endpoints(base_url):
    status, _ = _post(
        base_url + "/mask/add", {"name": "spot", "point": [10, 10], "tolerance": 0.2}
    )
    assert status == 200
    _, _, body = _get(base_url + "/masks")
    assert json.loads(body) == ["main", "spot"]
    _post(base_url + "/mask/invert", {"name": "spot"})
    _post(base_url + "/mask/remove", {"name": "spot"})
    _, _, body = _get(base_url + "/masks")
    assert json.loads(body) == ["main"]


def test_preset_roundtrip(base_url):
    _post(base_url + "/edit", {"contrast": 40})
    _, _, preset = _get(base_url + "/preset")
    obj = json.loads(preset)
    assert obj["masks"][0]["params"]["contrast"] == 40
    status, _ = _post(base_url + "/preset", obj)
    assert status == 200
    _post(base_url + "/reset", {})


def test_export_endpoint(base_url):
    status, ctype, body = _get(base_url + "/export")
    assert status == 200 and ctype == "image/jpeg" and body[:2] == b"\xff\xd8"


def test_bad_request_returns_400(base_url):
    req = urllib.request.Request(
        base_url + "/mask/remove", data=b'{"wrong": 1}', method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=60)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_settings_endpoints(base_url, tmp_path, monkeypatch):
    import os
    status, _, body = _get(base_url + "/settings")
    s = json.loads(body)
    assert s["ui_preview_size"] == 1280
    status, out = _post(base_url + "/settings", {"locale": "ja", "ui_preview_size": 900})
    assert status == 200 and out["locale"] == "ja" and out["ui_preview_size"] == 900
    # Page renders with Japanese labels now.
    _, _, page = _get(base_url + "/")
    assert "露出".encode() in page
    _post(base_url + "/settings", {"locale": "en"})


def test_crop_endpoint(base_url):
    status, _ = _post(base_url + "/crop", {"x0": 10, "y0": 5, "x1": 60, "y1": 40})
    assert status == 200
    from PIL import Image as PILImage
    import io as _io
    _, _, body = _get(base_url + "/preview?level=full")
    img = PILImage.open(_io.BytesIO(body))
    assert img.size == (50, 35)
    _post(base_url + "/crop", {"clear": True})
    _, _, body = _get(base_url + "/preview?level=full")
    assert PILImage.open(_io.BytesIO(body)).size == (90, 60)


def test_original_preview_and_info(base_url):
    _post(base_url + "/edit", {"exposure": 3.0})
    _, _, edited = _get(base_url + "/preview?level=mid")
    _, _, orig = _get(base_url + "/preview?level=mid&original=1")
    assert edited != orig  # compare-to-original differs after an edit
    status, _, body = _get(base_url + "/info")
    info = json.loads(body)
    assert info["shape"] == [60, 90]
    _post(base_url + "/reset", {})


def test_params_endpoint_and_mask_targeting(base_url):
    _post(base_url + "/mask/add", {"name": "zone", "point": [5, 5], "tolerance": 0.3})
    status, _ = _post(base_url + "/edit", {"_target": "zone", "exposure": 1.5})
    assert status == 200
    _, _, body = _get(base_url + "/params?mask=zone")
    assert json.loads(body)["exposure"] == 1.5
    _, _, body = _get(base_url + "/params?mask=main")
    assert json.loads(body)["exposure"] == 0.0
    _post(base_url + "/mask/remove", {"name": "zone"})
    _post(base_url + "/reset", {})


def test_params_unknown_mask_is_400(base_url):
    import urllib.error
    try:
        _get(base_url + "/params?mask=ghost")
        code = 200
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400


def test_mask_overlay_preview(base_url):
    _post(base_url + "/mask/add", {"name": "ov", "point": [8, 8], "tolerance": 0.5})
    _, ctype, body = _get(base_url + "/preview?level=mid&overlay=ov")
    assert ctype == "image/jpeg" and body[:2] == b"\xff\xd8"
    _, _, plain = _get(base_url + "/preview?level=mid")
    assert body != plain  # tint visible
    _post(base_url + "/mask/remove", {"name": "ov"})


def _post_raw(url, data: bytes):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read() or b"{}")


def _wait_open_ready(base_url, timeout=120.0):
    """Poll /open/status until the async open's device phase lands (the
    same protocol the page JS runs)."""
    import time as _time

    t0 = _time.monotonic()
    while _time.monotonic() - t0 < timeout:
        _, _, body = _get(base_url + "/open/status")
        st = json.loads(body)
        assert not st.get("error"), st
        if st["ready"]:
            return
        _time.sleep(0.1)
    raise AssertionError("async open never became ready")


def test_open_endpoint_replaces_session(base_url):
    """POST /open with raw file bytes swaps in a new PhotoEditor
    (web/main.ts:652-695 loadImage)."""
    import io as _io
    from PIL import Image as PILImage

    rng = np.random.default_rng(9)
    buf = _io.BytesIO()
    PILImage.fromarray(
        (rng.random((30, 44, 3)) * 255).astype(np.uint8)
    ).save(buf, format="PNG")
    status, out = _post_raw(base_url + "/open?name=new.png", buf.getvalue())
    assert status == 200 and out["ok"]
    _wait_open_ready(base_url)
    _, _, body = _get(base_url + "/info")
    assert json.loads(body)["shape"] == [30, 44]

    # Bad bytes -> 400 with a typed message, session unchanged.
    try:
        _post_raw(base_url + "/open?name=bad.png", b"not an image")
        code = 200
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400
    _, _, body = _get(base_url + "/info")
    assert json.loads(body)["shape"] == [30, 44]


def test_open_endpoint_raw_dng(base_url):
    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    img = np.random.default_rng(11).random((3, 32, 48)).astype(np.float32)
    blob = write_dng(synthetic_raw(img), compression=7)
    status, out = _post_raw(base_url + "/open?name=shot.dng", blob)
    assert status == 200 and out["ok"]
    _wait_open_ready(base_url)
    _, _, body = _get(base_url + "/info")
    assert json.loads(body)["shape"] == [32, 48]


def test_open_without_name_sniffs_container_magic(base_url):
    """POST /open with no ?name= must sniff the body's magic — a DNG
    upload used to be force-decoded as JPEG and 400 with a PIL error
    (found driving the HTTP API). PPM16 likewise; bitmaps still route
    through the PIL path, which identifies by magic itself."""
    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.image_io import encode_ppm16
    from rawphotoforge_tpu.io.raw import synthetic_raw

    img = np.random.default_rng(12).random((3, 32, 48)).astype(np.float32)
    status, out = _post_raw(base_url + "/open",
                            write_dng(synthetic_raw(img)))
    assert status == 200 and out["ok"]
    _wait_open_ready(base_url)
    _, _, body = _get(base_url + "/info")
    assert json.loads(body)["shape"] == [32, 48]
    # 16-bit PPM without a name.
    u16 = (np.random.default_rng(13).random((20, 30, 3))
           * 65535).astype(np.uint16)
    status, out = _post_raw(base_url + "/open", encode_ppm16(u16))
    assert status == 200 and out["ok"]
    _wait_open_ready(base_url)
    _, _, body = _get(base_url + "/info")
    assert json.loads(body)["shape"] == [20, 30]


def test_open_endpoint_oriented_cropped_dng(base_url):
    """A portrait (orientation 6) DNG and a DefaultCrop DNG through the
    async /open must land device sessions whose renders equal a direct
    library open — the server path takes the bucket-stable develop for
    both (io/raw.upload_padded)."""
    import dataclasses

    from rawphotoforge_tpu.engine.editor import FULL, PhotoEditor
    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    img = np.random.default_rng(13).random((3, 34, 46)).astype(np.float32)
    base = synthetic_raw(img)
    for raw, shape in [
        (dataclasses.replace(base, orientation=6), [46, 34]),
        (dataclasses.replace(base, default_crop=(4, 2, 40, 30)), [30, 40]),
    ]:
        blob = write_dng(raw)
        status, out = _post_raw(base_url + "/open?name=o.dng", blob)
        assert status == 200 and out["ok"]
        _wait_open_ready(base_url)
        _, _, body = _get(base_url + "/info")
        assert json.loads(body)["shape"] == shape
        _, ctype, pv = _get(base_url + "/preview?level=full")
        direct = PhotoEditor.from_bytes(blob, "DNG")
        import io as _io

        from PIL import Image as PILImage

        got = np.asarray(PILImage.open(_io.BytesIO(pv)))
        want = np.asarray(PILImage.open(_io.BytesIO(
            __import__("rawphotoforge_tpu.io.image_io", fromlist=["x"])
            .encode_image(direct.apply(FULL), "JPEG", quality=90))))
        assert got.shape == want.shape
        # Same JPEG pipeline on both sides: allow codec-level wiggle.
        assert np.abs(got.astype(np.int16) - want.astype(np.int16)).max() <= 2


def test_info_reports_crop(base_url):
    _post(base_url + "/crop", {"x0": 4, "y0": 2, "x1": 30, "y1": 20})
    _, _, body = _get(base_url + "/info")
    assert json.loads(body)["crop"] == [4, 2, 30, 20]
    _post(base_url + "/crop", {"clear": True})
    _, _, body = _get(base_url + "/info")
    assert json.loads(body)["crop"] is None


def test_regional_edit_does_not_wipe_globals(base_url):
    """A client editing a regional mask sends no global keys; vignette and
    friends on main must survive (advisor r1 finding)."""
    _post(base_url + "/edit", {"vignette": 55, "lens_distortion": -20})
    _post(base_url + "/mask/add", {"name": "rg", "point": [6, 6], "tolerance": 0.4})
    # Simulates the fixed client: regional pushes omit global-only keys.
    _post(base_url + "/edit", {"_target": "rg", "exposure": 0.8})
    _, _, body = _get(base_url + "/params?mask=main")
    p = json.loads(body)
    assert p["vignette"] == 55 and p["lens_distortion"] == -20
    _post(base_url + "/mask/remove", {"name": "rg"})
    _post(base_url + "/reset", {})


def test_page_has_new_ui_affordances(base_url):
    _, _, page = _get(base_url + "/")
    for needle in (b"fopen", b"fpreset", b"croprect", b"touchstart",
                   b"GLOBAL_ONLY", b"loadCurvesFrom"):
        assert needle in page, needle


def test_export_format_choice(base_url):
    _, ctype, body = _get(base_url + "/export?fmt=png")
    assert ctype == "image/png" and body[:8] == b"\x89PNG\r\n\x1a\n"
    try:
        _get(base_url + "/export?fmt=bmp")
        code = 200
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400


def test_viewport_rect_preview(base_url):
    """?rect=x0,y0,x1,y1 slices the cached render (zoom/pan viewport)."""
    import io as _io
    from PIL import Image as PILImage

    # Session shape after earlier tests: query /info for truth.
    _, _, info = _get(base_url + "/info")
    h, w = json.loads(info)["shape"]
    _, ctype, body = _get(base_url + "/preview?level=full&rect=0.25,0.25,0.75,0.75")
    img = PILImage.open(_io.BytesIO(body))
    assert ctype == "image/jpeg"
    assert abs(img.size[0] - w // 2) <= 1 and abs(img.size[1] - h // 2) <= 1
    # Degenerate/out-of-range rects are 400s.
    for bad in ("0.5,0.5,0.5,0.9", "0,0,2,1", "-0.1,0,1,1", "0,0,1"):
        try:
            _get(base_url + f"/preview?level=mid&rect={bad}")
            code = 200
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 400, bad


def test_mask_range_edit(base_url):
    """/edit carries mask_range (the binarization threshold applied when a
    mask is added, lib.rs:481-499)."""
    _post(base_url + "/edit", {"mask_range": 0.7})
    _, _, body = _get(base_url + "/params?mask=main")
    assert json.loads(body)["mask_range"] == 0.7
    _post(base_url + "/edit", {"mask_range": 0.0})


def test_concurrent_edit_preview_storm(base_url):
    """Race handling: concurrent edits, previews, mask ops and preset
    reads must all succeed (editor lock) and leave a consistent state."""
    import concurrent.futures
    import urllib.error

    def worker(i):
        for j in range(4):
            k = (i + j) % 4
            if k == 0:
                _post(base_url + "/edit", {"exposure": (i % 5) * 0.3})
            elif k == 1:
                _get(base_url + "/preview?level=low")
            elif k == 2:
                _get(base_url + "/histogram")
            else:
                _get(base_url + "/preset")
        return True

    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        assert all(pool.map(worker, range(16)))
    # State still consistent and renderable.
    _, _, body = _get(base_url + "/params?mask=main")
    assert "exposure" in json.loads(body)
    status, _, _ = _get(base_url + "/preview?level=mid")
    assert status == 200
    _post(base_url + "/reset", {})


def test_export_hdr_dng(base_url):
    import numpy as np

    from rawphotoforge_tpu.io import dng

    status, ctype, body = _get(base_url + "/export?fmt=dng")
    assert status == 200 and "dng" in ctype
    raw = dng.read_dng(body)
    assert raw.pattern == "RGB"
    assert raw.mosaic.dtype == np.float32


def test_malformed_json_returns_400(base_url):
    import http.client
    import urllib.parse

    u = urllib.parse.urlparse(base_url)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
    conn.request("POST", "/preset", body=b"{not json",
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 400
    assert b"error" in resp.read()
    conn.close()


def test_cross_origin_post_rejected(base_url):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        base_url + "/reset", data=b"{}", method="POST",
        headers={"Origin": "http://evil.example"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            status = r.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 403
    # Same-origin (matching Host) still works.
    import urllib.parse

    host = urllib.parse.urlparse(base_url).netloc
    req = urllib.request.Request(
        base_url + "/histogram", method="GET")
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.status == 200
    req = urllib.request.Request(
        base_url + "/reset", data=b"{}", method="POST",
        headers={"Origin": f"http://{host}"})
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 200


def test_edit_rejected_curve_leaves_state_untouched(base_url):
    """A non-monotone curve in /edit must not half-apply the sliders."""
    status, _ = _post(base_url + "/edit", {"exposure": 0.0})
    assert status == 200
    before = json.loads(_get(base_url + "/params?mask=main")[2])
    try:
        _post(base_url + "/edit", {
            "exposure": 3.0,
            "curve_brightness": [[0, 0], [0, 5000]],  # duplicate x: invalid
        })
        status = 200
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400
    after = json.loads(_get(base_url + "/params?mask=main")[2])
    assert after == before  # nothing half-applied


def test_open_endpoint_cr3_via_preview(base_url):
    """Non-TIFF vendor RAW opens on its embedded preview through /open."""
    import io as _io
    import struct as _struct

    from PIL import Image as PILImage

    def _box(fourcc, payload):
        return _struct.pack(">I", 8 + len(payload)) + fourcc + payload

    buf = _io.BytesIO()
    PILImage.fromarray(
        (np.random.default_rng(21).random((26, 38, 3)) * 255).astype(np.uint8)
    ).save(buf, format="JPEG")
    jpeg = buf.getvalue()
    blob = _box(b"ftyp", b"crx \x00\x00\x00\x01") + _box(
        b"uuid", bytes.fromhex("eaf42b5e1c984b88b9fbb7dc406e4d16")
        + b"\x00" * 8 + jpeg) + _box(b"mdat", b"\x00" * 256)
    status, out = _post_raw(base_url + "/open?name=shot.cr3", blob)
    assert status == 200 and out["ok"]
    _wait_open_ready(base_url)
    assert out.get("opened_from_preview")  # surfaced, never silent
    _, _, body = _get(base_url + "/info")
    assert json.loads(body)["shape"] == [26, 38]


def test_preset_endpoint_accepts_v1_schema(base_url):
    """The reference GUI's flat v1 preset uploads through POST /preset."""
    v1 = {"exposure": 0.5, "contrast": 10,
          "brightness_curve_points": [[0, 0], [20000, 30000], [65535, 65535]],
          "vignette": 25}
    status, out = _post(base_url + "/preset", v1)
    assert status == 200 and out["ok"]
    _, _, body = _get(base_url + "/params?mask=main")
    got = json.loads(body)
    assert got["exposure"] == 0.5 and got["vignette"] == 25
    assert got["curves"]["brightness"]["x"] == [0, 20000, 65535]


def test_page_injects_localized_exif_labels(base_url):
    _post(base_url + "/settings", {"locale": "ja"})
    try:
        _, _, body = _get(base_url + "/")
        page = body.decode("utf-8")
        assert "EXIF_LABELS" in page and "メーカー" in page
    finally:
        _post(base_url + "/settings", {"locale": "en"})
    _, _, body = _get(base_url + "/")
    assert "constEXIF_LABELS={};" in body.decode("utf-8").replace(" ", "")


def test_settings_survive_garbage_values(tmp_path):
    import json as _json

    from rawphotoforge_tpu.engine.session import Settings

    p = str(tmp_path / "s.json")
    with open(p, "w") as f:
        _json.dump({"ui_preview_size": "huge", "device_index": "x",
                    "locale": ["ja"], "jpeg_quality": None}, f)
    s = Settings.load(p)
    assert (s.ui_preview_size, s.device_index, s.locale, s.jpeg_quality) == \
        (1280, 0, "en", 95)
    # Non-dict JSON falls back to defaults instead of crashing.
    with open(p, "w") as f:
        f.write("[1,2,3]")
    assert Settings.load(p).locale == "en"
    # Atomic save round-trips.
    s.locale = "ja"
    s.save(p)
    assert Settings.load(p).locale == "ja"


def test_page_tabbed_edit_panel(base_url):
    """The edit panel is organized into the reference's tabs
    (web/index.html:43-120: tone/brightness/hue/saturation/lightness/
    WB/effect/metadata) with per-tab reset buttons."""
    _, _, page = _get(base_url + "/")
    for needle in (b"pane_tone", b"pane_brightness", b"pane_hue",
                   b"pane_saturation", b"pane_lightness", b"pane_wb",
                   b"pane_effect", b"pane_metadata", b"switchTab",
                   b"resetTab", b"curvebox", b"TAB_SLIDERS"):
        assert needle in page, needle
    assert b"curvesel" not in page
    assert page.count(b"id=exif") == 1


def test_async_export_job_flow(base_url):
    """Job-based export (v1's worker-thread export with progress,
    raw_photo_forge.py:2180-2257): start -> poll status with stage
    breakdown -> fetch result, without blocking the edit loop."""
    import time as _time

    status, resp = _post(base_url + "/export/start", {"fmt": "jpeg"})
    assert status == 200
    job = resp["job"]
    st = None
    for _ in range(400):
        st = json.loads(_get(base_url + f"/export/status?job={job}")[2])
        if st["state"] in ("done", "error"):
            break
        # Edits stay serviceable while the job runs.
        assert _post(base_url + "/edit", {"exposure": 0.1})[0] == 200
        _time.sleep(0.05)
    assert st["state"] == "done", st
    assert set(st["stages_ms"]) >= {"render", "fetch", "encode"}, st
    assert st["size"] > 0
    status, ctype, body = _get(base_url + f"/export/result?job={job}")
    assert status == 200 and ctype == "image/jpeg"
    assert body[:2] == b"\xff\xd8"  # decodes as JPEG
    _post(base_url + "/edit", {"exposure": 0.0})

    # HDR DNG jobs work through the same flow.
    _, resp = _post(base_url + "/export/start", {"fmt": "dng"})
    job = resp["job"]
    for _ in range(400):
        st = json.loads(_get(base_url + f"/export/status?job={job}")[2])
        if st["state"] in ("done", "error"):
            break
        _time.sleep(0.05)
    assert st["state"] == "done", st
    status, ctype, body = _get(base_url + f"/export/result?job={job}")
    assert status == 200 and "dng" in ctype and len(body) > 100

    # Typed errors: unknown job, bad format.
    for url_, code in [(base_url + "/export/status?job=999999", 400),
                       (base_url + "/export/result?job=999999", 400)]:
        try:
            status = _get(url_)[0]
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == code
    try:
        status, _ = _post(base_url + "/export/start", {"fmt": "bmp"})
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_unknown_keys_rejected_with_400(base_url):
    """Wrong-but-well-formed bodies must be rejected, not silently
    applied: /edit has full-state semantics, so a misspelled or nested
    key would otherwise no-op AND reset every other slider."""
    status, _ = _post(base_url + "/edit", {"exposure": 1.5})
    assert status == 200
    before = json.loads(_get(base_url + "/params?mask=main")[2])
    assert before["exposure"] == 1.5
    for ep, body in [
        ("/edit", {"tone": {"exposure": 0.8}}),      # nested schema
        ("/edit", {"exposures": 0.2}),               # typo
        ("/edit", {"curve_bright": [[0, 0], [65535, 65535]]}),
        ("/reset", {"hard": True}),
        ("/crop", {"x0": 0, "y0": 0, "x1": 5, "y1": 5, "mode": "lossy"}),
        ("/settings", {"jpg_quality": 80}),          # typo of jpeg_quality
        ("/mask/add", {"name": "m", "point": [1, 1], "colour": 0.1}),
        ("/mask/remove", {"name": "m", "force": 1}),
        ("/mask/invert", {"names": "m"}),
    ]:
        try:
            status, resp = _post(base_url + ep, body)
        except urllib.error.HTTPError as e:
            status, resp = e.code, e.read()
        assert status == 400, (ep, body, status)
        assert b"unknown key" in resp or b"must be a JSON object" in resp, (
            ep, resp)
    # The rejected /edit bodies left the editor state untouched.
    after = json.loads(_get(base_url + "/params?mask=main")[2])
    assert after == before
    status, _ = _post(base_url + "/edit", {"exposure": 0.0})
    assert status == 200


def test_malformed_curve_payloads_get_descriptive_400(base_url):
    """A known curve key with the WRONG value shape ({"x":..,"y":..}
    dicts, flat lists, strings) must answer a 400 naming the key and the
    [[x, y], ...] format — iterating a dict used to surface as
    'string index out of range' — and leave the state untouched."""
    before = json.loads(_get(base_url + "/params?mask=main")[2])
    for bad in [
        {"x": [0, 65535], "y": [0, 65535]},   # dict form
        [0, 65535, 0, 65535],                 # flat list
        "0:0,65535:65535",                    # CLI string form
        [[0, 0], [65535]],                    # ragged pair
        [[0, 0], [65535, "hi"]],              # non-numeric
    ]:
        try:
            status, resp = _post(base_url + "/edit",
                                 {"curve_brightness": bad})
        except urllib.error.HTTPError as e:
            status, resp = e.code, e.read()
        assert status == 400, (bad, status)
        assert b"curve_brightness" in resp and b"[[x, y]" in resp, resp
    after = json.loads(_get(base_url + "/params?mask=main")[2])
    assert after == before


def test_endpoint_fuzz_malformed_bodies(base_url):
    """Every POST endpoint must answer 4xx (JSON error) to malformed
    bodies — never 500, never kill the server thread."""
    endpoints = ["/edit", "/mask/add", "/mask/remove", "/mask/invert",
                 "/preset", "/crop", "/settings", "/reset"]
    rng = np.random.default_rng(7)
    bodies = [b"", b"null", b"[]", b'"str"', b"{", b"\xff\xfe\x00",
              json.dumps({"exposure": "NaN"}).encode(),
              json.dumps({"_target": "missing", "exposure": 1}).encode(),
              json.dumps({"curve_brightness": [[1]]}).encode(),
              json.dumps({"name": 5}).encode(),
              json.dumps({"x0": -1, "y0": -1, "x1": -5, "y1": -5}).encode(),
              json.dumps({"point": "xy"}).encode()]
    bodies += [bytes(rng.integers(0, 256, size=int(rng.integers(1, 200)),
                                  dtype=np.uint8)) for _ in range(20)]
    for ep in endpoints:
        for body in bodies:
            try:
                status, _ = _post_raw(base_url + ep, body)
            except urllib.error.HTTPError as e:
                status = e.code
            assert status < 500, (ep, body[:40], status)
    # The server is still alive and functional afterwards.
    status, _, page = _get(base_url + "/")
    assert status == 200 and b"RawPhotoForge-TPU" in page


def test_export_job_retention_never_evicts_running(tmp_path):
    """Rapid export starts must not evict a still-running job (its
    worker would finish into an unreachable dict entry and the whole
    render+fetch would be wasted); finished jobs are swept normally."""
    import threading as _threading
    import time

    import jax.numpy as jnp

    from rawphotoforge_tpu.app.server import EditorApp
    from rawphotoforge_tpu.engine.editor import LOW, PhotoEditor
    from rawphotoforge_tpu.engine.session import Settings

    app = EditorApp(PhotoEditor(jnp.ones((3, 16, 16)) * 0.5),
                    settings=Settings(), prewarm=False)
    release = _threading.Event()

    def slow_export(job):
        release.wait(timeout=60)
        job["state"] = "done"
        job["data"] = b"x"

    app._run_export = slow_export
    jobs = [app.start_export("JPEG") for _ in range(8)]
    # All 8 are running: none may be evicted despite the keep-4 sweep.
    assert all(j in app.export_jobs for j in jobs)
    release.set()
    for _ in range(100):
        if all(app.export_jobs[j]["state"] == "done" for j in jobs):
            break
        time.sleep(0.05)
    # A new start sweeps the now-finished backlog down to the cap.
    newest = app.start_export("JPEG")
    assert newest in app.export_jobs
    assert len(app.export_jobs) <= 5


class TestHostDragPreviews:
    """LOW (drag-tick) previews render host-side via the era's hostdev
    mirror — tunnel-latency-free drags (server.preview_jpeg)."""

    def test_low_preview_is_host_rendered_and_marked(self, base_url):
        import urllib.request

        req = urllib.request.Request(base_url + "/preview?level=low")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 200
            assert r.headers.get("X-RPF-HostDrag") == "1"
            # Drag-tail breakdown header (VERDICT r4 #7): render_us,
            # encode_us, lock_wait_us — all non-negative integers.
            parts = [int(v) for v in
                     r.headers.get("X-RPF-Drag-Us").split(",")]
            assert len(parts) == 3 and all(p >= 0 for p in parts)
            assert r.read()[:2] == b"\xff\xd8"
        # MID/FULL renders stay device-exact (no host marker).
        with urllib.request.urlopen(base_url + "/preview?level=mid",
                                    timeout=60) as r:
            assert r.headers.get("X-RPF-HostDrag") is None
        # original=1 (compare-press) is exact too, even at low.
        with urllib.request.urlopen(
                base_url + "/preview?level=low&original=1", timeout=60) as r:
            assert r.headers.get("X-RPF-HostDrag") is None

    def test_host_drag_matches_device_render(self):
        """The host drag frame must track the device LOW render within
        the hostdev fidelity gates (same formula mirror the era uses) —
        including a regional mask and a crop."""
        import io as _io

        from PIL import Image as PILImage

        from rawphotoforge_tpu.app.server import EditorApp
        from rawphotoforge_tpu.engine.session import Settings

        rng = np.random.default_rng(7)
        ed = PhotoEditor.from_rgb_f32(
            random_linear_image(rng, 64, 96),
            use_pallas=False, mid_long_edge=48, low_long_edge=32)
        ed.set_tone(exposure=0.8, contrast=25)
        ed.set_vignette(30)
        m = np.zeros((64, 96), np.float32)
        m[:, :48] = 1.0
        ed.add_mask("left", m)
        ed.set_tone(exposure=-0.5, mask_name="left")
        ed.set_crop(4, 4, 90, 60)
        app = EditorApp(ed, settings=Settings(), prewarm=False)
        jpeg_host, used_host = app.preview_jpeg(LOW)
        assert used_host
        app2 = EditorApp(ed, settings=Settings(), prewarm=False,
                         host_drag=False)
        jpeg_dev, used_host2 = app2.preview_jpeg(LOW)
        assert not used_host2
        a = np.asarray(PILImage.open(_io.BytesIO(jpeg_host)),
                       dtype=np.float32)
        b = np.asarray(PILImage.open(_io.BytesIO(jpeg_dev)),
                       dtype=np.float32)
        assert a.shape == b.shape
        # JPEG at q90 plus the hostdev mirror tolerance: gate the mean
        # and a loose max (block artifacts differ pixelwise).
        assert np.abs(a - b).mean() < 3.0
        assert np.abs(a - b).max() < 40.0

    def test_host_cache_tracks_mask_changes(self):
        from rawphotoforge_tpu.app.server import EditorApp
        from rawphotoforge_tpu.engine.session import Settings

        rng = np.random.default_rng(8)
        ed = PhotoEditor.from_rgb_f32(
            random_linear_image(rng, 40, 60),
            use_pallas=False, mid_long_edge=32, low_long_edge=20)
        app = EditorApp(ed, settings=Settings(), prewarm=False)
        before, used = app.preview_jpeg(LOW)
        assert used
        m = np.zeros((40, 60), np.float32)
        m[:, :30] = 1.0
        ed.add_mask("half", m)
        ed.set_tone(exposure=-2.0, mask_name="half")
        after, used = app.preview_jpeg(LOW)
        assert used
        assert after != before, "host drag cache served a stale mask stack"

    def test_drag_histogram_live_and_204_when_off(self, base_url):
        """/histogram?drag=1 answers a live host-computed histogram when
        host drag is on, and 204 (page keeps its last) when off."""
        status, _, body = _get(base_url + "/histogram?drag=1")
        h = json.loads(body)
        assert status == 200 and len(h) == 4 and len(h[0]) == 256
        # Off: a dedicated server instance with host_drag disabled.
        from rawphotoforge_tpu.engine.session import Settings

        rng = np.random.default_rng(21)
        ed = PhotoEditor.from_rgb_f32(
            random_linear_image(rng, 30, 40),
            use_pallas=False, mid_long_edge=24, low_long_edge=12)
        httpd = serve(ed, port=0, settings=Settings(), prewarm=False,
                      host_drag=False)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/histogram?drag=1",
                    timeout=60) as r:
                assert r.status == 204
        finally:
            httpd.shutdown()


def test_open_without_name_8bit_ppm_goes_to_pil(base_url):
    """An 8-bit P6 PPM without a name must take the PIL route (which
    decoded it before the magic sniff existed), not the strict 16-bit
    parser (review finding: the P6 sniff regressed it to a 400)."""
    import io as _io

    from PIL import Image as PILImage

    rng = np.random.default_rng(14)
    u8 = (rng.random((18, 26, 3)) * 255).astype(np.uint8)
    buf = _io.BytesIO()
    PILImage.fromarray(u8).save(buf, format="PPM")
    assert buf.getvalue()[:2] == b"P6"
    status, out = _post_raw(base_url + "/open", buf.getvalue())
    assert status == 200 and out["ok"]
    _wait_open_ready(base_url)
    _, _, body = _get(base_url + "/info")
    assert json.loads(body)["shape"] == [18, 26]


def test_serve_lens_correct_auto_applies(tmp_path):
    """`serve --lens-correct`: each /open resolves the file's EXIF lens
    against the DB and applies the profile at the device phase; /info
    reports the applied profile, and the render equals
    PhotoEditor.open(lens_correct=True) of the same file."""
    from rawphotoforge_tpu.engine.session import Settings
    from rawphotoforge_tpu.engine.editor import MID, PhotoEditor
    from rawphotoforge_tpu.app.server import serve
    from test_lensdb import _XML, _jpeg_with_lens_exif

    (tmp_path / "db").mkdir()
    (tmp_path / "db" / "t.xml").write_text(_XML)
    path = _jpeg_with_lens_exif(tmp_path)

    httpd = serve(None, port=0, settings=Settings(),
                  settings_path=str(tmp_path / "s.json"), prewarm=False,
                  lens_correct=True, lens_db_paths=[str(tmp_path / "db")],
                  initial_file=(open(path, "rb").read(), "t.jpg"))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        _wait_open_ready(base)
        _, _, body = _get(base + "/info")
        assert json.loads(body)["lens_profile"] == \
            "TestCo Prime 50mm f/1.8"
        _, _, jpeg = _get(base + "/preview?level=mid")
        ref = PhotoEditor.open(path, lens_correct=True,
                               lens_db_paths=[str(tmp_path / "db")],
                               use_pallas=False)
        from rawphotoforge_tpu.io import image_io

        # Decoded-pixel comparison with a small tolerance: the server
        # session renders on the kernel path, the reference editor here
        # on the anchor path (agree to curve-evaluation tolerance).
        import io as _io

        from PIL import Image as _PIL

        a = np.asarray(_PIL.open(_io.BytesIO(jpeg)), dtype=np.int32)
        b = np.asarray(_PIL.open(_io.BytesIO(image_io.encode_image(
            ref.apply(MID), "JPEG", quality=90))), dtype=np.int32)
        assert a.shape == b.shape
        assert np.abs(a - b).max() <= 3, np.abs(a - b).max()
    finally:
        httpd.shutdown()


def test_mask_add_labeled_points(base_url):
    """POST /mask/add with points+labels (shift-click include /
    ctrl+shift exclude UI flow) creates the mask through the labeled
    similarity path; bad label counts answer 400."""
    status, _ = _post(
        base_url + "/mask/add",
        {"name": "pts", "points": [[4, 4], [14, 10]], "labels": [1, 0],
         "tolerance": 0.3})
    assert status == 200
    _, _, body = _get(base_url + "/masks")
    assert "pts" in json.loads(body)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base_url + "/mask/add",
              {"name": "bad", "points": [[4, 4], [14, 10]], "labels": [1]})
    assert ei.value.code == 400
    _post(base_url + "/mask/remove", {"name": "pts"})
