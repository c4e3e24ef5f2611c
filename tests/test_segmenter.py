"""External segmenter adapter tests (stub models; no weights shipped)."""

import os
import stat
import sys
import textwrap

import numpy as np
import pytest

from rawphotoforge_tpu.engine.segmenter import (
    CallableSegmenter, SegmenterError, SubprocessSegmenter, make_segmenter,
    segment_to_mask,
)
from rawphotoforge_tpu.engine.editor import PhotoEditor, FULL

from conftest import random_linear_image


def _disk_stub(rgb_u8, point_xy, radius=6):
    """Stub 'model': logits = 1 inside a disk around the click, else -1."""
    h, w = rgb_u8.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    x, y = point_xy
    return np.where((xx - x) ** 2 + (yy - y) ** 2 <= radius ** 2, 1.0, -1.0)


def test_callable_adapter_and_resample():
    img = np.zeros((40, 60, 3), dtype=np.uint8)
    seg = CallableSegmenter(lambda im, pt: _disk_stub(im, pt)[::2, ::2])
    logits = segment_to_mask(seg, img, (30, 20))
    assert logits.shape == (40, 60)  # resampled from (20, 30) to full res
    assert logits[20, 30] > 0 and logits[0, 0] < 0


def test_editor_add_model_mask(rng):
    ed = PhotoEditor.from_rgb_f32(
        random_linear_image(rng, 40, 64), use_pallas=False,
        mid_long_edge=32, low_long_edge=16,
    )
    ed.set_mask_range(0.5)
    ed.add_model_mask("subject", (32, 20), lambda im, pt: _disk_stub(im, pt))
    assert "subject" in ed.mask_names()
    mask = np.asarray(ed._find("subject").data_full)
    assert mask[20, 32] == 1.0 and mask[0, 0] == 0.0
    assert 50 < mask.sum() < 200  # a disk, not everything

    # Regional edits through the AI mask actually land.
    base = np.asarray(ed.apply(FULL))
    ed.set_tone(exposure=2.0, mask_name="subject")
    out = np.asarray(ed.apply(FULL))
    assert out[:, 20, 32].mean() > base[:, 20, 32].mean()
    np.testing.assert_allclose(out[:, 0, 0], base[:, 0, 0], atol=1e-6)


def test_subprocess_adapter(tmp_path, rng):
    script = tmp_path / "stubseg.py"
    script.write_text(textwrap.dedent("""\
        import sys
        import numpy as np
        from PIL import Image
        img = np.asarray(Image.open(sys.argv[1]))
        x, y = int(sys.argv[2]), int(sys.argv[3])
        h, w = img.shape[:2]
        yy, xx = np.mgrid[0:h, 0:w]
        np.save(sys.argv[4], ((xx-x)**2 + (yy-y)**2 <= 25).astype(np.float32)*2 - 1)
    """))
    seg = SubprocessSegmenter([sys.executable, str(script)])
    img = (random_linear_image(rng, 32, 48) * 255).astype(np.uint8)
    logits = segment_to_mask(seg, img, (24, 16))
    assert logits.shape == (32, 48)
    assert logits[16, 24] == 1.0 and logits[0, 0] == -1.0


def test_subprocess_failure_is_typed(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text("import sys; sys.exit(3)")
    seg = SubprocessSegmenter([sys.executable, str(bad)])
    with pytest.raises(SegmenterError, match="exited 3"):
        seg.segment(np.zeros((8, 8, 3), dtype=np.uint8), (1, 1))


def test_torchscript_adapter(tmp_path):
    torch = pytest.importorskip("torch")

    class Disk(torch.nn.Module):
        def forward(self, img, pt):
            h, w = img.shape[1], img.shape[2]
            yy = torch.arange(h, dtype=torch.float32)[:, None].expand(h, w)
            xx = torch.arange(w, dtype=torch.float32)[None, :].expand(h, w)
            d2 = (xx - pt[0]) ** 2 + (yy - pt[1]) ** 2
            return torch.where(d2 <= 16.0, 1.0, -1.0)

    path = str(tmp_path / "disk.pt")
    torch.jit.script(Disk()).save(path)
    seg = make_segmenter({"type": "torchscript", "path": path})
    logits = seg.segment(np.zeros((20, 30, 3), dtype=np.uint8), (10, 5))
    assert logits.shape == (20, 30)
    assert logits[5, 10] == 1.0 and logits[19, 29] == -1.0


def test_make_segmenter_specs():
    assert make_segmenter(None) is None
    assert isinstance(make_segmenter(lambda i, p: None), CallableSegmenter)
    assert isinstance(make_segmenter("python seg.py"), SubprocessSegmenter)
    assert isinstance(make_segmenter(["python", "seg.py"]), SubprocessSegmenter)
    with pytest.raises(SegmenterError):
        make_segmenter({"type": "onnx"})
    with pytest.raises(SegmenterError):
        make_segmenter(42)


def test_bad_logits_shape_is_typed():
    seg = CallableSegmenter(lambda im, pt: np.zeros((2, 3, 4, 5)))
    with pytest.raises(SegmenterError, match="2-D"):
        seg.segment(np.zeros((8, 8, 3), dtype=np.uint8), (0, 0))


def test_server_model_mask(tmp_path, rng):
    """/mask/add with {"model": true} uses the configured adapter; without
    a configured adapter it degrades to the similarity mask."""
    import json
    import threading
    import urllib.request

    from rawphotoforge_tpu.app.server import serve
    from rawphotoforge_tpu.engine.session import Settings

    ed = PhotoEditor.from_rgb_f32(
        random_linear_image(rng, 40, 64), use_pallas=False,
        mid_long_edge=32, low_long_edge=16,
    )
    ed.set_mask_range(0.5)
    httpd = serve(ed, port=0, settings=Settings(), prewarm=False,
                  segmenter=make_segmenter(lambda im, pt: _disk_stub(im, pt)))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def post(p, obj):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{p}",
                data=json.dumps(obj).encode(), method="POST")
            return urllib.request.urlopen(req, timeout=60).status

        assert post("/mask/add",
                    {"name": "ai", "point": [30, 20], "model": True}) == 200
        mask = np.asarray(ed._find("ai").data_full)
        assert mask[20, 30] == 1.0 and mask.sum() < 200
        # No "model" key -> similarity-mask fallback still works.
        assert post("/mask/add", {"name": "sim", "point": [5, 5],
                                  "tolerance": 0.3}) == 200
        assert "sim" in ed.mask_names()
    finally:
        httpd.shutdown()


def test_server_rejects_segmenter_specs_over_http(tmp_path, rng):
    """Arbitrary segmenter specs in the request body would be drive-by
    command execution on a no-auth localhost server (CSRF); only the
    operator-configured segmenter may run (review finding)."""
    import json
    import threading
    import urllib.request
    import urllib.error

    import jax.numpy as jnp

    from rawphotoforge_tpu.app import server as srv
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    httpd = srv.serve(PhotoEditor(jnp.ones((3, 16, 16)) * 0.4), port=0,
                      prewarm=False)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def post(body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/mask/add",
                data=json.dumps(body).encode(), method="POST")
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    return r.status
            except urllib.error.HTTPError as e:
                return e.code

        evil = {"name": "x", "point": [1, 1],
                "model": {"type": "subprocess",
                          "cmd": ["bash", "-c", "touch /tmp/pwned_test"]}}
        assert post(evil) == 400
        assert post({"name": "x", "point": [1, 1],
                     "model": "bash -c 'touch /tmp/pwned_test'"}) == 400
        # No segmenter configured -> {"model": true} is a clean 400 too.
        assert post({"name": "x", "point": [1, 1], "model": True}) == 400
        import os

        assert not os.path.exists("/tmp/pwned_test")
    finally:
        httpd.shutdown()


def test_make_segmenter_spec_missing_keys():
    import pytest

    from rawphotoforge_tpu.engine.segmenter import SegmenterError, make_segmenter

    with pytest.raises(SegmenterError, match="cmd"):
        make_segmenter({"type": "subprocess"})
    with pytest.raises(SegmenterError, match="path"):
        make_segmenter({"type": "torchscript"})


def test_torchscript_script_raise_is_typed(tmp_path):
    """A script-level `raise` inside forward surfaces as torch.jit.Error
    (NOT a RuntimeError subclass) — it must still map to SegmenterError
    (review regression)."""
    torch = pytest.importorskip("torch")
    from rawphotoforge_tpu.engine.segmenter import SegmenterError

    class Guarded(torch.nn.Module):
        def forward(self, img, pt):
            if pt[0] < 0:
                raise ValueError("point out of bounds")
            return img[0]

    path = str(tmp_path / "guarded.pt")
    torch.jit.script(Guarded()).save(path)
    seg = make_segmenter({"type": "torchscript", "path": path})
    with pytest.raises(SegmenterError):
        seg.segment(np.zeros((8, 8, 3), dtype=np.uint8), (-1, 0))


# ---------------------------------------------------------------------------
# Labeled multi-point adapter protocol (r5, VERDICT r4 #6).
# ---------------------------------------------------------------------------


def test_callable_adapter_labeled_points(rng):
    """fn(rgb, points, labels): union of include discs minus exclude
    discs — the shape a SAM-style predictor wrapper takes."""
    from rawphotoforge_tpu.engine.segmenter import CallableSegmenter

    def fn(img, points, labels):
        h, w = img.shape[:2]
        yy, xx = np.mgrid[0:h, 0:w]
        out = np.full((h, w), -1.0, np.float32)
        for (x, y), lab in zip(points, labels):
            d = (xx - x) ** 2 + (yy - y) ** 2 <= 16
            out = np.where(d, 1.0 if lab else -1.0, out)
        return out

    seg = CallableSegmenter(fn)
    img = (random_linear_image(rng, 24, 32) * 255).astype(np.uint8)
    logits = segment_to_mask(seg, img, [(8, 8), (8, 8)], labels=[1, 0])
    assert logits[8, 8] == -1.0  # exclude wins at the shared point
    logits2 = segment_to_mask(seg, img, [(8, 8), (24, 12)], labels=[1, 1])
    assert logits2[8, 8] == 1.0 and logits2[12, 24] == 1.0


def test_subprocess_adapter_labeled_points(tmp_path, rng):
    """Multi-point argv encoding: cmd img --points "x,y,l;..." out."""
    script = tmp_path / "stubseg.py"
    script.write_text(textwrap.dedent("""\
        import sys
        import numpy as np
        from PIL import Image
        img = np.asarray(Image.open(sys.argv[1]))
        assert sys.argv[2] == "--points", sys.argv
        h, w = img.shape[:2]
        yy, xx = np.mgrid[0:h, 0:w]
        out = np.full((h, w), -1.0, np.float32)
        for tok in sys.argv[3].split(";"):
            x, y, lab = (int(v) for v in tok.split(","))
            d = (xx - x) ** 2 + (yy - y) ** 2 <= 25
            out = np.where(d, 1.0 if lab else -1.0, out)
        np.save(sys.argv[4], out)
    """))
    seg = SubprocessSegmenter([sys.executable, str(script)])
    img = (random_linear_image(rng, 32, 48) * 255).astype(np.uint8)
    logits = segment_to_mask(seg, img, [(24, 16), (40, 8)], labels=[1, 0])
    assert logits[16, 24] == 1.0 and logits[8, 40] == -1.0


def test_legacy_duck_typed_adapter_still_works(rng):
    """User-supplied adapter objects with the old 2-arg segment() keep
    working for single-point prompts."""

    class Legacy:
        def segment(self, rgb_u8, point_xy):
            h, w = rgb_u8.shape[:2]
            out = np.full((h, w), -1.0, np.float32)
            out[point_xy[1], point_xy[0]] = 1.0
            return out

    img = (random_linear_image(rng, 16, 20) * 255).astype(np.uint8)
    logits = segment_to_mask(Legacy(), img, (5, 7))
    assert logits[7, 5] == 1.0


def test_editor_model_mask_labeled_points(rng):
    """add_model_mask passes labeled points through to the adapter."""
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    seen = {}

    def fn(img, points, labels):
        seen["points"], seen["labels"] = points, labels
        h, w = img.shape[:2]
        return np.full((h, w), 1.0, np.float32)

    img = random_linear_image(rng, 24, 32)
    ed = PhotoEditor.from_rgb_f32(img, mid_long_edge=32, low_long_edge=16,
                                  use_pallas=False)
    ed.add_model_mask("m", segmenter=fn,
                      points_xy=[(3, 4), (10, 12)], labels=[1, 0])
    assert seen["points"] == [(3, 4), (10, 12)]
    assert seen["labels"] == [1, 0]
    assert "m" in ed.mask_names()
