"""CLI end-to-end tests (CPU backend, jnp path for speed)."""

import numpy as np
import pytest
from PIL import Image as PILImage

from rawphotoforge_tpu.app.cli import main

from conftest import random_linear_image


@pytest.fixture
def jpeg_path(tmp_path, rng):
    yy, xx = np.mgrid[0:60, 0:90].astype(np.float32)
    img = np.stack([yy / 60, xx / 90, (yy + xx) / 150], -1)
    p = tmp_path / "in.jpg"
    PILImage.fromarray((img * 255).astype(np.uint8)).save(p, quality=95)
    return str(p)


def test_info(jpeg_path, capsys):
    assert main(["info", jpeg_path]) == 0
    out = capsys.readouterr().out
    assert "90x60" in out


def test_develop_roundtrip(jpeg_path, tmp_path, capsys):
    out = tmp_path / "out.png"
    rc = main([
        "develop", jpeg_path, str(out),
        "--exposure", "0.5", "--contrast", "20", "--jnp-path",
        "--brightness-curve", "0:0,30000:40000,65535:65535",
        "--save-preset", str(tmp_path / "p.json"), "--histogram",
    ])
    assert rc == 0
    assert out.exists()
    assert (tmp_path / "p.json").exists()
    assert "developed 90x60" in capsys.readouterr().out


def test_develop_with_preset(jpeg_path, tmp_path):
    preset = tmp_path / "p.json"
    out1 = tmp_path / "a.png"
    out2 = tmp_path / "b.png"
    main(["develop", jpeg_path, str(out1), "--exposure", "1.0", "--jnp-path",
          "--save-preset", str(preset)])
    main(["develop", jpeg_path, str(out2), "--preset", str(preset), "--jnp-path"])
    a = np.asarray(PILImage.open(out1))
    b = np.asarray(PILImage.open(out2))
    np.testing.assert_array_equal(a, b)


def test_batch(jpeg_path, tmp_path, capsys):
    import shutil, os

    ind = tmp_path / "in"
    outd = tmp_path / "out"
    ind.mkdir()
    shutil.copy(jpeg_path, ind / "a.jpg")
    shutil.copy(jpeg_path, ind / "b.jpg")
    rc = main(["batch", str(ind), str(outd), "--exposure", "0.3", "--jnp-path"])
    assert rc == 0
    assert sorted(os.listdir(outd)) == ["a.jpg", "b.jpg"]


def test_error_paths(jpeg_path, tmp_path, capsys):
    assert main(["develop", jpeg_path, str(tmp_path / "x.xyz")]) == 2
    assert "unsupported image format" in capsys.readouterr().err
    assert main(["develop", jpeg_path, str(tmp_path / "x.jpg"),
                 "--brightness-curve", "9:9,1:1"]) == 2
    assert "strictly increasing" in capsys.readouterr().err
    assert main(["info", str(tmp_path / "missing.jpg")]) == 2


def test_devices(capsys):
    assert main(["devices"]) == 0
    assert "[0]" in capsys.readouterr().out


def test_batch_raw_fast_path(tmp_path, rng, capsys):
    import numpy as np
    from rawphotoforge_tpu.io.raw import synthetic_raw
    from rawphotoforge_tpu.io.dng import write_dng

    ind = tmp_path / "raws"
    outd = tmp_path / "out"
    ind.mkdir()
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    rgb = np.stack([0.2 + 0.4 * xx / 64, 0.3 + 0.3 * yy / 48, 0.4 - 0.1 * xx / 64])
    for name in ("a.dng", "b.dng"):
        (ind / name).write_bytes(write_dng(synthetic_raw(rgb, wb_gains=(1.8, 1.0, 1.4))))

    rc = main(["batch", str(ind), str(outd), "--no-mesh", "--exposure", "0.4", "--sharpness", "30"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "fused raw path" in out
    import os
    assert sorted(os.listdir(outd)) == ["a.jpg", "b.jpg"]


def test_batch_lens_distortion_skips_raw_fast_path(tmp_path, rng, capsys):
    """--lens-distortion must not take the fused fast path (which has no
    geometry stage): batch output must match develop with the same flags."""
    from rawphotoforge_tpu.io.raw import synthetic_raw
    from rawphotoforge_tpu.io.dng import write_dng

    ind = tmp_path / "raws"
    outd = tmp_path / "out"
    ind.mkdir()
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    rgb = np.stack([0.2 + 0.4 * xx / 64, 0.3 + 0.3 * yy / 48, 0.4 - 0.1 * xx / 64])
    (ind / "a.dng").write_bytes(write_dng(synthetic_raw(rgb)))

    rc = main(["batch", str(ind), str(outd), "--no-mesh", "--lens-distortion", "40"])
    assert rc == 0
    assert "fused raw path" not in capsys.readouterr().out

    rc = main(["develop", str(ind / "a.dng"), str(tmp_path / "ref.jpg"),
               "--lens-distortion", "40"])
    assert rc == 0
    a = np.asarray(PILImage.open(outd / "a.jpg"))
    b = np.asarray(PILImage.open(tmp_path / "ref.jpg"))
    np.testing.assert_array_equal(a, b)


def test_convert_to_compressed_dng(tmp_path, rng, capsys):
    """`convert` transcodes RAW -> lossless-JPEG DNG: smaller file, pixel
    data bit-identical, still openable by the editor."""
    from rawphotoforge_tpu.io.dng import read_dng, write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
    rgb = np.stack([0.2 + 0.5 * xx / 96, 0.3 + 0.4 * yy / 64, 0.5 - 0.2 * xx / 96])
    raw = synthetic_raw(rgb)
    src = tmp_path / "in.dng"
    dst = tmp_path / "out.dng"
    src.write_bytes(write_dng(raw))

    rc = main(["convert", str(src), str(dst), "--tile", "32x32"])
    assert rc == 0
    assert "->" in capsys.readouterr().out
    assert dst.stat().st_size < src.stat().st_size
    got = read_dng(dst.read_bytes())
    np.testing.assert_array_equal(got.mosaic, raw.mosaic)
    assert got.pattern == raw.pattern


def test_batch_fast_path_preview_fallback(tmp_path, capsys):
    """A vendor-codec RAW (no decodable sensor data, embedded preview
    present) must not abort the batch — it develops from the preview."""
    import os

    import numpy as np
    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw
    from test_preview import _jpeg, _tiff_with_previews

    ind = tmp_path / "raws"
    outd = tmp_path / "out"
    ind.mkdir()
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    rgb = np.stack([0.2 + 0.4 * xx / 64, 0.3 + 0.3 * yy / 48,
                    0.4 - 0.1 * xx / 64])
    (ind / "good.dng").write_bytes(
        write_dng(synthetic_raw(rgb, wb_gains=(1.8, 1.0, 1.4))))
    (ind / "vendor.nef").write_bytes(
        _tiff_with_previews(_jpeg(48, 64, seed=3), _jpeg(8, 10, seed=4)))

    rc = main(["batch", str(ind), str(outd), "--no-mesh", "--exposure", "0.4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "embedded preview" in out
    assert sorted(os.listdir(outd)) == ["good.jpg", "vendor.jpg"]


def test_batch_fast_path_applies_warp_opcode(tmp_path):
    """WarpRectilinear must not be silently skipped by the batch fast
    path (review finding: batch and develop disagreed on the same file)."""
    import io as _io

    import numpy as np
    from PIL import Image as PILImage

    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw
    from test_warp_rect import _warp_opcode

    yy, xx = np.mgrid[0:64, 0:80].astype(np.float32)
    rgb = np.clip(np.stack([0.2 + 0.6 * xx / 80, 0.3 + 0.5 * yy / 64,
                            0.6 - 0.3 * xx / 80]), 0, 1)
    base = synthetic_raw(rgb, wb_gains=(1.0, 1.0, 1.0))
    op3 = _warp_opcode([[0.85, 0.1, 0, 0, 0, 0]], (0.5, 0.5))

    for name, op in (("plain.dng", None), ("warped.dng", op3)):
        d = tmp_path / name.split(".")[0]
        d.mkdir()
        (d / name).write_bytes(write_dng(base, opcode_list_3=op))
        outd = tmp_path / (name.split(".")[0] + "_out")
        assert main(["batch", str(d), str(outd), "--no-mesh"]) == 0
    a = np.array(PILImage.open(tmp_path / "plain_out" / "plain.jpg"),
                 dtype=np.int32)
    b = np.array(PILImage.open(tmp_path / "warped_out" / "warped.jpg"),
                 dtype=np.int32)
    # The pipeline is deterministic, so ANY difference proves the warp
    # branch ran (a smooth gradient warps into a similar gradient, so the
    # per-pixel deltas are modest but pervasive).
    assert not np.array_equal(a, b)
    assert np.abs(a - b).mean() > 0.5


def test_batch_same_stem_no_overwrite(tmp_path):
    """RAW+JPEG shooting pairs (IMG.dng + IMG.jpg) must not overwrite
    each other's developed output (review regression)."""
    import dataclasses

    from PIL import Image

    from rawphotoforge_tpu.app.cli import main
    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    ind = tmp_path / "r"
    outd = tmp_path / "o"
    ind.mkdir()
    rgb = np.full((3, 32, 48), 0.5, np.float32)
    (ind / "IMG_0001.dng").write_bytes(write_dng(synthetic_raw(rgb)))
    Image.new("RGB", (48, 32), (90, 120, 40)).save(ind / "IMG_0001.jpg")
    assert main(["batch", str(ind), str(outd)]) == 0
    outs = sorted(p.name for p in outd.iterdir())
    assert len(outs) == 2, outs


def test_develop_rejects_raw_output_extension(tmp_path, capsys):
    """A vendor-RAW output extension fails fast with exit 2, before the
    render (review regression)."""
    from rawphotoforge_tpu.app.cli import main

    src = tmp_path / "t.png"
    from PIL import Image

    Image.new("RGB", (8, 8)).save(src)
    rc = main(["develop", str(src), str(tmp_path / "out.cr2")])
    assert rc == 2
    assert "error:" in capsys.readouterr().err


def test_malformed_flag_values_exit_two(tmp_path, capsys):
    from PIL import Image

    from rawphotoforge_tpu.app.cli import main

    src = tmp_path / "t.png"
    Image.new("RGB", (8, 8)).save(src)
    for flags in (["--crop", "1,2,3"], ["--brightness-curve", "10:20,30"]):
        rc = main(["develop", str(src), str(tmp_path / "o.jpg"), *flags])
        assert rc == 2, flags
        assert "error:" in capsys.readouterr().err


def test_batch_vignette_crop_parity(tmp_path):
    """`batch --vignette` on a RAW with an off-center DefaultCrop must
    match `develop --vignette` (the fast path used to vignette about the
    uncropped center — review regression)."""
    import dataclasses

    import numpy as np
    from PIL import Image

    from rawphotoforge_tpu.app.cli import main
    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    rng = np.random.default_rng(9)
    rgb = np.clip(rng.random((3, 48, 64)), 0, 1).astype(np.float32)
    raw = dataclasses.replace(synthetic_raw(rgb),
                              default_crop=(10, 2, 40, 40))
    ind = tmp_path / "r"
    outd = tmp_path / "o"
    ind.mkdir()
    (ind / "a.dng").write_bytes(write_dng(raw))
    assert main(["batch", str(ind), str(outd), "--no-mesh", "--vignette", "70"]) == 0
    dev_out = tmp_path / "dev.jpg"
    assert main(["develop", str(ind / "a.dng"), str(dev_out),
                 "--vignette", "70"]) == 0
    a = np.asarray(Image.open(outd / "a.jpg"), dtype=np.float32)
    b = np.asarray(Image.open(dev_out), dtype=np.float32)
    assert a.shape == b.shape
    # JPEG quantization differs between the native and Pillow encoders;
    # the vignette CENTER mismatch this guards against is tens of levels.
    assert np.abs(a - b).mean() < 3.0, np.abs(a - b).mean()


def test_info_hides_raw_exif_blob(tmp_path, capsys):
    """`info` must not dump the _exif_bytes APP1 blob (kilobytes of
    binary, possibly an embedded thumbnail) into the terminal."""
    from PIL import Image

    src = tmp_path / "t.jpg"
    img = Image.new("RGB", (16, 12), (90, 120, 40))
    ex = Image.Exif()
    ex[271] = "TestMake"  # Make
    img.save(src, exif=ex)
    assert main(["info", str(src)]) == 0
    out = capsys.readouterr().out
    assert "_exif_bytes" not in out
    assert "TestMake" in out


def test_develop_crop_never_dispatches_cropped_renders(jpeg_path, tmp_path,
                                                       monkeypatch):
    """With --crop, every apply() in the develop command must request the
    full (crop-independent) frame: a device-sliced render would compile
    one remote program per distinct rect, purely for the timing sync /
    histogram (the encode already slices host-side)."""
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    calls = []
    orig_apply = PhotoEditor.apply

    def spy(self, level="full", cropped=True):
        calls.append((level, cropped))
        return orig_apply(self, level, cropped=cropped)

    monkeypatch.setattr(PhotoEditor, "apply", spy)
    rc = main(["develop", jpeg_path, str(tmp_path / "o.png"), "--jnp-path",
               "--crop", "10,5,80,50", "--exposure", "0.3", "--histogram"])
    assert rc == 0
    assert calls, "apply never called"
    assert all(c == ("full", False) for c in calls), calls


def test_develop_and_batch_fast_path_share_flag_mapping(jpeg_path):
    """_apply_edit_flags (editor route) and _params_from_args (fused batch
    route) must produce identical packed edit state for the same flags —
    they share _set_edit_flags, so a flag wired into one is wired into
    both."""
    import argparse

    import jax

    from rawphotoforge_tpu.app import cli
    from rawphotoforge_tpu.core.params import pack_params
    from rawphotoforge_tpu.engine.editor import PhotoEditor

    ap = argparse.ArgumentParser()
    cli._add_edit_flags(ap)
    args = ap.parse_args([
        "--exposure", "0.7", "--contrast", "22", "--shadow", "-8",
        "--wb-temperature", "15", "--vignette", "35", "--sharpness", "40",
        "--brightness-curve", "0:0,20000:30000,65535:65535",
        "--saturation-curve", "0:40000,65535:40000",
    ])
    ed = PhotoEditor(np.full((3, 24, 32), 0.5, np.float32),
                     mid_long_edge=16, use_pallas=False)
    cli._apply_edit_flags(ed, args)
    a = pack_params([ed.masks[0].params])
    b = pack_params([cli._params_from_args(args)])
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_batch_fast_path_reports_cropped_pixels(tmp_path, capsys):
    """The fast path's MPix summary must count the ENCODED (DefaultCrop)
    frame, not the full mosaic — and thus agree with the fallback route's
    accounting."""
    import dataclasses

    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    import re

    from PIL import Image

    # Full mosaic 0.1536 MPix, DefaultCrop keeps 96x64 = 0.006144 MPix —
    # the summary must count the encoded (cropped) pixels, and its .4g
    # precision must keep tiny totals legible (VERDICT r4 weak #3).
    rgb = np.full((3, 320, 480), 0.4, np.float32)
    raw = dataclasses.replace(synthetic_raw(rgb),
                              default_crop=(16, 8, 96, 64))
    ind = tmp_path / "r"
    outd = tmp_path / "o"
    ind.mkdir()
    (ind / "a.dng").write_bytes(write_dng(raw))
    assert main(["batch", str(ind), str(outd), "--no-mesh"]) == 0
    out = capsys.readouterr().out
    assert "fused raw path" in out
    m = re.search(r"([\d.]+) MPix in", out)
    assert m is not None, out
    # The encoded-frame count, printed with enough precision to be
    # nonzero (the mosaic count would read 0.1536).
    assert abs(float(m.group(1)) - 96 * 64 / 1e6) < 1e-6, out
    assert Image.open(outd / "a.jpg").size == (96, 64)
