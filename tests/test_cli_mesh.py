"""CLI mesh batch export: the product surface for SURVEY §2.6's
batch data-parallelism.

With multiple visible devices (the 8-virtual-device CPU mesh here),
``cli batch`` shards the image batch over the mesh and runs the editor's
develop -> packed-JPEG tail per shard. The headline gate: the emitted
files are BYTE-IDENTICAL to the single-device editor loop
(``--no-mesh --jnp-path``) — develop_post_geo is the same anchor program
and everything after the u8-grid round is integer math.
"""

import os

import numpy as np
import pytest

from rawphotoforge_tpu.app.cli import main
from rawphotoforge_tpu import native


def _write_dngs(ind, shapes_names, seed=5):
    from rawphotoforge_tpu.io.dng import write_dng
    from rawphotoforge_tpu.io.raw import synthetic_raw

    rng = np.random.default_rng(seed)
    for name, (h, w) in shapes_names:
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        rgb = np.clip(np.stack([
            0.2 + 0.5 * xx / w + 0.05 * rng.random((h, w)),
            0.3 + 0.4 * yy / h,
            0.5 - 0.2 * xx / w,
        ]), 0, 1).astype(np.float32)
        (ind / name).write_bytes(
            write_dng(synthetic_raw(rgb, wb_gains=(1.8, 1.0, 1.4))))


@pytest.mark.skipif(not native.available(), reason="needs native lib")
def test_batch_mesh_byte_identical_to_single_loop(tmp_path, capsys):
    """Mesh-sharded batch == single-device editor loop, byte for byte —
    including a group smaller than the mesh (3 images on 8 devices, the
    padded-chunk path) and a second shape group."""
    ind = tmp_path / "in"
    out_mesh = tmp_path / "mesh"
    out_single = tmp_path / "single"
    ind.mkdir()
    _write_dngs(ind, [("a.dng", (48, 64)), ("b.dng", (48, 64)),
                      ("c.dng", (48, 64)), ("d.dng", (40, 56))])

    flags = ["--exposure", "0.5", "--vignette", "30", "--sharpness", "25",
             "--saturation-curve", "0:40000,65535:36000"]
    assert main(["batch", str(ind), str(out_mesh), *flags]) == 0
    out = capsys.readouterr().out
    assert "mesh x8" in out, out
    assert main(["batch", str(ind), str(out_single), "--no-mesh",
                 "--jnp-path", *flags]) == 0

    names = sorted(os.listdir(out_mesh))
    assert names == sorted(os.listdir(out_single))
    assert names == ["a.jpg", "b.jpg", "c.jpg", "d.jpg"]
    for n in names:
        a = (out_mesh / n).read_bytes()
        b = (out_single / n).read_bytes()
        assert a == b, f"{n}: mesh and single-device bytes differ"


@pytest.mark.skipif(not native.available(), reason="needs native lib")
def test_batch_mesh_handles_nonraw_and_naming(tmp_path, capsys):
    """Non-RAW inputs ride the mesh path too (the editor opens them),
    and RAW+JPEG same-stem pairs keep the collision-safe naming."""
    from PIL import Image

    ind = tmp_path / "in"
    outd = tmp_path / "out"
    ind.mkdir()
    _write_dngs(ind, [("IMG_0001.dng", (48, 64))])
    Image.new("RGB", (64, 48), (90, 120, 40)).save(ind / "IMG_0001.jpg")

    assert main(["batch", str(ind), str(outd), "--exposure", "0.3"]) == 0
    assert "mesh x8" in capsys.readouterr().out
    outs = sorted(p.name for p in outd.iterdir())
    assert len(outs) == 2, outs
    for n in outs:
        assert (outd / n).read_bytes()[:2] == b"\xff\xd8"
