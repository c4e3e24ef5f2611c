"""Container robustness: malformed RAW bytes must raise typed errors.

Every mutation of a valid DNG (truncation, byte flips, zeroed spans) must
either decode or raise a PhotoEditorError subclass — never an unhandled
struct.error/IndexError/OSError escaping to the caller (the CLI and
server map typed errors to friendly failures; anything else is a crash).
"""

import io

import numpy as np
import pytest

from rawphotoforge_tpu._errbase import PhotoEditorError
from rawphotoforge_tpu.io import dng


def _variants():
    rng = np.random.default_rng(0)
    mosaic = rng.integers(0, 16000, size=(24, 32), dtype=np.uint16)
    raw = dng.RawImage(
        mosaic=mosaic, pattern="RGGB", black_level=128.0,
        white_level=16383.0, wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None,
    )
    out = {
        "uncompressed": dng.write_dng(raw, compression=1),
        "ljpeg": dng.write_dng(raw, compression=7),
        "ljpeg_tiled": dng.write_dng(raw, compression=7, tile=(16, 16)),
        "deflate": dng.write_dng(raw, compression=8, predictor=2),
        "deflate_x4": dng.write_dng(raw, compression=8, predictor=34893),
        "float": dng.write_dng(
            dng.RawImage(
                mosaic=(mosaic.astype(np.float32) / 16383.0),
                pattern="RGGB", black_level=0.0, white_level=1.0,
                wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None,
            ),
            compression=8,
        ),
        "float_f16": dng.write_dng(
            dng.RawImage(
                mosaic=(mosaic.astype(np.float32) / 16383.0).astype(np.float16),
                pattern="RGGB", black_level=0.0, white_level=1.0,
                wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None,
            ),
            compression=8,
        ),
    }
    # An opcode-dense fixture: every handled OpcodeList1/2/3 id rides in
    # one file, so the mutation sweep exercises all the opcode parsers
    # (FixBadPixels, GainMap, FixVignetteRadial, MapPolynomial, MapTable,
    # Delta/ScalePerRow/Column, WarpRectilinear, TrimBounds).
    import struct as _struct

    def _ops(items):
        blob = _struct.pack(">I", len(items))
        for oid, body in items:
            blob += _struct.pack(">IIII", oid, 0x01030000, 1, len(body)) + body
        return blob

    _area = _struct.pack(">8I", 0, 0, 24, 32, 0, 1, 1, 1)
    op1 = _ops([(4, _struct.pack(">2I", 16000, 0)),
                (5, _struct.pack(">3I", 0, 1, 1)
                 + _struct.pack(">2I", 3, 5) + _struct.pack(">4I", 8, 8, 10, 10))])
    op2 = _ops([
        (9, _area + _struct.pack(">2I", 2, 2)
         + _struct.pack(">4d", 1.0, 1.0, 0.0, 0.0) + _struct.pack(">I", 1)
         + _struct.pack(">4f", 1.0, 1.1, 1.2, 1.3)),
        (3, _struct.pack(">7d", 0.2, 0.0, 0.0, 0.0, 0.0, 0.5, 0.5)),
        (8, _area + _struct.pack(">I", 1) + _struct.pack(">2d", 0.0, 1.0)),
        (7, _area + _struct.pack(">I", 16)
         + np.linspace(0, 65535, 16).astype(">u2").tobytes()),
        (10, _area + _struct.pack(">I", 24)
         + np.full(24, 0.01, ">f4").tobytes()),
        (13, _area + _struct.pack(">I", 32)
         + np.full(32, 0.98, ">f4").tobytes()),
    ])
    op3 = _ops([
        (1, _struct.pack(">I", 1)
         + _struct.pack(">6d", 0.9, 0.05, 0.0, 0.0, 0.0, 0.0)
         + _struct.pack(">2d", 0.5, 0.5)),
        (6, _struct.pack(">4I", 2, 2, 22, 30)),
    ])
    out["opcodes"] = dng.write_dng(raw, opcode_list_1=op1,
                                   opcode_list_2=op2, opcode_list_3=op3)

    # A lossy LinearRaw fixture via the test builder.
    from PIL import Image as PILImage

    from test_dng_lossy import _build_dng

    rgb = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    PILImage.fromarray(rgb).save(buf, format="JPEG", quality=90)
    jpg = buf.getvalue()
    out["lossy"] = _build_dng(
        24, 32, [jpg],
        chunk_tags=[(273, 4, 1, 0), (278, 4, 1, 24), (279, 4, 1, len(jpg))],
    )
    return out


@pytest.mark.parametrize("name", sorted(_variants()))
def test_mutations_raise_typed_errors(name):
    data = _variants()[name]
    # crc32, NOT hash(): str hashes are salted per-process, which made
    # this test nondeterministic (a failing seed could not be re-run).
    import zlib

    rng = np.random.default_rng(zlib.crc32(name.encode()))
    failures = []
    for trial in range(120):
        buf = bytearray(data)
        kind = trial % 3
        if kind == 0:  # truncate
            cut = int(rng.integers(1, len(buf)))
            buf = buf[:cut]
        elif kind == 1:  # flip random bytes
            for _ in range(int(rng.integers(1, 8))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        else:  # zero a span
            a = int(rng.integers(0, len(buf) - 1))
            b = min(len(buf), a + int(rng.integers(1, 64)))
            buf[a:b] = bytes(b - a)
        try:
            dng.read_dng(bytes(buf))
        except PhotoEditorError:
            pass
        except Exception as e:  # noqa: BLE001
            failures.append((trial, kind, type(e).__name__, str(e)[:120]))
    assert not failures, failures[:5]


def test_cr2_mutations_raise_typed_errors():
    from test_cr2 import build_cr2

    from rawphotoforge_tpu.io.raw import parse_raw

    rng = np.random.default_rng(42)
    mosaic = rng.integers(0, 16000, size=(48, 48), dtype=np.uint16)
    data = build_cr2(mosaic)
    parse_raw(data)  # the pristine fixture must decode
    failures = []
    for trial in range(150):
        buf = bytearray(data)
        kind = trial % 3
        if kind == 0:
            buf = buf[: int(rng.integers(1, len(buf)))]
        elif kind == 1:
            for _ in range(int(rng.integers(1, 8))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        else:
            a = int(rng.integers(0, len(buf) - 1))
            b = min(len(buf), a + int(rng.integers(1, 64)))
            buf[a:b] = bytes(b - a)
        try:
            parse_raw(bytes(buf))
        except PhotoEditorError:
            pass
        except Exception as e:  # noqa: BLE001
            failures.append((trial, kind, type(e).__name__, str(e)[:120]))
    assert not failures, failures[:5]


def test_cyclic_ifd_chain_terminates():
    """A next-IFD pointer looping back must not hang the parser
    (review finding)."""
    raw = dng.RawImage(
        mosaic=np.random.default_rng(0).integers(
            0, 4000, size=(8, 8), dtype=np.uint16),
        pattern="RGGB", black_level=0.0, white_level=16383.0,
        wb_gains=(1.0, 1.0, 1.0), xyz_to_cam=None,
    )
    data = bytearray(dng.write_dng(raw))
    # The writer emits one IFD at offset 8 with a zero next pointer after
    # its entries; point it back at IFD0.
    import struct

    (n_entries,) = struct.unpack_from("<H", data, 8)
    next_ptr_at = 8 + 2 + n_entries * 12
    assert struct.unpack_from("<I", data, next_ptr_at)[0] == 0
    struct.pack_into("<I", data, next_ptr_at, 8)
    back = dng.read_dng(bytes(data))  # must terminate
    np.testing.assert_array_equal(back.mosaic, raw.mosaic)


def test_truncated_chunk_grid_rejected():
    """A chunk list that doesn't cover the strip/tile grid must raise,
    not decode to silently black regions (review finding)."""
    with pytest.raises(dng.DngError, match="grid"):
        dng._assemble_chunks(
            lambda i, h, w: np.zeros((h, w), np.uint16),
            2, 32, 32, 16, 16, np.uint16, tiled=True,  # 2 chunks, 2x2 grid
        )
    with pytest.raises(dng.DngError, match="geometry"):
        dng._assemble_chunks(
            lambda i, h, w: np.zeros((h, w), np.uint16),
            1, 32, 32, 0, 32, np.uint16, tiled=False,  # RowsPerStrip=0
        )
