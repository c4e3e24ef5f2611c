"""DNG OpcodeList2 GainMap (opcode 9) — phone-DNG shading correction.

Fixtures build the big-endian opcode stream by hand from the DNG 1.3
layout; expected values come from an independent scalar (loop-based)
bilinear sampler in this file, so the production vectorized path is
gated against a separately-written implementation.
"""

import struct

import numpy as np
import pytest

from rawphotoforge_tpu.io import dng


def _gain_map_opcode(top, left, bottom, right, row_pitch, col_pitch,
                     pts_v, pts_h, spacing_v, spacing_h, origin_v, origin_h,
                     gains):
    body = struct.pack(
        ">10I", top, left, bottom, right, 0, 1, row_pitch, col_pitch,
        pts_v, pts_h)
    body += struct.pack(">4d", spacing_v, spacing_h, origin_v, origin_h)
    body += struct.pack(">I", 1)  # map_planes
    body += np.asarray(gains, dtype=">f4").tobytes()
    return body


def _opcode_list(ops):
    out = struct.pack(">I", len(ops))
    for op_id, body in ops:
        out += struct.pack(">IIII", op_id, 0x01030000, 0, len(body)) + body
    return out


def _oracle_apply(mosaic, top, left, bottom, right, row_pitch, col_pitch,
                  pts_v, pts_h, sv, sh, ov, oh, gains):
    out = mosaic.astype(np.float64, copy=True)
    h, w = out.shape
    for r in range(top, min(bottom, h), row_pitch):
        for c in range(left, min(right, w), col_pitch):
            mv = min(max((r / max(h - 1, 1) - ov) / sv, 0.0), pts_v - 1.0)
            mh = min(max((c / max(w - 1, 1) - oh) / sh, 0.0), pts_h - 1.0)
            v0 = min(int(mv), pts_v - 2) if pts_v > 1 else 0
            h0 = min(int(mh), pts_h - 2) if pts_h > 1 else 0
            fv = mv - v0 if pts_v > 1 else 0.0
            fh = mh - h0 if pts_h > 1 else 0.0
            v1 = min(v0 + 1, pts_v - 1)
            h1 = min(h0 + 1, pts_h - 1)
            g = ((1 - fv) * (1 - fh) * gains[v0][h0]
                 + (1 - fv) * fh * gains[v0][h1]
                 + fv * (1 - fh) * gains[v1][h0]
                 + fv * fh * gains[v1][h1])
            out[r, c] *= g
    return out.astype(np.float32)


def test_gain_map_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    h, w = 20, 28
    norm = rng.random((h, w)).astype(np.float32)
    pts_v, pts_h = 3, 4
    gains = rng.uniform(0.8, 2.0, size=(pts_v, pts_h)).astype(np.float32)
    sv, sh = 1.0 / (pts_v - 1), 1.0 / (pts_h - 1)
    op = _gain_map_opcode(0, 0, h, w, 1, 1, pts_v, pts_h, sv, sh, 0.0, 0.0,
                          gains)
    got = dng._apply_gain_maps(norm, _opcode_list([(9, op)]))
    want = _oracle_apply(norm, 0, 0, h, w, 1, 1, pts_v, pts_h, sv, sh,
                         0.0, 0.0, gains)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pitched_area_touches_only_its_lattice():
    """row/col pitch 2 = one Bayer plane: other sites stay untouched."""
    rng = np.random.default_rng(1)
    h, w = 16, 16
    norm = rng.random((h, w)).astype(np.float32)
    gains = np.full((2, 2), 1.5, dtype=np.float32)
    op = _gain_map_opcode(0, 0, h, w, 2, 2, 2, 2, 1.0, 1.0, 0.0, 0.0, gains)
    got = dng._apply_gain_maps(norm, _opcode_list([(9, op)]))
    np.testing.assert_allclose(got[0::2, 0::2], norm[0::2, 0::2] * 1.5,
                               rtol=1e-6)
    np.testing.assert_array_equal(got[1::2, :], norm[1::2, :])
    np.testing.assert_array_equal(got[0::2, 1::2], norm[0::2, 1::2])


def test_unknown_opcodes_skipped():
    norm = np.ones((8, 8), dtype=np.float32)
    weird = _opcode_list([(4, b"\x00" * 8),   # FixBadPixels: skipped
                          (9, _gain_map_opcode(
                              0, 0, 8, 8, 1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0,
                              np.asarray([[2.0]])))])
    got = dng._apply_gain_maps(norm, weird)
    np.testing.assert_allclose(got, 2.0)


def test_end_to_end_dng_with_gain_map():
    """A written DNG carrying OpcodeList2 decodes to a float mosaic with
    the gains folded in at the normalized (linear-reference) stage."""
    rng = np.random.default_rng(2)
    h, w = 24, 32
    mosaic = rng.integers(600, 15000, size=(h, w), dtype=np.uint16)
    raw = dng.RawImage(
        mosaic=mosaic, pattern="RGGB", black_level=512.0,
        white_level=16383.0, wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None,
    )
    gains = np.asarray([[1.0, 1.4], [1.2, 2.0]], dtype=np.float32)
    op = _gain_map_opcode(0, 0, h, w, 1, 1, 2, 2, 1.0, 1.0, 0.0, 0.0, gains)
    data = dng.write_dng(raw, opcode_list_2=_opcode_list([(9, op)]))
    back = dng.read_dng(data)
    assert back.mosaic.dtype == np.float32
    assert back.black_level == 0.0 and back.white_level == 1.0
    norm = (mosaic.astype(np.float32) - 512.0) / (16383.0 - 512.0)
    want = _oracle_apply(norm, 0, 0, h, w, 1, 1, 2, 2, 1.0, 1.0, 0.0, 0.0,
                         gains)
    np.testing.assert_allclose(back.mosaic, want, rtol=1e-5)
    # ...and the develop path accepts the float mosaic.
    from rawphotoforge_tpu.io.raw import develop_raw_image

    planes, _ = develop_raw_image(back)
    assert planes.shape == (3, h, w)


def test_malformed_opcode_list_is_typed():
    norm = np.ones((4, 4), dtype=np.float32)
    with pytest.raises(dng.DngError):
        dng._apply_gain_maps(
            norm, struct.pack(">I", 2) + struct.pack(">IIII", 9, 0, 0, 400))


def test_linear_raw_per_plane_selectors():
    """Plane/Planes selectors route each opcode's gains to its own
    channels only (review finding: all channels got every map)."""
    norm = np.ones((8, 8, 3), dtype=np.float32)
    ops = []
    for ch, g in enumerate((1.5, 2.0, 3.0)):
        body = struct.pack(">10I", 0, 0, 8, 8, ch, 1, 1, 1, 1, 1)
        body += struct.pack(">4d", 1.0, 1.0, 0.0, 0.0)
        body += struct.pack(">I", 1)
        body += np.asarray([[g]], dtype=">f4").tobytes()
        ops.append((9, body))
    got = dng._apply_gain_maps(norm, _opcode_list(ops))
    np.testing.assert_allclose(got[..., 0], 1.5)
    np.testing.assert_allclose(got[..., 1], 2.0)
    np.testing.assert_allclose(got[..., 2], 3.0)


def test_multi_plane_map_single_opcode():
    """One opcode with Planes=3 and map_planes=3 applies map plane j to
    channel j."""
    norm = np.ones((6, 6, 3), dtype=np.float32)
    gains = np.asarray([1.1, 1.2, 1.3], dtype=np.float32).reshape(1, 1, 3)
    body = struct.pack(">10I", 0, 0, 6, 6, 0, 3, 1, 1, 1, 1)
    body += struct.pack(">4d", 1.0, 1.0, 0.0, 0.0)
    body += struct.pack(">I", 3)
    body += gains.astype(">f4").tobytes()
    got = dng._apply_gain_maps(norm, _opcode_list([(9, body)]))
    np.testing.assert_allclose(got[0, 0], [1.1, 1.2, 1.3], rtol=1e-6)


def test_convert_mode_preserves_pixels_and_opcodes():
    """read_dng(apply_opcodes=False) + write_dng = lossless transcode:
    stored integer pixels pass through verbatim and both opcode lists
    re-serialize (review findings: convert crashed / dropped opcodes)."""
    rng = np.random.default_rng(3)
    mosaic = rng.integers(600, 15000, size=(16, 16), dtype=np.uint16)
    raw0 = dng.RawImage(
        mosaic=mosaic, pattern="RGGB", black_level=512.0,
        white_level=16383.0, wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None,
    )
    gains = np.asarray([[1.0, 1.5]], dtype=np.float32)
    op2 = _opcode_list([(9, _gain_map_opcode(
        0, 0, 16, 16, 1, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, gains))])
    from test_warp_rect import _warp_opcode

    op3 = _warp_opcode([[0.95, 0.02, 0, 0, 0, 0]], (0.5, 0.5))
    src = dng.write_dng(raw0, compression=7, opcode_list_2=op2,
                        opcode_list_3=op3)

    # Transcode without baking anything in.
    raw = dng.read_dng(src, apply_opcodes=False)
    assert raw.mosaic.dtype == np.uint16
    np.testing.assert_array_equal(raw.mosaic, mosaic)
    assert raw.warp_rectilinear is None  # not scheduled in transcode mode
    out = dng.write_dng(raw, compression=8, predictor=34892)

    # The transcoded file still decodes (with opcodes APPLIED) exactly
    # like the source does.
    a = dng.read_dng(src)
    b = dng.read_dng(out)
    assert a.mosaic.dtype == b.mosaic.dtype == np.float32  # gains baked
    np.testing.assert_allclose(b.mosaic, a.mosaic, rtol=1e-6)
    assert b.warp_rectilinear is not None
    np.testing.assert_allclose(b.warp_rectilinear[0], a.warp_rectilinear[0])
