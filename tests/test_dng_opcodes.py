"""DNG opcode coverage beyond GainMap/WarpRectilinear (DNG 1.3 §opcodes):

- OpcodeList1 FixBadPixelsConstant (id 4) / FixBadPixelsList (id 5):
  defective-pixel interpolation on the STORED mosaic, full-sensor
  coordinates (before LinearizationTable / ActiveArea).
- OpcodeList2 FixVignetteRadial (id 3) and MapPolynomial (id 8) at the
  normalized linear-reference stage.
- OpcodeList3 FixVignetteRadial: post-demosaic radial gain in develop.

Fixtures build the big-endian opcode streams by hand from the DNG 1.3
layout; expected values come from independent scalar (loop-based)
oracles in this file. The radial-gain model (r normalized to the corner
farthest from the optical center, gain = 1 + sum k_i r^(2(i+1))) is the
dng_sdk dng_vignette_radial_params contract.
"""

import struct

import numpy as np
import pytest

from rawphotoforge_tpu.io import dng
from test_gainmap import _opcode_list


def _vignette_opcode(k, cx, cy):
    return struct.pack(">7d", *k, cx, cy)


def _map_poly_opcode(top, left, bottom, right, plane, planes,
                     row_pitch, col_pitch, coefs):
    body = struct.pack(">8I", top, left, bottom, right, plane, planes,
                       row_pitch, col_pitch)
    body += struct.pack(">I", len(coefs) - 1)
    body += struct.pack(f">{len(coefs)}d", *coefs)
    return body


def _bad_const_opcode(constant, phase=0):
    return struct.pack(">2I", constant, phase)


def _bad_list_opcode(points, rects, phase=0):
    body = struct.pack(">3I", phase, len(points), len(rects))
    for r, c in points:
        body += struct.pack(">2I", r, c)
    for t, l, b, rr in rects:
        body += struct.pack(">4I", t, l, b, rr)
    return body


def _vignette_gain_oracle(h, w, k, cx, cy):
    """Independent scalar radial-gain surface."""
    out = np.empty((h, w), np.float64)
    ccy, ccx = cy * (h - 1), cx * (w - 1)
    m2 = max(ccy, h - 1 - ccy) ** 2 + max(ccx, w - 1 - ccx) ** 2
    for y in range(h):
        for x in range(w):
            r2 = ((y - ccy) ** 2 + (x - ccx) ** 2) / m2
            g = 1.0
            for i, ki in enumerate(k):
                g += ki * r2 ** (i + 1)
            out[y, x] = g
    return out


def test_vignette_radial_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    h, w = 18, 26
    norm = rng.random((h, w)).astype(np.float32)
    k = [0.3, -0.05, 0.01, 0.0, 0.002]
    op = _opcode_list([(3, _vignette_opcode(k, 0.45, 0.55))])
    got = dng._apply_gain_maps(norm, op)
    want = norm * _vignette_gain_oracle(h, w, k, 0.45, 0.55)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5)


def test_vignette_radial_rgb_applies_all_channels():
    norm = np.ones((8, 10, 3), dtype=np.float32)
    op = _opcode_list([(3, _vignette_opcode([1.0, 0, 0, 0, 0], 0.5, 0.5))])
    got = dng._apply_gain_maps(norm, op)
    want = 1.0 + _vignette_gain_oracle(8, 10, [1.0, 0, 0, 0, 0],
                                       0.5, 0.5) - 1.0
    for ch in range(3):
        np.testing.assert_allclose(got[..., ch], want, rtol=1e-5)
    # Farthest corner has r = 1 -> gain = 1 + k0 there.
    corners = [got[0, 0, 0], got[0, -1, 0], got[-1, 0, 0], got[-1, -1, 0]]
    np.testing.assert_allclose(max(corners), 2.0, rtol=1e-6)


def test_map_polynomial_matches_scalar_oracle():
    rng = np.random.default_rng(1)
    h, w = 12, 16
    norm = rng.random((h, w)).astype(np.float32)
    coefs = [0.05, 0.7, 0.4]  # 0.05 + 0.7 x + 0.4 x^2
    op = _opcode_list([(8, _map_poly_opcode(0, 0, h, w, 0, 1, 1, 1, coefs))])
    got = dng._apply_gain_maps(norm, op)
    x = norm.astype(np.float64)
    want = np.clip(coefs[0] + coefs[1] * x + coefs[2] * x * x, 0.0, 1.0)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)


def test_map_polynomial_clips_and_selects_planes():
    norm = np.full((6, 6, 3), 0.5, dtype=np.float32)
    # Channel 1 only: 3x -> clipped to 1.0; others untouched.
    op = _opcode_list([(8, _map_poly_opcode(0, 0, 6, 6, 1, 1, 1, 1,
                                            [0.0, 3.0]))])
    got = dng._apply_gain_maps(norm, op)
    np.testing.assert_allclose(got[..., 0], 0.5)
    np.testing.assert_allclose(got[..., 1], 1.0)
    np.testing.assert_allclose(got[..., 2], 0.5)


def test_map_polynomial_pitched_lattice():
    norm = np.full((8, 8), 0.25, dtype=np.float32)
    op = _opcode_list([(8, _map_poly_opcode(0, 0, 8, 8, 0, 1, 2, 2,
                                            [0.0, 2.0]))])
    got = dng._apply_gain_maps(norm, op)
    np.testing.assert_allclose(got[0::2, 0::2], 0.5)
    np.testing.assert_array_equal(got[1::2, :], norm[1::2, :])
    np.testing.assert_array_equal(got[0::2, 1::2], norm[0::2, 1::2])


def test_opcode_order_is_respected():
    """Opcodes apply in listed order: poly(2x) then vignette center gain
    1 differs from vignette first only through clipping — use values
    where order changes the clip."""
    norm = np.full((4, 4), 0.6, dtype=np.float32)
    poly = _map_poly_opcode(0, 0, 4, 4, 0, 1, 1, 1, [0.0, 2.0])  # -> 1.0 clip
    vig = _vignette_opcode([-0.5, 0, 0, 0, 0], 0.5, 0.5)  # corner gain 0.5
    a = dng._apply_gain_maps(norm, _opcode_list([(8, poly), (3, vig)]))
    b = dng._apply_gain_maps(norm, _opcode_list([(3, vig), (8, poly)]))
    # a: clip(1.2)=1.0 then x0.5 -> 0.5 at the corner; b: 0.6*0.5=0.3
    # then clip(0.6) -> 0.6 at the corner.
    assert abs(a[0, 0] - 0.5) < 1e-6
    assert abs(b[0, 0] - 0.6) < 1e-6


def test_fix_bad_pixels_constant_interpolates():
    m = np.full((12, 12), 1000, dtype=np.uint16)
    m[1::2, :] = 1200  # distinguish phases
    m[4, 6] = 65535    # the defect marker
    fixed = dng._apply_opcode_list1(
        m, _opcode_list([(4, _bad_const_opcode(65535))]), (2, 2))
    assert fixed.dtype == np.uint16
    # Same-phase neighbors (distance-2 lattice) all hold 1000.
    assert fixed[4, 6] == 1000
    # Everything else untouched.
    m2 = m.copy()
    m2[4, 6] = 1000
    np.testing.assert_array_equal(fixed, m2)


def test_fix_bad_pixels_list_points_and_rects():
    rng = np.random.default_rng(2)
    m = rng.integers(100, 4000, size=(20, 20), dtype=np.uint16)
    pts = [(3, 5), (10, 11)]
    rects = [(14, 14, 18, 18)]
    fixed = dng._apply_opcode_list1(
        m, _opcode_list([(5, _bad_list_opcode(pts, rects))]), (2, 2))
    # A point defect becomes the mean of its 8 same-phase neighbors.
    for r, c in pts:
        offs = [(-2, 0), (2, 0), (0, -2), (0, 2),
                (-2, -2), (-2, 2), (2, -2), (2, 2)]
        vals = [float(m[r + dy, c + dx]) for dy, dx in offs]
        assert abs(float(fixed[r, c]) - np.mean(vals)) <= 0.5 + 1e-6
    # The rect interior was filled (no original values survive) and
    # values are in the plausible neighbor range.
    sub = fixed[14:18, 14:18].astype(np.int64)
    assert (sub >= 100).all() and (sub <= 4000).all()
    # Outside the defects nothing changed.
    mask = np.zeros((20, 20), bool)
    for r, c in pts:
        mask[r, c] = True
    mask[14:18, 14:18] = True
    np.testing.assert_array_equal(fixed[~mask], m[~mask])


def test_fix_bad_pixels_float_mosaic_skips_constant():
    m = np.full((8, 8), 0.5, dtype=np.float32)
    out = dng._apply_opcode_list1(
        m, _opcode_list([(4, _bad_const_opcode(0))]), (2, 2))
    np.testing.assert_array_equal(out, m)


def test_malformed_opcode_list1_is_typed():
    m = np.ones((4, 4), dtype=np.uint16)
    with pytest.raises(dng.DngError):
        dng._apply_opcode_list1(
            m, struct.pack(">I", 1) + struct.pack(">IIII", 5, 0, 0, 400),
            (2, 2))


def test_end_to_end_list1_full_sensor_coordinates():
    """A written DNG with OpcodeList1 + ActiveArea: the bad pixel is
    addressed in FULL-sensor coordinates and fixed before the
    ActiveArea crop shifts the image."""
    rng = np.random.default_rng(3)
    h, w = 16, 16
    mosaic = rng.integers(600, 15000, size=(h, w), dtype=np.uint16)
    mosaic[6, 7] = 16383
    raw = dng.RawImage(
        mosaic=mosaic, pattern="RGGB", black_level=512.0,
        white_level=16383.0, wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None,
    )
    op1 = _opcode_list([(5, _bad_list_opcode([(6, 7)], []))])
    data = dng.write_dng(raw, active_area=(2, 2, 14, 14), opcode_list_1=op1)
    back = dng.read_dng(data)
    assert back.mosaic.shape == (12, 12)
    offs = [(-2, 0), (2, 0), (0, -2), (0, 2),
            (-2, -2), (-2, 2), (2, -2), (2, 2)]
    want = np.mean([float(mosaic[6 + dy, 7 + dx]) for dy, dx in offs])
    # (6, 7) full-sensor lands at (4, 5) after the (2, 2) active origin.
    assert abs(float(back.mosaic[4, 5]) - want) <= 0.5 + 1e-6
    # An untouched stored pixel passes through.
    assert back.mosaic[0, 0] == mosaic[2, 2]


def test_end_to_end_list3_vignette_develops():
    """OpcodeList3 FixVignetteRadial reaches develop as a post-demosaic
    radial gain: developing the file equals developing the same file
    without the opcode, times the gain surface."""
    rng = np.random.default_rng(4)
    h, w = 24, 32
    mosaic = rng.integers(600, 15000, size=(h, w), dtype=np.uint16)
    raw = dng.RawImage(
        mosaic=mosaic, pattern="RGGB", black_level=512.0,
        white_level=16383.0, wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None,
    )
    k = [0.4, 0.1, 0.0, 0.0, 0.0]
    op3 = _opcode_list([(3, _vignette_opcode(k, 0.5, 0.5))])
    with_op = dng.read_dng(dng.write_dng(raw, opcode_list_3=op3))
    without = dng.read_dng(dng.write_dng(raw))
    assert with_op.vignette_radial is not None
    np.testing.assert_allclose(with_op.vignette_radial[0], k, rtol=1e-6)

    from rawphotoforge_tpu.io.raw import bucket_stable_eligible, \
        develop_raw_image

    # Opcode files are bucket-stable since r4 (true-extent-traced
    # coordinates); padded-vs-unpadded identity is gated in tests/
    # test_raw.py::test_bucket_stable_develop_opcode_files_bit_identical.
    assert bucket_stable_eligible(with_op)
    a, _ = develop_raw_image(with_op)
    b, _ = develop_raw_image(without)
    g = _vignette_gain_oracle(h, w, k, 0.5, 0.5).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b) * g[None], rtol=2e-5, atol=1e-6)


def test_list2_vignette_end_to_end_normalizes():
    """A list-2 FixVignetteRadial (no GainMap present) still triggers
    the normalize-and-apply path on read."""
    rng = np.random.default_rng(5)
    h, w = 12, 12
    mosaic = rng.integers(600, 15000, size=(h, w), dtype=np.uint16)
    raw = dng.RawImage(
        mosaic=mosaic, pattern="RGGB", black_level=512.0,
        white_level=16383.0, wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None,
    )
    k = [0.25, 0.0, 0.0, 0.0, 0.0]
    op2 = _opcode_list([(3, _vignette_opcode(k, 0.5, 0.5))])
    back = dng.read_dng(dng.write_dng(raw, opcode_list_2=op2))
    assert back.mosaic.dtype == np.float32
    assert back.black_level == 0.0 and back.white_level == 1.0
    norm = (mosaic.astype(np.float32) - 512.0) / (16383.0 - 512.0)
    want = norm * _vignette_gain_oracle(h, w, k, 0.5, 0.5)
    np.testing.assert_allclose(back.mosaic, want.astype(np.float32),
                               rtol=1e-5)


def test_list1_ignored_on_linear_raw():
    """Bad-pixel opcodes describe defective CFA sites; a LinearRaw
    (H, W, 3) DNG carrying one must open with the opcode IGNORED, not
    crash or be rejected (review finding: the 2-D interpolator ran
    unconditionally)."""
    rng = np.random.default_rng(7)
    vals = rng.integers(600, 15000, size=(12, 16, 3), dtype=np.uint16)
    raw = dng.RawImage(
        mosaic=vals, pattern="RGB", black_level=512.0,
        white_level=16383.0, wb_gains=(1.5, 1.0, 1.2), xyz_to_cam=None,
    )
    op1 = _opcode_list([(4, _bad_const_opcode(600)),
                        (5, _bad_list_opcode([(2, 3)], []))])
    back = dng.read_dng(dng.write_dng(raw, opcode_list_1=op1))
    np.testing.assert_array_equal(back.mosaic, vals)


def test_list1_xtrans_uses_cfa_period():
    """On an X-Trans DNG the bad-pixel interpolation lattice is the 6x6
    CFA period, not the Bayer 2x2 (a distance-2 neighbor is usually a
    different channel on X-Trans)."""
    rng = np.random.default_rng(8)
    mosaic = rng.integers(600, 15000, size=(24, 24), dtype=np.uint16)
    mosaic[12, 12] = 16383
    from rawphotoforge_tpu.io.raw import synthetic_raw

    base = synthetic_raw(rng.random((3, 24, 24)).astype(np.float32),
                         pattern="XTRANS")
    import dataclasses

    raw = dataclasses.replace(base, mosaic=mosaic)
    op1 = _opcode_list([(5, _bad_list_opcode([(12, 12)], []))])
    back = dng.read_dng(dng.write_dng(raw, opcode_list_1=op1))
    offs = [(-6, 0), (6, 0), (0, -6), (0, 6),
            (-6, -6), (-6, 6), (6, -6), (6, 6)]
    want = np.mean([float(mosaic[12 + dy, 12 + dx]) for dy, dx in offs])
    assert abs(float(back.mosaic[12, 12]) - want) <= 0.5 + 1e-6


def test_list3_order_is_respected():
    """OpcodeList3 opcodes apply in the file's LISTED order: a
    vignette-before-warp file evaluates the radial gain on pre-warp
    coordinates (review finding: the order was hardcoded)."""
    from rawphotoforge_tpu.io.raw import develop_raw_image
    from test_warp_rect import _warp_opcode

    rng = np.random.default_rng(9)
    h, w = 48, 64
    mosaic = rng.integers(600, 15000, size=(h, w), dtype=np.uint16)
    raw = dng.RawImage(
        mosaic=mosaic, pattern="RGGB", black_level=512.0,
        white_level=16383.0, wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None,
    )
    k = [0.6, 0.0, 0.0, 0.0, 0.0]
    warp_body = _warp_opcode([[0.85, 0.1, 0, 0, 0, 0]], (0.5, 0.5))
    # _warp_opcode returns a full opcode LIST; unwrap its single body.
    (_id, _v, _f, nb) = struct.unpack_from(">IIII", warp_body, 4)
    warp_body = warp_body[20 : 20 + nb]
    vig_body = _vignette_opcode(k, 0.5, 0.5)
    wv = dng.read_dng(dng.write_dng(raw, opcode_list_3=_opcode_list(
        [(1, warp_body), (3, vig_body)])))
    vw = dng.read_dng(dng.write_dng(raw, opcode_list_3=_opcode_list(
        [(3, vig_body), (1, warp_body)])))
    assert not wv.vignette_first and vw.vignette_first
    a, _ = develop_raw_image(wv)
    b, _ = develop_raw_image(vw)
    a, b = np.asarray(a), np.asarray(b)
    assert np.abs(a - b).max() > 1e-3  # the order is observable
    # Manual compositions of the same primitives match each ordering.
    base, _ = develop_raw_image(dng.read_dng(dng.write_dng(raw)))
    from rawphotoforge_tpu.io.dng import (_parse_warp_body,
                                          _vignette_radial_gain)
    from rawphotoforge_tpu.ops.lenscorr import warp_rectilinear
    import jax.numpy as jnp

    coefs, center = _parse_warp_body(warp_body)
    g = _vignette_radial_gain(h, w, k, (0.5, 0.5))
    want_wv = np.asarray(warp_rectilinear(
        jnp.asarray(base), jnp.asarray(coefs),
        jnp.asarray(center))) * g[None]
    want_vw = np.asarray(warp_rectilinear(
        jnp.asarray(np.asarray(base) * g[None]), jnp.asarray(coefs),
        jnp.asarray(center)))
    np.testing.assert_allclose(a, want_wv, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b, want_vw, rtol=1e-5, atol=1e-6)


def test_transcode_preserves_list1():
    """read_dng(apply_opcodes=False) + write_dng re-serializes
    OpcodeList1 so the transcoded file still fixes its bad pixels."""
    rng = np.random.default_rng(6)
    mosaic = rng.integers(600, 15000, size=(12, 12), dtype=np.uint16)
    mosaic[4, 4] = 16383
    raw0 = dng.RawImage(
        mosaic=mosaic, pattern="RGGB", black_level=512.0,
        white_level=16383.0, wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None,
    )
    op1 = _opcode_list([(5, _bad_list_opcode([(4, 4)], []))])
    src = dng.write_dng(raw0, opcode_list_1=op1)
    raw = dng.read_dng(src, apply_opcodes=False)
    np.testing.assert_array_equal(raw.mosaic, mosaic)  # nothing baked
    out = dng.write_dng(raw, compression=8, predictor=34892)
    a = dng.read_dng(src)
    b = dng.read_dng(out)
    np.testing.assert_array_equal(a.mosaic, b.mosaic)
    assert a.mosaic[4, 4] != 16383  # the fix actually ran


# ---- MapTable (id 7) and per-row/column corrections (ids 10-13) ----


def _map_table_opcode(top, left, bottom, right, plane, planes,
                      row_pitch, col_pitch, table):
    body = struct.pack(">8I", top, left, bottom, right, plane, planes,
                       row_pitch, col_pitch)
    body += struct.pack(">I", len(table))
    body += struct.pack(f">{len(table)}H", *table)
    return body


def _per_rowcol_opcode(top, left, bottom, right, plane, planes,
                       row_pitch, col_pitch, vals):
    body = struct.pack(">8I", top, left, bottom, right, plane, planes,
                       row_pitch, col_pitch)
    body += struct.pack(">I", len(vals))
    body += struct.pack(f">{len(vals)}f", *vals)
    return body


def test_map_table_matches_scalar_oracle():
    """Short tables replicate their last entry across the rest of the
    16-bit domain (dng_sdk's fill): values indexing past count-1 read
    table[count-1]."""
    rng = np.random.default_rng(10)
    h, w = 10, 14
    norm = rng.random((h, w)).astype(np.float32)
    count = 300  # most of [0,1] lands beyond the table
    table = np.sort(rng.integers(0, 65536, size=count)).astype(np.uint16)
    op = _opcode_list([(7, _map_table_opcode(0, 0, h, w, 0, 1, 1, 1,
                                             table))])
    got = dng._apply_gain_maps(norm, op)
    want = np.empty_like(norm)
    for y in range(h):
        for x in range(w):
            idx = int(round(norm[y, x] * 65535.0))
            idx = min(max(idx, 0), count - 1)
            want[y, x] = table[idx] / 65535.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_map_table_plane_selection_and_identity():
    """A full 65536-entry identity table is a no-op; plane selection
    touches only the requested channel."""
    rng = np.random.default_rng(11)
    norm = rng.random((6, 8, 3)).astype(np.float32)
    ident = np.arange(65536, dtype=np.uint16)
    inv = ident[::-1].copy()  # v -> 1 - v (up to quantization)
    op = _opcode_list([(7, _map_table_opcode(0, 0, 6, 8, 1, 1, 1, 1,
                                             inv))])
    got = dng._apply_gain_maps(norm, op)
    np.testing.assert_array_equal(got[..., 0], norm[..., 0])
    np.testing.assert_array_equal(got[..., 2], norm[..., 2])
    np.testing.assert_allclose(got[..., 1], 1.0 - norm[..., 1],
                               atol=2.0 / 65535.0)
    op_id = _opcode_list([(7, _map_table_opcode(0, 0, 6, 8, 0, 0, 1, 1,
                                                ident))])
    got2 = dng._apply_gain_maps(norm, op_id)
    np.testing.assert_allclose(got2, norm, atol=1.0 / 65535.0)


def test_delta_per_row_pitched_lattice():
    """DeltaPerRow adds one value per PITCHED row of the area and clips
    to [0, 1]; untouched rows keep their values."""
    norm = np.full((8, 6), 0.4, dtype=np.float32)
    deltas = [0.1, -0.5, 0.7]  # rows 1, 3, 5 (top=1, pitch=2)
    op = _opcode_list([(10, _per_rowcol_opcode(1, 0, 6, 6, 0, 1, 2, 1,
                                               deltas))])
    got = dng._apply_gain_maps(norm, op)
    np.testing.assert_allclose(got[1, :], 0.5, rtol=1e-6)
    np.testing.assert_allclose(got[3, :], 0.0)      # clipped up from -0.1
    np.testing.assert_allclose(got[5, :], 1.0)      # clipped down from 1.1
    for r in (0, 2, 4, 6, 7):
        np.testing.assert_array_equal(got[r, :], norm[r, :])


def test_scale_per_column_matches_oracle_rgb():
    rng = np.random.default_rng(12)
    h, w = 7, 5
    norm = rng.random((h, w, 3)).astype(np.float32)
    scales = rng.uniform(0.5, 1.8, size=w).astype(np.float32)
    op = _opcode_list([(13, _per_rowcol_opcode(0, 0, h, w, 0, 0, 1, 1,
                                               scales))])
    got = dng._apply_gain_maps(norm, op)
    want = np.clip(norm * scales[None, :, None], 0.0, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_delta_per_column_then_scale_per_row_in_order():
    """Listed order matters through the [0,1] clip."""
    norm = np.full((3, 3), 0.8, dtype=np.float32)
    add = _per_rowcol_opcode(0, 0, 3, 3, 0, 1, 1, 1, [0.5, 0.5, 0.5])
    scale = _per_rowcol_opcode(0, 0, 3, 3, 0, 1, 1, 1, [0.5, 0.5, 0.5])
    a = dng._apply_gain_maps(norm, _opcode_list([(11, add), (12, scale)]))
    b = dng._apply_gain_maps(norm, _opcode_list([(12, scale), (11, add)]))
    np.testing.assert_allclose(a, 0.5)   # clip(1.3)=1.0 then *0.5
    np.testing.assert_allclose(b, 0.9)   # 0.4 then +0.5
    assert abs(float(a[0, 0]) - float(b[0, 0])) > 0.3


def test_per_row_short_table_is_typed():
    norm = np.full((8, 8), 0.5, dtype=np.float32)
    op = _opcode_list([(12, _per_rowcol_opcode(0, 0, 8, 8, 0, 1, 1, 1,
                                               [1.0, 1.0]))])
    with pytest.raises(dng.DngError):
        dng._apply_gain_maps(norm, op)


def test_map_table_truncated_is_typed():
    norm = np.full((4, 4), 0.5, dtype=np.float32)
    body = _map_table_opcode(0, 0, 4, 4, 0, 1, 1, 1,
                             np.arange(16, dtype=np.uint16))
    for cut in (body[:34], body[:40]):
        with pytest.raises(dng.DngError):
            dng._apply_gain_maps(norm, _opcode_list([(7, cut)]))
    with pytest.raises(dng.DngError):
        dng._apply_gain_maps(norm, _opcode_list(
            [(7, body[:32] + struct.pack(">I", 0))]))  # size 0


def test_list2_map_table_end_to_end_normalizes():
    """A list-2 MapTable alone triggers the normalize-and-apply read
    path (the _LIST2_IDS gate covers id 7)."""
    rng = np.random.default_rng(13)
    h, w = 12, 12
    mosaic = rng.integers(600, 15000, size=(h, w), dtype=np.uint16)
    raw = dng.RawImage(
        mosaic=mosaic, pattern="RGGB", black_level=512.0,
        white_level=16383.0, wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None,
    )
    # Square-root response table.
    tab = (np.sqrt(np.arange(65536) / 65535.0) * 65535.0).astype(np.uint16)
    op2 = _opcode_list([(7, _map_table_opcode(0, 0, h, w, 0, 1, 1, 1,
                                              tab))])
    back = dng.read_dng(dng.write_dng(raw, opcode_list_2=op2))
    assert back.black_level == 0.0 and back.white_level == 1.0
    norm = (mosaic.astype(np.float32) - 512.0) / (16383.0 - 512.0)
    idx = np.clip(np.rint(norm * 65535.0), 0, 65535).astype(np.int32)
    want = tab[idx] / 65535.0
    np.testing.assert_allclose(back.mosaic, want.astype(np.float32),
                               rtol=1e-5)


# ---- TrimBounds (id 6, OpcodeList3) ----


def _trim_opcode(top, left, bottom, right):
    return struct.pack(">4I", top, left, bottom, right)


def _trim_raw(h=16, w=20, seed=20):
    rng = np.random.default_rng(seed)
    mosaic = rng.integers(600, 15000, size=(h, w), dtype=np.uint16)
    return dng.RawImage(
        mosaic=mosaic, pattern="RGGB", black_level=512.0,
        white_level=16383.0, wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None)


def test_trim_bounds_alone_becomes_crop():
    raw = _trim_raw()
    op3 = _opcode_list([(6, _trim_opcode(2, 4, 14, 18))])
    back = dng.read_dng(dng.write_dng(raw, opcode_list_3=op3))
    assert back.default_crop == (4, 2, 14, 12)  # (x, y, w, h)


def test_trim_bounds_intersects_default_crop():
    raw = _trim_raw()
    raw = dng.RawImage(**{**raw.__dict__, "default_crop": (2, 0, 16, 10)})
    op3 = _opcode_list([(6, _trim_opcode(4, 6, 16, 20))])
    back = dng.read_dng(dng.write_dng(raw, opcode_list_3=op3))
    # trim rect x:[6,20) y:[4,16) ∩ crop x:[2,18) y:[0,10)
    assert back.default_crop == (6, 4, 12, 6)


def test_trim_bounds_full_frame_is_noop():
    raw = _trim_raw()
    op3 = _opcode_list([(6, _trim_opcode(0, 0, 16, 20))])
    back = dng.read_dng(dng.write_dng(raw, opcode_list_3=op3))
    assert back.default_crop is None


def test_trim_bounds_empty_is_typed():
    raw = _trim_raw()
    op3 = _opcode_list([(6, _trim_opcode(10, 0, 10, 20))])
    data = dng.write_dng(raw, opcode_list_3=op3)
    with pytest.raises(dng.DngError):
        dng.read_dng(data)


def test_trim_bounds_disjoint_from_default_crop_is_typed():
    """A trim rect that does not intersect DefaultCrop is two disjoint
    claims about where the visible image is — loud DngError, symmetric
    with the empty-trim handling (ADVICE r3: the old code silently
    discarded DefaultCrop and let the trim rect win)."""
    raw = _trim_raw()
    raw = dng.RawImage(**{**raw.__dict__, "default_crop": (0, 0, 4, 4)})
    op3 = _opcode_list([(6, _trim_opcode(10, 10, 16, 20))])
    data = dng.write_dng(raw, opcode_list_3=op3)
    with pytest.raises(dng.DngError, match="intersect"):
        dng.read_dng(data)


def test_map_table_nan_pixels_do_not_abort():
    """Isolated NaN samples (possible in fp32 HDR deflate mosaics) must
    not abort the decode via a garbage table index (ADVICE r3): NaN maps
    deterministically to index 0."""
    norm = np.full((6, 8), 0.5, np.float32)
    norm[2, 3] = np.nan
    count = 256
    table = np.arange(0, 65536, 256).astype(np.uint16)
    op = _opcode_list([(7, _map_table_opcode(0, 0, 6, 8, 0, 1, 1, 1,
                                             table))])
    got = dng._apply_gain_maps(norm, op)
    assert np.isfinite(got).all()
    assert got[2, 3] == table[0] / 65535.0


def test_trim_bounds_transcode_preserved():
    """apply_opcodes=False keeps TrimBounds in the raw blob (no crop
    folded in) and re-serializes it."""
    raw = _trim_raw()
    op3 = _opcode_list([(6, _trim_opcode(2, 4, 14, 18))])
    mid = dng.read_dng(dng.write_dng(raw, opcode_list_3=op3),
                       apply_opcodes=False)
    assert mid.default_crop is None
    back = dng.read_dng(dng.write_dng(mid))
    assert back.default_crop == (4, 2, 14, 12)


def test_trim_bounds_develop_matches_sliced_full():
    """Developing the trimmed DNG equals slicing the untrimmed develop
    (crop applies post-demosaic, so interior stencils see full
    context)."""
    from rawphotoforge_tpu.io import raw as rawmod
    raw = _trim_raw(24, 28, seed=21)
    op3 = _opcode_list([(6, _trim_opcode(4, 6, 20, 26))])
    trimmed = dng.read_dng(dng.write_dng(raw, opcode_list_3=op3))
    full = dng.read_dng(dng.write_dng(raw))
    a = np.asarray(rawmod.develop_raw_image(trimmed)[0])
    b = np.asarray(rawmod.develop_raw_image(full)[0])[:, 4:20, 6:26]
    np.testing.assert_array_equal(a, b)
