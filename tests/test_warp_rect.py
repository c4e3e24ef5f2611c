"""DNG WarpRectilinear (OpcodeList3 opcode 1) — phone-DNG distortion.

The remap is gated against scipy.ndimage.map_coordinates on the same
coordinate model, plus exactness checks (identity coefficients) and an
end-to-end DNG round trip through the opcode container.
"""

import struct

import numpy as np
import jax.numpy as jnp
import pytest

from rawphotoforge_tpu.io import dng
from rawphotoforge_tpu.ops import lenscorr


def _warp_opcode(coefs, center):
    coefs = np.asarray(coefs, dtype=np.float64)
    body = struct.pack(">I", coefs.shape[0])
    body += coefs.astype(">f8").tobytes()
    body += struct.pack(">2d", center[0], center[1])
    return struct.pack(">I", 1) + struct.pack(
        ">IIII", 1, 0x01030000, 0, len(body)) + body


def _grad_planes(h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack([yy / h, xx / w, (yy * xx) / (h * w)])


def test_identity_coefficients_are_noop():
    planes = _grad_planes(24, 32)
    coefs = jnp.asarray([[1.0, 0.0, 0.0, 0.0, 0.0, 0.0]], dtype=jnp.float32)
    out = lenscorr.warp_rectilinear(
        jnp.asarray(planes), coefs, jnp.asarray([0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(out), planes, atol=1e-5)


def test_matches_scipy_map_coordinates():
    from scipy.ndimage import map_coordinates

    h, w = 30, 40
    rng = np.random.default_rng(0)
    planes = rng.random((3, h, w)).astype(np.float32)
    k = np.asarray([0.96, 0.05, -0.01, 0.002, 0.003, -0.002])
    center = np.asarray([0.45, 0.55])

    out = np.asarray(lenscorr.warp_rectilinear(
        jnp.asarray(planes), jnp.asarray([k], dtype=jnp.float32),
        jnp.asarray(center, dtype=jnp.float32)))

    cx, cy = center[0] * (w - 1), center[1] * (h - 1)
    mmax = np.hypot(max(cx, w - 1 - cx), max(cy, h - 1 - cy))
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    dx, dy = (xs - cx) / mmax, (ys - cy) / mmax
    r2 = dx * dx + dy * dy
    fr = k[0] + r2 * (k[1] + r2 * (k[2] + r2 * k[3]))
    sxn = fr * dx + k[4] * 2 * dx * dy + k[5] * (r2 + 2 * dx * dx)
    syn = fr * dy + k[5] * 2 * dx * dy + k[4] * (r2 + 2 * dy * dy)
    sx = np.clip(sxn * mmax + cx, 0, w - 1)
    sy = np.clip(syn * mmax + cy, 0, h - 1)
    for p in range(3):
        want = map_coordinates(planes[p].astype(np.float64), [sy, sx],
                               order=1, mode="nearest")
        np.testing.assert_allclose(out[p], want, atol=2e-5)


def test_per_plane_coefficients_differ():
    h, w = 20, 20
    planes = _grad_planes(h, w)
    coefs = jnp.asarray([
        [1.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.9, 0.0, 0.0, 0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    ], dtype=jnp.float32)
    out = np.asarray(lenscorr.warp_rectilinear(
        jnp.asarray(planes), coefs, jnp.asarray([0.5, 0.5])))
    np.testing.assert_allclose(out[0], planes[0], atol=1e-5)
    np.testing.assert_allclose(out[2], planes[2], atol=1e-5)
    assert np.abs(out[1] - planes[1]).max() > 1e-3  # G plane remapped


def test_end_to_end_dng_with_warp():
    from rawphotoforge_tpu.io.raw import develop_raw_image, synthetic_raw

    rgb = np.clip(_grad_planes(32, 48), 0, 1)
    base = synthetic_raw(rgb, wb_gains=(1.0, 1.0, 1.0))
    op = _warp_opcode([[0.92, 0.05, 0.0, 0.0, 0.0, 0.0]], (0.5, 0.5))
    data = dng.write_dng(base, opcode_list_3=op)
    back = dng.read_dng(data)
    assert back.warp_rectilinear is not None
    coefs, center = back.warp_rectilinear
    np.testing.assert_allclose(coefs, [[0.92, 0.05, 0, 0, 0, 0]], atol=1e-7)
    np.testing.assert_allclose(center, [0.5, 0.5], atol=1e-7)

    warped, _ = develop_raw_image(back)
    plain, _ = develop_raw_image(
        dng.read_dng(dng.write_dng(base)))
    assert warped.shape == plain.shape
    # The warp must actually have moved pixels.
    assert np.abs(np.asarray(warped) - np.asarray(plain)).max() > 1e-3


def test_bad_plane_count_is_typed():
    op = _warp_opcode([[1, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0]], (0.5, 0.5))
    with pytest.raises(dng.DngError):
        dng._parse_warp_rectilinear(op)


# ---------------------------------------------------------------------------
# WarpFisheye (OpcodeList3 opcode 2) — the last DNG 1.3 opcode (r5).
# ---------------------------------------------------------------------------


def _fisheye_opcode(coefs, center):
    coefs = np.asarray(coefs, dtype=np.float64)
    body = struct.pack(">I", coefs.shape[0])
    body += coefs.astype(">f8").tobytes()
    body += struct.pack(">2d", center[0], center[1])
    return struct.pack(">I", 1) + struct.pack(
        ">IIII", 2, 0x01030000, 0, len(body)) + body


def test_fisheye_matches_scipy_map_coordinates():
    from scipy.ndimage import map_coordinates

    h, w = 30, 40
    rng = np.random.default_rng(1)
    planes = rng.random((3, h, w)).astype(np.float32)
    k = np.asarray([1.05, 0.08, -0.02, 0.004])
    center = np.asarray([0.48, 0.52])

    out = np.asarray(lenscorr.warp_fisheye(
        jnp.asarray(planes), jnp.asarray([k], dtype=jnp.float32),
        jnp.asarray(center, dtype=jnp.float32)))

    cx, cy = center[0] * (w - 1), center[1] * (h - 1)
    mmax = np.hypot(max(cx, w - 1 - cx), max(cy, h - 1 - cy))
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    dx, dy = (xs - cx) / mmax, (ys - cy) / mmax
    r = np.hypot(dx, dy)
    t = np.arctan(r)
    t2 = t * t
    poly = k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3]))
    ratio = np.where(r > 1e-12, t * poly / np.maximum(r, 1e-12), poly)
    sx = np.clip(dx * ratio * mmax + cx, 0, w - 1)
    sy = np.clip(dy * ratio * mmax + cy, 0, h - 1)
    for p in range(3):
        want = map_coordinates(planes[p].astype(np.float64), [sy, sx],
                               order=1, mode="nearest")
        np.testing.assert_allclose(out[p], want, atol=2e-5)


def test_fisheye_center_is_finite_and_smooth():
    """The r -> 0 limit (ratio -> kr0) must not NaN the optical center."""
    planes = _grad_planes(21, 21)
    out = np.asarray(lenscorr.warp_fisheye(
        jnp.asarray(planes),
        jnp.asarray([[1.0, 0.1, 0.0, 0.0]], dtype=jnp.float32),
        jnp.asarray([0.5, 0.5])))
    assert np.isfinite(out).all()
    # Exact center pixel samples itself (ratio finite, dx=dy=0).
    np.testing.assert_allclose(out[:, 10, 10], planes[:, 10, 10], atol=1e-6)


def test_end_to_end_dng_with_fisheye():
    from rawphotoforge_tpu.io.raw import develop_raw_image, synthetic_raw

    rgb = np.clip(_grad_planes(32, 48), 0, 1)
    base = synthetic_raw(rgb, wb_gains=(1.0, 1.0, 1.0))
    op = _fisheye_opcode([[0.9, 0.05, 0.0, 0.0]], (0.5, 0.5))
    data = dng.write_dng(base, opcode_list_3=op)
    back = dng.read_dng(data)
    assert back.warp_fisheye is not None and back.warp_rectilinear is None
    coefs, center = back.warp_fisheye
    np.testing.assert_allclose(coefs, [[0.9, 0.05, 0, 0]], atol=1e-7)
    np.testing.assert_allclose(center, [0.5, 0.5], atol=1e-7)

    warped, _ = develop_raw_image(back)
    plain, _ = develop_raw_image(dng.read_dng(dng.write_dng(base)))
    assert warped.shape == plain.shape
    assert np.abs(np.asarray(warped) - np.asarray(plain)).max() > 1e-3


def test_fisheye_padded_develop_matches_unpadded():
    """Bucket-stable develop (extent-traced coordinates) stays
    bit-identical to the unpadded path for fisheye files, like the other
    opcode-carrying DNGs."""
    from rawphotoforge_tpu.io.raw import (bucket_stable_eligible,
                                          develop_raw_image,
                                          develop_raw_image_padded,
                                          synthetic_raw)

    rng = np.random.default_rng(2)
    rgb = np.clip(rng.random((3, 40, 56)).astype(np.float32), 0, 1)
    base = synthetic_raw(rgb, wb_gains=(1.0, 1.0, 1.0))
    op = _fisheye_opcode([[0.93, 0.06, -0.01, 0.0]], (0.45, 0.55))
    back = dng.read_dng(dng.write_dng(base, opcode_list_3=op))
    assert bucket_stable_eligible(back)
    want, _ = develop_raw_image(back)
    got = develop_raw_image_padded(back)
    np.testing.assert_array_equal(
        np.asarray(got)[:, : want.shape[1], : want.shape[2]],
        np.asarray(want))


def test_fisheye_bad_plane_count_is_typed():
    op = _fisheye_opcode([[1, 0, 0, 0], [1, 0, 0, 0]], (0.5, 0.5))
    with pytest.raises(dng.DngError):
        dng.read_dng(dng.write_dng(
            __import__("rawphotoforge_tpu.io.raw", fromlist=["synthetic_raw"]
                       ).synthetic_raw(np.full((3, 16, 32), 0.5, np.float32)),
            opcode_list_3=op))
