"""Native C++ runtime (librpf_native.so) vs the Python/numpy references."""

import numpy as np
import pytest

from rawphotoforge_tpu import native
from rawphotoforge_tpu.core import curve as cv

import oracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_pchip_lut_bit_identical():
    cases = [
        ([0, 65535], [0, 65535]),
        ([0, 65535], [32767, 32767]),
        ([0, 20000, 45000, 65535], [0, 30000, 40000, 65535]),
        ([0, 30000, 65535], [10000, 50000, 20000]),
        ([5000, 60000], [10000, 62000]),
        ([0, 8000, 12000, 65535], [0, 2000, 60000, 65535]),
    ]
    for xs, ys in cases:
        xs = np.asarray(xs, dtype=np.int32)
        ys = np.asarray(ys, dtype=np.int32)
        a = native.pchip_build_lut(xs, ys)
        # Force the pure-numpy path for the comparison.
        xe = np.arange(cv.CURVE_RESOLUTION, dtype=np.float32)
        b = np.clip(np.trunc(cv.pchip_eval_f32(xs, ys, xe)), 0, 65535).astype(np.int32)
        np.testing.assert_array_equal(a, b)


def test_pchip_lut_error():
    with pytest.raises(cv.CurveError):
        native.pchip_build_lut(
            np.array([0, 0, 10], dtype=np.int32), np.array([0, 1, 2], dtype=np.int32)
        )


def test_resize_matches_reference_loop(rng):
    src = rng.random((10, 20, 3)).astype(np.float32)
    out = native.resize_bilinear(src, 4, 7)
    # Same oracle loop as test_io.test_resize_matches_reference_semantics.
    expected = np.zeros((4, 7, 3), dtype=np.float32)
    sy_scale, sx_scale = 10 / 4, 20 / 7
    for y in range(4):
        sy = (y + 0.5) * sy_scale - 0.5
        y0 = max(int(np.floor(sy)), 0)
        y1 = min(y0 + 1, 9)
        ty = sy - y0
        for x in range(7):
            sx = (x + 0.5) * sx_scale - 0.5
            x0 = max(int(np.floor(sx)), 0)
            x1 = min(x0 + 1, 19)
            tx = sx - x0
            expected[y, x] = (
                (src[y0, x0] * (1 - tx) + src[y0, x1] * tx) * (1 - ty)
                + (src[y1, x0] * (1 - tx) + src[y1, x1] * tx) * ty
            )
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_srgb_conversions(rng):
    u8 = np.arange(256, dtype=np.uint8)
    lin = native.srgb_u8_to_linear(u8)
    np.testing.assert_allclose(
        lin, oracle.srgb_to_linear(u8.astype(np.float32) / 255.0), atol=1e-6
    )
    back = native.linear_to_srgb_u8(lin)
    # Truncating encode (reference image.rs:375-383): f32 OETF(EOTF(c)) can
    # land an ulp below the exact code value, so roundtrip is within 1.
    assert np.abs(back.astype(int) - u8.astype(int)).max() <= 1
    # Clamping
    np.testing.assert_array_equal(
        native.linear_to_srgb_u8(np.array([-0.5, 2.0], dtype=np.float32)), [0, 255]
    )


def test_histogram_matches_numpy(rng):
    hwc = rng.random((37, 53, 3)).astype(np.float32)
    out = native.histogram_rgbl(hwc)
    assert out.shape == (4, 256)
    np.testing.assert_array_equal(out.sum(axis=1), [37 * 53] * 4)
    for c in range(3):
        idx = np.clip((hwc[..., c] * 255).astype(np.int32), 0, 255)
        np.testing.assert_array_equal(out[c], np.bincount(idx.ravel(), minlength=256))


def test_binarize_mask(rng):
    v = rng.standard_normal(1000).astype(np.float32)
    out = native.binarize_mask(v, 0.3)
    np.testing.assert_array_equal(out, (v >= 0.3).astype(np.float32))


def test_build_lut_uses_native_and_matches():
    """core.curve.build_lut routes through the native lib when available and
    stays bit-identical to the numpy path."""
    xs = np.array([0, 16000, 40000, 65535], dtype=np.int32)
    ys = np.array([1000, 20000, 46000, 65535], dtype=np.int32)
    via_build = cv.build_lut(xs, ys)
    xe = np.arange(cv.CURVE_RESOLUTION, dtype=np.float32)
    pure = np.clip(np.trunc(cv.pchip_eval_f32(xs, ys, xe)), 0, 65535).astype(np.int32)
    np.testing.assert_array_equal(via_build, pure)


def test_native_decode_scan_rejects_out_of_range_mcus():
    """The MCU window is the decoder's only write-bounds parameter; an
    out-of-range value must be rejected in C++ (heap-overflow class),
    not just by the Python framing layer (review finding)."""
    import numpy as np

    from rawphotoforge_tpu import native
    from rawphotoforge_tpu.io import ljpeg

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    samples = rng.integers(0, 4096, size=(8, 8, 1)).astype(np.uint16)
    frame = ljpeg.parse(ljpeg.encode(samples, precision=12))
    out = np.zeros((frame.rows, frame.width), dtype=np.uint16)
    with pytest.raises(ljpeg.LJpegError):
        native.ljpeg_decode_scan(frame.scan, out, frame, 0,
                                 frame.rows * frame.mcus_per_row + 1)
    with pytest.raises(ljpeg.LJpegError):
        native.ljpeg_decode_scan(frame.scan, out, frame, -1, 4)


def test_native_jpeg_rejects_oversize_dimensions():
    """SOF0 dimension fields are 16-bit; >65535 must error, not silently
    truncate (review finding)."""
    import numpy as np

    from rawphotoforge_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    y = np.zeros((1, 8), dtype=np.uint8)
    cb = cr = np.zeros((1, 4), dtype=np.uint8)
    lib = native._load()
    import ctypes

    out = np.empty(1 << 16, dtype=np.uint8)
    out_len = ctypes.c_int64(0)
    rc = lib.rpf_jpeg_encode_ycc420(y, cb, cr, 70000, 8, 92, out,
                                    out.size, ctypes.byref(out_len))
    assert rc != 0
