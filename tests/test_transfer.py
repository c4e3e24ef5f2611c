"""Banded device->host transfer (utils/transfer.py).

Correctness gates for the parallel-fetch path used by every export: band
reassembly must be exact for any shape/dtype/band count, and the
device-side u8 quantization must bit-match the host quantization that
reproduces the reference's truncating readback (image.rs:375-383).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rawphotoforge_tpu.utils import transfer


@pytest.mark.parametrize("shape,dtype", [
    ((3, 37, 53), np.float32),
    ((4, 3, 16, 24), np.uint8),
    ((1001,), np.float32),
    ((2, 2), np.int32),
])
@pytest.mark.parametrize("bands", [2, 3, 8, 64])
def test_fetch_np_matches_asarray(shape, dtype, bands):
    rng = np.random.default_rng(7)
    host = (rng.random(shape) * 200).astype(dtype)
    dev = jnp.asarray(host)
    got = transfer.fetch_np(dev, bands=bands)
    np.testing.assert_array_equal(got, host)
    assert got.dtype == host.dtype and got.shape == host.shape


def test_fetch_np_numpy_passthrough():
    host = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_array_equal(transfer.fetch_np(host), host)


@pytest.mark.parametrize("shape,dtype", [
    ((3, 37, 53), np.float32),
    ((257, 31), np.uint16),
    ((1001,), np.uint8),
])
@pytest.mark.parametrize("bands", [2, 3, 8])
def test_put_np_matches_asarray(shape, dtype, bands):
    rng = np.random.default_rng(5)
    host = (rng.random(shape) * 200).astype(dtype)
    dev = transfer.put_np(host, bands=bands)
    np.testing.assert_array_equal(np.asarray(dev), host)
    assert dev.shape == host.shape and np.dtype(dev.dtype) == host.dtype


def test_put_np_small_and_noncontiguous_fallbacks():
    # Below the parallel threshold: plain asarray path.
    host = np.arange(24, dtype=np.uint16).reshape(4, 6)
    np.testing.assert_array_equal(np.asarray(transfer.put_np(host)), host)
    # Non-contiguous input (a transpose view) uploads correctly.
    view = np.arange(60, dtype=np.float32).reshape(5, 12).T
    got = transfer.put_np(view, bands=3)
    np.testing.assert_array_equal(np.asarray(got), view)
    # Device arrays pass straight through.
    dev = jnp.asarray(host)
    assert transfer.put_np(dev) is dev


def test_fetch_u8_hwc_device_matches_host():
    rng = np.random.default_rng(11)
    planes = rng.normal(0.5, 0.6, size=(3, 41, 29)).astype(np.float32)
    # Exact boundary values exercise the clip + truncating-cast semantics.
    planes[0, 0, :5] = [0.0, 1.0, -0.25, 1.25, 0.999999]
    want = transfer.fetch_u8_hwc(planes)              # host np path
    got = transfer.fetch_u8_hwc(jnp.asarray(planes))  # device path
    assert want.shape == (41, 29, 3) and want.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_encode_image_device_equals_host_bytes():
    from rawphotoforge_tpu.io import image_io

    rng = np.random.default_rng(3)
    planes = rng.random((3, 33, 47)).astype(np.float32)
    for fmt in ("PNG", "PPM16"):
        b_host = image_io.encode_image(planes, fmt, quality=92)
        b_dev = image_io.encode_image(jnp.asarray(planes), fmt, quality=92)
        assert b_host == b_dev, fmt
    # JPEG: the device path routes through the sparse-coefficient
    # encoder (different DCT rounding than Pillow's) — decoded pixels,
    # not bytes, must agree.
    import io as _io

    from PIL import Image as PILImage

    b_host = image_io.encode_image(planes, "JPEG", quality=92)
    b_dev = image_io.encode_image(jnp.asarray(planes), "JPEG", quality=92)
    d_host = np.array(PILImage.open(_io.BytesIO(b_host)).convert("RGB"))
    d_dev = np.array(PILImage.open(_io.BytesIO(b_dev)).convert("RGB"))
    assert d_dev.shape == (33, 47, 3)
    assert np.abs(d_host.astype(int) - d_dev.astype(int)).mean() < 3.0


def test_fetch_np_prefix_band_boundaries():
    """Prefix fetch assembles fixed-boundary bands and trims to n."""
    n_total = 5_000_000  # ~10 MB i16: spans two 8 MB-default bands at i16
    host = np.arange(n_total, dtype=np.int16)
    dev = jnp.asarray(host)
    small_band = 1 << 20  # force multiple bands without a huge array
    for n in (0, 1, 1000, small_band // 2 - 1, small_band // 2,
              small_band, small_band + 7, n_total, n_total + 99):
        got = transfer.fetch_np_prefix(dev, n, band_bytes=small_band)
        np.testing.assert_array_equal(got, host[: min(n, n_total)])
    # np input path
    np.testing.assert_array_equal(
        transfer.fetch_np_prefix(host, 17), host[:17])
    # 2-D device input is viewed flat
    dev2 = jnp.asarray(host[:64].reshape(8, 8))
    np.testing.assert_array_equal(
        transfer.fetch_np_prefix(dev2, 10), host[:10])
    # empty device array with n > 0 (review finding: n must clamp to
    # size BEFORE the early-out, or the band math divides by zero)
    empty = transfer.fetch_np_prefix(jnp.zeros((0,), jnp.int16), 5)
    assert empty.shape == (0,) and empty.dtype == np.int16


def test_fetch_np_prefix_geometric_lead_bands():
    """Tiny prefixes must move ~KBs, not a full 8 MB band (review
    finding: the escape stream is often a few hundred entries on a 75 MB
    capacity buffer), and prefix_fetch_elems must report the actual
    band-rounded transfer for bench accounting."""
    size = 40 << 20  # 40M i16 elements = 80 MB capacity
    itemsize = 2
    band = transfer._BAND_BYTES
    # 100 elements round to the 64 KB lead band, not 8 MB.
    assert transfer.prefix_fetch_elems(100, size, itemsize) \
        == (64 << 10) // itemsize
    # Just past a ladder step takes the next step.
    assert transfer.prefix_fetch_elems((64 << 10) // itemsize + 1,
                                       size, itemsize) \
        == (256 << 10) // itemsize
    # Large prefixes round to full-band multiples, as before.
    n_big = (band // itemsize) * 2 + 5
    assert transfer.prefix_fetch_elems(n_big, size, itemsize) \
        == (band // itemsize) * 3
    # Never exceeds the array, and degenerate inputs stay degenerate.
    assert transfer.prefix_fetch_elems(10**9, size, itemsize) == size
    assert transfer.prefix_fetch_elems(0, size, itemsize) == 0
    assert transfer.prefix_fetch_elems(5, 3, itemsize) == 3
    # The schedule is n-independent: every boundary set for smaller n is
    # a prefix of the set for larger n (fixed device slice programs).
    full = transfer._prefix_bounds(size, size, itemsize, band)
    for n in (1, 1000, 10**6, 10**7, size):
        b = transfer._prefix_bounds(n, size, itemsize, band)
        assert b == full[: len(b)]


def test_banded_bounds_and_fetch_banded():
    """Pre-split band buffers reassemble exactly; prefix fetch trims to
    n and transfers only the bands the prefix touches."""
    size = 3_000_000  # 6 MB i16: lead ladder + one 4 MB band region
    host = np.arange(size, dtype=np.int16)
    bounds = transfer.banded_bounds(size, 2)
    assert bounds[0] == 0 and bounds[-1] == size
    assert bounds == sorted(set(bounds))
    dev = jnp.asarray(host)
    bands = tuple(dev[a:b] for a, b in zip(bounds, bounds[1:]))
    for n in (0, 1, 1000, bounds[1], bounds[1] + 1, size - 1, size,
              size + 99):
        got = transfer.fetch_banded(bands, bounds, n)
        np.testing.assert_array_equal(got, host[: min(n, size)])
        assert got.dtype == np.int16
    # start_banded is a fire-and-forget hint; it must accept any n.
    transfer.start_banded(bands, bounds, 17)
    transfer.start_banded(bands, bounds, 0)
    transfer.start_banded(bands, bounds, size + 5)
    # accounting mirrors what fetch_banded moves
    assert transfer.banded_fetch_elems(0, bounds) == 0
    assert transfer.banded_fetch_elems(1, bounds) == bounds[1]
    assert transfer.banded_fetch_elems(size, bounds) == size
    assert transfer.banded_fetch_elems(size + 9, bounds) == size
    # band/bounds mismatch is a hard error, not a silent misread
    with pytest.raises(ValueError):
        transfer.fetch_banded(bands[:-1], bounds, 10)


def test_banded_bounds_degenerate():
    assert transfer.banded_bounds(0, 2) == [0]
    b = transfer.banded_bounds(5, 4)
    assert b[0] == 0 and b[-1] == 5
