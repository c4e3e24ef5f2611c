"""Native baseline-JPEG encoder (io/jpegenc.py + rpf_jpeg_encode_ycc420).

The stream must be decodable by Pillow (an independent decoder), and the
decoded pixels must track the source within normal lossy-JPEG error —
compared directly against Pillow's own encoder at the same quality so the
bound is relative, not hand-picked.
"""

import io

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image as PILImage

from rawphotoforge_tpu import native
from rawphotoforge_tpu.io import jpegenc

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _planes(h, w, kind="gradient", seed=0):
    if kind == "gradient":
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        return np.stack([yy / h, xx / w, (yy + xx) / (h + w)])
    rng = np.random.default_rng(seed)
    return rng.random((3, h, w)).astype(np.float32)


def _decode(data):
    return np.array(PILImage.open(io.BytesIO(data)).convert("RGB"))


def _pil_bytes(planes, quality):
    u8 = (np.clip(planes, 0, 1) * 255.0).astype(np.uint8).transpose(1, 2, 0)
    buf = io.BytesIO()
    PILImage.fromarray(u8).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


@pytest.mark.parametrize("h,w", [(64, 96), (33, 47), (16, 16), (15, 17)])
def test_stream_decodes_and_tracks_source(h, w):
    planes = _planes(h, w)
    src_u8 = (np.clip(planes, 0, 1) * 255.0).astype(np.uint8)
    data = jpegenc.encode_jpeg(planes, quality=92)
    dec = _decode(data)
    assert dec.shape == (h, w, 3)
    ours = _psnr(dec.transpose(2, 0, 1), src_u8)
    pil = _psnr(_decode(_pil_bytes(planes, 92)).transpose(2, 0, 1), src_u8)
    # Within 3 dB of Pillow's encoder at the same quality setting.
    assert ours > pil - 3.0, (ours, pil)
    assert ours > 30.0, ours


def test_noise_image_survives():
    planes = _planes(48, 64, kind="noise")
    src_u8 = (np.clip(planes, 0, 1) * 255.0).astype(np.uint8)
    data = jpegenc.encode_jpeg(planes, quality=92)
    dec = _decode(data).transpose(2, 0, 1)
    pil = _psnr(_decode(_pil_bytes(planes, 92)).transpose(2, 0, 1), src_u8)
    assert _psnr(dec, src_u8) > pil - 3.0


def test_quality_scales_size_and_fidelity():
    planes = _planes(64, 64, kind="noise", seed=3)
    src_u8 = (np.clip(planes, 0, 1) * 255.0).astype(np.uint8)
    lo = jpegenc.encode_jpeg(planes, quality=40)
    hi = jpegenc.encode_jpeg(planes, quality=95)
    assert len(hi) > len(lo)
    assert _psnr(_decode(hi).transpose(2, 0, 1), src_u8) > \
        _psnr(_decode(lo).transpose(2, 0, 1), src_u8)


def test_device_and_host_paths_agree():
    planes = _planes(40, 56)
    b_host = jpegenc.encode_jpeg(planes, quality=90)
    b_dev = jpegenc.encode_jpeg(jnp.asarray(planes), quality=90)
    # Device rounding of the YCC planes can differ by the odd ulp; the
    # decoded images must agree essentially exactly.
    d_host = _decode(b_host).astype(np.int16)
    d_dev = _decode(b_dev).astype(np.int16)
    assert np.abs(d_host - d_dev).max() <= 2


def test_flat_color_is_near_exact():
    planes = np.full((3, 32, 32), 0.42, dtype=np.float32)
    data = jpegenc.encode_jpeg(planes, quality=92)
    dec = _decode(data)
    src = np.full((32, 32, 3), round(0.42 * 255), dtype=np.uint8)
    assert np.abs(dec.astype(int) - src.astype(int)).max() <= 2


def test_high_entropy_q100_grows_buffer():
    """Noise at quality 100 exceeds 2 B/px; the wrapper must grow the
    output buffer instead of raising (review finding)."""
    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, size=(512, 512), dtype=np.uint8)
    cb = rng.integers(0, 256, size=(256, 256), dtype=np.uint8)
    cr = rng.integers(0, 256, size=(256, 256), dtype=np.uint8)
    data = native.jpeg_encode_ycc420(y, cb, cr, quality=100)
    assert len(data) > 512 * 512 * 1.5  # genuinely high-entropy stream
    dec = PILImage.open(io.BytesIO(data))
    assert dec.size == (512, 512)
