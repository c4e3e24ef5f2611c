"""JPEG export fast path: device-side YCbCr 4:2:0 + native encoder.

The general export path (io/image_io.encode_image) fetches u8 RGB and
encodes with Pillow — 3 bytes/pixel over the device->host link. This
module moves the JFIF color conversion and chroma subsampling onto the
device, so the link carries 1.5 bytes/pixel (Y full-res + Cb/Cr quarter
res), then entropy-encodes in C++ (native/rpf_native.cpp
rpf_jpeg_encode_ycc420). On the tunneled TPU backend that halves export
fetch time; on any backend it removes Pillow from the batch-export hot
loop. Reference counterpart: image.rs:482-511 (u8 quantize + `image`
crate encode).

Output is standard baseline JFIF (SOF0, 4:2:0, Annex K tables) —
decodable everywhere; quality semantics follow the common libjpeg
quantization scaling.
"""

from __future__ import annotations

import functools

import numpy as np

# BT.601 full-range RGB -> YCbCr (the JFIF convention).
_YCC = np.array([
    [0.299, 0.587, 0.114],
    [-0.168736, -0.331264, 0.5],
    [0.5, -0.418688, -0.081312],
], dtype=np.float32)


@functools.cache
def _to_ycc420_jit():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(planes):
        rgb = jnp.clip(planes, 0.0, 1.0) * 255.0
        r, g, b = rgb[0], rgb[1], rgb[2]
        m = _YCC
        y = m[0, 0] * r + m[0, 1] * g + m[0, 2] * b
        cb = 128.0 + m[1, 0] * r + m[1, 1] * g + m[1, 2] * b
        cr = 128.0 + m[2, 0] * r + m[2, 1] * g + m[2, 2] * b
        h, w = y.shape
        # Pad to even dims (edge replicate) for the 2x2 chroma average.
        cbp = jnp.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
        crp = jnp.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
        ph, pw = cbp.shape
        cb2 = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr2 = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

        def u8(x):
            return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)

        return u8(y), u8(cb2), u8(cr2)

    return f


def _to_ycc420_np(planes: np.ndarray):
    rgb = np.clip(np.asarray(planes, dtype=np.float32), 0.0, 1.0) * 255.0
    ycc = np.einsum("ij,jhw->ihw", _YCC, rgb)
    y, cb, cr = ycc[0], 128.0 + ycc[1], 128.0 + ycc[2]
    h, w = y.shape
    cbp = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
    crp = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
    ph, pw = cbp.shape
    cb2 = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr2 = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    def u8(x):
        return np.clip(np.round(x), 0.0, 255.0).astype(np.uint8)

    return u8(y), u8(cb2), u8(cr2)


def available() -> bool:
    from .. import native

    return native.available()


def _splice_app1(jpeg: bytes, exif_bytes: bytes) -> bytes:
    """Insert an EXIF APP1 segment right after SOI (ITU-T.81 B.2.4.4 /
    JEITA CP-3451 layout: the EXIF APP1 precedes other marker segments)."""
    if not jpeg.startswith(b"\xff\xd8"):
        return jpeg
    from .image_io import normalize_exif_blob

    # Same orientation reset encode_image applies: pixels are already
    # upright, so a stored Orientation!=1 would double-rotate in viewers.
    payload = normalize_exif_blob(exif_bytes)
    if not payload.startswith(b"Exif\x00\x00"):
        payload = b"Exif\x00\x00" + payload
    if len(payload) + 2 > 0xFFFF:  # segment length field is 16-bit
        return jpeg
    import struct

    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]


def encode_jpeg(planes, quality: int = 92, exif_bytes: bytes | None = None) -> bytes:
    """sRGB-encoded f32 [3,H,W] in [0,1] -> baseline JFIF bytes.

    Device inputs convert + subsample on device and fetch 1.5
    bytes/pixel; np inputs use the same math on the host. Falls back to
    the Pillow path when the native library is unavailable. An
    ``exif_bytes`` payload (raw blob or io/image_io.build_exif_bytes
    output) is spliced in as the APP1 segment.
    """
    from .. import native
    from ..utils.transfer import _is_device_array, fetch_np

    if not native.available():
        from .image_io import encode_image

        return encode_image(planes, "JPEG", quality=quality,
                            exif_bytes=exif_bytes)
    if _is_device_array(planes):
        y, cb, cr = _to_ycc420_jit()(planes)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(2) as pool:
            fcb = pool.submit(fetch_np, cb)
            fcr = pool.submit(fetch_np, cr)
            y = fetch_np(y)
            cb, cr = fcb.result(), fcr.result()
    else:
        y, cb, cr = _to_ycc420_np(planes)
    body = native.jpeg_encode_ycc420(y, cb, cr, quality=quality)
    if exif_bytes:
        body = _splice_app1(body, exif_bytes)
    return body
