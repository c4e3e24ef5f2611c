"""Image file I/O: decode to linear-light planar float32, encode from sRGB.

Reference contract (rust/photo-editor/src/image.rs):
* read_image (:386-480) — decode JPEG/PNG/WebP/TIFF, apply EXIF orientation,
  convert sRGB-encoded formats to *linear* sRGB (TIFF is passed through
  untouched, image.rs:430-440), produce float32 RGB.
* write_image (:482-511) — clamp to [0,1], truncate to u8
  (`(v.clamp(0,1)*255) as u8`, image.rs:375-383), encode with the container
  codec.
* 16-bit P6 PPM (max=65535, big-endian) treated as already-linear data
  (web-ts/core/image.ts:146-195).

Decode runs on CPU (PIL for the containers); the sRGB->linear EOTF and the
planar transpose run on whatever backend jnp targets, so for big images the
linearization happens on the TPU, not the host.
"""

from __future__ import annotations

import functools as _functools
import io as _io
import os

import numpy as np
import jax.numpy as jnp

from PIL import Image as PILImage, ImageOps

from ..core.color import srgb_to_linear, linear_to_srgb

SUPPORTED_EXTENSIONS = {
    ".jpg": "JPEG", ".jpeg": "JPEG", ".png": "PNG",
    ".webp": "WEBP", ".tif": "TIFF", ".tiff": "TIFF",
    ".ppm": "PPM16", ".dng": "DNG",
}


from .._errbase import PhotoEditorError


class ImageIOError(PhotoEditorError, ValueError):
    """Unsupported or undecodable image data (errors.rs taxonomy)."""


def format_for_path(path: str) -> str:
    ext = os.path.splitext(path)[1].lower()
    if ext not in SUPPORTED_EXTENSIONS:
        from .raw import RAW_EXTENSIONS

        if ext in RAW_EXTENSIONS:
            # TIFF-structured vendor RAWs route through the DNG/TIFF
            # walker; unsupported compressions raise a typed DngError.
            return "DNG"
        raise ImageIOError(f"unsupported image format: {ext!r}")
    return SUPPORTED_EXTENSIONS[ext]


def format_for_bytes(data: bytes) -> str:
    """Best-effort format from container MAGIC, for uploads that carry no
    filename (`POST /open` without ?name=). TIFF-structured and vendor
    RAW containers route to the raw walker ("DNG" — the same route their
    extensions take); 16-bit PPM by its P6 header; everything else falls
    back to "JPEG", whose decode path (PIL) identifies common bitmaps by
    magic itself. A plain (non-RAW) TIFF bitmap without a filename lands
    on the raw walker and fails with a typed error naming the problem —
    pass ?name= to route it to the bitmap decoder."""
    head = data[:16]
    if (head[:4] in (b"II*\x00", b"MM\x00*", b"IIU\x00")
            or head[:8] == b"FUJIFILM"          # RAF
            or head[4:8] == b"ftyp"             # Canon CR3 (ISO-BMFF)
            or head[:4] == b"FOVb"):            # Sigma X3F
        return "DNG"
    if head[:2] == b"P6":
        # Route to the strict 16-bit parser only when the header's
        # maxval token says 65535 — 8-bit P6 bodies keep going to the
        # PIL path that decoded them before this sniff existed.
        # Tokenizer matching _parse_ppm16's semantics exactly: '#'
        # TERMINATES the current token (like any whitespace) and runs to
        # end of line. 4096-byte window: enough for any realistic
        # comment block before the maxval token.
        toks: list[bytes] = []
        i, n, cur = 2, min(len(data), 4096), b""
        while i < n and len(toks) < 3:
            ch = data[i:i + 1]
            if ch == b"#":
                if cur:
                    toks.append(cur)
                    cur = b""
                while i < n and data[i:i + 1] not in (b"\n", b"\r"):
                    i += 1
            elif ch.isspace():
                if cur:
                    toks.append(cur)
                    cur = b""
            else:
                cur += ch
            i += 1
        if cur and len(toks) < 3:
            toks.append(cur)
        if len(toks) == 3 and toks[2] == b"65535":
            return "PPM16"
    return "JPEG"


def _parse_ppm16(data: bytes) -> np.ndarray:
    """16-bit big-endian P6 PPM -> u16 HWC samples (image.ts:146-195)."""
    # Header: magic, dims, maxval — tokens separated by ANY whitespace
    # (netpbm allows "P6 W H 65535 <data>" on one line, not just
    # newline-terminated lines), '#' comments run to end of line, and
    # exactly ONE whitespace byte after maxval precedes the pixel data.
    try:
        pos = 0
        n = len(data)
        fields = []
        while len(fields) < 4:
            while pos < n and data[pos:pos + 1].isspace():
                pos += 1
            if pos < n and data[pos:pos + 1] == b"#":
                pos = data.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < n and not data[pos:pos + 1].isspace() \
                    and data[pos:pos + 1] != b"#":
                pos += 1
            if pos == start:
                raise ImageIOError("truncated PPM header")
            fields.append(data[start:pos])
        pos += 1  # the single whitespace byte terminating maxval
        magic = fields[0]
        w, h, maxval = int(fields[1]), int(fields[2]), int(fields[3])
        if magic != b"P6":
            raise ImageIOError("PPM must be binary P6")
        if maxval != 65535:
            raise ImageIOError("only 16-bit PPM (max=65535) is supported")
        if not (0 < w <= 65535 and 0 < h <= 65535):
            raise ImageIOError(f"bad PPM dimensions {w}x{h}")
        raw = np.frombuffer(data, dtype=">u2", count=w * h * 3, offset=pos)
        return raw.reshape(h, w, 3).astype(np.uint16)
    except ImageIOError:
        raise
    except (ValueError, IndexError, OverflowError) as e:
        # Truncated/garbled header or short pixel data — keep the typed
        # error contract (callers branch on PhotoEditorError).
        raise ImageIOError(f"malformed PPM: {e}") from e


def decode_ppm16(data: bytes) -> np.ndarray:
    """16-bit P6 PPM -> float32 HWC in [0,1]."""
    return _parse_ppm16(data).astype(np.float32) / 65535.0


def encode_ppm16(hwc: np.ndarray) -> bytes:
    """float32 HWC [0,1] -> 16-bit big-endian P6 PPM bytes."""
    h, w = hwc.shape[:2]
    u16 = (np.clip(hwc, 0.0, 1.0) * 65535.0).astype(">u2")
    return b"P6\n%d %d\n65535\n" % (w, h) + u16.tobytes()


def _png_unfilter_py(rows: np.ndarray, filters: np.ndarray,
                     bpp: int) -> np.ndarray:
    """Numpy mirror of native.png_unfilter (PNG spec 4.5.4): the tested
    oracle and the fallback when the native library is unavailable.
    Filters 0/2 vectorize; 1 (Sub) is a per-lane cumulative sum; 3/4
    (Average/Paeth) are inherently sequential in x — Python loops,
    correct but slow (the native path carries real decodes)."""
    h, stride = rows.shape
    out = rows.astype(np.int32)
    for y in range(h):
        f = int(filters[y])
        row = out[y]
        up = out[y - 1] if y > 0 else np.zeros(stride, np.int32)
        if f == 0:
            pass
        elif f == 1:
            lanes = row[: stride - stride % bpp].reshape(-1, bpp)
            np.cumsum(lanes, axis=0, out=lanes)
        elif f == 2:
            row += up
        elif f == 3:
            for x in range(stride):
                a = row[x - bpp] & 0xFF if x >= bpp else 0
                row[x] += (a + (up[x] & 0xFF)) >> 1
                row[x] &= 0xFF
        elif f == 4:
            for x in range(stride):
                a = row[x - bpp] & 0xFF if x >= bpp else 0
                b = up[x] & 0xFF
                c = up[x - bpp] & 0xFF if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ImageIOError(f"PNG filter type {f}")
        out[y] = row & 0xFF
    return out.astype(np.uint8)


# Adam7 interlace pass origins/strides (PNG spec 8.2): (x0, y0, dx, dy).
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _parse_png48(data: bytes) -> np.ndarray | None:
    """Decode a 16-bit-per-channel PNG at full depth -> u16 HWC RGB.

    Handles depth-16 color types 2 (RGB) and 6 (RGBA — alpha dropped,
    matching the 8-bit path's ``convert("RGB")``), 4 (gray+alpha) and,
    interlaced only, 0 (gray; Pillow already decodes the non-interlaced
    case at full depth as I;16B), each non-interlaced or Adam7. Returns
    None for anything else (those take the Pillow path at full depth);
    raises ImageIOError on a malformed file that claims to be one —
    including any chunk whose stored CRC mismatches: a bit-rotted file
    must fail loudly, never decode silently wrong. Exists because Pillow
    READS 16-bit RGB/RGBA/LA PNGs by truncating to 8 bits — the
    reference's image crate decodes them at full depth (image.rs:386-480),
    and this framework's own PNG16 exports must round-trip losslessly."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n" or len(data) < 33:
        return None
    if data[12:16] != b"IHDR":
        return None
    w, h, depth, ctype, comp, filt, ilace = struct.unpack(
        ">IIBBBBB", data[16:29])
    if depth != 16 or ctype not in (0, 2, 4, 6):
        return None  # Pillow handles these at full depth (or 8-bit native)
    if ctype == 0 and ilace == 0:
        return None  # Pillow: full-depth I;16B
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    bpp = channels * 2
    from .. import native

    def unfilter(buf: bytes, ph: int, pw: int) -> np.ndarray:
        stride = pw * bpp
        grid = np.frombuffer(buf, np.uint8).reshape(ph, 1 + stride)
        filters = np.ascontiguousarray(grid[:, 0])
        rows = np.ascontiguousarray(grid[:, 1:])
        if native.available():
            rows = native.png_unfilter(rows, filters, bpp)
        else:
            rows = _png_unfilter_py(rows, filters, bpp)
        return (np.frombuffer(rows.tobytes(), ">u2")
                .reshape(ph, pw, channels).astype(np.uint16))

    try:
        if comp != 0 or filt != 0:
            raise ValueError(f"compression/filter method {comp}/{filt}")
        if ilace not in (0, 1):
            raise ValueError(f"interlace method {ilace}")
        if not (0 < w <= 1 << 24 and 0 < h <= 1 << 24):
            raise ValueError(f"dimensions {w}x{h}")
        if w * h > (1 << 28):
            raise ValueError(f"unreasonable pixel count {w * h}")
        idat = []
        pos = 8
        while pos + 8 <= len(data):
            (ln,) = struct.unpack_from(">I", data, pos)
            tag = data[pos + 4 : pos + 8]
            if pos + 12 + ln > len(data):
                raise ValueError(f"truncated {tag!r} chunk")
            (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
            if zlib.crc32(data[pos + 4 : pos + 8 + ln]) != crc:
                raise ValueError(f"bad CRC in {tag!r} chunk")
            if tag == b"IDAT":
                idat.append(data[pos + 8 : pos + 8 + ln])
            pos += 12 + ln
            if tag == b"IEND":
                break
        raw = zlib.decompress(b"".join(idat))
        if ilace == 0:
            if len(raw) != h * (1 + w * bpp):
                raise ValueError(
                    f"IDAT inflates to {len(raw)} bytes, "
                    f"want {h * (1 + w * bpp)}")
            out = unfilter(raw, h, w)
        else:
            # Adam7: seven independently-filtered sub-images, scattered
            # back onto the full grid by each pass's origin/stride.
            out = np.zeros((h, w, channels), np.uint16)
            off = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (w - x0 + dx - 1) // dx
                ph = (h - y0 + dy - 1) // dy
                if pw == 0 or ph == 0:
                    continue
                n = ph * (1 + pw * bpp)
                if off + n > len(raw):
                    raise ValueError("truncated interlaced image data")
                out[y0::dy, x0::dx] = unfilter(raw[off:off + n], ph, pw)
                off += n
            if off != len(raw):
                raise ValueError(
                    f"{len(raw) - off} trailing bytes after the last "
                    "interlace pass")
        if ctype == 6:
            out = out[:, :, :3]
        elif ctype == 4:
            out = np.repeat(out[:, :, :1], 3, axis=2)
        elif ctype == 0:
            out = np.repeat(out, 3, axis=2)
        return np.ascontiguousarray(out)
    except (ValueError, zlib.error, struct.error) as e:
        raise ImageIOError(f"malformed 16-bit PNG: {e}") from e


def encode_png16(u16_hwc: np.ndarray,
                 exif_bytes: bytes | None = None) -> bytes:
    """u16 HWC RGB -> 48-bit (16-bit/channel) PNG bytes.

    From-scratch encoder: Pillow cannot WRITE 48-bit RGB PNGs (it only
    models 8-bit RGB rasters), and the depth is the point — the sRGB-
    encoded render carries more than 8 bits of tonal precision, and an
    8-bit export posterizes any later shadow push. Exceeds the
    reference (v1 saves 8-bit JPEG/PNG only, editor.py:307-345).
    Layout per the PNG spec: IHDR depth 16 / color type 2, one zlib
    IDAT of filter-0 rows with big-endian samples, optional eXIf chunk
    (the TIFF-structured payload, APP1 prefix stripped)."""
    import struct
    import zlib

    a = np.ascontiguousarray(u16_hwc)
    if a.ndim != 3 or a.shape[2] != 3 or a.dtype != np.uint16:
        raise ImageIOError(
            f"encode_png16 needs u16 HWC RGB, got {a.dtype} {a.shape}")
    h, w = a.shape[:2]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    # Filter byte 0 before each row (no prediction: the zlib stage
    # already rides the smoothness, and filter-0 keeps the encoder and
    # the test oracle trivially byte-auditable).
    rows = a.astype(">u2").tobytes()
    stride = w * 6
    raw = b"".join(b"\x00" + rows[i * stride:(i + 1) * stride]
                   for i in range(h))
    out = [b"\x89PNG\r\n\x1a\n", chunk(b"IHDR", ihdr)]
    if exif_bytes:
        blob = normalize_exif_blob(exif_bytes)
        if blob.startswith(b"Exif\x00\x00"):
            blob = blob[6:]
        if blob:
            out.append(chunk(b"eXIf", blob))
    out.append(chunk(b"IDAT", zlib.compress(raw, 6)))
    out.append(chunk(b"IEND", b""))
    return b"".join(out)


@_functools.cache
def _normalize_upload(scale: float, linearize: bool):
    """Jitted integer->f32 normalize (+ optional sRGB EOTF) on device."""
    import jax

    @jax.jit
    def f(x):
        y = x.astype(jnp.float32) / jnp.float32(scale)
        return srgb_to_linear(y) if linearize else y

    return f


class HostDecoded:
    """The host half of a decode: everything knowable before any device
    work, plus an ``upload()`` closure that performs the device half
    (transfer + normalize/develop dispatch — the part that pays remote
    compiles). Lets the server answer ``/open`` from host data immediately
    and run ``upload()`` in a background thread (engine.instant design)."""

    __slots__ = ("exif", "instant", "instant_linear", "shape", "upload",
                 "upload_padded")

    def __init__(self, exif, instant, shape, upload, instant_linear=None,
                 upload_padded=None):
        self.exif = exif          # parsed capture metadata (host-side)
        self.instant = instant    # sRGB u8 HWC instant preview, or None
        self.shape = shape        # final true (h, w) of the device planes
        self.upload = upload      # () -> device planes f32 [3, H, W]
        # Small LINEAR planes [3, h, w] f32 matching ``instant`` — the
        # era-render source for engine.hostdev live edits. None when the
        # decode had no cheap linear form (recoverable from ``instant``
        # via engine.instant.linear_from_srgb_u8).
        self.instant_linear = instant_linear
        # Optional bucket-stable variant: () -> device planes f32
        # [3, Hp, Wp] edge-padded HOST-SIDE to the compile-bucket shape of
        # ``shape``, so the transfer/normalize programs key on bucket
        # shapes and PhotoEditor (given true_shape=shape) runs ZERO
        # per-image-extent device programs on the open path.
        self.upload_padded = upload_padded


def decode_image(data: bytes, fmt: str, instant_out: dict | None = None):
    """Decode container bytes -> (planes f32 [3,H,W] linear-light, exif dict).

    Applies EXIF orientation (image.rs:417-426) then linearizes via the sRGB
    EOTF — except TIFF, which is passed through (image.rs:430-440).

    ``instant_out``: optional dict; when given, the host-side instant
    preview (``"srgb_u8_hwc"``, <= ``instant_out.get("long_edge", 1280)``
    px) is stashed from the host data the decode naturally holds — zero
    device work (engine.instant). Best-effort: absent on failure.
    """
    edge = None
    if instant_out is not None:
        edge = int(instant_out.get("long_edge", 1280))
    hd = decode_image_host(data, fmt, instant_long_edge=edge)
    if instant_out is not None and hd.instant is not None:
        instant_out["srgb_u8_hwc"] = hd.instant
    return hd.upload(), hd.exif


def decode_image_host(data: bytes, fmt: str,
                      instant_long_edge: int | None = None) -> HostDecoded:
    """Host phase of decode_image: container parse + instant preview,
    no device work. Every file-content error surfaces HERE (the upload
    closure only moves already-validated arrays)."""
    if fmt == "PPM16":
        u16 = _parse_ppm16(data)
        pv = lin = None
        if instant_long_edge:
            from ..engine import instant

            lin = instant.quick_linear_from_linear_rgb(
                u16.transpose(2, 0, 1).astype(np.float32) / 65535.0,
                instant_long_edge,
            )
            pv = instant._to_u8_hwc(lin)

        def upload_ppm(u16=u16, pad=False):
            # Integer upload + on-device normalize: the host->device link
            # carries 2 bytes/sample instead of 4 (same f32 math), in
            # parallel bands (utils/transfer.put_np). pad=True edge-pads
            # host-side so the programs key on bucket shapes.
            from ..engine.editor import pad_to_bucket_np
            from ..utils.transfer import put_np

            chw = np.ascontiguousarray(u16.transpose(2, 0, 1))
            if pad:
                chw = pad_to_bucket_np(chw)
            return _normalize_upload(65535.0, False)(put_np(chw))

        return HostDecoded({}, pv, u16.shape[:2], upload_ppm,
                           instant_linear=lin,
                           upload_padded=lambda: upload_ppm(pad=True))

    if fmt == "DNG":
        from .raw import decode_raw_host  # local import to avoid cycle

        return decode_raw_host(data, instant_long_edge=instant_long_edge)

    try:
        img = PILImage.open(_io.BytesIO(data))

        from .exif import parse_exif  # local import to avoid cycle

        exif = parse_exif(img)
        raw_exif = img.info.get("exif")
        if raw_exif:
            # Raw blob for metadata write-back into exports (exiftool-style,
            # python-legacy editor.py:345-350); editors pop this key.
            exif["_exif_bytes"] = raw_exif
        png48 = _parse_png48(data) if fmt == "PNG" else None
        if png48 is not None:
            # 48-bit RGB PNG: Pillow's raster is truncated to 8 bits,
            # so pixels come from the full-depth parser; PIL still
            # supplies the metadata above. Orientation (PNG eXIf) is
            # applied to the u16 array directly.
            try:
                o = int(img.getexif().get(0x0112, 1) or 1)
            except Exception:  # noqa: BLE001 — orientation is best-effort
                o = 1
            if 2 <= o <= 8:
                from ..engine.instant import _orient_np

                png48 = np.ascontiguousarray(
                    _orient_np(png48.transpose(2, 0, 1), o)
                    .transpose(1, 2, 0))
            arr, scale = png48, 65535.0
        else:
            img = ImageOps.exif_transpose(img)

        # Upload the decoder's native integer width and normalize on
        # device: a 24MP JPEG moves 72 MB over the host->device link
        # instead of 288 MB (the /scale division is the identical f32 op
        # on either side).
        if png48 is not None:
            pass
        elif img.mode in ("I;16", "I;16B", "I;16L"):
            arr, scale = np.asarray(img, dtype=np.uint16), 65535.0
        elif img.mode == "I":
            # 32-bit integer mode: values may exceed 65535, so a u16 cast
            # would wrap — keep the float path (scaled like 16-bit modes).
            arr, scale = np.asarray(img, dtype=np.float32) / 65535.0, None
        elif img.mode == "F":
            arr, scale = np.asarray(img, dtype=np.float32), None
        else:
            if img.mode not in ("RGB", "L"):
                img = img.convert("RGB")
            arr, scale = np.asarray(img, dtype=np.uint8), 255.0
    except (PhotoEditorError, MemoryError):
        # MemoryError must surface as itself (same convention as read_dng):
        # converting OOM into ImageIOError sends callers down the
        # corrupt-file / preview-fallback path on an exhausted machine.
        raise
    except Exception as e:  # noqa: BLE001 — PIL raises OSError/ValueError/
        # SyntaxError subclasses at open(), transpose, or pixel access
        # (truncated scans surface only when pixels decode); keep the
        # typed-error contract for all of it.
        raise ImageIOError(f"failed to decode {fmt}: {e}") from e
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)

    linearize = fmt != "TIFF"
    pv = lin = None
    if instant_long_edge:
        from ..engine import instant

        if scale == 255.0:
            # sRGB u8 source: the linear era-render planes are recovered
            # from the u8 instant on demand (lossless round trip).
            pv = instant.quick_from_srgb_u8(arr, instant_long_edge)
        else:
            hostf = arr.astype(np.float32)
            if scale is not None:
                hostf /= np.float32(scale)
            planes_h = hostf.transpose(2, 0, 1)
            if linearize:
                # Encoded-space resize, like quick_from_srgb_u8 (stand-in
                # image; sub-quantization difference at preview scale).
                small = instant._fit_long_edge(planes_h, instant_long_edge)
                pv = np.ascontiguousarray(
                    np.clip(small * 255.0 + 0.5, 0.0, 255.0)
                    .astype(np.uint8).transpose(1, 2, 0))
            else:
                lin = instant.quick_linear_from_linear_rgb(
                    planes_h, instant_long_edge)
                pv = instant._to_u8_hwc(lin)

    def upload_pil(arr=arr, scale=scale, linearize=linearize, pad=False):
        from ..utils.transfer import put_np

        chw = np.ascontiguousarray(arr.transpose(2, 0, 1))
        if pad:
            from ..engine.editor import pad_to_bucket_np

            chw = pad_to_bucket_np(chw)
        chw = put_np(chw)
        if scale is not None:
            return _normalize_upload(scale, linearize)(chw)
        if linearize:
            chw = srgb_to_linear(chw)
        return chw

    return HostDecoded(exif, pv, arr.shape[:2], upload_pil,
                       instant_linear=lin,
                       upload_padded=lambda: upload_pil(pad=True))


def normalize_exif_blob(exif_bytes: bytes) -> bytes:
    """Reset the Orientation tag to 1 in a raw EXIF blob.

    Pixels are rotated upright at decode (exif_transpose / orient_exif),
    so any export that re-embeds the original blob must clear the stored
    rotation or viewers rotate the image a second time. Shared by both
    encoders (encode_image and the native io/jpegenc fast path) so they
    cannot diverge on orientation. Blobs already at Orientation=1 (or
    with none) pass through UNTOUCHED — a PIL re-serialization relocates
    offset-based MakerNotes and drops structures PIL can't model, so it
    is only paid when a rotation actually has to be cleared. Falls back
    to the raw blob if PIL cannot parse it."""
    try:
        ex = PILImage.Exif()
        ex.load(exif_bytes)
        if ex.get(274, 1) == 1:
            return exif_bytes
        ex[274] = 1  # Orientation = normal
        return ex.tobytes()
    except Exception:  # noqa: BLE001 - unparseable blob: pass through
        return exif_bytes


def build_exif_bytes(exif: dict | None) -> bytes | None:
    """Synthesize an EXIF APP1 payload from a parsed RAW metadata dict
    (the io/dng._format_exif key set: Make, Model, ExposureTime, FNumber,
    ISO, FocalLength, LensModel).

    RAW containers are parsed into a plain dict, so exports from RAW
    sources have no raw EXIF blob to copy; the reference preserves camera
    metadata on export by writing it back with exiftool (python-legacy
    editor.py:307-355 / :345-350). This rebuilds the equivalent payload
    for Pillow / APP1 splicing. Orientation is deliberately omitted: the
    pipeline rotates pixels upright at develop time, so the export is
    Orientation=1 by default. Returns None when nothing is writable.
    """
    if not exif:
        return None
    from PIL.TiffImagePlugin import IFDRational as _Rat

    from .exif import parse_rational

    def _rat(v):
        nd = parse_rational(v)
        return None if nd is None else _Rat(*nd)

    ex = PILImage.Exif()
    wrote = False
    # Software (305): processing provenance — carries the
    # approximate-lens-profile note the editor injects on export.
    for tag, key in ((271, "Make"), (272, "Model"), (305, "Software")):
        v = exif.get(key)
        if v:
            ex[tag] = str(v)
            wrote = True
    sub = ex.get_ifd(0x8769)  # Exif sub-IFD
    for tag, key in ((33434, "ExposureTime"), (33437, "FNumber"),
                     (37386, "FocalLength")):
        v = exif.get(key)
        if v is not None:
            r = _rat(v)
            if r is not None:
                sub[tag] = r
                wrote = True
    iso = exif.get("ISO")
    if iso is not None:
        try:
            sub[34855] = int(float(iso))
            wrote = True
        except (ValueError, OverflowError):
            pass
    lens = exif.get("LensModel")
    if lens:
        sub[42036] = str(lens)
        wrote = True
    # Container opens key this "DateTimeOriginal" (io/exif.py to_dict);
    # RAW parsers key it "DateTime" — accept either.
    dt = exif.get("DateTime") or exif.get("DateTimeOriginal")
    if dt:
        ex[306] = str(dt)          # DateTime (IFD0)
        sub[36867] = str(dt)       # DateTimeOriginal
        wrote = True
    if not wrote:
        return None
    import struct as _struct

    try:
        return ex.tobytes()
    except (TypeError, ValueError, OSError, _struct.error):
        return None


def encode_image(planes, fmt: str, quality: int = 95, exif_bytes=None,
                 on_stage=None, host_crop=None) -> bytes:
    """sRGB-encoded f32 [3,H,W] in [0,1] -> container bytes.

    Truncating u8 quantization per image.rs:375-383. ``exif_bytes`` (a raw
    EXIF blob from decode) is written back into formats that carry it.
    ``on_stage(name)`` (optional) is called entering the 'fetch' (device ->
    host transfer, the tunnel-bound part) and 'encode' (host container
    encode) stages — progress reporting for async export jobs.

    ``host_crop``: optional (r0, r1, c0, c1) applied on the HOST after
    the fetch. Crop-aware callers pass the full-frame render plus this
    slice instead of a device-sliced array: device shapes then stay
    stable across crop rects, so the quantize programs compile once per
    level shape, not once per rect (remote compiles are seconds-minutes,
    CLAUDE.md). The extra fetched rows/cols are cheap next to that.
    """
    from ..utils.transfer import fetch_np, fetch_u8_hwc

    stage = on_stage or (lambda _name: None)

    def hcrop(hwc):
        if host_crop is None:
            return hwc
        r0, r1, c0, c1 = host_crop
        return np.ascontiguousarray(hwc[r0:r1, c0:c1])
    if fmt == "DNG":
        raise ImageIOError(
            "cannot encode a developed image as DNG; use io.dng.write_dng "
            "for CFA mosaics"
        )
    if fmt == "PNG16":
        # 48-bit PNG: quantize + transpose to u16 HWC ON DEVICE in one
        # cached jitted program (2 bytes/sample over the link, same
        # shape-stable program story as the u8 path) and entropy-code
        # host-side with the from-scratch encoder.
        from ..utils.transfer import fetch_u16_hwc

        stage("fetch")
        hwc = hcrop(np.ascontiguousarray(fetch_u16_hwc(planes)))
        stage("encode")
        return encode_png16(hwc, exif_bytes=exif_bytes)
    if fmt == "PPM16":
        # PPM16 is a LINEAR container here (the decode path takes its
        # samples as linear light, matching the reference TS loader's
        # passthrough) — undo the render's sRGB OETF before storing, or
        # a .ppm export round-trips double-bright.
        import jax.numpy as jnp

        from ..core.color import srgb_to_linear

        lin = srgb_to_linear(jnp.clip(jnp.asarray(planes), 0.0, 1.0))
        stage("fetch")
        hwc = hcrop(fetch_np(lin).transpose(1, 2, 0))
        stage("encode")
        return encode_ppm16(hwc)
    if fmt == "JPEG" and host_crop is None:
        from .. import native
        from ..utils.transfer import _is_device_array

        # native.available() guard: without it encode_jpeg's own
        # no-native fallback is THIS function — infinite recursion.
        if native.available() and _is_device_array(planes):
            from . import jpegenc

            npix = int(planes.shape[-2]) * int(planes.shape[-1])
            if npix >= jpegenc.SPARSE_MIN_PIXELS:
                # Export-sized device-array JPEG: the sparse-coefficient
                # fast path (io/jpegenc — device fDCT/quantization, only
                # nonzero coefficients over the link, well under the u8
                # RGB fetch below at 24-45MP). Gated on size: MID/LOW
                # preview frames (<= ~1 MPix) keep the u8 path — routing
                # them here would put a heavyweight never-prewarmed
                # device program (per preview bucket) on the first
                # preview, for a byte saving that is marginal at preview
                # sizes. Cropped exports (host_crop) also keep the u8
                # path — DCT blocks can't be sliced to an arbitrary rect
                # post-hoc. Host np inputs keep the byte-deterministic
                # Pillow encode.
                return jpegenc.encode_jpeg(planes, quality=quality,
                                           exif_bytes=exif_bytes,
                                           on_stage=on_stage)
    # Quantize on device + parallel banded fetch: the tunnel moves 1
    # byte/sample instead of 4 (utils/transfer.py).
    stage("fetch")
    u8 = hcrop(fetch_u8_hwc(planes))
    stage("encode")
    img = PILImage.fromarray(u8, mode="RGB")
    buf = _io.BytesIO()
    save_kwargs = {}
    if fmt in ("JPEG", "WEBP"):
        save_kwargs["quality"] = quality
    if exif_bytes and fmt in ("JPEG", "PNG", "WEBP", "TIFF"):
        save_kwargs["exif"] = normalize_exif_blob(exif_bytes)
    img.save(buf, format=fmt, **save_kwargs)
    return buf.getvalue()


def read_image(path: str):
    """Load a file -> (planes f32 [3,H,W] linear, exif dict)."""
    fmt = format_for_path(path)
    with open(path, "rb") as f:
        data = f.read()
    return decode_image(data, fmt)


def write_image(path: str, srgb_planes, quality: int = 95) -> None:
    """Write sRGB-encoded planes [3,H,W] to a file by extension."""
    fmt = format_for_path(path)
    with open(path, "wb") as f:
        f.write(encode_image(srgb_planes, fmt, quality=quality))


def linear_planes_to_srgb_u8(planes) -> np.ndarray:
    """Utility: linear [3,H,W] -> sRGB u8 HWC (for thumbnails/masks UIs)."""
    from ..utils.transfer import fetch_u8_hwc

    srgb = linear_to_srgb(jnp.clip(jnp.asarray(planes), 0.0, 1.0))
    return fetch_u8_hwc(srgb)
