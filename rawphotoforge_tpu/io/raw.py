"""RAW ingestion glue: DNG bytes -> linear sRGB planes on device.

The TPU analog of the reference's RAW load paths
(rust-godot-legacy image.rs:509-557 rawler develop;
python-legacy editor.py:169-181 rawpy postprocess with camera WB, 16-bit
linear output, no auto-bright): container parse on CPU, then the whole
normalize -> WB -> demosaic -> camera-matrix chain runs as one jitted TPU
program (ops/demosaic.develop_raw).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import demosaic as dm
from ..ops.geometry import orient_exif
from .dng import RawImage, read_dng

# The RAW container surface (rust-godot-legacy image.rs:14-179 enumerates
# these via rawler's format list). DNG and any TIFF-structured RAW with
# uncompressed, lossless-JPEG (SOF3 strips/tiles), or deflate
# (Compression=8, integer or fp16/fp32 HDR) CFA data decode natively
# today — that covers standard DNGs from Adobe converters and cameras
# plus Canon CR2 (io/cr2.py). Vendor-specific schemes (Nikon NEF huffman
# variant, Sony ARW delta packing, ...) parse their container/EXIF but
# raise a typed unsupported-compression error. The TIFF walker finds the
# CFA IFD in ARW/NEF/ORF/PEF/RW2-style files too.
RAW_EXTENSIONS = {
    ".dng", ".arw", ".nef", ".nrw", ".cr2", ".orf", ".pef", ".raf",
    ".rw2", ".srw", ".kdc", ".dcr", ".erf", ".3fr", ".fff", ".iiq",
    ".mos", ".mef", ".mrw", ".sr2", ".srf", ".x3f", ".crw", ".cr3",
    ".rwl", ".raw",
}


def is_raw_image(path: str) -> bool:
    """Extension-based RAW detection (is_raw_image analog, image.rs:14-179)."""
    import os

    return os.path.splitext(path)[1].lower() in RAW_EXTENSIONS


def parse_raw(data: bytes, apply_opcodes: bool = True) -> RawImage:
    """Sniff the container type and parse RAW bytes into a RawImage.

    Canon CR2 carries a CR\\x02 marker at byte 8; Panasonic RW2 stamps
    TIFF magic 0x0055; Fujifilm RAF has its fixed ``FUJIFILMCCD-RAW``
    header; everything else TIFF-structured (DNG, uncompressed
    NEF/ARW/other TIFF-EP RAWs) goes through the DNG walker.
    ``apply_opcodes=False`` is the lossless-transcode mode (see
    read_dng)."""
    from .cr2 import is_cr2, read_cr2
    from .vendor_raw import is_raf, is_rw2, read_raf, read_rw2

    if is_cr2(data):
        raw = read_cr2(data)
    elif is_rw2(data):
        raw = read_rw2(data)
    elif is_raf(data):
        raw = read_raf(data)
    else:
        raw = read_dng(data, apply_opcodes=apply_opcodes)
    if raw.needs_verification:
        _verify_memory_derived_decode(data, raw)
    return raw


def _verify_memory_derived_decode(data: bytes, raw) -> None:
    """Automatic silent-wrong gate for memory-derived bitstream codecs
    (io/vendor_packed: Sony ARW2, Panasonic RAW4 — VERDICT r4 #1).

    A host superpixel develop of the decoded mosaic (engine.instant, no
    device dispatch, ~0.1 s at 24 MPix) is Pearson-correlated against
    the file's own embedded camera preview over the 8 dihedral
    placements. Below the 0.9 gate the decode is REFUSED with a typed
    DngError — callers' preview fallback then opens the file loudly
    (``opened_from_preview`` carries this message) instead of showing
    silently-wrong pixels. Files without a decodable embedded preview
    pass through unverified (fixtures; every real camera writes one);
    ``info --verify-decode`` remains the explicit device-path check."""
    from ..engine import instant
    from .dng import DngError
    from .vendor_raw import CORRELATION_GATE, dihedral_luma_correlation

    import io as _io

    from PIL import Image as PILImage

    from .dng import extract_preview

    jpeg = extract_preview(data)
    if jpeg is None:
        return
    try:
        img = PILImage.open(_io.BytesIO(jpeg))
        # JPEG draft mode: decode at the nearest 1/2^k scale >= 256 px —
        # the correlation pools to a 64-grid anyway, and full-resolution
        # camera previews would otherwise dominate the gate's cost on
        # every ARW2/RAW4 open.
        img.draft("RGB", (256, 256))
        pv_u8 = np.asarray(img.convert("RGB"))
    except Exception:  # noqa: BLE001 — a corrupt preview can't verify
        return
    if pv_u8.ndim != 3 or min(pv_u8.shape[:2]) < 8:
        return
    pv_lin = instant.linear_from_srgb_u8(np.ascontiguousarray(pv_u8))
    dev = instant.quick_linear_from_raw(raw, 128)
    if dev is None:
        return
    corr = dihedral_luma_correlation(dev, pv_lin)
    if corr < CORRELATION_GATE:
        raise DngError(
            f"memory-derived packed decode failed the embedded-preview "
            f"correlation gate ({corr:.3f} < {CORRELATION_GATE}); "
            f"refusing possibly-wrong sensor data")


def decode_embedded_preview(data: bytes):
    """Decode the embedded camera-rendered JPEG preview of a RAW file.

    The single fallback used when sensor data can't decode (vendor
    entropy codecs): returns (linear planes f32 [3,H,W], exif dict), or
    None when no decodable preview exists. Failures inside the preview
    decode surface as typed PhotoEditorError (never PIL exceptions) so
    callers' error handling stays uniform."""
    hd = decode_embedded_preview_host(data)
    if hd is None:
        return None
    return hd.upload(), hd.exif


def decode_embedded_preview_host(data: bytes,
                                 instant_long_edge: int | None = None):
    """Host phase of decode_embedded_preview (HostDecoded contract):
    preview extraction + PIL decode + container-EXIF merge happen here;
    the returned upload closure only moves the validated pixels."""
    from .._errbase import PhotoEditorError
    from .dng import extract_preview
    from .image_io import ImageIOError, decode_image_host

    jpeg = extract_preview(data)
    if jpeg is None:
        return None
    try:
        hd = decode_image_host(jpeg, "JPEG",
                               instant_long_edge=instant_long_edge)
    except PhotoEditorError:
        raise
    except Exception as e:  # noqa: BLE001 — PIL's hierarchy stays inside
        raise ImageIOError(f"embedded preview failed to decode: {e}") from e
    exif = hd.exif
    # The container's metadata tags are the authoritative capture record;
    # camera previews rarely carry their own EXIF, and when they do the
    # two agree on shared fields (both written by the camera), so the
    # preview's parsed tags fill per-field. The preview's raw
    # "_exif_bytes" blob is DROPPED when the container knows fields the
    # blob's parse lacks — write-back prefers the blob verbatim
    # (editor.export_exif_bytes), and a stripped preview blob would
    # silently shadow the richer container record on save.
    merged = container_exif(data)
    pv_fields = {k for k in exif if k != "_exif_bytes"}
    if merged and any(k not in pv_fields for k in merged):
        exif.pop("_exif_bytes", None)
    merged.update(exif)
    hd.exif = merged
    return hd


def container_exif(data: bytes) -> dict:
    """Best-effort capture metadata from any RAW container, without
    decoding sensor data: the TIFF IFD forest for TIFF-structured files,
    or the CMT metadata boxes of a BMFF container (Canon CR3)."""
    from .dng import _EXIF_TAGS, _format_exif, extract_container_exif
    from .vendor_preview import bmff_exif_tiff_blocks, is_bmff

    exif = dict(extract_container_exif(data))
    if not exif and is_bmff(data):
        # Merge the CMT streams at the raw-TAG level, then format once:
        # CMT1 (IFD0 stream) holds DateTime(306), CMT2 (EXIF stream)
        # DateTimeOriginal(36867) — a per-block format + dict merge would
        # let CMT1's modification time shadow the capture time.
        from .dng import extract_container_tags

        tags: dict = {}
        for blk in bmff_exif_tiff_blocks(data):
            for t, v in extract_container_tags(bytes(blk), _EXIF_TAGS).items():
                tags.setdefault(t, v)
        if tags:
            exif = _format_exif(tags.get)
    return exif


def estimate_gray_world_gains(mosaic: np.ndarray, pattern: str,
                              black: float, white: float) -> tuple:
    """Gray-world WB gains from per-CFA-channel means (host numpy).

    The fallback for vendor RAWs whose camera WB lives in an
    undocumented/encrypted maker note (RawImage.wb_known False): assume
    the scene averages neutral, so gains equalize the channel means —
    the same spirit as rawpy/libraw auto_wb when use_camera_wb has no
    camera WB to use. Deterministic; clipped to [0.25, 8]."""
    m = np.asarray(mosaic)
    if m.ndim == 3:  # demosaiced RGB
        sub = m[:: max(1, m.shape[0] // 512), :: max(1, m.shape[1] // 512)]
        means = sub.reshape(-1, 3).astype(np.float64).mean(axis=0)
    else:
        tile = np.asarray(dm.NAMED_CFA[pattern])
        ph, pw = tile.shape
        th, tw = m.shape[0] // ph, m.shape[1] // pw
        if th == 0 or tw == 0:
            return (1.0, 1.0, 1.0)
        # Subsample whole CFA tiles (keeps every channel phase) so a
        # 45MP sensor averages ~1M samples, not all of them.
        t = m[: th * ph, : tw * pw].reshape(th, ph, tw, pw)
        t = t[:: max(1, th // 512), :, :: max(1, tw // 512), :]
        sub = t.reshape(t.shape[0] * ph, t.shape[2] * pw)
        yy, xx = np.mgrid[0:sub.shape[0], 0:sub.shape[1]]
        chan = tile[yy % ph, xx % pw]
        vals = sub.astype(np.float64)
        means = np.array([
            vals[chan == c].mean() if (chan == c).any() else 1.0
            for c in range(3)
        ])
    span = max(float(white) - float(black), 1e-9)
    means = np.maximum((means - float(black)) / span, 1e-6)
    g = means[1]
    gains = np.clip(g / means, 0.25, 8.0)
    return (float(gains[0]), 1.0, float(gains[2]))


def _with_effective_wb(raw: RawImage) -> RawImage:
    """Substitute deterministic gray-world gains when the container had no
    usable camera WB (wb_known=False, vendor maker-note gap)."""
    if not raw.wb_known and tuple(raw.wb_gains) == (1.0, 1.0, 1.0):
        import dataclasses

        raw = dataclasses.replace(
            raw,
            wb_gains=estimate_gray_world_gains(
                raw.mosaic, raw.pattern, raw.black_level, raw.white_level),
        )
    return raw


def _cam2srgb_for(raw: RawImage) -> jnp.ndarray:
    if raw.xyz_to_cam is not None:
        return jnp.asarray(dm.cam_matrix_to_srgb(raw.xyz_to_cam))
    return jnp.eye(3, dtype=jnp.float32)


# Which mosaic sides take the reflect bucket pad, per EXIF orientation:
# (pad_top, pad_left). Chosen so ops.geometry.orient_exif maps the pad to
# the OUTPUT's bottom/right — the true region lands at the origin, where
# PhotoEditor's true-extent convention needs it. Derived from
# orient_exif's index maps (e.g. o=6: out[y, x] = in[h-1-x, y], so input
# TOP rows become output right cols -> pad top).
_PAD_SIDES = {
    0: (False, False), 1: (False, False), 2: (False, True),
    3: (True, True), 4: (True, False), 5: (False, False),
    6: (True, False), 7: (True, True), 8: (False, True),
}


def _bucket_pads(raw: RawImage):
    """Reflect-pad amounts (ph, pw) for the bucket-stable develop, or
    None when the file must fall back to the per-extent path.

    Base pads round (h, w) up to the 128-bucket; a DefaultCrop adds one
    fixed extra bucket on each axis, which (a) guarantees the
    post-develop bucket-size dynamic_slice (bucket(ch), bucket(cw))
    starting at the traced crop origin stays inside the padded grid
    (cy <= h-ch and bucket(ch) < ch+128 give cy+bucket(ch) < h+128;
    dynamic_slice would otherwise CLAMP the start and silently shift
    the crop), and (b) makes the crop-file grid DETERMINISTIC per
    sensor bucket so prewarm can compile it without knowing rects."""
    from ..engine.editor import SHAPE_BUCKET

    h, w = raw.mosaic.shape[:2]
    if h < 2 or w < 2:
        return None
    ph, pw = (-h) % SHAPE_BUCKET, (-w) % SHAPE_BUCKET
    sides = _PAD_SIDES.get(raw.orientation)
    if sides is None:
        return None
    if raw.orientation not in (0, 1):
        if raw.default_crop is not None:
            # Crop-under-rotation needs side-dependent slice gymnastics;
            # rare enough to take the per-extent path.
            return None
        # A top/left pad shifts the CFA phase of the true region unless
        # it is even (Bayer period 2); real sensor dims are even, so
        # this almost never falls back. LinearRaw has no CFA phase.
        if raw.pattern in dm.BAYER_PATTERNS and (
                (sides[0] and ph % 2) or (sides[1] and pw % 2)):
            return None
    if raw.default_crop is not None:
        cx, cy, cw, ch = raw.default_crop
        if not (0 <= cy and 0 <= cx and cy + ch <= h and cx + cw <= w
                and ch >= 1 and cw >= 1):
            return None  # malformed rect: legacy path validates/fails
        ph += SHAPE_BUCKET
        pw += SHAPE_BUCKET
    # A 1-px pad would let the Malvar 5x5 window cross the padded edge
    # at true-edge pixels (its internal reflect then disagrees with the
    # unpadded path by one row) — bit-exactness requires pad != 1.
    # Deeper pads than the image (np reflect cycles) are fine: only the
    # first two pad rows/cols feed true-region stencils.
    if ph == 1 or pw == 1:
        return None
    return ph, pw


def bucket_stable_eligible(raw: RawImage) -> bool:
    """Whether this RAW can take the bucket-stable develop
    (develop_raw_image_padded): the common camera file — Bayer CFA,
    X-Trans, or demosaiced LinearRaw (crop and rotation not combined);
    post-demosaic opcodes (warp / radial vignette, the phone/ProRAW
    class) are bucket-stable too for bottom/right-pad orientations
    (true-extent-traced coordinates, r4).

    Bayer/LinearRaw: the reflect bucket pad preserves Bayer phase
    (period 2 divides the 128 bucket; mirror indices keep row parity)
    and reproduces exactly the reflect values the Malvar/bilinear
    stencils generate internally at a true edge, so the true region is
    BIT-IDENTICAL to the unpadded develop (gated in tests/test_raw.py);
    any EXIF orientation works (side-aware pads stay phase-safe).

    X-Trans: the masked-NC demosaic takes the true extent AND origin as
    traced scalars (ops/demosaic.demosaic_cfa true_shape/true_origin)
    and treats pad sites as absent samples, so the true region is
    bit-identical by the zero-contribution argument — no 6x6 phase
    constraint on the pad, any orientation (top/left pads use the
    traced-origin channel map to keep every true site's absolute CFA
    phase, r4)."""
    if raw.pattern not in dm.BAYER_PATTERNS and raw.pattern not in (
            "RGB", "XTRANS"):
        return False
    if (raw.warp_rectilinear is not None or raw.warp_fisheye is not None
            or raw.vignette_radial is not None):
        # Opcode-carrying files (phone/ProRAW class) develop on the
        # bucket grid with the true extent traced (develop_raw_image_
        # padded's opcode block); restricted to orientations whose pads
        # land bottom/right PRE-orientation so the true region sits at
        # the origin when the extent-normalized coordinates are built.
        if _PAD_SIDES.get(raw.orientation) != (False, False):
            return False
    return _bucket_pads(raw) is not None


def develop_raw_image_padded(raw: RawImage, method: str = "malvar"):
    """Bucket-stable develop: reflect-pad the mosaic HOST-side to the
    128-bucket shape, then run the normalize/WB/demosaic/matrix chain on
    the padded grid — every device program keys on BUCKET shapes, so
    all same-sensor-class RAWs share compiles (and prewarm can front-run
    them). A DefaultCrop becomes a traced-origin dynamic_slice of
    bucket-quantized size (one program per crop bucket, not per rect).
    Returns padded planes [3, Hp, Wp]; the true region equals
    develop_raw_image's output bit-for-bit (see bucket_stable_eligible).
    Caller passes true_shape = HostDecoded.shape to PhotoEditor."""
    from ..engine.editor import bucket_shape
    from ..utils.transfer import put_np

    pads = _bucket_pads(raw)
    assert pads is not None and bucket_stable_eligible(raw)
    raw = _with_effective_wb(raw)
    m = raw.mosaic
    # Pad the sides that orient_exif maps to the output's bottom/right
    # (true region at the origin after the final orientation).
    pad_top, pad_left = _PAD_SIDES[raw.orientation]
    pad = [(pads[0], 0) if pad_top else (0, pads[0]),
           (pads[1], 0) if pad_left else (0, pads[1])]
    pad += [(0, 0)] * (m.ndim - 2)
    m = np.pad(m, pad, mode="reflect")
    mosaic01 = dm.normalize_mosaic(
        put_np(m), raw.black_level, raw.white_level)
    cam2srgb = _cam2srgb_for(raw)
    wb = jnp.asarray(raw.wb_gains, dtype=jnp.float32)
    if raw.pattern == "RGB":
        planes = dm.develop_linear_raw(mosaic01, wb, cam2srgb)
    elif raw.pattern == "XTRANS":
        # Masked-NC demosaic with the TRUE extent AND origin traced: pad
        # samples are treated as absent, so the true region is
        # bit-identical to the unpadded develop with no 6x6 phase
        # constraint on the pad. Rotated orientations pad top/left; the
        # traced origin keeps every true site's absolute CFA phase
        # (ops/demosaic._cfa_channel_map_traced) with one device program
        # per bucket (r4 — previously restricted to orientations 0/1/5).
        th0, tw0 = raw.mosaic.shape[:2]
        origin = jnp.asarray([pads[0] if pad_top else 0,
                              pads[1] if pad_left else 0], dtype=jnp.int32)
        planes = dm.develop_raw(
            mosaic01, wb, cam2srgb, pattern=raw.pattern, method=method,
            true_shape=jnp.asarray([th0, tw0], dtype=jnp.int32),
            true_origin=origin)
    else:
        planes = dm.develop_raw(mosaic01, wb, cam2srgb,
                                pattern=raw.pattern, method=method)
    if (raw.warp_rectilinear is not None or raw.warp_fisheye is not None
            or raw.vignette_radial is not None):
        # OpcodeList3 warp/vignette on the BUCKET grid with the true
        # extent traced (coordinates normalize by it; bilinear_sample
        # clamps to it) — phone/ProRAW-class files stay bucket-stable
        # instead of paying per-extent remote compiles (VERDICT r3 #4).
        # bucket_stable_eligible restricted opcode files to bottom/right
        # pads, so the true region sits at the origin here.
        from ..ops.lenscorr import (vignette_radial_gain, warp_fisheye,
                                    warp_rectilinear)

        th0, tw0 = raw.mosaic.shape[:2]
        ext = jnp.asarray([th0, tw0], dtype=jnp.float32)

        def _warp(p):
            if raw.warp_rectilinear is not None:
                coefs, center = raw.warp_rectilinear
                p = warp_rectilinear(p, jnp.asarray(coefs),
                                     jnp.asarray(center), extent=ext)
            if raw.warp_fisheye is not None:
                coefs, center = raw.warp_fisheye
                p = warp_fisheye(p, jnp.asarray(coefs),
                                 jnp.asarray(center), extent=ext)
            return p

        def _vig(p):
            k, center = raw.vignette_radial
            g = vignette_radial_gain(p.shape[1], p.shape[2], k, center,
                                     extent=ext)
            return p * g[None, :, :]

        warp_present = (raw.warp_rectilinear is not None
                        or raw.warp_fisheye is not None) or None
        steps = [(_warp, warp_present), (_vig, raw.vignette_radial)]
        if raw.vignette_first:
            steps.reverse()
        for fn, present in steps:
            if present is not None:
                planes = fn(planes)
    if raw.default_crop is not None:
        import jax.lax as lax

        cx, cy, cw, ch = raw.default_crop
        # Crop values inside the true region are demosaiced from real
        # neighbors, so the slice is bit-identical to the legacy
        # post-demosaic crop. _bucket_pads guaranteed the slice stays
        # in bounds (no silent dynamic_slice clamping); the pad content
        # it drags along is normalized to edge replication below.
        planes = lax.dynamic_slice(
            planes,
            (jnp.int32(0), jnp.int32(cy), jnp.int32(cx)),
            (3,) + bucket_shape(ch, cw))
    # Pure relocation of already-final values (one program per
    # orientation x bucket); _PAD_SIDES put the pad where this lands it
    # bottom/right, so the true region arrives at the origin.
    planes = orient_exif(planes, raw.orientation)
    # Normalize the pad content to the editor's mode='edge' contract:
    # the reflect-demosaiced (or crop-sliced) pad would otherwise feed
    # the sharpen/warp stencils values a legacy open never shows.
    from ..ops.develop import replicate_true_edges_traced

    th, tw = raw.mosaic.shape[:2]
    if raw.default_crop is not None:
        th, tw = raw.default_crop[3], raw.default_crop[2]
    if raw.orientation in (5, 6, 7, 8):
        th, tw = tw, th
    return replicate_true_edges_traced(
        planes, jnp.asarray([th, tw], dtype=jnp.int32))


def develop_raw_image(raw: RawImage, method: str = "malvar"):
    """RawImage -> (linear sRGB planes f32 [3, H, W], exif dict)."""
    raw = _with_effective_wb(raw)
    from ..utils.transfer import put_np

    mosaic01 = dm.normalize_mosaic(
        put_np(raw.mosaic), raw.black_level, raw.white_level
    )
    cam2srgb = _cam2srgb_for(raw)
    if raw.pattern == "RGB":
        # Demosaiced LinearRaw data (lossy DNG): WB + matrix only.
        planes = dm.develop_linear_raw(
            mosaic01, jnp.asarray(raw.wb_gains, dtype=jnp.float32), cam2srgb
        )
    else:
        planes = dm.develop_raw(
            mosaic01,
            jnp.asarray(raw.wb_gains, dtype=jnp.float32),
            cam2srgb,
            pattern=raw.pattern,
            method=method,
        )
    def _apply_warp(p):
        # DNG OpcodeList3 WarpRectilinear/WarpFisheye: post-demosaic
        # geometric correction (the distortion correction phone DNGs
        # rely on), applied before DefaultCrop per the opcode-stage
        # ordering. Files carry one warp kind; if both appear they apply
        # in opcode-id order.
        from ..ops.lenscorr import warp_fisheye, warp_rectilinear

        if raw.warp_rectilinear is not None:
            coefs, center = raw.warp_rectilinear
            p = warp_rectilinear(p, jnp.asarray(coefs), jnp.asarray(center))
        if raw.warp_fisheye is not None:
            coefs, center = raw.warp_fisheye
            p = warp_fisheye(p, jnp.asarray(coefs), jnp.asarray(center))
        return p

    def _apply_vignette(p):
        # DNG OpcodeList3 FixVignetteRadial: post-demosaic radial
        # shading gain. The device f32 evaluation (ops/lenscorr
        # .vignette_radial_gain) is shared with the bucket-stable padded
        # develop so the two paths stay elementwise-identical; the
        # list-2 normalized-mosaic stage keeps the host f64 version.
        from ..ops.lenscorr import vignette_radial_gain

        k, center = raw.vignette_radial
        g = vignette_radial_gain(p.shape[1], p.shape[2], k, center)
        return p * g[None, :, :]

    # List-3 opcodes apply sequentially IN THE FILE'S LISTED ORDER —
    # for vignette-before-warp files the gain must be evaluated on
    # pre-warp coordinates (raw.vignette_first).
    steps = [_apply_warp, _apply_vignette]
    if raw.vignette_first:
        steps.reverse()
    for step in steps:
        present = ((raw.warp_rectilinear is not None
                    or raw.warp_fisheye is not None)
                   if step is _apply_warp
                   else raw.vignette_radial is not None)
        if present:
            planes = step(planes)
    if raw.default_crop is not None:
        # DNG DefaultCrop: recommended final crop, applied post-demosaic
        # (so the demosaic keeps its border context), pre-orientation.
        cx, cy, cw, ch = raw.default_crop
        planes = planes[:, cy : cy + ch, cx : cx + cw]
    planes = orient_exif(planes, raw.orientation)
    return planes, dict(raw.exif)


def read_raw(path_or_bytes, method: str = "malvar"):
    """Load a RAW file (path or bytes) -> (linear planes, exif)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    return develop_raw_image(parse_raw(data), method=method)


def decode_raw_host(data: bytes, instant_long_edge: int | None = None):
    """Host phase of a RAW decode (io.image_io.HostDecoded contract):
    container parse + superpixel instant preview, no device work. All
    file-content errors (corrupt containers, unsupported vendor codecs)
    surface here; the upload closure runs the device develop."""
    from .image_io import HostDecoded

    raw = parse_raw(data)

    pv = lin = None
    if instant_long_edge:
        from ..engine import instant

        lin = instant.quick_linear_from_raw(raw, instant_long_edge)
        if lin is not None:
            pv = instant._to_u8_hwc(lin)

    # Final planes shape, knowable without developing: mosaic extent,
    # DefaultCrop applied post-demosaic, then orientations 5-8 transpose.
    h, w = raw.mosaic.shape[:2]
    if raw.default_crop is not None:
        cx, cy, cw, ch = raw.default_crop
        h, w = ch, cw
    if raw.orientation in (5, 6, 7, 8):
        h, w = w, h

    def upload(raw=raw):
        return develop_raw_image(raw)[0]

    upload_padded = None
    if bucket_stable_eligible(raw):
        # The common upright Bayer/LinearRaw file: develop on the
        # reflect-padded bucket grid so every device program is shared
        # across same-sensor-class RAWs (true region bit-identical;
        # PhotoEditor gets true_shape via HostDecoded.shape).
        def upload_padded(raw=raw):
            return develop_raw_image_padded(raw)

    return HostDecoded(dict(raw.exif), pv, (h, w), upload,
                       instant_linear=lin, upload_padded=upload_padded)


def synthetic_raw(
    planes_linear: np.ndarray,
    pattern: str = "RGGB",
    black_level: int = 512,
    white_level: int = 16383,
    wb_gains=(2.0, 1.0, 1.5),
    xyz_to_cam: np.ndarray | None = None,
) -> RawImage:
    """Mosaic a linear RGB image into a synthetic RawImage (tests/bench).

    Simulates the camera: divide by WB gains (sensor sees unbalanced
    light), optionally push through cam = xyz_to_cam-derived inverse of the
    develop matrix, sample the CFA, quantize into [black, white].
    """
    rgb = np.asarray(planes_linear, dtype=np.float32)
    assert rgb.ndim == 3 and rgb.shape[0] == 3
    _, h, w = rgb.shape
    if xyz_to_cam is not None:
        cam2srgb = dm.cam_matrix_to_srgb(xyz_to_cam)
        srgb2cam = np.linalg.inv(cam2srgb)
        rgb = np.einsum("ij,jhw->ihw", srgb2cam.astype(np.float32), rgb)
    inv_gains = 1.0 / np.asarray(wb_gains, dtype=np.float32)
    rgb = rgb * inv_gains[:, None, None]

    tile = np.asarray(dm.NAMED_CFA[pattern], dtype=np.int64)
    ph, pw = tile.shape
    yy, xx = np.mgrid[0:h, 0:w]
    chan = tile[yy % ph, xx % pw]
    mosaic01 = np.take_along_axis(
        rgb.reshape(3, -1), chan.reshape(1, -1), axis=0
    ).reshape(h, w)

    span = white_level - black_level
    mosaic = np.clip(
        np.round(mosaic01 * span + black_level), 0, white_level
    ).astype(np.uint16)
    return RawImage(
        mosaic=mosaic,
        pattern=pattern,
        black_level=float(black_level),
        white_level=float(white_level),
        wb_gains=tuple(float(g) for g in wb_gains),
        xyz_to_cam=xyz_to_cam,
        exif={"Make": "Synthetic", "Model": "rawphotoforge-tpu"},
    )
