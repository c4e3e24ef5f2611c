"""ctypes loader for the native host runtime (librpf_native.so).

Builds the library on first import if the .so is missing (best-effort; all
callers have numpy fallbacks, so a missing toolchain degrades gracefully).
See rpf_native.cpp for what lives here and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "librpf_native.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:  # noqa: BLE001
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    # Always run make (near-free no-op when current): gating on the .so's
    # existence would keep loading a STALE binary after rpf_native.cpp
    # changes, silently breaking the wrappers' bit-identical contracts on
    # that machine while fresh-build CI stays green. The Makefile's
    # dependency line makes this a correct rebuild, not a rebuild-always.
    if not _build() and not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    try:
        _bind(lib)
    except AttributeError:
        # A stale prebuilt .so missing a newer symbol (with no working
        # toolchain to rebuild it) must degrade to available() == False —
        # the callers' documented numpy/Pillow fallbacks — not leak an
        # AttributeError out of every available() call.
        return None
    _lib = lib
    return lib


def _bind(lib) -> None:
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    c = ctypes.c_int32
    c64 = ctypes.c_int64

    lib.rpf_pchip_build_lut.argtypes = [i32p, i32p, c, c, c, c, i32p]
    lib.rpf_pchip_build_lut.restype = c
    lib.rpf_resize_bilinear_f32.argtypes = [f32p, c, c, c, f32p, c, c]
    lib.rpf_resize_bilinear_f32.restype = c
    lib.rpf_srgb_u8_to_linear_f32.argtypes = [u8p, f32p, c64]
    lib.rpf_srgb_u8_to_linear_f32.restype = c
    lib.rpf_linear_f32_to_srgb_u8.argtypes = [f32p, u8p, c64]
    lib.rpf_linear_f32_to_srgb_u8.restype = c
    lib.rpf_histogram_rgbl_f32.argtypes = [f32p, c, c, i32p]
    lib.rpf_histogram_rgbl_f32.restype = c
    lib.rpf_binarize_mask_f32.argtypes = [f32p, f32p, c64, ctypes.c_float]
    lib.rpf_binarize_mask_f32.restype = c
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    lib.rpf_ljpeg_decode_scan.argtypes = [
        ctypes.c_char_p, c64, u16p, c, c, c,
        u8p, u8p, u8p, c, c, c, c, c64, c64,
    ]
    lib.rpf_ljpeg_decode_scan.restype = c
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.rpf_ljpeg_pack_bits.argtypes = [i64p, u8p, c64, u8p]
    lib.rpf_ljpeg_pack_bits.restype = c64
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    lib.rpf_jpeg_encode_sparse.argtypes = [
        u8p, u32p, u8p, c64, i16p, c64, c, c, c, c, c, u8p, c64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.rpf_jpeg_encode_sparse.restype = c
    lib.rpf_jpeg_encode_prepacked.argtypes = [
        u16p, c64, u32p, c64, c, c, c, u8p, c64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.rpf_jpeg_encode_prepacked.restype = c
    lib.rpf_jpeg_encode_packed.argtypes = [
        u32p, c64, c64, c, c, c, u8p, c64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.rpf_jpeg_encode_packed.restype = c
    lib.rpf_jpeg_encode_ycc420.argtypes = [
        u8p, u8p, u8p, c, c, c, u8p, c64, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rpf_jpeg_encode_ycc420.restype = c
    lib.rpf_cfa_block_means.argtypes = [
        u16p, c, c, c, c, i32p, ctypes.c_float, ctypes.c_float, f32p,
    ]
    lib.rpf_cfa_block_means.restype = c
    lib.rpf_pana_decode_raw4.argtypes = [ctypes.c_char_p, c64, c, c, u16p]
    lib.rpf_pana_decode_raw4.restype = c
    lib.rpf_arw2_decode.argtypes = [ctypes.c_char_p, c64, c, c, u16p, u16p]
    lib.rpf_arw2_decode.restype = c
    lib.rpf_hostdev_develop.argtypes = [
        f32p, c, c, c, f32p, f32p, i32p, i32p, c, f32p,
        ctypes.c_float, u8p,
    ]
    lib.rpf_hostdev_develop.restype = c
    lib.rpf_warp_f32.argtypes = [f32p, c, c, ctypes.c_float, f32p]
    lib.rpf_warp_f32.restype = c
    cf = ctypes.c_float
    lib.rpf_similarity_logits.argtypes = [
        f32p, c, c, c, c, cf, cf, f32p, f32p,
    ]
    lib.rpf_similarity_logits.restype = c
    lib.rpf_geodesic_logits.argtypes = [
        f32p, c, c, c, c, cf, cf, c, cf, f32p, f32p,
    ]
    lib.rpf_geodesic_logits.restype = c
    lib.rpf_unsharp_f32.argtypes = [
        f32p, c, c, f32p, c, ctypes.c_float, f32p,
    ]
    lib.rpf_unsharp_f32.restype = c
    lib.rpf_png_unfilter.argtypes = [u8p, u8p, c64, c64, c]
    lib.rpf_png_unfilter.restype = c


def available() -> bool:
    return _load() is not None


def pchip_build_lut(xs, ys, lo=0, hi=65535, lut_size=65536):
    """Native PCHIP LUT expansion; raises on bad control points.
    Semantics identical to core.curve.build_lut (tested equal)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    xs = np.ascontiguousarray(xs, dtype=np.int32)
    ys = np.ascontiguousarray(ys, dtype=np.int32)
    out = np.empty(lut_size, dtype=np.int32)
    rc = lib.rpf_pchip_build_lut(xs, ys, len(xs), lo, hi, lut_size, out)
    if rc == 2:
        from ..core.curve import CurveError

        raise CurveError("control point x values must be strictly increasing")
    if rc != 0:
        raise ValueError(f"rpf_pchip_build_lut failed: {rc}")
    return out


def resize_bilinear(src_hwc, dh, dw):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    src = np.ascontiguousarray(src_hwc, dtype=np.float32)
    h, w, ch = src.shape
    out = np.empty((dh, dw, ch), dtype=np.float32)
    rc = lib.rpf_resize_bilinear_f32(src, h, w, ch, out, dh, dw)
    if rc != 0:
        raise ValueError(f"rpf_resize_bilinear_f32 failed: {rc}")
    return out


def srgb_u8_to_linear(u8):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    src = np.ascontiguousarray(u8, dtype=np.uint8)
    out = np.empty(src.shape, dtype=np.float32)
    lib.rpf_srgb_u8_to_linear_f32(src, out, src.size)
    return out


def linear_to_srgb_u8(f32):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    src = np.ascontiguousarray(f32, dtype=np.float32)
    out = np.empty(src.shape, dtype=np.uint8)
    lib.rpf_linear_f32_to_srgb_u8(src, out, src.size)
    return out


def histogram_rgbl(hwc):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    src = np.ascontiguousarray(hwc, dtype=np.float32)
    h, w, ch = src.shape
    assert ch == 3
    out = np.zeros((4, 256), dtype=np.int32)
    lib.rpf_histogram_rgbl_f32(src, h, w, out)
    return out


def ljpeg_decode_scan(seg: bytes, out, frame, mcu_start: int, mcu_count: int,
                      lut_sym=None, lut_len=None):
    """Decode one lossless-JPEG restart segment into ``out`` (u16
    [rows, mcus_per_row*ncomp]); see io/ljpeg.py for the framing layer.
    ``lut_sym``/``lut_len``: concatenated peek-16 Huffman LUTs
    ([ntab << 16] u8 each), built once per frame by the caller."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if lut_sym is None or lut_len is None:
        from ..io.ljpeg import _build_huffman_lut

        luts = [
            _build_huffman_lut(frame.counts[t], frame.values[t],
                               int(frame.nvalues[t]))
            for t in range(frame.counts.shape[0])
        ]
        lut_sym = np.concatenate([s for s, _ in luts])
        lut_len = np.concatenate([l for _, l in luts])
    lut_sym = np.ascontiguousarray(lut_sym, dtype=np.uint8)
    lut_len = np.ascontiguousarray(lut_len, dtype=np.uint8)
    comp_tab = np.ascontiguousarray(frame.comp_table, dtype=np.uint8)
    rc = lib.rpf_ljpeg_decode_scan(
        seg, len(seg), out, frame.rows, frame.mcus_per_row, frame.ncomp,
        lut_sym, lut_len, comp_tab, lut_sym.size >> 16,
        frame.predictor, frame.precision, frame.point_transform,
        mcu_start, mcu_count,
    )
    if rc != 0:
        from ..io.ljpeg import LJpegError

        raise LJpegError(f"native lossless-JPEG decode failed (rc={rc})")


def ljpeg_pack_bits(vals, lens) -> bytes:
    """MSB-first bit packing of (value, nbits) entries, 1-padded to a byte
    boundary — the lossless-JPEG encoder hot loop."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.uint8)
    out = np.empty(int(lens.astype(np.int64).sum()) // 8 + 2, dtype=np.uint8)
    n = lib.rpf_ljpeg_pack_bits(vals, lens, vals.size, out)
    if n < 0:
        raise ValueError("rpf_ljpeg_pack_bits failed")
    return out[:n].tobytes()


def binarize_mask(src, threshold):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    s = np.ascontiguousarray(src, dtype=np.float32)
    out = np.empty(s.shape, dtype=np.float32)
    lib.rpf_binarize_mask_f32(s, out, s.size, float(threshold))
    return out


def jpeg_encode_ycc420(y, cb, cr, quality: int = 92) -> bytes:
    """Baseline JFIF 4:2:0 encode from planar YCbCr u8 (the export hot
    path; planes come from io/jpegenc's device-side conversion)."""
    import ctypes as _ct

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    y = np.ascontiguousarray(y, dtype=np.uint8)
    cb = np.ascontiguousarray(cb, dtype=np.uint8)
    cr = np.ascontiguousarray(cr, dtype=np.uint8)
    h, w = y.shape
    ch, cw = (h + 1) // 2, (w + 1) // 2
    if cb.shape != (ch, cw) or cr.shape != (ch, cw):
        raise ValueError(
            f"chroma planes must be ({ch}, {cw}), got {cb.shape}/{cr.shape}"
        )
    # Start at 2 bytes/pixel (noise at quality 100 measures ~1.98 B/px)
    # and grow on overflow; the absolute worst case — max-magnitude
    # coefficients everywhere plus full byte stuffing — is bounded by
    # ~10 B/px, covered by the last rung.
    out_len = _ct.c_int64(0)
    rc = 3
    for bpp in (2, 4, 10):
        cap = int(h) * int(w) * bpp + (1 << 16)
        out = np.empty(cap, dtype=np.uint8)
        rc = lib.rpf_jpeg_encode_ycc420(
            y, cb, cr, h, w, int(quality), out, cap, _ct.byref(out_len))
        if rc != 3:
            break
    if rc != 0:
        raise ValueError(f"rpf_jpeg_encode_ycc420 failed (rc={rc})")
    return out[: out_len.value].tobytes()


def jpeg_encode_sparse(counts, bitmaps, values, escapes, h: int, w: int,
                       quality: int = 92, grid=None) -> bytes:
    """Baseline JFIF 4:2:0 entropy-encode from device-sparsified
    quantized DCT coefficients (io/jpegenc.encode_jpeg's sparse path:
    per-block zigzag presence bitmaps + the nonzero values as packed
    4-bit two's-complement nibbles, low nibble first, with 0x8 escaping
    to the int16 ``escapes`` stream, DC slots carrying same-component
    deltas, all in MCU scan order — the fDCT/quantization already
    happened on the device).

    ``grid``: optional (mcu_rows, mcu_cols) of the BUCKET-PADDED grid
    the coefficient arrays cover when it exceeds the true image's
    ceil(h/16) x ceil(w/16) (bucket-stable exports); padding blocks are
    walked for stream alignment but not emitted."""
    import ctypes as _ct

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    counts = np.ascontiguousarray(counts, dtype=np.uint8)
    bitmaps = np.ascontiguousarray(bitmaps, dtype=np.uint32)
    values = np.ascontiguousarray(values, dtype=np.uint8)
    escapes = np.ascontiguousarray(escapes, dtype=np.int16)
    h, w = int(h), int(w)
    gr, gc = ((h + 15) // 16, (w + 15) // 16) if grid is None else (
        int(grid[0]), int(grid[1]))
    nblocks = gr * gc * 6
    if counts.shape != (nblocks,) or bitmaps.shape != (nblocks, 2):
        raise ValueError(
            f"expected counts ({nblocks},) and bitmaps ({nblocks}, 2) for "
            f"grid {gr}x{gc} MCUs, got {counts.shape}/{bitmaps.shape}")
    out_len = _ct.c_int64(0)
    rc = 3
    for bpp in (2, 4, 10):
        cap = h * w * bpp + (1 << 16)
        out = np.empty(cap, dtype=np.uint8)
        rc = lib.rpf_jpeg_encode_sparse(
            counts, bitmaps, values, values.size, escapes, escapes.size,
            h, w, gr, gc, int(quality), out, cap, _ct.byref(out_len))
        if rc != 3:
            break
    if rc != 0:
        raise ValueError(f"rpf_jpeg_encode_sparse failed (rc={rc})")
    return out[: out_len.value].tobytes()


def jpeg_encode_prepacked(bit_lens, words, h: int, w: int,
                          quality: int = 92, grid=None) -> bytes:
    """Assemble a JFIF stream from device-prepacked entropy bits
    (io/jpegbits.encode_prepacked_device: the TPU already Huffman-coded
    each block into an MSB-first bit string, word-aligned per block; the
    host shifts the strings onto the running bit position and stuffs
    0x00 after 0xFF).

    ``bit_lens``: u16 [nblocks] per-block bit counts over the (possibly
    bucket-padded) MCU grid, 0 for padding blocks; ``words``: u32 the
    concatenated per-block word streams in scan order. ``grid``:
    optional (mcu_rows, mcu_cols) when the arrays cover a bucket grid
    larger than ceil(h/16) x ceil(w/16)."""
    import ctypes as _ct

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    bit_lens = np.ascontiguousarray(bit_lens, dtype=np.uint16)
    words = np.ascontiguousarray(words, dtype=np.uint32)
    h, w = int(h), int(w)
    gr, gc = ((h + 15) // 16, (w + 15) // 16) if grid is None else (
        int(grid[0]), int(grid[1]))
    nblocks = gr * gc * 6
    if bit_lens.shape != (nblocks,):
        raise ValueError(
            f"expected bit_lens ({nblocks},) for grid {gr}x{gc} MCUs, "
            f"got {bit_lens.shape}")
    out_len = _ct.c_int64(0)
    # Exact-ish capacity: headers (<1 KiB) + the scan bits with worst-
    # case 0xFF stuffing (2x) + EOI; one attempt always suffices.
    cap = int(bit_lens.astype(np.int64).sum()) // 8 * 2 + (1 << 16)
    out = np.empty(cap, dtype=np.uint8)
    rc = lib.rpf_jpeg_encode_prepacked(
        bit_lens, bit_lens.size, words, words.size, h, w, int(quality),
        out, cap, _ct.byref(out_len))
    if rc != 0:
        raise ValueError(f"rpf_jpeg_encode_prepacked failed (rc={rc})")
    return out[: out_len.value].tobytes()


def jpeg_encode_packed(words, total_bits: int, h: int, w: int,
                       quality: int = 92) -> bytes:
    """Assemble a JFIF stream from the device-packed contiguous scan
    (io/jpegbits.encode_packed_device: ``words`` u32 MSB-first holds the
    ENTIRE entropy-coded scan, ``total_bits`` its exact bit length; the
    native side writes headers, 0xFF-stuffs, pads the last byte with 1s
    and appends EOI)."""
    import ctypes as _ct

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    words = np.ascontiguousarray(words, dtype=np.uint32)
    total_bits = int(total_bits)
    if words.ndim != 1 or total_bits < 0 or \
            words.size != (total_bits + 31) // 32:
        raise ValueError(
            f"packed scan mismatch: {words.size} words for "
            f"{total_bits} bits")
    out_len = _ct.c_int64(0)
    # Headers (<1 KiB) + scan with worst-case 0xFF stuffing (2x) + EOI.
    cap = total_bits // 8 * 2 + (1 << 16)
    out = np.empty(cap, dtype=np.uint8)
    rc = lib.rpf_jpeg_encode_packed(
        words, words.size, total_bits, int(h), int(w), int(quality),
        out, cap, _ct.byref(out_len))
    if rc != 0:
        raise ValueError(f"rpf_jpeg_encode_packed failed (rc={rc})")
    return out[: out_len.value].tobytes()


def hostdev_develop(planes, masks, mrow, lut_idx, luts, mats,
                    vig_strength: float):
    """Fused host develop: [3, H, W] linear f32 -> u8 HWC in one pass.

    ``masks``: f32 [M, H, W] 0/1 (None for the single-mask session);
    ``mrow``/``lut_idx``/``luts``/``mats``: the packed per-mask scalars,
    LUT row table, concatenated i32 LUT rows, and color-matrix block
    built by engine/hostdev._pack_native (which owns the semantics)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    planes = np.ascontiguousarray(planes, dtype=np.float32)
    if planes.ndim != 3 or planes.shape[0] != 3:
        raise ValueError(f"planes must be [3, H, W], got {planes.shape}")
    _, h, w = planes.shape
    mrow = np.ascontiguousarray(mrow, dtype=np.float32)
    n_masks = mrow.shape[0]
    if masks is None:
        if n_masks != 1:
            raise ValueError("masks required when more than one mask")
        marr = np.zeros(1, dtype=np.float32)
    else:
        marr = np.ascontiguousarray(masks, dtype=np.float32)
        if marr.shape != (n_masks, h, w):
            raise ValueError(
                f"masks must be ({n_masks}, {h}, {w}), got {marr.shape}")
    lut_idx = np.ascontiguousarray(lut_idx, dtype=np.int32)
    if lut_idx.shape != (n_masks, 4):
        raise ValueError(f"lut_idx must be ({n_masks}, 4), got {lut_idx.shape}")
    luts = np.ascontiguousarray(luts, dtype=np.int32)
    n_rows = int(luts.size) // 65536
    if luts.size != n_rows * 65536:
        raise ValueError("luts must be a whole number of 65536-entry rows")
    if luts.size == 0:
        luts = np.zeros(1, dtype=np.int32)
    mats = np.ascontiguousarray(mats, dtype=np.float32)
    if mats.size != 39:
        raise ValueError(f"mats must have 39 entries, got {mats.size}")
    out = np.empty((h, w, 3), dtype=np.uint8)
    rc = lib.rpf_hostdev_develop(
        planes, h, w, n_masks, marr, mrow.reshape(-1), lut_idx.reshape(-1),
        luts.reshape(-1), n_rows, mats.reshape(-1), float(vig_strength), out)
    if rc != 0:
        raise ValueError(f"rpf_hostdev_develop failed (rc={rc})")
    return out


def png_unfilter(rows: "np.ndarray", filters: "np.ndarray",
                 bpp: int) -> "np.ndarray":
    """Undo PNG row filters IN PLACE on ``rows`` [h, stride] u8 (filter
    bytes already split off into ``filters`` [h] u8); returns ``rows``.
    Raises on unknown filter types (malformed file)."""
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    filters = np.ascontiguousarray(filters, dtype=np.uint8)
    h, stride = rows.shape
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rc = lib.rpf_png_unfilter(rows, filters, h, stride, int(bpp))
    if rc != 0:
        raise ValueError(f"png_unfilter failed (code {rc})")
    return rows


def _check_planes_point(planes, point_yx):
    p = np.ascontiguousarray(planes, dtype=np.float32)
    if p.ndim != 3 or p.shape[0] != 3:
        raise ValueError(f"planes must be [3, H, W], got {p.shape}")
    py, px = int(point_yx[0]), int(point_yx[1])
    if not (0 <= py < p.shape[1] and 0 <= px < p.shape[2]):
        raise ValueError(f"point {point_yx} outside {p.shape[1:]}")
    return p, py, px


def similarity_logits(planes, point_yx, tolerance: float, sigma: float,
                      mats18):
    """OKLab similarity logits (hostdev.similarity_logits_np mirror);
    ``mats18`` = M1, M2 row-major f32[18] (engine/hostdev supplies it)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    p, py, px = _check_planes_point(planes, point_yx)
    m = np.ascontiguousarray(mats18, dtype=np.float32)
    if m.size != 18:
        raise ValueError(f"mats18 must have 18 entries, got {m.size}")
    out = np.empty(p.shape[1:], dtype=np.float32)
    rc = lib.rpf_similarity_logits(p, p.shape[1], p.shape[2], py, px,
                                   float(tolerance), float(sigma),
                                   m.reshape(-1), out)
    if rc != 0:
        raise ValueError(f"rpf_similarity_logits failed (rc={rc})")
    return out


def geodesic_logits(planes, point_yx, tolerance: float, edge_weight: float,
                    spatial_cost: float, sweeps: int, mats18):
    """Geodesic smart-select logits (hostdev.smart_logits_np mirror)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    p, py, px = _check_planes_point(planes, point_yx)
    m = np.ascontiguousarray(mats18, dtype=np.float32)
    if m.size != 18:
        raise ValueError(f"mats18 must have 18 entries, got {m.size}")
    if not 0 <= int(sweeps) <= 64:
        raise ValueError(f"sweeps must be in [0, 64], got {sweeps}")
    out = np.empty(p.shape[1:], dtype=np.float32)
    rc = lib.rpf_geodesic_logits(p, p.shape[1], p.shape[2], py, px,
                                 float(edge_weight), float(spatial_cost),
                                 int(sweeps), float(tolerance),
                                 m.reshape(-1), out)
    if rc != 0:
        raise ValueError(f"rpf_geodesic_logits failed (rc={rc})")
    return out


def warp_f32(planes, strength: float):
    """Radial lens-distortion warp over [3, H, W] f32 — bit-identical to
    engine/hostdev.warp_np (pure IEEE f32 arithmetic, same order).
    ``strength`` is the already-scaled f32(-0.5 * distortion/100)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    p = np.ascontiguousarray(planes, dtype=np.float32)
    if p.ndim != 3 or p.shape[0] != 3:
        raise ValueError(f"planes must be [3, H, W], got {p.shape}")
    out = np.empty_like(p)
    rc = lib.rpf_warp_f32(p, p.shape[1], p.shape[2], float(strength), out)
    if rc != 0:
        raise ValueError(f"rpf_warp_f32 failed (rc={rc})")
    return out


def unsharp_f32(planes, taps, amount: float):
    """Separable-Gaussian unsharp over [3, H, W] f32 — bit-identical to
    engine/hostdev.unsharp_np for the same taps."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    p = np.ascontiguousarray(planes, dtype=np.float32)
    if p.ndim != 3 or p.shape[0] != 3:
        raise ValueError(f"planes must be [3, H, W], got {p.shape}")
    t = np.ascontiguousarray(taps, dtype=np.float32)
    if t.ndim != 1 or t.size % 2 == 0 or t.size > 129:
        raise ValueError(f"taps must be odd-length 1-D (<=129), got {t.shape}")
    out = np.empty_like(p)
    rc = lib.rpf_unsharp_f32(p, p.shape[1], p.shape[2], t, t.size // 2,
                             float(amount), out)
    if rc != 0:
        raise ValueError(f"rpf_unsharp_f32 failed (rc={rc})")
    return out


def arw2_decode(payload: bytes, width: int, height: int, curve):
    """Sony ARW2 block decode -> u16 [height, width] (curve-mapped), or
    None when the native library is unavailable (caller falls back to
    the vectorized numpy decoder — the tested oracle this mirrors
    bit-for-bit, gated in tests/test_vendor_packed.py)."""
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(curve, dtype=np.uint16)
    if c.shape != (4096,):
        raise ValueError(f"curve must be u16[4096], got {c.shape}")
    out = np.empty((height, width), dtype=np.uint16)
    rc = lib.rpf_arw2_decode(bytes(payload), len(payload),
                             int(width), int(height), c, out)
    if rc != 0:
        raise ValueError(f"rpf_arw2_decode failed: {rc}")
    return out


def pana_decode_raw4(payload: bytes, width: int, height: int):
    """Panasonic RAW4 bitstream decode -> u16 [height, width], or None
    when the native library is unavailable (caller falls back to the
    Python oracle io/vendor_packed.decode_pana_raw4_py — bit-identical,
    fuzz-gated in tests/test_vendor_packed.py). Raises the callers'
    typed DngError on a truncated stream, matching the oracle."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((height, width), dtype=np.uint16)
    rc = lib.rpf_pana_decode_raw4(bytes(payload), len(payload),
                                  int(width), int(height), out)
    if rc == 4:
        from ..io.dng import DngError

        raise DngError("RAW4 bitstream truncated")
    if rc != 0:
        raise ValueError(f"rpf_pana_decode_raw4 failed: {rc}")
    return out


def cfa_block_means(t_u16, ph: int, pw: int, tile_flat, black: float,
                    span: float):
    """Per-CFA-tile channel means of a u16 block -> f32 [3, eh, ew] in
    [0, 1] (instant-preview hot loop; semantics identical to the numpy
    strided accumulation in engine/instant.quick_linear_from_raw)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    t = np.ascontiguousarray(t_u16, dtype=np.uint16)
    h, w = t.shape
    if ph <= 0 or pw <= 0 or h % ph or w % pw:
        raise ValueError(f"block {t.shape} not a multiple of tile "
                         f"({ph}, {pw})")
    eh, ew = h // ph, w // pw
    tile = np.ascontiguousarray(tile_flat, dtype=np.int32).reshape(-1)
    if tile.size != ph * pw:
        raise ValueError("tile size mismatch")
    out = np.empty((3, eh, ew), dtype=np.float32)
    rc = lib.rpf_cfa_block_means(t, eh, ew, ph, pw, tile,
                                 float(black), float(span), out)
    if rc != 0:
        raise ValueError(f"rpf_cfa_block_means failed (rc={rc})")
    return out
