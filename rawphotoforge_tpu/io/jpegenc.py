"""JPEG export fast path: device-side DCT + sparse fetch + native encoder.

The general export path (io/image_io.encode_image) fetches u8 RGB and
encodes with Pillow — 3 bytes/pixel over the device->host link. This
module moves the whole lossy half of baseline JPEG onto the device:
JFIF color conversion, 4:2:0 chroma subsampling, the 8x8 fDCT,
libjpeg-convention quantization, zigzag, per-component DC-delta, and
sparsity compaction — so the link carries only the NONZERO quantized
coefficients (packed 4-bit two's-complement nibbles with an int16
escape side stream + per-block presence bitmaps, ~0.2-0.4 B/px on
natural images vs 1.5 B/px dense YCbCr or 3 B/px u8 RGB). The native entropy coder
(native/rpf_native.cpp rpf_jpeg_encode_sparse) reconstructs blocks from
the bitmaps and emits the JFIF stream; rpf_jpeg_encode_ycc420 is the
dense host/fallback path (same headers, same tables — byte-identical
output when the coefficients agree). Reference counterpart:
image.rs:482-511 (u8 quantize + `image` crate encode).

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

# Below this pixel count encode_image keeps the u8-RGB fetch + Pillow
# path for device arrays: preview frames (MID <= ~1 MPix) would pay a
# never-prewarmed heavyweight device compile per preview bucket for a
# marginal byte saving; exports (10-45MP cameras) are far above it.
SPARSE_MIN_PIXELS = 4 << 20


def _ycc420_f32(jnp, planes):
    """Traced JFIF color convert + 4:2:0 subsample, f32 in [0, 255].

    The SINGLE definition both the dense u8 path (_to_ycc420_jit) and
    the sparse blockifier (_sparse_jit._blockify) trace through — the
    sparse-vs-dense byte-identity contract requires the two paths'
    YCC/subsample math to be bit-equal, so it must not be duplicated.
    Callers apply their own rounding/cast (values after clip(round) are
    exactly representable either way)."""
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
    return y, cb2, cr2


@functools.cache
def _to_ycc420_jit():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(planes):
        y, cb2, cr2 = _ycc420_f32(jnp, planes)

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


# ---------------------------------------------------------------------------
# Sparse-coefficient export: run the fDCT + quantization + zigzag ON DEVICE
# and ship only the nonzero quantized coefficients (per-block 64-bit
# presence bitmaps + a compacted value stream). Dense YCbCr 4:2:0 is 1.5
# B/px over the device->host link; at quality ~92 a natural photo has
# ~15-30% nonzero coefficients and >=96% of them fit a 4-bit nibble, so
# the sparse stream is ~4-6x smaller —
# and the link, not compute, bounds batch export (BASELINE config 5).
# The native entropy coder (rpf_jpeg_encode_sparse) turns the stream into
# the same JFIF layout rpf_jpeg_encode_ycc420 writes.
# ---------------------------------------------------------------------------

# Annex K.1/K.2 base quantization tables in natural (row-major) order —
# the same contract constants as native/rpf_native.cpp kQLum/kQChr.
_QLUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QCHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Zigzag position -> natural index (T.81 Figure 5 sequence).
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)


def _dct8(dtype):
    """D[u, x] = C(u)/2 * cos((2x+1) u pi / 16) — the direct T.81 fDCT
    matrix (native block_coeffs uses the identical constants)."""
    u = np.arange(8)[:, None].astype(np.float64)
    x = np.arange(8)[None, :].astype(np.float64)
    cu = np.where(u == 0, 1.0 / np.sqrt(2.0), 1.0)
    return (0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)).astype(dtype)


@functools.lru_cache(maxsize=8)
def _quant_tables(quality: int):
    """libjpeg-convention quality scaling of the Annex K tables, natural
    order (mirror of native scale_qtbl — integer arithmetic)."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality

    def t(base):
        return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)

    return t(_QLUM), t(_QCHR)


@functools.cache
def _block_stages():
    """Shared device-side block stages for BOTH coefficient wires.

    The nibble wire (_sparse_jit) and the prepacked entropy wire
    (io/jpegbits) consume the identical coefficient model — one
    blockify + DC-delta + compaction implementation keeps them
    byte-coherent by construction."""
    import types

    import jax
    import jax.numpy as jnp

    # Plain numpy constants: the namespace is functools.cached, and its
    # FIRST build may happen inside an outer jit trace (the sharded
    # batch-export step traces through st.wire) — a jnp.asarray created
    # there would be a tracer cached beyond its trace (leak). XLA bakes
    # these as program literals either way.
    D = _dct8(np.float32)
    zig = np.asarray(_ZIGZAG)

    def clamp_fill(img, th, tw):
        """Overwrite rows/cols at or beyond (th, tw) with edge replicas
        of the last true row/col (gathers; th/tw may be traced)."""
        rows = jnp.minimum(jnp.arange(img.shape[-2]), th - 1)
        cols = jnp.minimum(jnp.arange(img.shape[-1]), tw - 1)
        return jnp.take(jnp.take(img, rows, axis=-2), cols, axis=-1)

    def blockify(planes, qlum, qchr, true_hw=None):
        h, w = planes.shape[-2:]
        if true_hw is not None:
            # Luma-level fill BEFORE the chroma subsample: an odd true
            # extent's last chroma sample must average the last true
            # row/col with its own replica, as the direct path's
            # even-dim edge pad does.
            planes = clamp_fill(planes, true_hw[0], true_hw[1])
        y, cb2, cr2 = _ycc420_f32(jnp, planes)
        if true_hw is not None:
            # Chroma-level fill: the direct path MCU-pads chroma AFTER
            # subsampling (replicating the last true chroma sample —
            # which for even extents averages TWO true rows), so the
            # replica must be taken on the subsampled grid.
            th, tw = true_hw
            ch, cw = (th + 1) // 2, (tw + 1) // 2
            cb2 = clamp_fill(cb2, ch, cw)
            cr2 = clamp_fill(cr2, ch, cw)

        # Round to the u8 grid the dense path ships (stay f32; the
        # values are exactly representable), then level-shift.
        def u8f(v):
            return jnp.clip(jnp.round(v), 0.0, 255.0)

        y, cb2, cr2 = u8f(y), u8f(cb2), u8f(cr2)
        mh, mw = -(-h // 16), -(-w // 16)
        # Edge padding == the native encoder's per-pixel clamp.
        yp = jnp.pad(y, ((0, mh * 16 - h), (0, mw * 16 - w)),
                     mode="edge") - 128.0
        ch2, cw2 = cb2.shape
        cbp2 = jnp.pad(cb2, ((0, mh * 8 - ch2), (0, mw * 8 - cw2)),
                       mode="edge") - 128.0
        crp2 = jnp.pad(cr2, ((0, mh * 8 - ch2), (0, mw * 8 - cw2)),
                       mode="edge") - 128.0
        yb = (yp.reshape(mh, 2, 8, mw, 2, 8)
                .transpose(0, 3, 1, 4, 2, 5).reshape(mh * mw, 4, 8, 8))
        cbb = (cbp2.reshape(mh, 8, mw, 8)
                   .transpose(0, 2, 1, 3).reshape(mh * mw, 1, 8, 8))
        crb = (crp2.reshape(mh, 8, mw, 8)
                   .transpose(0, 2, 1, 3).reshape(mh * mw, 1, 8, 8))

        def qz(bl, q):
            n = bl.shape[0] * bl.shape[1]
            x = bl.reshape(n, 8, 8)
            # Rows then columns, like the native fdct8x8; precision
            # 'highest' keeps the 8x8 matmuls in true f32 (the MXU's
            # default bf16 inputs would flip quantized values).
            t = jnp.einsum("nyx,ux->nyu", x, D, precision="highest")
            o = jnp.einsum("nyu,vy->nvu", t, D, precision="highest")
            rq = o.reshape(n, 64) / q.astype(jnp.float32)
            # lround semantics: round half AWAY from zero (jnp.round is
            # half-to-even and would disagree with the native coder).
            qi = (jnp.sign(rq) * jnp.floor(jnp.abs(rq) + 0.5)
                  ).astype(jnp.int32)
            return qi[:, zig].reshape(bl.shape[0], bl.shape[1], 64)

        blocks = jnp.concatenate(
            [qz(yb, qlum), qz(cbb, qchr), qz(crb, qchr)], axis=1)
        return blocks.reshape(mh * mw * 6, 64)

    def dc_delta(blocks):
        """Rewrite each DC as the delta vs the previous same-component
        block in MCU scan order (the prediction the entropy coder runs
        anyway) — deltas are small on natural images, so most fit the
        one-byte value stream."""
        m = blocks.shape[0] // 6
        b3 = blocks.reshape(m, 6, 64)
        dc = b3[:, :, 0]

        def delta(seq):
            prev = jnp.concatenate(
                [jnp.zeros((1,), seq.dtype), seq[:-1]])
            return seq - prev

        dy = delta(dc[:, :4].reshape(-1)).reshape(m, 4)
        db = delta(dc[:, 4])[:, None]
        dr = delta(dc[:, 5])[:, None]
        b3 = b3.at[:, :, 0].set(jnp.concatenate([dy, db, dr], axis=1))
        return b3.reshape(m * 6, 64)

    def compact(flat, drop, dtype):
        """Stream compaction as ONE stable 1-bit key sort: kept elements
        (drop == 0) sink to the front preserving order, dropped ones to
        the back. 35x faster than the searchsorted + gather formulation
        on TPU (measured 0.19 s vs 6.6 s at 36M lanes): lax.sort is
        HBM-bandwidth-shaped, while a 36M-wide random gather serializes.
        Scatters are even worse (CLAUDE.md) — never reach for them.
        Being bandwidth-shaped also means WIDTH matters: the key is i8
        and callers pass narrow payloads (i16 coefficients, u32 words),
        minimizing the bytes the sort moves vs the original i32/i32
        formulation."""
        _, out = jax.lax.sort_key_val(drop.astype(jnp.int8), flat,
                                      dimension=0, is_stable=True)
        return out.astype(dtype)

    return types.SimpleNamespace(blockify=blockify, dc_delta=dc_delta,
                                 compact=compact, clamp_fill=clamp_fill)


def _band_layout(nblocks: int):
    """Fixed pre-split band boundaries for the three sparse streams.

    (bitmap_bounds u32-elements, value_bounds u8-elements, escape_bounds
    i16-elements) — shared by the trace-time output split in
    ``full_banded`` and the fetch-time reassembly in
    ``_encode_sparse_device``/bench accounting. Escapes use coarser bands:
    the stream is usually tiny (the lead ladder covers it) and its 72 MB
    capacity at 24MP would otherwise mint ~20 output buffers."""
    from ..utils.transfer import banded_bounds

    ncap = nblocks * 64
    return (banded_bounds(nblocks * 2, 4),
            banded_bounds(ncap // 2, 1),
            banded_bounds(ncap, 2, band_bytes=8 << 20))


class _SparseJit(tuple):
    """4-tuple of the classic stages + banded attributes (callers that
    unpack positionally keep working; banded consumers use attributes)."""

    def __new__(cls, full, blockify, sparsify, full_extent,
                full_banded, full_extent_banded):
        self = super().__new__(cls, (full, blockify, sparsify, full_extent))
        return self

    def __init__(self, full, blockify, sparsify, full_extent,
                 full_banded, full_extent_banded):
        self.full_banded = full_banded
        self.full_extent_banded = full_extent_banded


@functools.cache
def _sparse_jit():
    """(full, blockify, sparsify, full_extent) jitted stages.

    full(planes, qlum, qchr) -> (counts u8 [N], bitmaps u32 [N, 2],
    values u8 [N*32] packed nibbles zero-padded, escapes i16 [N*64]
    zero-padded, totals i32 [2] = (n_values, n_escapes) where n_values
    COUNTS COEFFICIENTS (the packed byte prefix is (n_values+1)//2)):
    N blocks in MCU scan order (per MCU: Y tl/tr/bl/br, Cb, Cr), each
    as a nonzero-presence bitmap over zigzag positions plus its nonzero
    values packed to the front; the DC slot carries the delta against
    the previous same-component block, `values` is the cross-block
    compaction as 4-bit two's-complement nibbles (low nibble first)
    with 0x8 escaping to the int16 side stream (native
    rpf_jpeg_encode_sparse owns the wire contract). blockify (raw
    quantized blocks, no DC delta) and sparsify (compaction only) are
    exposed for tests.

    full_extent(planes, qlum, qchr, th, tw) is ``full`` for BUCKET-PADDED
    renders whose true extent (th, tw) is a TRACED scalar pair (one
    compile per bucket, never per extent): the pad region is overwritten
    with clamp-gather edge replication — at luma level BEFORE the 4:2:0
    subsample and again at chroma level after it — which reproduces
    exactly the per-component MCU edge pad the direct path applies, so
    boundary blocks of a padded render encode byte-identically to a
    direct encode of the true extent no matter what the caller's pad
    rows contain (the editor's bucket renders carry developed
    reflect-pad content there, not edge replicas)."""
    import jax
    import jax.numpy as jnp

    st = _block_stages()
    _blockify, _dc_delta, _compact = st.blockify, st.dc_delta, st.compact
    # numpy, not jnp: same trace-safety rule as _block_stages' constants.
    wlo = np.array(
        [(1 << i) if i < 32 else 0 for i in range(64)], dtype=np.uint32)
    whi = np.array(
        [(1 << (i - 32)) if i >= 32 else 0 for i in range(64)],
        dtype=np.uint32)

    def _sparsify(blocks):
        nz = blocks != 0
        counts = nz.sum(axis=1, dtype=jnp.int32)
        nzu = nz.astype(jnp.uint32)
        bitmaps = jnp.stack([(nzu * wlo).sum(axis=1, dtype=jnp.uint32),
                             (nzu * whi).sum(axis=1, dtype=jnp.uint32)],
                            axis=1)
        # The flat zigzag stream compacted in (block, zigzag) order IS
        # the wire order: per-block front-packing and the cross-block
        # concatenation collapse into one stable compaction.
        total = counts.sum(dtype=jnp.int32)
        ncap = blocks.shape[0] * 64
        j = jnp.arange(ncap, dtype=jnp.int32)
        vals = _compact(blocks.reshape(-1).astype(jnp.int16),
                        ~nz.reshape(-1), jnp.int16)
        vals16 = jnp.where(j < total, vals, 0)
        # 4-bit wire stream: two's-complement nibbles cover [-7, 7]
        # (>=96% of quantized coefficients on natural images at q92),
        # the 0x8 code (-8) escapes to the int16 side channel — ~0.5 B
        # per coefficient where the previous int8 format paid 1 B.
        # Lanes >= total are zeroed above, so the final half-used byte
        # and the padded tail are deterministic zeros.
        esc = (vals16 > 7) | (vals16 < -7)
        nib = jnp.where(esc, jnp.int16(8), vals16 & jnp.int16(15))
        nib2 = nib.astype(jnp.uint8).reshape(ncap // 2, 2)
        packed = (nib2[:, 0] | (nib2[:, 1] << 4)).astype(jnp.uint8)
        n_esc = esc.sum(dtype=jnp.int32)
        escapes = jnp.where(j < n_esc,
                            _compact(vals16, ~esc, jnp.int16), 0)
        totals = jnp.stack([total, n_esc])
        return counts.astype(jnp.uint8), bitmaps, packed, escapes, totals

    @jax.jit
    def full(planes, qlum, qchr):
        return _sparsify(_dc_delta(_blockify(planes, qlum, qchr)))

    @jax.jit
    def full_extent(planes, qlum, qchr, th, tw):
        # th/tw are traced 0-d ints: every extent inside a bucket shares
        # one compiled program (extent-keyed programs cost 10-400 s
        # remote compiles each, CLAUDE.md).
        return _sparsify(_dc_delta(_blockify(planes, qlum, qchr,
                                             (th, tw))))

    @jax.jit
    def blockify(planes, qlum, qchr):
        return _blockify(planes, qlum, qchr)

    @jax.jit
    def sparsify(blocks):
        return _sparsify(blocks)

    def _split_banded(out):
        """Split the stream outputs at the fixed band boundaries INSIDE
        the compiled program: each band becomes its own device buffer,
        so the consumer's prefix fetch is whole-buffer transfers with no
        slice program queueing behind the next image's compute. The
        counts stream is dropped entirely (the host popcounts the
        bitmaps)."""
        counts, bitmaps, packed, escapes, totals = out
        bmb, vb, eb = _band_layout(counts.shape[0])

        def sp(flat, bounds):
            return tuple(flat[a:b] for a, b in zip(bounds, bounds[1:]))

        return (sp(bitmaps.reshape(-1), bmb), sp(packed, vb),
                sp(escapes, eb), totals)

    @jax.jit
    def full_banded(planes, qlum, qchr):
        return _split_banded(
            _sparsify(_dc_delta(_blockify(planes, qlum, qchr))))

    @jax.jit
    def full_extent_banded(planes, qlum, qchr, th, tw):
        return _split_banded(
            _sparsify(_dc_delta(_blockify(planes, qlum, qchr, (th, tw)))))

    return _SparseJit(full, blockify, sparsify, full_extent,
                      full_banded, full_extent_banded)


def _blocks_np(planes: np.ndarray, quality: int) -> np.ndarray:
    """Float64 oracle of the device DCT/quant stage: [N, 64] i32 blocks
    in the same MCU scan order (tests compare the f32 device output
    against this within +-1)."""
    y, cb, cr = _to_ycc420_np(planes)
    qlum, qchr = _quant_tables(quality)
    d = _dct8(np.float64)
    h, w = y.shape
    mh, mw = -(-h // 16), -(-w // 16)

    def blocks_of(plane, grid_h, grid_w, q):
        p = plane.astype(np.float64)
        p = np.pad(p, ((0, grid_h - p.shape[0]), (0, grid_w - p.shape[1])),
                   mode="edge") - 128.0
        nbh, nbw = grid_h // 8, grid_w // 8
        bl = p.reshape(nbh, 8, nbw, 8).transpose(0, 2, 1, 3)
        t = np.einsum("abyx,ux->abyu", bl, d)
        o = np.einsum("abyu,vy->abvu", t, d)
        rq = o.reshape(nbh, nbw, 64) / q.astype(np.float64)
        qi = (np.sign(rq) * np.floor(np.abs(rq) + 0.5)).astype(np.int32)
        return qi[:, :, _ZIGZAG]

    yb = blocks_of(y, mh * 16, mw * 16, qlum)
    # [2mh, 2mw, 64] -> per-MCU (tl, tr, bl, br)
    yb = (yb.reshape(mh, 2, mw, 2, 64).transpose(0, 2, 1, 3, 4)
            .reshape(mh * mw, 4, 64))
    cbb = blocks_of(cb, mh * 8, mw * 8, qchr).reshape(mh * mw, 1, 64)
    crb = blocks_of(cr, mh * 8, mw * 8, qchr).reshape(mh * mw, 1, 64)
    return np.concatenate([yb, cbb, crb], axis=1).reshape(mh * mw * 6, 64)


def _dc_delta_np(blocks: np.ndarray) -> np.ndarray:
    """Exact integer mirror of the device DC-delta stage."""
    blocks = np.asarray(blocks, dtype=np.int32).copy()
    m = blocks.shape[0] // 6
    b3 = blocks.reshape(m, 6, 64)
    dc = b3[:, :, 0].copy()

    def delta(seq):
        out = seq.copy()
        out[1:] -= seq[:-1]
        return out

    b3[:, :, 0] = np.concatenate(
        [delta(dc[:, :4].reshape(-1)).reshape(m, 4),
         delta(dc[:, 4])[:, None], delta(dc[:, 5])[:, None]], axis=1)
    return b3.reshape(m * 6, 64)


def _sparsify_np(blocks: np.ndarray):
    """Exact integer mirror of the device sparsify stage (row-major
    boolean indexing IS the block-then-ascending-zigzag order).
    Returns (counts u8, bitmaps u32 [N,2], packed-nibble values u8,
    escapes i16, n_values, n_escapes) with values/escapes already
    trimmed to their true lengths (values to (n_values+1)//2 bytes, the
    odd-tail high nibble zero like the device's zeroed padding lanes)."""
    blocks = np.asarray(blocks, dtype=np.int32)
    nz = blocks != 0
    counts = nz.sum(axis=1)
    w32 = (np.uint64(1) << np.arange(32, dtype=np.uint64))
    lo = (nz[:, :32] * w32).sum(axis=1).astype(np.uint32)
    hi = (nz[:, 32:] * w32).sum(axis=1).astype(np.uint32)
    vals16 = blocks[nz].astype(np.int16)
    esc = (vals16 > 7) | (vals16 < -7)
    nib = np.where(esc, 8, vals16 & 15).astype(np.uint8)
    if nib.size % 2:
        nib = np.concatenate([nib, np.zeros(1, np.uint8)])
    packed = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
    return (counts.astype(np.uint8), np.stack([lo, hi], axis=1),
            packed, vals16[esc], int(counts.sum()), int(esc.sum()))


# byte -> set-bit count, for deriving per-block counts from bitmaps on
# the host (the counts stream itself never crosses the link).
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                      axis=1).sum(axis=1).astype(np.uint8)


def _popcount_rows(bitmaps: np.ndarray) -> np.ndarray:
    """Per-row popcount of [N, 2] u32 presence bitmaps -> u8 [N]."""
    b = np.ascontiguousarray(bitmaps, dtype=np.uint32)
    return _POP8[b.view(np.uint8).reshape(b.shape[0], 8)].sum(
        axis=1, dtype=np.uint8)


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


_sparse_fallback_warned: set = set()

# Export compile bucket — mirrors engine/editor.SHAPE_BUCKET (not imported:
# io must not depend on engine). encode_jpeg pads device inputs up to
# multiples of this so the expensive sparse program (DCT + sorts +
# searchsorted compactions) is keyed on bucket shapes and compiles once
# per bucket, not once per image extent; only a trivial edge-pad program
# keys on the extent. Any multiple of 16 keeps the MCU grid exact.
_EXPORT_BUCKET = 128


def _encode_sparse_device(planes, quality: int, stage=None,
                          true_shape=None) -> bytes:
    """Device-side fDCT/quantize/sparsify -> banded fetch of the nonzero
    coefficient stream -> native entropy coder. The link carries the
    per-block bitmaps/counts (~0.23 B/px) plus ~0.5 B per nonzero
    coefficient (packed nibbles) instead of 1.5 B/px of dense YCbCr.

    ``true_shape``: (h, w) of the real image when ``planes`` is a
    bucket-padded render — the value stream is fetched only up to the
    last true-image block (host-computed from the fetched counts), and
    the native coder walks the padded grid while emitting only
    true-image blocks."""
    import jax.numpy as jnp

    from .. import native
    from ..utils.transfer import fetch_banded

    stage = stage or (lambda _name: None)
    _, ph, pw = planes.shape
    h, w = (ph, pw) if true_shape is None else (
        int(true_shape[0]), int(true_shape[1]))
    if true_shape is not None:
        if ph % 16 or pw % 16:
            raise ValueError(
                f"padded planes must be MCU-aligned (multiples of 16), "
                f"got {ph}x{pw}")
        if h > ph or w > pw:
            raise ValueError(
                f"true_shape {h}x{w} exceeds planes {ph}x{pw}")
    padded = (h, w) != (ph, pw)
    stages = _sparse_jit()
    qlum, qchr = _quant_tables(quality)
    if padded:
        # The extent-aware program edge-fills the pad region (luma- and
        # chroma-level clamp gathers) so boundary blocks match a direct
        # encode of the true extent byte-for-byte, whatever the caller's
        # pad rows contain — and right-edge pad blocks compact to almost
        # nothing, trimming the value prefix that crosses the link.
        bm_bands, val_bands, esc_bands, totals = stages.full_extent_banded(
            planes, jnp.asarray(qlum), jnp.asarray(qchr), h, w)
    else:
        bm_bands, val_bands, esc_bands, totals = stages.full_banded(
            planes, jnp.asarray(qlum), jnp.asarray(qchr))
    stage("fetch")
    # The streams arrive pre-split at fixed band boundaries (separate
    # device buffers, sliced inside the compiled program): each fetch
    # below is a whole-buffer transfer — no slice program runs on the
    # device, so a pipelining caller may already have the NEXT image's
    # compute dispatched without the transfers queueing behind it.
    nblocks = -(-ph // 16) * (-(-pw // 16)) * 6
    bmb, vb, eb = _band_layout(nblocks)
    n, n_esc = (int(v) for v in np.asarray(totals))
    from concurrent.futures import ThreadPoolExecutor

    grid = None
    with ThreadPoolExecutor(3) as pool:
        fb = pool.submit(fetch_banded, bm_bands, bmb, nblocks * 2)
        fe = pool.submit(fetch_banded, esc_bands, eb, n_esc)
        fv = None
        if not padded:
            # n counts coefficients; the packed-nibble wire is 2/byte.
            fv = pool.submit(fetch_banded, val_bands, vb, (n + 1) // 2)
        host_bitmaps = fb.result().reshape(nblocks, 2)
        # The counts stream never crosses the link: host-side popcount
        # of the bitmaps reproduces it (1 B/block saved + one fewer
        # fetch stream; the native coder's counts==popcount check
        # becomes self-consistent, but the coder still validates value
        # lengths and Huffman size categories against the streams).
        host_counts = _popcount_rows(host_bitmaps)
        if padded:
            # The value prefix ends at the last true-image block; the
            # trailing padding rows' values never cross the link.
            grid = (ph // 16, pw // 16)
            mcu_r, mcu_c = -(-h // 16), -(-w // 16)
            last = ((mcu_r - 1) * grid[1] + (mcu_c - 1)) * 6 + 5
            n = int(host_counts[: last + 1].astype(np.int64).sum())
            host_vals = fetch_banded(val_bands, vb, (n + 1) // 2)
        else:
            host_vals = fv.result()
        host_esc = fe.result()
    stage("encode")
    return native.jpeg_encode_sparse(
        host_counts, host_bitmaps, host_vals, host_esc, h, w,
        quality=quality, grid=grid)


def encode_jpeg(planes, quality: int = 92, exif_bytes: bytes | None = None,
                sparse: bool | None = None, on_stage=None,
                true_shape=None) -> bytes:
    """sRGB-encoded f32 [3,H,W] in [0,1] -> baseline JFIF bytes.

    Device inputs run the whole DCT/quantization AND entropy coding on
    device and fetch prepacked Huffman bit streams (io/jpegbits; the
    nibble-coefficient wire is the fallback — ``sparse``; default on,
    pass False for the dense YCbCr 4:2:0 fetch, 1.5 B/px); np inputs
    use the host math.
    Falls back to the Pillow path when the native library is
    unavailable. An ``exif_bytes`` payload (raw blob or
    io/image_io.build_exif_bytes output) is spliced in as the APP1
    segment.

    BUCKET STABILITY: device inputs whose extent is not a multiple of
    _EXPORT_BUCKET are edge-padded on device first, so the expensive
    sparse program compiles once per bucket shape, never per image
    extent (only a trivial pad program keys on the extent — remote
    compiles are 10-400 s, CLAUDE.md). Callers that already hold a
    bucket-padded render (engine/editor.apply_padded) pass it with
    ``true_shape`` = the real extent and skip even that.
    """
    from .. import native
    from ..utils.transfer import _is_device_array, fetch_np

    stage = on_stage or (lambda _name: None)
    if sparse and not (native.available() and _is_device_array(planes)):
        # An explicit sparse request that can't be satisfied must fail
        # loudly, not silently hand back dense-path bytes.
        raise RuntimeError(
            "sparse JPEG export requires a device array and the native "
            "library; got "
            + ("host array" if not _is_device_array(planes)
               else "no native library"))
    if not native.available():
        from .image_io import encode_image

        if true_shape is not None:
            h, w = int(true_shape[0]), int(true_shape[1])
            planes = planes[:, :h, :w]
        return encode_image(planes, "JPEG", quality=quality,
                            exif_bytes=exif_bytes, on_stage=on_stage)
    body = None
    if _is_device_array(planes):
        _, ph, pw = planes.shape
        if true_shape is None and (ph % _EXPORT_BUCKET
                                   or pw % _EXPORT_BUCKET):
            import jax.numpy as jnp

            planes = jnp.pad(
                planes,
                ((0, 0), (0, (-ph) % _EXPORT_BUCKET),
                 (0, (-pw) % _EXPORT_BUCKET)), mode="edge")
            true_shape = (ph, pw)
        if sparse or sparse is None:
            # Wire order: packed first (the TPU emits the FINISHED
            # contiguous scan — the link carries exactly the entropy-
            # coded bytes, no per-block lengths or word alignment),
            # prepacked second (per-block bit strings; no aggregate
            # capacity limit, so it absorbs packed-capacity overflows
            # on pathologically dense content), nibble last. All three
            # produce byte-identical files, so degrading is invisible
            # in the output, which is why the first fallback per wire
            # is logged.
            from . import jpegbits

            for enc, label in ((jpegbits.encode_packed_device,
                                "packed"),
                               (jpegbits.encode_prepacked_device,
                                "prepacked"),
                               (_encode_sparse_device, "nibble")):
                try:
                    body = enc(planes, quality, stage,
                               true_shape=true_shape)
                    break
                except Exception:
                    if sparse and label == "nibble":
                        # explicit request: surface the failure
                        raise
                    # log the first degradation per wire — a silently-
                    # degraded export path would reintroduce slower
                    # fetches unnoticed.
                    global _sparse_fallback_warned
                    if label not in _sparse_fallback_warned:
                        _sparse_fallback_warned.add(label)
                        import sys
                        import traceback

                        print(f"{label} JPEG export wire failed; falling "
                              "back:\n" + traceback.format_exc(limit=3),
                              file=sys.stderr)
        if body is None:
            y, cb, cr = _to_ycc420_jit()(planes)
            from concurrent.futures import ThreadPoolExecutor

            stage("fetch")
            with ThreadPoolExecutor(2) as pool:
                fcb = pool.submit(fetch_np, cb)
                fcr = pool.submit(fetch_np, cr)
                y = fetch_np(y)
                cb, cr = fcb.result(), fcr.result()
            stage("encode")
            if true_shape is not None:
                # Padded render: slice the fetched planes back to the
                # true extent on the host (free next to the fetch).
                h, w = int(true_shape[0]), int(true_shape[1])
                y = y[:h, :w]
                cb = cb[: (h + 1) // 2, : (w + 1) // 2]
                cr = cr[: (h + 1) // 2, : (w + 1) // 2]
            body = native.jpeg_encode_ycc420(y, cb, cr, quality=quality)
    else:
        if true_shape is not None:
            h, w = int(true_shape[0]), int(true_shape[1])
            planes = np.asarray(planes)[:, :h, :w]
        y, cb, cr = _to_ycc420_np(planes)
        stage("encode")
        body = native.jpeg_encode_ycc420(y, cb, cr, quality=quality)
    if exif_bytes:
        body = _splice_app1(body, exif_bytes)
    return body
