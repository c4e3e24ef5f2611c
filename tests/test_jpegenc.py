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
    b_dev = jpegenc.encode_jpeg(jnp.asarray(planes), quality=90,
                                sparse=False)
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


# ---------------------------------------------------------------------------
# Sparse-coefficient export path: device fDCT/quantize/sparsify + the
# native from-sparse entropy coder (rpf_jpeg_encode_sparse).
# ---------------------------------------------------------------------------


def _synth_blocks(nblocks, seed=0):
    """Synthetic quantized-coefficient blocks exercising every entropy
    case: all-zero blocks (EOB-only), a lone high-zigzag coefficient
    (ZRL chains), dense blocks, and magnitudes up to the baseline size
    limits (|DC| <= 1016 keeps every DC diff within 11 bits)."""
    rng = np.random.default_rng(seed)
    blocks = np.zeros((nblocks, 64), dtype=np.int32)
    for i in range(nblocks):
        kind = i % 5
        if kind == 0:
            continue  # all-zero: DC diff 0 + EOB
        if kind == 1:
            blocks[i, 63] = int(rng.integers(1, 100))  # 62-zero run: 3 ZRLs
            blocks[i, 0] = int(rng.integers(-1016, 1017))
            continue
        n = int(rng.integers(1, 64))
        pos = rng.choice(64, size=n, replace=False)
        blocks[i, pos] = rng.integers(-1023, 1024, size=n)
        blocks[i, 0] = int(rng.integers(-1016, 1017))
    return blocks


def test_sparsify_device_equals_np_mirror():
    blocks = _synth_blocks(60, seed=1)
    _, _, sparsify, _ = jpegenc._sparse_jit()
    dc, db, dv, de, dt = map(np.asarray, sparsify(jnp.asarray(blocks)))
    nc, nb, nv, ne, nt, net = jpegenc._sparsify_np(blocks)
    assert [int(x) for x in dt] == [nt, net]
    np.testing.assert_array_equal(dc, nc)
    np.testing.assert_array_equal(db, nb)
    # nt counts coefficients; the packed-nibble wire is 2 per byte
    np.testing.assert_array_equal(dv[: (nt + 1) // 2], nv)
    np.testing.assert_array_equal(de[:net], ne)
    assert not dv[(nt + 1) // 2:].any() and not de[net:].any()


def test_nibble_wire_boundaries_round_trip():
    """The 4-bit wire's edges, pinned exactly: +-7 ride the nibble
    stream, -8 (colliding with the 0x8 escape code) and +-8 escape to
    i16, an ODD total leaves the final byte's high nibble zero, and the
    native coder reconstructs every value bit-exactly (checked through
    a PIL decode of a luma-only stream against the dequantized IDCT)."""
    blocks = np.zeros((6, 64), dtype=np.int32)
    # 5 coefficients -> odd total: packed stream is 3 bytes.
    blocks[0, [0, 1, 2, 3, 4]] = [7, -7, 8, -8, 1]
    counts, bitmaps, packed, esc, nv, ne = jpegenc._sparsify_np(blocks)
    assert nv == 5 and ne == 2
    assert list(esc) == [8, -8]
    assert packed.shape == (3,)
    assert packed[0] == (7 | ((-7 & 15) << 4))       # 7, -7
    assert packed[1] == (8 | (8 << 4))               # two escape codes
    assert packed[2] == 1                            # odd tail: high nibble 0
    # device mirror agrees bit-for-bit
    _, _, sparsify, _ = jpegenc._sparse_jit()
    dv = [np.asarray(x) for x in sparsify(jnp.asarray(blocks))]
    np.testing.assert_array_equal(dv[2][:3], packed)
    np.testing.assert_array_equal(dv[3][:2], esc)
    assert [int(x) for x in dv[4]] == [5, 2]
    # and the native coder reconstructs the boundary values bit-exactly:
    # decode the stream with PIL and compare the luma block against the
    # f64 dequantize+IDCT oracle (a sign-extension bug at +-7/+-8 would
    # shift these pixels far beyond the +-2 bound).
    data = native.jpeg_encode_sparse(counts, bitmaps, packed, esc, 16, 16,
                                     quality=92)
    assert data.startswith(b"\xff\xd8") and data.endswith(b"\xff\xd9")
    dec = _decode(data)
    qlum, _ = jpegenc._quant_tables(92)
    d = jpegenc._dct8(np.float64)
    inv = np.argsort(jpegenc._ZIGZAG)
    zz = blocks[0].astype(np.float64)
    px = np.clip(np.round(d.T @ (zz[inv] * qlum).reshape(8, 8) @ d + 128.0),
                 0, 255)
    assert np.abs(dec[:8, :8, 1].astype(np.float64) - px).max() <= 2


def test_full_device_equals_composed_np_mirror():
    """full() == sparsify_np(dc_delta_np(blockify())) seeded from the
    DEVICE blockify output — exact integer equality of the delta +
    compaction stages end-to-end (no f32-vs-f64 DCT noise in the way)."""
    planes = _planes(40, 56, kind="noise", seed=2)
    full, blockify, _, _ = jpegenc._sparse_jit()
    qlum, qchr = jpegenc._quant_tables(92)
    ql, qc = jnp.asarray(qlum), jnp.asarray(qchr)
    blocks = np.asarray(blockify(jnp.asarray(planes), ql, qc))
    ref = jpegenc._sparsify_np(jpegenc._dc_delta_np(blocks))
    dev = [np.asarray(x) for x in full(jnp.asarray(planes), ql, qc)]
    np.testing.assert_array_equal(dev[0], ref[0])
    np.testing.assert_array_equal(dev[1], ref[1])
    np.testing.assert_array_equal(dev[2][: (ref[4] + 1) // 2], ref[2])
    np.testing.assert_array_equal(dev[3][: ref[5]], ref[3])
    assert [int(x) for x in dev[4]] == [ref[4], ref[5]]
    # the delta stage leaves AC slots untouched and is the per-component
    # MCU-order difference on the DC slot
    deltas = jpegenc._dc_delta_np(blocks)
    np.testing.assert_array_equal(deltas[:, 1:], blocks[:, 1:])
    m = blocks.shape[0] // 6
    ys = blocks.reshape(m, 6, 64)[:, :4, 0].reshape(-1)
    dy = deltas.reshape(m, 6, 64)[:, :4, 0].reshape(-1)
    assert dy[0] == ys[0]
    np.testing.assert_array_equal(dy[1:], np.diff(ys))


def test_device_blocks_track_f64_oracle():
    planes = _planes(48, 64, kind="noise", seed=7)
    _, blockify, _, _ = jpegenc._sparse_jit()
    qlum, qchr = jpegenc._quant_tables(92)
    dev = np.asarray(blockify(jnp.asarray(planes), jnp.asarray(qlum),
                              jnp.asarray(qchr)))
    ora = jpegenc._blocks_np(planes, 92)
    diff = dev != ora
    # f32-vs-f64 DCT: only quantization-boundary straddles may flip,
    # and only ever by one step.
    assert np.abs(dev - ora)[diff].max(initial=0) <= 1
    assert diff.mean() < 0.005, diff.mean()


def test_sparse_bitstream_identical_on_blockwise_constant_gray():
    """Gray 16x16-constant tiles make every DCT exact (AC == 0, DC a
    clean multiple), so the dense C encoder, the f64 numpy oracle, and
    the f32 device path must all produce the SAME coefficients — and the
    sparse entropy coder must then emit a byte-identical stream to the
    dense one (same headers, same Huffman walk, same DC prediction)."""
    rng = np.random.default_rng(5)
    tiles = rng.choice(np.arange(0, 256, 16), size=(3, 4))
    gray = np.kron(tiles, np.ones((16, 16))).astype(np.float32) / 255.0
    planes = np.stack([gray, gray, gray])
    y, cb, cr = jpegenc._to_ycc420_np(planes)
    dense = native.jpeg_encode_ycc420(y, cb, cr, quality=92)

    h, w = gray.shape
    blocks = jpegenc._blocks_np(planes, 92)
    counts, bitmaps, vals, esc, _, n_esc = jpegenc._sparsify_np(
        jpegenc._dc_delta_np(blocks))
    assert n_esc > 0  # 16-step tiles make some DC deltas escape the i8
    from_oracle = native.jpeg_encode_sparse(counts, bitmaps, vals, esc,
                                            h, w, quality=92)
    assert from_oracle == dense

    full, _, _, _ = jpegenc._sparse_jit()
    qlum, qchr = jpegenc._quant_tables(92)
    dc_, db_, dv_, de_, dt_ = full(jnp.asarray(planes), jnp.asarray(qlum),
                                   jnp.asarray(qchr))
    nv, ne = (int(x) for x in np.asarray(dt_))
    from_device = native.jpeg_encode_sparse(
        np.asarray(dc_), np.asarray(db_), np.asarray(dv_)[: (nv + 1) // 2],
        np.asarray(de_)[:ne], h, w, quality=92)
    assert from_device == dense


def test_sparse_entropy_coder_vs_pil_luma_reconstruction():
    """Feed crafted coefficient blocks straight to the entropy coder and
    check PIL's decode against a float64 dequantize+IDCT oracle — an
    independent end-to-end check of bitmap reconstruction, DC
    prediction, ZRL/EOB runs, and byte stuffing. Chroma blocks are zero
    (flat Cb=Cr=128) so subsampling upscale can't blur the comparison."""
    mh, mw = 3, 4
    h, w = mh * 16, mw * 16
    nmcu = mh * mw
    rng = np.random.default_rng(11)
    blocks = np.zeros((nmcu * 6, 64), dtype=np.int32)
    qlum, _ = jpegenc._quant_tables(92)
    for mcu in range(nmcu):
        for blk in range(4):  # luma only
            i = mcu * 6 + blk
            kind = i % 4
            if kind == 0:
                blocks[i, 0] = int(rng.integers(-300, 301))
            elif kind == 1:
                blocks[i, [0, 63]] = [int(rng.integers(-300, 301)), 7]
            else:
                n = int(rng.integers(1, 20))
                pos = rng.choice(63, size=n, replace=False) + 1
                # keep |dequantized AC| modest so pixels stay in range
                blocks[i, pos] = rng.integers(-8, 9, size=n)
                blocks[i, 0] = int(rng.integers(-300, 301))
    counts, bitmaps, vals, esc, _, _ = jpegenc._sparsify_np(
        jpegenc._dc_delta_np(blocks))
    data = native.jpeg_encode_sparse(counts, bitmaps, vals, esc, h, w,
                                     quality=92)
    dec = _decode(data)
    assert dec.shape == (h, w, 3)

    # f64 oracle: inverse zigzag -> dequantize -> IDCT -> +128.
    d = jpegenc._dct8(np.float64)
    inv = np.argsort(jpegenc._ZIGZAG)
    recon = np.zeros((h, w))
    for mcu in range(nmcu):
        my, mx = divmod(mcu, mw)
        for blk in range(4):
            dy, dx = divmod(blk, 2)
            zz = blocks[mcu * 6 + blk].astype(np.float64)
            coef = (zz[inv] * qlum).reshape(8, 8)
            px = d.T @ coef @ d + 128.0
            recon[my * 16 + dy * 8: my * 16 + dy * 8 + 8,
                  mx * 16 + dx * 8: mx * 16 + dx * 8 + 8] = px
    recon = np.clip(np.round(recon), 0, 255)
    # Luma-only stream: decoded RGB is gray; compare the green channel.
    assert np.abs(dec[:, :, 1].astype(np.float64) - recon).max() <= 2


@pytest.mark.parametrize("h,w", [(64, 96), (33, 47), (17, 23), (8, 8)])
def test_sparse_end_to_end_tracks_dense(h, w):
    planes = _planes(h, w, kind="noise", seed=h * 100 + w)
    src_u8 = (np.clip(planes, 0, 1) * 255.0).astype(np.uint8)
    b_sparse = jpegenc.encode_jpeg(jnp.asarray(planes), quality=92,
                                   sparse=True)
    b_dense = jpegenc.encode_jpeg(planes, quality=92)
    d_sparse = _decode(b_sparse)
    assert d_sparse.shape == (h, w, 3)
    # Same quality, same tables; only f32-vs-C-f32 DCT boundary flips
    # separate the two streams.
    sp = _psnr(d_sparse.transpose(2, 0, 1), src_u8)
    dn = _psnr(_decode(b_dense).transpose(2, 0, 1), src_u8)
    assert sp > dn - 1.0, (sp, dn)
    assert b_sparse.startswith(b"\xff\xd8") and b_sparse.endswith(b"\xff\xd9")


def test_sparse_rejects_malformed_wire_data():
    blocks = _synth_blocks(12, seed=3)[:6]  # one 16x16 MCU -> 6 blocks
    counts, bitmaps, vals, esc, nv, ne = jpegenc._sparsify_np(
        jpegenc._dc_delta_np(blocks))
    h = w = 16
    assert ne > 0  # the synthetic blocks exercise the escape stream
    # the valid wire data round-trips first (guards the fixtures)
    ok = native.jpeg_encode_sparse(counts, bitmaps, vals, esc, h, w,
                                   quality=92)
    assert ok.startswith(b"\xff\xd8")
    # counts/popcount mismatch
    bad = counts.copy()
    bad[0] += 1
    with pytest.raises(ValueError):
        native.jpeg_encode_sparse(bad, bitmaps, vals, esc, h, w, quality=92)
    # an escaped AC value outside the 10-bit baseline size category
    esc_bad = esc.copy()
    esc_bad[-1] = 32000
    with pytest.raises(ValueError):
        native.jpeg_encode_sparse(counts, bitmaps, vals, esc_bad, h, w,
                                  quality=92)
    # a truncated escape stream
    with pytest.raises(ValueError):
        native.jpeg_encode_sparse(counts, bitmaps, vals, esc[:-1], h, w,
                                  quality=92)
    # wrong geometry
    with pytest.raises(ValueError):
        native.jpeg_encode_sparse(counts, bitmaps, vals, esc, 64, 64,
                                  quality=92)
    # a corrupted bitmap fetch with host-derived counts (production no
    # longer fetches counts): clearing set bits keeps counts==popcount
    # self-consistent, but the walk then under-consumes the value
    # stream and the end-of-walk exhaustion check must fire. Two bits
    # cleared so the check catches it at either total parity.
    bm_bad = bitmaps.copy()
    cnt_bad = counts.copy()
    cleared = 0
    for b in range(bm_bad.shape[0]):
        for word in (0, 1):
            if cleared < 2 and bm_bad[b, word]:
                bit = bm_bad[b, word] & (~bm_bad[b, word] + 1)  # lowest set
                bm_bad[b, word] ^= bit
                cnt_bad[b] -= 1
                cleared += 1
    assert cleared == 2
    with pytest.raises(ValueError):
        native.jpeg_encode_sparse(cnt_bad, bm_bad, vals, esc, h, w,
                                  quality=92)
    # explicit sparse=True on a host array must refuse, not silently
    # hand back dense-path bytes
    with pytest.raises(RuntimeError):
        jpegenc.encode_jpeg(np.zeros((3, 16, 16), np.float32), sparse=True)


@pytest.mark.parametrize("h,w", [(40, 56), (33, 47), (17, 129)])
def test_padded_grid_bitstream_identical_to_direct(h, w):
    """Bucket-stable exports: padding a device render to the 128 bucket
    and encoding with true_shape must produce the SAME JFIF bytes as
    encoding the true-extent planes directly — WHATEVER the pad region
    contains (the editor's bucket renders carry developed reflect-pad
    content there, review finding). The extent-aware program overwrites
    the pad with per-component clamp-gather edge replicas, reproducing
    the direct path's luma-then-chroma MCU pad exactly, and the grid
    walk skips padding blocks while replaying their DC deltas.

    Byte-identity is asserted at these extents; it is per-program, not
    universal — the padded and direct programs compile separately, so
    f32 reassociation can flip a quantization-straddling coefficient by
    one step at other extents (rpf_native.cpp sparse-coder comment;
    decoded pixel diff <= 1). If an XLA upgrade flips one here, compare
    decoded pixels within 1 instead of loosening the wire tests."""
    planes = _planes(h, w, kind="noise", seed=h + w).copy()
    # the UNPADDED reference: grid == true grid (bypasses encode_jpeg's
    # auto-bucketing, which would otherwise make this comparison
    # tautological)
    direct = jpegenc._encode_sparse_device(jnp.asarray(planes), 92)
    # Adversarial pad content: noise, nothing like edge replicas.
    rng = np.random.default_rng(h * w)
    padded = rng.random(
        (3, h + (-h) % 128, w + (-w) % 128)).astype(np.float32)
    padded[:, :h, :w] = planes
    via_padded = jpegenc.encode_jpeg(jnp.asarray(padded), quality=92,
                                     sparse=True, true_shape=(h, w))
    assert via_padded == direct
    # and encode_jpeg's own internal bucketing (device input, no
    # true_shape) pads on device and lands on the same bytes
    auto = jpegenc.encode_jpeg(jnp.asarray(planes), quality=92)
    assert auto == direct


def test_encode_image_routes_device_jpeg_through_sparse(monkeypatch):
    """image_io.encode_image centralizes the JPEG fast-path routing
    (review finding): an EXPORT-SIZED device array with no host_crop must
    produce the sparse encoder's bytes; preview-sized frames stay on the
    u8-RGB path (routing them through sparse would put a never-prewarmed
    device compile per preview bucket on the first preview)."""
    from rawphotoforge_tpu.io import image_io

    planes = _planes(48, 64, kind="noise", seed=4)
    # Above the gate -> the sparse encoder's bytes.
    monkeypatch.setattr(jpegenc, "SPARSE_MIN_PIXELS", 48 * 64)
    via_image_io = image_io.encode_image(jnp.asarray(planes), "JPEG",
                                         quality=92)
    via_jpegenc = jpegenc.encode_jpeg(jnp.asarray(planes), quality=92)
    assert via_image_io == via_jpegenc
    # Below the gate (the default: previews are << SPARSE_MIN_PIXELS) ->
    # the same bytes as the u8 path, which np inputs always take.
    monkeypatch.setattr(jpegenc, "SPARSE_MIN_PIXELS", 48 * 64 + 1)
    via_gated = image_io.encode_image(jnp.asarray(planes), "JPEG",
                                      quality=92)
    via_u8 = image_io.encode_image(planes, "JPEG", quality=92)
    assert via_gated == via_u8
    # host_crop callers keep the crop-stable dense route — output is a
    # valid JPEG of the cropped extent
    cropped = image_io.encode_image(jnp.asarray(planes), "JPEG",
                                    quality=92, host_crop=(4, 36, 8, 56))
    dec = _decode(cropped)
    assert dec.shape == (32, 48, 3)


def test_sparse_rejects_dc_accumulation_overflow():
    """Per-block deltas that each fit 11 bits can still walk the
    accumulated DC out of its category; the coder must reject the wire
    instead of wrapping int16 and emitting a corrupt stream as OK
    (review finding)."""
    mh = mw = 2  # 4 MCUs -> 16 luma blocks: enough to walk past 2047
    nblocks = mh * mw * 6
    counts = np.zeros(nblocks, dtype=np.uint8)
    bitmaps = np.zeros((nblocks, 2), dtype=np.uint32)
    vals8, esc = [], []
    for b in range(nblocks):
        if b % 6 < 4:  # every luma block: DC delta +2047 (escaped)
            counts[b] = 1
            bitmaps[b, 0] = 1
            vals8.append(-128)
            esc.append(2047)
    with pytest.raises(ValueError):
        native.jpeg_encode_sparse(
            counts, bitmaps, np.array(vals8, np.int8),
            np.array(esc, np.int16), mh * 16, mw * 16, quality=92)


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


def test_banded_outputs_reassemble_to_full():
    """full_banded/full_extent_banded split the streams at the fixed
    _band_layout boundaries inside the program; reassembling the band
    buffers must reproduce full/full_extent bit-for-bit (the export path
    fetches these bands with no device-side slice program)."""
    import jax.numpy as jnp

    from rawphotoforge_tpu.utils.transfer import fetch_banded

    rng = np.random.default_rng(21)
    h, w = 48, 64
    planes = rng.random((3, h, w)).astype(np.float32)
    stages = jpegenc._sparse_jit()
    qlum, qchr = jpegenc._quant_tables(92)
    ql, qc = jnp.asarray(qlum), jnp.asarray(qchr)
    nblocks = (h // 16) * (w // 16) * 6
    bmb, vb, eb = jpegenc._band_layout(nblocks)

    for banded_fn, ref_fn, extra in (
        (stages.full_banded, stages[0], ()),
        (stages.full_extent_banded, stages[3], (37, 50)),
    ):
        dev = jnp.asarray(planes)
        bm_bands, val_bands, esc_bands, totals = banded_fn(
            dev, ql, qc, *extra)
        counts, bitmaps, vals, escapes, ref_totals = ref_fn(
            dev, ql, qc, *extra)
        np.testing.assert_array_equal(np.asarray(totals),
                                      np.asarray(ref_totals))
        got_bm = fetch_banded(bm_bands, bmb, nblocks * 2)
        np.testing.assert_array_equal(got_bm.reshape(nblocks, 2),
                                      np.asarray(bitmaps))
        # bands cover the FULL capacity; prefix fetches trim anywhere
        n, n_esc = (int(v) for v in np.asarray(totals))
        np.testing.assert_array_equal(
            fetch_banded(val_bands, vb, (n + 1) // 2),
            np.asarray(vals)[: (n + 1) // 2])
        np.testing.assert_array_equal(
            fetch_banded(esc_bands, eb, n_esc),
            np.asarray(escapes)[:n_esc])
        # host popcount of the fetched bitmaps == the counts stream
        np.testing.assert_array_equal(
            jpegenc._popcount_rows(got_bm.reshape(nblocks, 2)),
            np.asarray(counts))
