"""Device-side JPEG entropy coding (io/jpegbits.py + rpf_jpeg_encode_prepacked).

Correctness oracle: the prepacked wire shares every stage upstream of
entropy coding with the nibble wire (io/jpegenc._block_stages), so for
identical pixels the two wires must produce BYTE-IDENTICAL files. The
per-block bit strings are additionally checked against a serial
numpy/python oracle (jpegbits.prepacked_np) that mirrors the native
coder's encode_block logic lane by lane.
"""

import io

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image as PILImage

from rawphotoforge_tpu import native
from rawphotoforge_tpu.io import jpegbits, jpegenc

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")


def _rand_blocks(rng, n, max_nnz=30, amp=1023):
    """Random sparse zigzag blocks with DC deltas in the 11-bit category
    and ACs in the 10-bit category (the baseline wire domain: |AC| <=
    1023, |DC delta| <= 2047 — larger sizes have no Annex-K.3 symbol)."""
    blocks = np.zeros((n, 64), np.int32)
    nnz = rng.integers(0, max_nnz + 1, n)
    for b in range(n):
        idx = rng.choice(63, nnz[b], replace=False) + 1
        blocks[b, idx] = rng.integers(-amp, amp + 1, nnz[b])
    blocks[:, 0] = rng.integers(-2000, 2001, n)
    return blocks


def _dev_stream(words, nwords):
    return np.concatenate(
        [np.asarray(words)[b, : int(nwords[b])]
         for b in range(words.shape[0])] or
        [np.zeros(0, np.uint32)])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_prepack_matches_np_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 6 * 8
    blocks = _rand_blocks(rng, n)
    mask = np.ones(n, bool)
    st = jpegbits._prepacked_jit()
    lens_d, words_d, nwords_d, bad_d = (np.asarray(a) for a in st.prepack(
        jnp.asarray(blocks), jnp.asarray(mask)))
    lens_o, words_o = jpegbits.prepacked_np(blocks, mask)
    np.testing.assert_array_equal(lens_d, lens_o)
    np.testing.assert_array_equal(_dev_stream(words_d, nwords_d), words_o)
    assert int(bad_d) == 0


def test_prepack_edge_blocks():
    """All-zero, fully dense max-magnitude, long zero runs (ZRL chains),
    and last-lane-nonzero (no EOB) blocks — one MCU of each family."""
    blocks = np.zeros((6 * 4, 64), np.int32)
    # MCU 1: fully dense at the 10-bit AC / 11-bit DC category ceiling
    # (|AC| <= 1023; 1024 would be size 11, which has no AC symbol).
    blocks[6:12, 1:] = 1023
    blocks[6:12, 0] = 2047
    blocks[7, 1:] = -1023
    # MCU 2: isolated nonzeros after runs of 16/32/47 zeros (1/2 ZRLs +
    # remainder), and lane 63 nonzero so no EOB is emitted.
    blocks[12, 17] = 3
    blocks[13, 34] = -5
    blocks[14, 48] = 7
    blocks[15, 63] = 1
    # MCU 3: negative DC deltas only.
    blocks[18:24, 0] = -2047
    mask = np.ones(blocks.shape[0], bool)
    st = jpegbits._prepacked_jit()
    lens_d, words_d, nwords_d, bad_d = (np.asarray(a) for a in st.prepack(
        jnp.asarray(blocks), jnp.asarray(mask)))
    lens_o, words_o = jpegbits.prepacked_np(blocks, mask)
    np.testing.assert_array_equal(lens_d, lens_o)
    np.testing.assert_array_equal(_dev_stream(words_d, nwords_d), words_o)
    assert int(bad_d) == 0
    # The dense-max block is the wire's worst case and must fit the
    # fixed per-block capacity.
    assert lens_d.max() <= 32 * jpegbits.BLOCK_WORDS


def test_prepack_flags_out_of_domain_coefficients():
    """|AC| >= 1024 has no Annex-K.3 symbol: the oracle raises, the
    device flags it in the bad counter, and the host encoder refuses
    (a zero-length Huffman prefix would corrupt the stream silently)."""
    blocks = np.zeros((6, 64), np.int32)
    blocks[2, 5] = 1024
    mask = np.ones(6, bool)
    with pytest.raises(ValueError, match="Huffman domain"):
        jpegbits.prepacked_np(blocks, mask)
    st = jpegbits._prepacked_jit()
    bad = np.asarray(st.prepack(jnp.asarray(blocks), jnp.asarray(mask))[3])
    assert int(bad) == 1
    # DC delta beyond size 11 flags too.
    blocks2 = np.zeros((6, 64), np.int32)
    blocks2[0, 0] = 2048
    with pytest.raises(ValueError, match="Huffman domain"):
        jpegbits.prepacked_np(blocks2, mask)
    bad2 = np.asarray(
        st.prepack(jnp.asarray(blocks2), jnp.asarray(mask))[3])
    assert int(bad2) == 1


def test_prepack_mask_zeroes_padding_blocks():
    rng = np.random.default_rng(3)
    n = 6 * 6
    blocks = _rand_blocks(rng, n)
    mask = np.ones(n, bool)
    mask[6:12] = False  # one padding MCU mid-stream
    st = jpegbits._prepacked_jit()
    lens_d, words_d, nwords_d, _bad = (np.asarray(a) for a in st.prepack(
        jnp.asarray(blocks), jnp.asarray(mask)))
    assert (lens_d[6:12] == 0).all()
    assert (nwords_d[6:12] == 0).all()
    lens_o, words_o = jpegbits.prepacked_np(blocks, mask)
    np.testing.assert_array_equal(lens_d, lens_o)
    np.testing.assert_array_equal(_dev_stream(words_d, nwords_d), words_o)


def test_masked_dc_delta_skips_padding_blocks():
    """DC prediction chains over TRUE blocks only (padding blocks are
    never emitted, so the emitted deltas must bridge across them)."""
    rng = np.random.default_rng(4)
    m = 5
    blocks = np.zeros((m * 6, 64), np.int32)
    dc = rng.integers(-900, 900, (m, 6))
    blocks[:, 0] = dc.reshape(-1)
    mask = np.ones((m, 6), bool)
    mask[2, :] = False  # padding MCU in the middle
    st = jpegbits._prepacked_jit()
    out = np.asarray(st.dc_delta_masked(
        jnp.asarray(blocks), jnp.asarray(mask.reshape(-1))))
    got = out[:, 0].reshape(m, 6)
    # Python reference: per component (Y lanes 0-3 chained, Cb, Cr).
    for comp_lanes in ([0, 1, 2, 3], [4], [5]):
        prev = 0
        for mi in range(m):
            for li in comp_lanes:
                if mask[mi, li]:
                    assert got[mi, li] == dc[mi, li] - prev, (mi, li)
                    prev = dc[mi, li]


@pytest.mark.parametrize("h,w", [(64, 80), (48, 56), (33, 47)])
def test_wire_bytes_identical_to_nibble_wire(h, w):
    rng = np.random.default_rng(10)
    planes = jnp.asarray(rng.random((3, h, w), np.float32))
    a = jpegenc._encode_sparse_device(planes, 90)
    b = jpegbits.encode_prepacked_device(planes, 90)
    assert a == b


@pytest.mark.parametrize("h,w,ph,pw", [(100, 72, 128, 128),
                                       (144, 272, 256, 384)])
def test_padded_wire_bytes_identical(h, w, ph, pw):
    rng = np.random.default_rng(11)
    full = jnp.asarray(rng.random((3, ph, pw), np.float32))
    a = jpegenc._encode_sparse_device(full, 90, true_shape=(h, w))
    b = jpegbits.encode_prepacked_device(full, 90, true_shape=(h, w))
    assert a == b


def test_stream_decodes_via_pillow():
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    planes = np.stack([yy / h, xx / w, (yy + xx) / (h + w)])
    data = jpegbits.encode_prepacked_device(jnp.asarray(planes), 92)
    dec = np.array(PILImage.open(io.BytesIO(data)).convert("RGB"))
    assert dec.shape == (h, w, 3)
    src = (np.clip(planes, 0, 1) * 255).astype(np.float64)
    mse = np.mean((dec.transpose(2, 0, 1) - src) ** 2)
    assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-9)) > 30.0


def test_encode_jpeg_routes_through_packed_wire(monkeypatch):
    """encode_jpeg's device sparse path uses the packed wire first and
    degrades packed -> prepacked -> nibble — byte-identically."""
    rng = np.random.default_rng(14)
    planes = jnp.asarray(rng.random((3, 64, 80), np.float32))
    calls = []
    real = jpegbits.encode_packed_device

    def spy(*a, **k):
        calls.append("packed")
        return real(*a, **k)

    monkeypatch.setattr(jpegbits, "encode_packed_device", spy)
    via_auto = jpegenc.encode_jpeg(planes, quality=90)
    assert calls == ["packed"]
    assert via_auto.startswith(b"\xff\xd8")

    def boom(*a, **k):
        raise RuntimeError("no pack")

    monkeypatch.setattr(jpegbits, "encode_packed_device", boom)
    monkeypatch.setattr(jpegenc, "_sparse_fallback_warned",
                        {"packed", "prepacked", "nibble"})
    assert jpegenc.encode_jpeg(planes, quality=90) == via_auto
    # Both device fallbacks gone: the nibble wire still matches.
    monkeypatch.setattr(jpegbits, "encode_prepacked_device", boom)
    assert jpegenc.encode_jpeg(planes, quality=90) == via_auto
    # Explicit sparse=True survives via the nibble wire.
    assert jpegenc.encode_jpeg(planes, quality=90, sparse=True) == via_auto


@pytest.mark.parametrize("seed", range(4))
def test_native_prepacked_survives_random_wires(seed):
    """Randomized robustness fuzz of the native bit-walk: arbitrary
    (lens, words) buffers must either raise ValueError (stream/length
    mismatch) or produce a SOI..EOI-framed byte string — never crash,
    never read past the buffers. Valid-looking random wires decode as
    garbage scans, which is fine: the coder validates structure, not
    semantics (semantic validity is the device stage's bad-counter)."""
    rng = np.random.default_rng(100 + seed)
    for _ in range(200):
        nblocks = 6 * int(rng.integers(1, 5))
        lens = rng.integers(0, 1700, nblocks).astype(np.uint16)
        nwords = int(rng.integers(0, 80))
        words = rng.integers(0, 2**32, nwords, dtype=np.uint64).astype(
            np.uint32)
        gr = nblocks // 6
        try:
            out = native.jpeg_encode_prepacked(
                lens, words, 16, gr * 16, quality=90)
        except ValueError:
            continue
        assert out[:2] == b"\xff\xd8" and out[-2:] == b"\xff\xd9"


def test_native_rejects_malformed_wire():
    rng = np.random.default_rng(13)
    blocks = _rand_blocks(rng, 6)
    lens, words = jpegbits.prepacked_np(blocks, np.ones(6, bool))
    ok = native.jpeg_encode_prepacked(lens, words, 16, 16, quality=90)
    assert ok[:2] == b"\xff\xd8"
    # Truncated word stream: the walk runs past the buffer.
    with pytest.raises(ValueError):
        native.jpeg_encode_prepacked(lens, words[:-1], 16, 16, quality=90)
    # Extra trailing words: stream not consumed exactly.
    with pytest.raises(ValueError):
        native.jpeg_encode_prepacked(
            lens, np.concatenate([words, words[:1]]), 16, 16, quality=90)
    # Oversized per-block length.
    bad = lens.copy()
    bad[0] = 2000
    with pytest.raises(ValueError):
        native.jpeg_encode_prepacked(bad, words, 16, 16, quality=90)


# ---------------------------------------------------------------------------
# PACKED wire: the device emits the finished contiguous scan bit stream.
# ---------------------------------------------------------------------------


def _packed_dev(blocks, mask, cap_ent=None, cap_out=None):
    st = jpegbits._prepacked_jit()
    cap_ent = cap_ent if cap_ent is not None else jpegbits.BLOCK_WORDS_ROT
    cap_out = cap_out if cap_out is not None else jpegbits.BLOCK_WORDS_ROT
    flat, totals = st.packed(jnp.asarray(blocks), jnp.asarray(mask),
                             cap_ent, cap_out)
    return np.asarray(flat), [int(x) for x in np.asarray(totals)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_packed_matches_np_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 6 * 8
    blocks = _rand_blocks(rng, n)
    mask = np.ones(n, bool)
    flat, (tw, tb, bad, nent, kept) = _packed_dev(blocks, mask)
    words_o, bits_o = jpegbits.packed_np(blocks, mask)
    assert (tb, bad) == (bits_o, 0)
    assert tw == (bits_o + 31) // 32 == kept
    np.testing.assert_array_equal(flat[:tw], words_o)
    assert not flat[tw:].any()  # deterministic zero tail


def test_packed_minimal_blocks_share_words():
    """All-minimal blocks (DC delta 0, no AC) pack an MCU into exactly
    32 bits — six entries OR-merge into each output word, the longest
    run the production structure produces. A leading nonzero DC delta
    then knocks every subsequent block off word phase, exercising the
    rotation + boundary-merge path for all 6 in-MCU phases."""
    for lead_dc in (0, 3, -100, 2047):
        blocks = np.zeros((6 * 9, 64), np.int32)
        blocks[0, 0] = lead_dc
        mask = np.ones(blocks.shape[0], bool)
        flat, (tw, tb, bad, nent, kept) = _packed_dev(blocks, mask)
        words_o, bits_o = jpegbits.packed_np(blocks, mask)
        assert (tb, kept, bad) == (bits_o, tw, 0)
        np.testing.assert_array_equal(flat[:tw], words_o)


def test_packed_edge_blocks():
    """Dense max-magnitude, ZRL chains, no-EOB and negative-DC block
    families — the same corpus the prepack edge test uses — through the
    global bit-pack."""
    blocks = np.zeros((6 * 4, 64), np.int32)
    blocks[6:12, 1:] = 1023
    blocks[6:12, 0] = 2047
    blocks[7, 1:] = -1023
    blocks[12, 17] = 3
    blocks[13, 34] = -5
    blocks[14, 48] = 7
    blocks[15, 63] = 1
    blocks[18:24, 0] = -2047
    mask = np.ones(blocks.shape[0], bool)
    flat, (tw, tb, bad, nent, kept) = _packed_dev(blocks, mask)
    words_o, bits_o = jpegbits.packed_np(blocks, mask)
    assert (tb, kept, bad) == (bits_o, tw, 0)
    np.testing.assert_array_equal(flat[:tw], words_o)


def test_packed_mask_skips_padding_blocks():
    """Bucket-padding blocks contribute no bits; the packed stream over
    a padded grid equals the oracle over the true blocks alone."""
    rng = np.random.default_rng(21)
    blocks = _rand_blocks(rng, 6 * 6)
    mask = np.ones(blocks.shape[0], bool)
    mask[6 * 4:] = False  # last two MCUs are padding
    flat, (tw, tb, bad, nent, kept) = _packed_dev(blocks, mask)
    words_o, bits_o = jpegbits.packed_np(blocks, mask)
    assert (tb, kept) == (bits_o, tw)
    np.testing.assert_array_equal(flat[:tw], words_o)


@pytest.mark.parametrize("h,w", [(64, 80), (48, 56), (33, 47)])
def test_packed_wire_bytes_identical(h, w):
    rng = np.random.default_rng(30)
    planes = jnp.asarray(rng.random((3, h, w), np.float32))
    a = jpegenc._encode_sparse_device(planes, 90)
    b = jpegbits.encode_prepacked_device(planes, 90)
    c = jpegbits.encode_packed_device(planes, 90)
    assert a == b == c


@pytest.mark.parametrize("h,w,ph,pw", [(100, 72, 128, 128),
                                       (144, 272, 256, 384)])
def test_packed_padded_wire_bytes_identical(h, w, ph, pw):
    rng = np.random.default_rng(31)
    full = jnp.asarray(rng.random((3, ph, pw), np.float32))
    a = jpegbits.encode_prepacked_device(full, 90, true_shape=(h, w))
    c = jpegbits.encode_packed_device(full, 90, true_shape=(h, w))
    assert a == c


def test_packed_capacity_overflow_degrades(monkeypatch):
    """Content denser than the packed capacities raises in
    encode_packed_device (totals-driven, detected BEFORE any stream
    fetch) and encode_jpeg degrades to the prepacked wire with
    byte-identical output."""
    rng = np.random.default_rng(32)
    planes = jnp.asarray(rng.random((3, 64, 80), np.float32))
    ref = jpegbits.encode_prepacked_device(planes, 90)
    monkeypatch.setattr(jpegbits, "PACKED_ENT_WORDS", 2)
    monkeypatch.setattr(jpegbits, "PACKED_OUT_WORDS", 2)
    with pytest.raises(ValueError, match="overflow"):
        jpegbits.encode_packed_device(planes, 90)
    monkeypatch.setattr(jpegenc, "_sparse_fallback_warned",
                        {"packed", "prepacked", "nibble"})
    assert jpegenc.encode_jpeg(planes, quality=90) == ref


def test_native_packed_roundtrip_and_validation():
    rng = np.random.default_rng(33)
    blocks = _rand_blocks(rng, 6)
    words, bits = jpegbits.packed_np(blocks, np.ones(6, bool))
    out = native.jpeg_encode_packed(words, bits, 16, 16, quality=90)
    ref_lens, ref_words = jpegbits.prepacked_np(blocks, np.ones(6, bool))
    ref = native.jpeg_encode_prepacked(ref_lens, ref_words, 16, 16,
                                       quality=90)
    assert out == ref
    # Word-count / bit-count mismatch must be rejected, not walked.
    with pytest.raises(ValueError):
        native.jpeg_encode_packed(words[:-1], bits, 16, 16, quality=90)
    with pytest.raises(ValueError):
        native.jpeg_encode_packed(words, bits + 64, 16, 16, quality=90)
    with pytest.raises(ValueError):
        native.jpeg_encode_packed(words, -1, 16, 16, quality=90)


@pytest.mark.parametrize("seed", range(2))
def test_native_packed_survives_random_wires(seed):
    """Arbitrary (words, total_bits) buffers either raise ValueError or
    produce a SOI..EOI-framed byte string — never crash."""
    rng = np.random.default_rng(200 + seed)
    for _ in range(200):
        nbits = int(rng.integers(0, 2000))
        nwords = (nbits + 31) // 32 if rng.random() < 0.8 else int(
            rng.integers(0, 70))
        words = rng.integers(0, 2**32, nwords, dtype=np.uint64).astype(
            np.uint32)
        try:
            out = native.jpeg_encode_packed(words, nbits, 16, 16,
                                            quality=90)
        except ValueError:
            continue
        assert out[:2] == b"\xff\xd8" and out[-2:] == b"\xff\xd9"
