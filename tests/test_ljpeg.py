"""Lossless JPEG (ITU-T.81 process 14) codec tests.

The decoder is anchored three ways: (a) a hand-derived bitstream worked out
from the T.81 spec (encoder-independent), (b) encode->decode round trips
across the full configuration grid, (c) native C++ scan decoder vs the
pure-Python oracle.
"""

import struct

import numpy as np
import pytest

from rawphotoforge_tpu.io import ljpeg
from rawphotoforge_tpu.io.ljpeg import LJpegError


def _manual_stream(scan: bytes, precision=8, h=2, w=2, predictor=1, ncomp=1):
    """Assemble a complete SOF3 stream around hand-built scan bytes, using
    the 17-categories-at-5-bits Huffman table."""
    out = bytearray(b"\xff\xd8")
    out += struct.pack(">BBHBHHB", 0xFF, 0xC3, 8 + 3 * ncomp, precision, h, w, ncomp)
    for c in range(ncomp):
        out += struct.pack(">BBB", c + 1, 0x11, 0)
    counts = bytes([0, 0, 0, 0, 17] + [0] * 11)
    out += struct.pack(">BBH", 0xFF, 0xC4, 2 + 1 + 16 + 17) + b"\x00"
    out += counts + bytes(range(17))
    out += struct.pack(">BBHB", 0xFF, 0xDA, 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        out += struct.pack(">BB", c + 1, 0x00)
    out += struct.pack(">BBB", predictor, 0, 0)
    out += scan + b"\xff\xd9"
    return bytes(out)


def test_hand_derived_bitstream():
    """2x2 8-bit predictor-1 image worked out by hand from T.81 Annex H.

    samples [[100, 102], [98, 99]]; first prediction 2^(8-1)=128:
      (0,0): diff -28 -> cat 5, bits 00011 ; code 00101
      (0,1): Ra=100, diff  +2 -> cat 2, bits 10    ; code 00010
      (1,0): Rb=100, diff  -2 -> cat 2, bits 01    ; code 00010
      (1,1): Ra=98,  diff  +1 -> cat 1, bits 1     ; code 00001
    -> 00101 00011 00010 10 00010 01 00001 1 + '11' pad = 28 C5 09 0F
    """
    data = _manual_stream(bytes([0x28, 0xC5, 0x09, 0x0F]))
    dec, frame = ljpeg.decode(data)
    np.testing.assert_array_equal(dec, [[100, 102], [98, 99]])
    assert frame.precision == 8 and frame.predictor == 1


def test_hand_derived_bitstream_predictor2():
    """Same samples, predictor 2 (Rb): row 0 still predicts via Ra.
      (0,0): 128 -> 100: cat 5, 00011
      (0,1): Ra=100 -> 102: cat 2, 10
      (1,0): Rb=100 -> 98: diff -2, cat 2, 01
      (1,1): Rb=102 -> 99: diff -3, cat 2, 00
    -> 00101 00011 00010 10 00010 01 00010 00 + 1111 pad
       = 00101000 11000101 00001001 00010001 111(1) -> 28 C5 09 11 F?
    bits: 00101,00011,00010,10,00010,01,00010,00 = 34 bits -> pad 6 ones
      00101000 11000101 00001001 00010001 11111111? no: 34+6=40 bits
      byte4   = 00010 00 + 1 -> 00010001
      byte5   = 11111111
    """
    scan = bytes([0x28, 0xC5, 0x09, 0x11, 0xFF, 0x00])  # FF stuffed with 00
    data = _manual_stream(scan, predictor=2)
    dec, _ = ljpeg.decode(data)
    np.testing.assert_array_equal(dec, [[100, 102], [98, 99]])


@pytest.mark.parametrize("bits", [8, 12, 14, 16])
@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_roundtrip_grid(rng, bits, predictor):
    for nc in (1, 2):
        s = rng.integers(0, 1 << bits, (13, 11, nc)).astype(np.uint16)
        enc = ljpeg.encode(s, precision=bits, predictor=predictor)
        dec, frame = ljpeg.decode(enc)
        np.testing.assert_array_equal(dec, s.reshape(13, 11 * nc))
        assert frame.ncomp == nc and frame.width == 11 * nc


def test_roundtrip_restart_intervals(rng):
    s = rng.integers(0, 1 << 12, (9, 14, 2)).astype(np.uint16)
    for ri in (1, 3, 5, 100):
        enc = ljpeg.encode(s, precision=12, predictor=4, restart_interval=ri)
        dec, frame = ljpeg.decode(enc)
        assert frame.restart_interval == ri
        np.testing.assert_array_equal(dec, s.reshape(9, 28))


def test_roundtrip_point_transform(rng):
    s = (rng.integers(0, 1 << 12, (9, 7)) << 2).astype(np.uint16)
    enc = ljpeg.encode(s, precision=14, predictor=4, point_transform=2)
    dec, frame = ljpeg.decode(enc)
    assert frame.point_transform == 2
    np.testing.assert_array_equal(dec, s)


def test_extreme_diffs_category_16(rng):
    """Alternating 0/65535 forces +-32768-wrap diffs (category 16)."""
    s = np.zeros((4, 8), dtype=np.uint16)
    s[:, 1::2] = 65535
    s[1::2] = s[1::2][:, ::-1]
    enc = ljpeg.encode(s, precision=16, predictor=1)
    dec, _ = ljpeg.decode(enc)
    np.testing.assert_array_equal(dec, s)


def test_native_matches_python_oracle(rng):
    from rawphotoforge_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    for bits, pred, nc, ri in [(8, 1, 1, 0), (14, 4, 2, 7), (16, 7, 2, 0),
                               (12, 5, 3, 3), (10, 6, 1, 0)]:
        s = rng.integers(0, 1 << bits, (21, 13, nc)).astype(np.uint16)
        enc = ljpeg.encode(s, precision=bits, predictor=pred,
                           restart_interval=ri)
        frame = ljpeg.parse(enc)
        total = frame.rows * frame.mcus_per_row
        segs = ljpeg._split_segments(frame.scan, frame.restart_interval, total)
        luts = [
            ljpeg._build_huffman_lut(frame.counts[t], frame.values[t],
                                     int(frame.nvalues[t]))
            for t in range(frame.counts.shape[0])
        ]
        py = np.zeros((frame.rows, frame.width), dtype=np.int32)
        nat = np.zeros((frame.rows, frame.width), dtype=np.uint16)
        for seg, start, count in segs:
            ljpeg._decode_scan_py(seg, py, frame, start, count, luts)
            native.ljpeg_decode_scan(seg, nat, frame, start, count)
        np.testing.assert_array_equal(py.astype(np.uint16), nat)
        np.testing.assert_array_equal(nat, s.reshape(21, 13 * nc))


def test_error_paths():
    with pytest.raises(LJpegError):
        ljpeg.decode(b"\x00\x01not a jpeg")
    with pytest.raises(LJpegError):
        # Baseline DCT (SOF0), not lossless.
        bad = bytearray(_manual_stream(b"\x00"))
        bad[3] = 0xC0
        ljpeg.decode(bytes(bad))
    with pytest.raises(LJpegError):
        ljpeg.encode(np.zeros((4, 4, 5), dtype=np.uint16))  # 5 components
    with pytest.raises(LJpegError):
        ljpeg.encode(np.full((4, 4), 300, dtype=np.uint16), precision=8)


def test_truncated_scan_raises(rng):
    s = rng.integers(0, 256, (8, 8)).astype(np.uint16)
    enc = ljpeg.encode(s, precision=8)
    with pytest.raises(LJpegError):
        ljpeg.decode(enc[: len(enc) // 2])


def _random_canonical_table(rng):
    """A random valid canonical Huffman table for categories 0..16 with
    varied code lengths (the shape real camera files use)."""
    # Assign lengths by repeatedly splitting the Kraft budget.
    while True:
        lens = sorted(int(rng.integers(2, 13)) for _ in range(17))
        kraft = sum(2.0 ** -l for l in lens)
        if kraft <= 1.0:
            break
    counts = np.zeros(16, dtype=np.uint8)
    for l in lens:
        counts[l - 1] += 1
    # Canonical assignment orders values by code length: shuffle which
    # category lands on which code.
    values = rng.permutation(np.arange(17)).astype(np.uint8)
    return counts, values


def test_roundtrip_random_huffman_tables(rng):
    """Decoder robustness across arbitrary canonical tables — not just the
    fixed table our encoder defaults to."""
    for trial in range(8):
        counts, values = _random_canonical_table(rng)
        s = rng.integers(0, 1 << 14, (11, 9, 2)).astype(np.uint16)
        enc = ljpeg.encode(s, precision=14, predictor=(trial % 7) + 1,
                           huffman=(counts, values))
        dec, frame = ljpeg.decode(enc)
        np.testing.assert_array_equal(dec, s.reshape(11, 18))


def test_random_tables_native_matches_python(rng):
    from rawphotoforge_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    counts, values = _random_canonical_table(rng)
    s = rng.integers(0, 1 << 16, (15, 13)).astype(np.uint16)
    enc = ljpeg.encode(s, precision=16, predictor=4, huffman=(counts, values))
    frame = ljpeg.parse(enc)
    total = frame.rows * frame.mcus_per_row
    segs = ljpeg._split_segments(frame.scan, 0, total)
    luts = [ljpeg._build_huffman_lut(frame.counts[t], frame.values[t],
                                     int(frame.nvalues[t]))
            for t in range(frame.counts.shape[0])]
    py = np.zeros((frame.rows, frame.width), dtype=np.int32)
    nat = np.zeros((frame.rows, frame.width), dtype=np.uint16)
    for seg, start, count in segs:
        ljpeg._decode_scan_py(seg, py, frame, start, count, luts)
        native.ljpeg_decode_scan(seg, nat, frame, start, count)
    np.testing.assert_array_equal(py.astype(np.uint16), nat)
    np.testing.assert_array_equal(nat, s)


def test_encode_rejects_insufficient_table():
    counts = np.zeros(16, dtype=np.uint8)
    counts[2] = 4  # only 4 categories covered
    values = np.arange(4, dtype=np.uint8)
    s = np.full((4, 4), 30000, dtype=np.uint16)  # needs high categories
    with pytest.raises(LJpegError, match="lacks categories"):
        ljpeg.encode(s, precision=16, huffman=(counts, values))


def test_optimal_table_roundtrip_and_smaller(rng):
    """huffman='optimal' round-trips and beats the fixed 5-bit table on
    low-entropy (realistic) data."""
    yy, xx = np.mgrid[0:64, 0:48].astype(np.float32)
    s = (2000 + 800 * np.sin(xx / 9) + 50 * rng.normal(0, 1, (64, 48))
         ).clip(0, 16383).astype(np.uint16)
    fixed = ljpeg.encode(s, precision=14, predictor=1)
    opt = ljpeg.encode(s, precision=14, predictor=1, huffman="optimal")
    dec, _ = ljpeg.decode(opt)
    np.testing.assert_array_equal(dec, s)
    assert len(opt) < len(fixed)


def test_optimal_table_skewed_lengths_capped(rng):
    """Extremely skewed category stats still produce <=16-bit codes."""
    # Overwhelmingly category 0 (constant image) with rare large diffs.
    s = np.full((80, 64), 5000, dtype=np.uint16)
    s[::17, ::13] = 60000
    s[3::29, 7::11] = 1
    enc = ljpeg.encode(s, precision=16, huffman="optimal")
    frame = ljpeg.parse(enc)
    assert int(frame.counts[0].sum()) >= 2  # real multi-symbol table
    dec, _ = ljpeg.decode(enc)
    np.testing.assert_array_equal(dec, s)


def test_optimal_table_single_category():
    s = np.full((16, 16), 1234, dtype=np.uint16)  # all diffs 0 after first
    # First sample diff is nonzero (vs the 2^(P-1) default), so two cats.
    enc = ljpeg.encode(s, precision=16, huffman="optimal")
    dec, _ = ljpeg.decode(enc)
    np.testing.assert_array_equal(dec, s)
    lone = np.zeros(100, dtype=np.int64)  # the degenerate 1-symbol table
    counts, values = ljpeg.optimal_table(lone)
    assert counts[0] == 1 and list(values) == [0]


def test_restart_first_line_uses_ra_predictor():
    """T.81 H.1.2.1 anchor: the first line of each restart interval uses
    the 1-D Ra predictor (not the scan's selected predictor), the first
    sample of each interval the default prediction. Hand-derived diffs for
    a 3x4 predictor-2 image with restart_interval=5."""
    s = np.array([[10, 12, 14, 16],
                  [20, 22, 24, 26],
                  [30, 32, 34, 36]], dtype=np.uint16)
    d = ljpeg._diffs(s[:, :, None], predictor=2, precision=8, pt=0,
                     restart_interval=5)[:, :, 0]
    expected = np.array([
        [10 - 128, 2, 2, 2],        # scan start: default, then Ra
        [10, 22 - 128, 2, 2],       # Rb at col 0; RST at idx 5: default, Ra
        [10, 10, 34 - 128, 2],      # Rb, Rb(selected), RST at idx 10, Ra
    ])
    np.testing.assert_array_equal(d, expected)
    # And the full stream round-trips through both decoders.
    enc = ljpeg.encode(s, precision=8, predictor=2, restart_interval=5)
    dec, _ = ljpeg.decode(enc)
    np.testing.assert_array_equal(dec, s)


def test_optimal_table_reserves_all_ones_code(rng):
    """T.81 Annex C: the all-1-bits codeword of every length must stay a
    prefix for longer codes (K.2 dummy-symbol procedure)."""
    streams = [
        np.zeros(1000, dtype=np.int64),                       # 1 category
        rng.integers(0, 3, 500),                              # few, even
        np.concatenate([np.zeros(10000, dtype=np.int64),      # very skewed
                        np.arange(17)]),
        rng.integers(0, 17, 64),                              # all cats
    ]
    for cats in streams:
        counts, values = ljpeg.optimal_table(cats)
        assert int(counts.sum()) == len(np.unique(cats))
        code, k = 0, 0
        last = None
        for ln in range(1, 17):
            for _ in range(int(counts[ln - 1])):
                last = (code, ln)
                code += 1
                k += 1
            code <<= 1
        lc, ll = last
        assert lc != (1 << ll) - 1, f"all-ones code assigned: {last}"


def test_native_pack_bits_matches_numpy(rng):
    from rawphotoforge_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    for trial in range(5):
        n = int(rng.integers(1, 3000))
        lens = rng.integers(1, 33, n).astype(np.uint8)
        vals = np.array([int(rng.integers(0, 1 << int(l))) for l in lens],
                        dtype=np.int64)
        nat = native.ljpeg_pack_bits(vals, lens)
        # Numpy oracle (the in-module fallback form).
        l64 = lens.astype(np.int64)
        pos = np.cumsum(l64) - l64
        total = int(l64.sum())
        bits = np.ones(total + (-total % 8), dtype=np.uint8)
        for b in range(int(l64.max())):
            m = l64 > b
            bits[pos[m] + b] = (vals[m] >> (l64[m] - 1 - b)) & 1
        ref = np.packbits(bits).tobytes()
        assert nat == ref, trial


def test_encoder_against_libjpeg_turbo_oracle():
    """Independent-oracle gate: Pillow's libjpeg-turbo build decodes
    8-bit single-component lossless JPEG (SOF3), so our from-scratch
    encoder's bitstream framing, Huffman coding, and all 7 predictors are
    cross-validated against a decoder we didn't write. (>8-bit and
    multi-component streams are outside Pillow's JPEG plugin; those stay
    covered by round trips and hand-derived bitstreams.)"""
    import io as _io

    from PIL import Image as PILImage

    rng = np.random.default_rng(7)
    for predictor in range(1, 8):
        samples = rng.integers(0, 256, size=(11, 17, 1)).astype(np.uint16)
        data = ljpeg.encode(samples, precision=8, predictor=predictor)
        got = np.array(PILImage.open(_io.BytesIO(data)))
        np.testing.assert_array_equal(
            got.astype(np.uint16), samples[..., 0],
            err_msg=f"predictor {predictor}")
        # ...and our own decoder agrees with the oracle.
        ours, _ = ljpeg.decode(data)
        np.testing.assert_array_equal(ours, samples[..., 0])


def test_encoder_oracle_with_restart_intervals():
    import io as _io

    from PIL import Image as PILImage

    rng = np.random.default_rng(9)
    samples = rng.integers(0, 256, size=(16, 12, 1)).astype(np.uint16)
    data = ljpeg.encode(samples, precision=8, predictor=1,
                        restart_interval=12)
    got = np.array(PILImage.open(_io.BytesIO(data)))
    np.testing.assert_array_equal(got.astype(np.uint16), samples[..., 0])


def test_dht_value_out_of_range_rejected():
    """DHT HUFFVAL bytes above 16 (SSSS range) would drive the native
    decoder into >=64-bit shifts (undefined behavior); parse must reject
    them (review finding)."""
    rng = np.random.default_rng(3)
    samples = rng.integers(0, 4096, size=(8, 8, 1)).astype(np.uint16)
    data = bytearray(ljpeg.encode(samples, precision=12, predictor=1))
    dht = data.find(b"\xff\xc4")
    assert dht > 0
    # DHT: marker(2) len(2) tcth(1) counts(16) values...
    vals_at = dht + 2 + 2 + 1 + 16
    data[vals_at] = 200
    with pytest.raises(ljpeg.LJpegError, match="out of range"):
        ljpeg.decode(bytes(data))


def test_codec_review_regressions():
    """Whole-file codec review findings, one sweep."""
    import struct as _struct
    import time

    rng = np.random.default_rng(5)
    samples = rng.integers(0, 4096, size=(8, 8, 1)).astype(np.uint16)
    good = ljpeg.encode(samples, precision=12, predictor=1)

    # 1. Point transform >= precision is rejected at parse time (was C++
    #    negative-shift UB / bare ValueError).
    data = bytearray(good)
    sos = data.find(b"\xff\xda")
    assert sos > 0
    (seglen,) = _struct.unpack_from(">H", data, sos + 2)
    ahal_at = sos + 2 + seglen - 1
    data[ahal_at] = (data[ahal_at] & 0xF0) | 15  # Al = 15 >= precision 12
    with pytest.raises(ljpeg.LJpegError, match="point transform"):
        ljpeg.decode(bytes(data))

    # 2. Truncated headers raise LJpegError, not struct.error.
    with pytest.raises(ljpeg.LJpegError):
        ljpeg.parse(b"\xff\xd8\xff\xc3\x00")
    with pytest.raises(ljpeg.LJpegError):
        ljpeg.parse(good[:20])

    # 3. Oversubscribed Huffman tables (Kraft sum > 1) are rejected (were
    #    silently wrong pixels via empty LUT slices).
    data = bytearray(good)
    dht = data.find(b"\xff\xc4")
    counts_at = dht + 5
    data[counts_at : counts_at + 16] = bytes(16)
    data[counts_at] = 2
    data[counts_at + 1] = 1  # lengths [2,1]: 2*2^-1 + 1*2^-2 > 1
    with pytest.raises(ljpeg.LJpegError, match="oversubscribed"):
        ljpeg.decode(bytes(data))

    # 4. Encoder validates point_transform and empty input with typed
    #    errors.
    with pytest.raises(ljpeg.LJpegError, match="point transform"):
        ljpeg.encode(samples, precision=2, point_transform=2)
    with pytest.raises(ljpeg.LJpegError, match="empty"):
        ljpeg.encode(np.zeros((4, 0), dtype=np.uint16))

    # 5. The pure-Python fallback decoder is O(n): 4x the pixels must not
    #    cost ~16x the time (the old bignum reader was quadratic).
    def py_time(n, monkeypatch_native=[None]):
        arr = rng.integers(0, 65535, size=(n, 64, 1)).astype(np.uint16)
        enc = ljpeg.encode(arr, precision=16, predictor=1)
        frame = ljpeg.parse(enc)
        segs = ljpeg._split_segments(
            frame.scan, frame.restart_interval,
            frame.rows * frame.mcus_per_row)
        luts = [ljpeg._build_huffman_lut(
            frame.counts[t], frame.values[t], int(frame.nvalues[t]))
            for t in range(frame.counts.shape[0])]
        out = np.zeros((frame.rows, frame.width), np.int32)
        t0 = time.perf_counter()
        for seg, start, count in segs:
            ljpeg._decode_scan_py(seg, out, frame, start, count, luts)
        dt = time.perf_counter() - t0
        np.testing.assert_array_equal(
            out.astype(np.uint16), arr[..., 0])  # and it decodes right
        return dt

    t1 = py_time(64)
    t4 = py_time(256)
    assert t4 < t1 * 10, (t1, t4)  # linear-ish, with generous slack
