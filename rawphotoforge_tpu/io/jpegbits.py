"""Device-side JPEG entropy coding: the TPU emits final Huffman bits.

The nibble wire (io/jpegenc._sparse_jit + native rpf_jpeg_encode_sparse)
ships quantized coefficients and entropy-codes on the host — ~4 bits per
nonzero coefficient plus an 8 B/block presence bitmap across the
device->host link. This module moves the LAST stage onto the device too,
in two wire formats:

PREPACKED (`prepack` / rpf_jpeg_encode_prepacked): each 8x8 block's
complete baseline-JPEG bit string (DC size category + magnitude,
run/size AC symbols, ZRLs, EOB — Annex K.3 typical tables, the same
tables native/rpf_native.cpp emits in its DHT segments) is assembled
into per-block bit-packed u32 words on the TPU, compacted with the same
stable 1-bit sort the nibble wire uses, and fetched as
  bit_lens u16 [nblocks]  (0 for bucket-padding blocks)
  words    u32 [total_words]  (per-block streams, MSB-first, word-aligned
                               per block, zero-padded last word)
  totals   i32 [3] = (total_words, total_bits, n_out_of_domain)
The host coder only concatenates the per-block bit strings — shifting by
the running bit position and byte-stuffing 0xFF — so the link carries
roughly the finished JFIF scan size (+2 B/block of lengths + ~2 B/block
of word-alignment padding) instead of coefficients + bitmaps.

PACKED (`packed` / rpf_jpeg_encode_packed, the production default): the
device additionally concatenates the blocks itself. Each block's string
is assembled PRE-ROTATED to its global bit phase (its cumulative bit
offset mod 32 — free in the same 65-lane pass: the phase adds to every
lane offset), giving one u32 entry per global scan word the block
touches; the stable-sort compaction leaves those entries ORDERED by
global word with equal-word runs consecutive, 4 bounded prefix-doubling
passes OR-merge each run into its head entry (a run is at most 10
entries: two boundary straddles plus floor(32/4) whole blocks inside one
word — the shortest block is 4 bits), and a second 1-bit-sort compaction
emits the finished scan. The wire is
  words  u32 [ceil(total_bits/32)]  (the ENTIRE entropy-coded scan)
  totals i32 [5] = (total_words, total_bits, n_out_of_domain,
                    n_entries, n_kept)
— no per-block lengths, no alignment padding: the link carries exactly
the finished scan bytes, and the host coder only writes headers and
0xFF-stuffs. Fixed aggregate capacities (PACKED_ENT_WORDS /
PACKED_OUT_WORDS per block) keep the intermediate arrays statically
shaped; denser content overflows loudly via totals and encode_jpeg
degrades to the prepacked wire, which has per-block capacity only.

Everything upstream (color convert, 4:2:0, fDCT, quantization, zigzag,
DC deltas) is shared with the nibble wire via jpegenc._block_stages, so
for identical pixels the two wires produce BYTE-IDENTICAL files — the
correctness oracle tests/test_jpegbits.py enforces.

TPU notes: Huffman lookups are select-sums over the defined symbols
(table gathers at 36M lanes serialize, CLAUDE.md); 64-bit code patterns
live as u32 (hi, lo) pairs (no uint64 without jax_enable_x64); word
assembly is a 65-step fori accumulation over lanes (DC + 63 AC + EOB),
each step one fused elementwise pass over the [nblocks, 52] word grid.

Reference counterpart: the reference exports JPEG host-side via the
image crate (rust-godot-legacy/photo-editor/src/image.rs:482-511); this
stage has no reference equivalent — it exists because a remote
accelerator link makes export bytes the bottleneck.
"""

from __future__ import annotations

import functools

import numpy as np

# ITU-T.81 Annex K.3 typical Huffman tables (public contract constants;
# the same values native/rpf_native.cpp writes into the DHT segments —
# both coders must agree or the stream is undecodable).
DC_LUM_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_CHR_BITS = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
DC_VALS = tuple(range(12))
AC_LUM_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_LUM_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)
AC_CHR_BITS = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
AC_CHR_VALS = (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

# Hard per-block capacity: the worst case is every coefficient nonzero
# (ZRL replaces 16 zero-lanes with 11 bits — always shorter), bounding a
# block at dc(<=11+11) + 63 ac(<=16+10) = 1660 bits -> 52 words.
BLOCK_WORDS = 52
# The PACKED wire rotates each block's string to its global bit phase
# (offset mod 32) before word assembly, so a block can straddle one more
# word than its unrotated worst case.
BLOCK_WORDS_ROT = 53
# Packed-wire capacities, in u32 words per block. The entry stream (one
# entry per word a rotated block touches) and the final packed scan are
# fixed-size device arrays; real content sits far below both (the c5
# noise corpus averages ~174 bits/block = ~6.9 entries and ~5.4 scan
# words), and overflow is detected host-side via totals and degrades
# loudly to the prepacked wire. 18 entries/block covers ~540 avg
# bits/block; 12 scan words/block covers ~384 avg bits/block.
PACKED_ENT_WORDS = 18
PACKED_OUT_WORDS = 12
# Pre-split band size for the packed scan stream: finer than the 4 MB
# default because the stream is ~the finished JPEG scan (a 24MP image is
# ~3-17 MB) and the fetch rounds up to a whole band. r4: 512 KB — the
# round-3 c5 run fetched 3.758 GB for 3.253 GB of JPEG bytes (~2 MB of
# band rounding per image at the old 2 MB bands); 512 KB cuts the
# structural over-fetch ~4x while fetch_banded still launches every
# needed band's d2h transfer concurrently (the per-band RTT amortizes
# across the parallel streams, tools/wire_ab.py A/B). Env override for
# on-hardware A/B; the producing program's output split keys on it, so
# changing it recompiles the packed programs once per bucket.
_PACKED_BAND_BYTES = int(__import__("os").environ.get(
    "RPF_PACKED_BAND_BYTES", 512 << 10))


def build_canonical(bits, vals):
    """(code u32[256], len u8[256]) canonical assignment, T.81 Annex C —
    the same algorithm as the native coder's build_huff."""
    code = np.zeros(256, np.uint32)
    length = np.zeros(256, np.uint8)
    c = 0
    k = 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            v = vals[k]
            k += 1
            code[v] = c
            length[v] = l
            c += 1
        c <<= 1
    return code, length


@functools.cache
def _tables():
    dcl = build_canonical(DC_LUM_BITS, DC_VALS)
    dcc = build_canonical(DC_CHR_BITS, DC_VALS)
    acl = build_canonical(AC_LUM_BITS, AC_LUM_VALS)
    acc = build_canonical(AC_CHR_BITS, AC_CHR_VALS)
    return dcl, dcc, acl, acc


def _bit_size_np(v: int) -> int:
    return int(abs(int(v))).bit_length()


def _block_bits_np(zz, chroma: bool) -> tuple[int, int]:
    """One block's complete baseline bit string as (big int, nbits) —
    the shared serial emission both numpy oracles chop differently."""
    tables = _tables()
    dc_code, dc_len = tables[1] if chroma else tables[0]
    ac_code, ac_len = tables[3] if chroma else tables[2]
    acc = 0
    nbits = 0

    def put(v, nb):
        nonlocal acc, nbits
        acc = (acc << nb) | (int(v) & ((1 << nb) - 1))
        nbits += nb

    d = int(zz[0])
    s = _bit_size_np(d)
    if s > 11 or not dc_len[s]:
        raise ValueError(
            f"DC delta {d} outside the baseline Huffman domain")
    put((int(dc_code[s]) << s) | ((d if d >= 0 else d - 1)
                                  & ((1 << s) - 1)), int(dc_len[s]) + s)
    run = 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            put(ac_code[0xF0], int(ac_len[0xF0]))
            run -= 16
        s = _bit_size_np(v)
        sym = (run << 4) | s
        if s > 10 or not ac_len[sym]:
            raise ValueError(
                f"AC value {v} outside the baseline Huffman domain")
        put((int(ac_code[sym]) << s) | ((v if v >= 0 else v - 1)
                                        & ((1 << s) - 1)),
            int(ac_len[sym]) + s)
        run = 0
    if run > 0:
        put(ac_code[0x00], int(ac_len[0x00]))
    return acc, nbits


def _chop_words_np(acc: int, nbits: int) -> list[int]:
    """MSB-first u32 words of a bit string, zero-padded last word."""
    nwords = (nbits + 31) // 32
    acc <<= nwords * 32 - nbits
    return [(acc >> (32 * (nwords - 1 - wi))) & 0xFFFFFFFF
            for wi in range(nwords)]


def prepacked_np(blocks: np.ndarray, true_mask: np.ndarray | None = None):
    """Serial numpy/python oracle for the device prepack.

    blocks: [N, 64] int zigzag coefficients, DC slot = delta vs the
    previous TRUE same-component block (MCU order Y,Y,Y,Y,Cb,Cr).
    Returns (bit_lens u16 [N], words u32 [total_words])."""
    blocks = np.asarray(blocks)
    n = blocks.shape[0]
    lens = np.zeros(n, np.uint16)
    words: list[int] = []
    for b in range(n):
        if true_mask is not None and not true_mask[b]:
            continue
        acc, nbits = _block_bits_np(blocks[b], (b % 6) >= 4)
        lens[b] = nbits
        words.extend(_chop_words_np(acc, nbits))
    return lens, np.asarray(words, dtype=np.uint32)


def packed_np(blocks: np.ndarray, true_mask: np.ndarray | None = None):
    """Serial oracle for the PACKED wire: the whole scan as one
    contiguous bit stream (no per-block word alignment).

    Returns (words u32 [ceil(total_bits/32)], total_bits)."""
    blocks = np.asarray(blocks)
    acc = 0
    nbits = 0
    for b in range(blocks.shape[0]):
        if true_mask is not None and not true_mask[b]:
            continue
        a, nb = _block_bits_np(blocks[b], (b % 6) >= 4)
        acc = (acc << nb) | a
        nbits += nb
    return np.asarray(_chop_words_np(acc, nbits), dtype=np.uint32), nbits


def _word_band_layout(nblocks: int):
    """Pre-split band boundaries for the word stream (u32 elements)."""
    from ..utils.transfer import banded_bounds

    return banded_bounds(nblocks * BLOCK_WORDS, 4)


def _packed_band_layout(nblocks: int, cap_out: int | None = None):
    """Pre-split band boundaries for the packed scan stream."""
    from ..utils.transfer import banded_bounds

    return banded_bounds(nblocks * (PACKED_OUT_WORDS if cap_out is None
                                    else cap_out), 4,
                         band_bytes=_PACKED_BAND_BYTES)


@functools.cache
def _prepacked_jit():
    """Jitted device stages for the prepacked entropy wire.

    full(planes, qlum, qchr) / full_extent(planes, qlum, qchr, th, tw)
    -> (bit_lens u16 [N], word_bands tuple of u32 buffers, totals i32
    [3] = (total_words, total_bits, n_out_of_domain)). ``prepack``
    (blocks + mask -> uncompacted [N, 52] words + lens + bad count) is
    exposed for tests."""
    import jax
    import jax.numpy as jnp

    from .jpegenc import _block_stages

    st = _block_stages()
    dcl, dcc, acl, acc = _tables()

    u32 = jnp.uint32
    i32 = jnp.int32

    def shamt(n):
        """Shift amount safe for u32 ops: clamp to [0, 31] as u32."""
        return jnp.clip(n, 0, 31).astype(u32)

    def shr64_lo(hi, lo, r):
        """Low 32 bits of (hi:lo) >> r for r in [0, 63]."""
        r1 = shamt(r)
        # (32 - r1) & 31 maps r1==0 to 0; the where() discards that lane.
        cross = jnp.where(r1 == 0, u32(0),
                          hi << ((u32(32) - r1) & u32(31)))
        small = (lo >> r1) | cross
        big = hi >> shamt(r - 32)
        return jnp.where(r >= 32, big, small)

    def shl64(hi, lo, n):
        """(hi:lo) << n for n in [0, 63] -> (hi', lo')."""
        n1 = shamt(jnp.where(n >= 32, n - 32, n))
        cross = jnp.where(n1 == 0, u32(0),
                          lo >> ((u32(32) - n1) & u32(31)))
        hi_small = (hi << n1) | cross
        lo_small = lo << n1
        hi_big = lo << n1
        ge = n >= 32
        return (jnp.where(ge, hi_big, hi_small),
                jnp.where(ge, u32(0), lo_small))

    def sel_lookup(key, keys, packed):
        """Select-sum lookup: OR of packed[e] where key == keys[e].

        A 36M-lane gather from even a tiny table serializes on TPU
        (CLAUDE.md); an unrolled compare/select chain fuses into one
        elementwise pass instead. Entries pack (code << 5) | len."""
        out = jnp.zeros(key.shape, u32)
        for k, p in zip(keys.tolist(), packed.tolist()):
            out = out | jnp.where(key == k, u32(p), u32(0))
        return out

    def packed_entries(code, length):
        sym = np.nonzero(length)[0]
        return sym.astype(np.int32), (
            (code[sym].astype(np.uint64) << 5)
            | length[sym].astype(np.uint64)).astype(np.uint32)

    dc_l_keys, dc_l_packed = packed_entries(*dcl)
    dc_c_keys, dc_c_packed = packed_entries(*dcc)
    ac_l_keys, ac_l_packed = packed_entries(*acl)
    ac_c_keys, ac_c_packed = packed_entries(*acc)

    # ZRL (0xF0) repeated 0..3 times as 64-bit constants, and EOB (0x00),
    # per table — python ints baked per repetition count.
    def zrl_consts(code, length):
        zc, zl = int(code[0xF0]), int(length[0xF0])
        reps = []
        v = 0
        for z in range(4):
            reps.append((v >> 32, v & 0xFFFFFFFF, z * zl))
            v = (v << zl) | zc
        return reps

    zrl_l = zrl_consts(*acl)
    zrl_c = zrl_consts(*acc)
    eob_l = (int(acl[0][0]), int(acl[1][0]))
    eob_c = (int(acc[0][0]), int(acc[1][0]))

    def bit_size(v):
        """Size category: bit length of |v| (v i32, |v| <= 2047)."""
        a = jnp.abs(v)
        s = jnp.zeros(v.shape, i32)
        for t in range(12):
            s = s + (a >= (1 << t)).astype(i32)
        return s

    def chroma_select(is_chr, lum_val, chr_val):
        return jnp.where(is_chr, chr_val, lum_val)

    def _lanes(blocks, true_mask):
        """[N, 64] i32 zigzag blocks (DC = masked delta) + bool [N] ->
        per-lane (hi, lo, len) 64-bit code strings for DC + 63 AC + EOB,
        lane lengths zeroed on padding blocks, plus the out-of-domain
        lane count over TRUE blocks."""
        nblk = blocks.shape[0]
        is_chr = ((jnp.arange(nblk, dtype=i32) % 6) >= 4)
        nz = blocks != 0

        # --- DC lane -------------------------------------------------
        d = blocks[:, 0]
        s_dc = bit_size(d)
        mag_dc = jnp.where(d < 0, d - 1, d).astype(u32) & (
            (u32(1) << shamt(s_dc)) - u32(1))
        dc_packed = jnp.where(
            is_chr,
            sel_lookup(s_dc, dc_c_keys, dc_c_packed),
            sel_lookup(s_dc, dc_l_keys, dc_l_packed))
        dc_lo = ((dc_packed >> u32(5)) << shamt(s_dc)) | mag_dc
        dc_len = (dc_packed & u32(31)).astype(i32) + s_dc

        # --- AC lanes: zero runs -> ZRLs + (run, size) symbol ---------
        k = jnp.arange(64, dtype=i32)[None, :]
        codedpos = jnp.where(nz, k, -1).at[:, 0].set(0)  # DC always coded
        prevmax = jax.lax.cummax(codedpos, axis=1)
        lastprev = jnp.concatenate(
            [jnp.zeros((nblk, 1), i32), prevmax[:, :-1]], axis=1)
        run = k - lastprev - 1
        ac = blocks[:, 1:]
        nz_ac = nz[:, 1:]
        run = jnp.where(nz_ac, run[:, 1:], 0)
        z = run >> 4
        rem = run & 15
        s_ac = bit_size(ac)
        sym = (rem << 4) | s_ac
        mag_ac = jnp.where(ac < 0, ac - 1, ac).astype(u32) & (
            (u32(1) << shamt(s_ac)) - u32(1))
        ac_packed = jnp.where(
            is_chr[:, None],
            sel_lookup(sym, ac_c_keys, ac_c_packed),
            sel_lookup(sym, ac_l_keys, ac_l_packed))
        base_lo = ((ac_packed >> u32(5)) << shamt(s_ac)) | mag_ac
        base_len = (ac_packed & u32(31)).astype(i32) + s_ac

        # Prepend z ZRLs (z <= 3): constants selected per z, shifted
        # over the base code+magnitude.
        def zsel(idx, reps):
            hi = jnp.zeros(z.shape, u32)
            lo = jnp.zeros(z.shape, u32)
            ln = jnp.zeros(z.shape, i32)
            for zi, (rh, rl, rlen) in enumerate(reps):
                m = z == zi
                hi = jnp.where(m, u32(rh), hi)
                lo = jnp.where(m, u32(rl), lo)
                ln = jnp.where(m, i32(rlen), ln)
            return hi, lo, ln

        zl_hi, zl_lo, zl_len = zsel(z, zrl_l)
        zc_hi, zc_lo, zc_len = zsel(z, zrl_c)
        zrl_hi = chroma_select(is_chr[:, None], zl_hi, zc_hi)
        zrl_lo = chroma_select(is_chr[:, None], zl_lo, zc_lo)
        zrl_len = chroma_select(is_chr[:, None], zl_len, zc_len)
        sh_hi, sh_lo = shl64(zrl_hi, zrl_lo, base_len)
        ac_hi = sh_hi
        ac_lo = sh_lo | base_lo
        ac_len = jnp.where(nz_ac, zrl_len + base_len, 0)
        ac_hi = jnp.where(nz_ac, ac_hi, u32(0))
        ac_lo = jnp.where(nz_ac, ac_lo, u32(0))

        # --- EOB lane (after the last nonzero when it isn't lane 63) --
        lastnz = prevmax[:, -1]
        eob_needed = lastnz < 63
        eob_lo = chroma_select(is_chr, u32(eob_l[0]), u32(eob_c[0]))
        eob_len = jnp.where(
            eob_needed,
            chroma_select(is_chr, i32(eob_l[1]), i32(eob_c[1])), 0)

        # --- lane table: DC + 63 AC + EOB ------------------------------
        lane_hi = jnp.concatenate(
            [jnp.zeros((nblk, 1), u32), ac_hi,
             jnp.zeros((nblk, 1), u32)], axis=1)
        lane_lo = jnp.concatenate(
            [dc_lo[:, None], ac_lo, eob_lo[:, None]], axis=1)
        lane_len = jnp.concatenate(
            [dc_len[:, None], ac_len, eob_len[:, None]], axis=1)
        lane_len = lane_len * true_mask[:, None].astype(i32)

        # Out-of-domain detector: a defined Huffman entry always packs
        # to (code << 5) | len with len >= 1, so packed == 0 on a coded
        # lane means the (run, size) symbol has NO table entry (e.g. an
        # AC size category > 10) and the emitted stream would be
        # silently undecodable. Count such lanes on TRUE blocks; the
        # host raises instead of shipping a corrupt file.
        bad = jnp.where(
            true_mask,
            (dc_packed == u32(0)).astype(i32)
            + (nz_ac & (ac_packed == u32(0))).astype(i32).sum(axis=1),
            0).sum(dtype=i32)
        return lane_hi, lane_lo, lane_len, bad

    def _assemble(lane_hi, lane_lo, lane_len, lane_off, n_words):
        """65-step word accumulation over lanes: each step one fused
        elementwise pass over the [N, n_words] word grid. Lane offsets
        are arbitrary (the packed wire adds each block's global bit
        phase), words beyond a block's own bits stay zero."""
        nblk = lane_hi.shape[0]
        wpos = (jnp.arange(n_words, dtype=i32) * 32)[None, :]

        def body(t, out):
            hi = jax.lax.dynamic_slice_in_dim(lane_hi, t, 1, axis=1)
            lo = jax.lax.dynamic_slice_in_dim(lane_lo, t, 1, axis=1)
            ln = jax.lax.dynamic_slice_in_dim(lane_len, t, 1, axis=1)
            off = jax.lax.dynamic_slice_in_dim(lane_off, t, 1, axis=1)
            shift = wpos - off  # [N, W]
            r = ln - shift - 32
            pos = shr64_lo(hi, lo, r)
            neg = lo << shamt(-r)
            valid = (shift > -32) & (shift < ln) & (ln > 0)
            return out | jnp.where(valid,
                                   jnp.where(r >= 0, pos, neg), u32(0))

        return jax.lax.fori_loop(
            0, 65, body, jnp.zeros((nblk, n_words), u32))

    def prepack(blocks, true_mask):
        """[N, 64] i32 zigzag blocks (DC = masked delta) + bool [N] ->
        (bit_lens u16 [N], words u32 [N, 52], nwords i32 [N], bad)."""
        lane_hi, lane_lo, lane_len, bad = _lanes(blocks, true_mask)
        lane_off = jnp.cumsum(lane_len, axis=1) - lane_len
        bits = lane_off[:, -1] + lane_len[:, -1]
        nwords = (bits + 31) >> 5
        out = _assemble(lane_hi, lane_lo, lane_len, lane_off, BLOCK_WORDS)
        return bits.astype(jnp.uint16), out, nwords, bad

    def packed(blocks, true_mask, cap_ent, cap_out):
        """The PACKED wire: one contiguous scan bit stream on device.

        Each block's bit string is assembled PRE-ROTATED to its global
        bit phase (offset mod 32 — free in the lane pass: the phase
        just adds to every lane offset, widening the grid to 53 words).
        A rotated block then contributes one u32 "entry" per global
        word it touches; adjacent blocks share at most their boundary
        word, and since compaction is a STABLE sort the entries arrive
        ordered by global word with equal-word runs CONSECUTIVE. Runs
        are OR-merged by 4 bounded prefix-doubling passes (a run is at
        most 2 boundary entries + floor(32/4) whole blocks inside one
        word = 10 entries: the shortest block is DC0+EOB = 4 bits on
        chroma), the first entry of each run keeps the merged word, and
        a second 1-bit-sort compaction yields the finished scan —
        exactly ceil(total_bits/32) words, which the host only has to
        0xFF-stuff (native rpf_jpeg_encode_packed).

        Returns (flat u32 [N*cap_out] zero-tailed, totals i32 [5] =
        (total_words, total_bits, n_out_of_domain, n_entries, n_kept)).
        Capacity overflow (n_entries > N*cap_ent or total_words >
        N*cap_out) silently truncates ON DEVICE — the HOST must check
        totals and degrade to the prepacked wire."""
        nblk = blocks.shape[0]
        lane_hi, lane_lo, lane_len, bad = _lanes(blocks, true_mask)
        lane_off0 = jnp.cumsum(lane_len, axis=1) - lane_len
        bits = lane_off0[:, -1] + lane_len[:, -1]  # 0 on padding blocks
        goff = jnp.cumsum(bits) - bits  # exclusive global bit offset
        r = goff & 31
        grid = _assemble(lane_hi, lane_lo, lane_len,
                         lane_off0 + r[:, None], BLOCK_WORDS_ROT)
        nrot = jnp.where(bits > 0, (bits + r + 31) >> 5, 0)
        j = jnp.arange(BLOCK_WORDS_ROT, dtype=i32)[None, :]
        dropm = j >= nrot[:, None]
        # flag: this entry STARTS a new global word (j > 0 always does;
        # a block's first word is shared with its predecessor's last
        # exactly when the block starts mid-word, r > 0).
        flag = (j > 0) | (r[:, None] == 0)
        n_ent = nrot.sum(dtype=i32)
        _, val_c, flag_c = jax.lax.sort(
            (dropm.reshape(-1).astype(jnp.int8), grid.reshape(-1),
             flag.reshape(-1).astype(jnp.int8)),
            dimension=0, is_stable=True, num_keys=1)
        cap_e = nblk * cap_ent
        v = val_c[:cap_e]
        f = flag_c[:cap_e] != 0

        def nxt(a, d, fill):
            return jnp.concatenate(
                [a[d:], jnp.full((d,), fill, a.dtype)])

        # Segmented OR toward the run head. Entries past n_ent carry
        # garbage flags but ZERO values (the assembly grid is zero
        # beyond each block's words), so absorbing them is harmless.
        w = v
        c = ~nxt(f, 1, True)  # next entry continues this word's run
        for d in (1, 2, 4, 8):
            w = w | jnp.where(c, nxt(w, d, u32(0)), u32(0))
            c = c & nxt(c, d, False)
        idx = jnp.arange(cap_e, dtype=i32)
        keep = f & (idx < n_ent)
        kept = keep.sum(dtype=i32)
        flat = st.compact(w, ~keep, u32)[: nblk * cap_out]
        total_bits = bits.sum(dtype=i32)
        total_words = (total_bits + 31) >> 5
        jpos = jnp.arange(nblk * cap_out, dtype=i32)
        flat = jnp.where(jpos < total_words, flat, u32(0))
        totals = jnp.stack([total_words, total_bits, bad, n_ent, kept])
        return flat, totals

    def _flat(bit_lens, words, nwords, bad):
        """Compact the per-block word grids to the dense wire stream:
        (bit_lens u16 [N], flat u32 [N*52] zero-tailed, totals i32 [3])."""
        nblk = words.shape[0]
        wi = jnp.arange(BLOCK_WORDS, dtype=i32)[None, :]
        drop = (wi >= nwords[:, None]).reshape(-1)
        flat = st.compact(words.reshape(-1), drop, u32)
        total_words = nwords.sum(dtype=i32)
        total_bits = bit_lens.astype(i32).sum(dtype=i32)
        # Zero the tail: compaction leaves dropped words after the
        # prefix; deterministic zeros keep fetches reproducible.
        j = jnp.arange(nblk * BLOCK_WORDS, dtype=i32)
        flat = jnp.where(j < total_words, flat, u32(0))
        totals = jnp.stack([total_words, total_bits, bad])
        return bit_lens, flat, totals

    def _finish(bit_lens, words, nwords, bad):
        """_flat + pre-split at the fixed band boundaries."""
        bit_lens, flat, totals = _flat(bit_lens, words, nwords, bad)
        bounds = _word_band_layout(bit_lens.shape[0])
        bands = tuple(flat[a:b] for a, b in zip(bounds, bounds[1:]))
        return bit_lens, bands, totals

    def wire(planes, qlum, qchr):
        """Un-jitted single-image wire (flat words, no banding) — for
        composition under vmap/sharding (parallel/mesh batch export)."""
        blocks = st.dc_delta(st.blockify(planes, qlum, qchr))
        mask = jnp.ones((blocks.shape[0],), bool)
        return _flat(*prepack(blocks, mask))

    def _true_mask(nblk, grid_c, mcu_r, mcu_c):
        mcu = jnp.arange(nblk, dtype=i32) // 6
        return ((mcu // grid_c) < mcu_r) & ((mcu % grid_c) < mcu_c)

    def _dc_delta_masked(blocks, true_mask):
        """DC -> delta vs the previous TRUE same-component block (the
        emitted prediction chain: bucket-padding blocks are not emitted,
        so unlike the nibble wire the deltas must skip them)."""
        m = blocks.shape[0] // 6
        b3 = blocks.reshape(m, 6, 64)
        tm = true_mask.reshape(m, 6)
        dc = b3[:, :, 0]

        def delta(seq, keep):
            # prev_true[i] = seq[j] for the largest j < i with keep[j]
            def comb(a, b):
                av, ah = a
                bv, bh = b
                return jnp.where(bh, bv, av), ah | bh

            held = jax.lax.associative_scan(
                comb, (jnp.where(keep, seq, 0), keep))
            prev = jnp.concatenate([jnp.zeros((1,), seq.dtype),
                                    held[0][:-1]])
            return seq - prev

        dy = delta(dc[:, :4].reshape(-1), tm[:, :4].reshape(-1)
                   ).reshape(m, 4)
        db = delta(dc[:, 4], tm[:, 4])[:, None]
        dr = delta(dc[:, 5], tm[:, 5])[:, None]
        b3 = b3.at[:, :, 0].set(jnp.concatenate([dy, db, dr], axis=1))
        return b3.reshape(m * 6, 64)

    @jax.jit
    def full(planes, qlum, qchr):
        blocks = st.dc_delta(st.blockify(planes, qlum, qchr))
        mask = jnp.ones((blocks.shape[0],), bool)
        return _finish(*prepack(blocks, mask))

    @jax.jit
    def full_extent(planes, qlum, qchr, th, tw):
        # th/tw are traced 0-d ints: one compile per bucket shape.
        blocks = st.blockify(planes, qlum, qchr, (th, tw))
        grid_c = planes.shape[-1] // 16
        mask = _true_mask(blocks.shape[0], grid_c,
                          -(-th // 16), -(-tw // 16))
        blocks = _dc_delta_masked(blocks, mask)
        return _finish(*prepack(blocks, mask))

    @jax.jit
    def prepack_blocks(blocks, true_mask):
        return prepack(blocks, true_mask)

    def _finish_packed(flat, totals, cap_out):
        bounds = _packed_band_layout(flat.shape[0] // cap_out, cap_out)
        return tuple(flat[a:b] for a, b in zip(bounds, bounds[1:])), totals

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def full_packed(planes, qlum, qchr, cap_ent, cap_out):
        blocks = st.dc_delta(st.blockify(planes, qlum, qchr))
        mask = jnp.ones((blocks.shape[0],), bool)
        return _finish_packed(*packed(blocks, mask, cap_ent, cap_out),
                              cap_out)

    @functools.partial(jax.jit, static_argnums=(5, 6))
    def full_packed_extent(planes, qlum, qchr, th, tw, cap_ent, cap_out):
        blocks = st.blockify(planes, qlum, qchr, (th, tw))
        grid_c = planes.shape[-1] // 16
        mask = _true_mask(blocks.shape[0], grid_c,
                          -(-th // 16), -(-tw // 16))
        blocks = _dc_delta_masked(blocks, mask)
        return _finish_packed(*packed(blocks, mask, cap_ent, cap_out),
                              cap_out)

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def packed_blocks(blocks, true_mask, cap_ent, cap_out):
        return packed(blocks, true_mask, cap_ent, cap_out)

    def wire_packed(planes, qlum, qchr, cap_ent, cap_out):
        """Un-jitted single-image packed wire (flat words + totals) —
        for composition under vmap/sharding."""
        blocks = st.dc_delta(st.blockify(planes, qlum, qchr))
        mask = jnp.ones((blocks.shape[0],), bool)
        return packed(blocks, mask, cap_ent, cap_out)

    def wire_packed_extent(planes, qlum, qchr, th, tw, cap_ent, cap_out):
        """Un-jitted packed wire on a BUCKET-PADDED render with a static
        true extent ``th x tw`` — full_packed_extent without the band
        split, for composition under vmap/sharding (the mesh batch
        export). Pad blocks carry bits==0 and occupy no words; DC deltas
        chain over true blocks only (_dc_delta_masked), so the stream is
        byte-identical to a single-image encode of the same pixels."""
        blocks = st.blockify(planes, qlum, qchr, (th, tw))
        grid_c = planes.shape[-1] // 16
        mask = _true_mask(blocks.shape[0], grid_c,
                          -(-th // 16), -(-tw // 16))
        blocks = _dc_delta_masked(blocks, mask)
        return packed(blocks, mask, cap_ent, cap_out)

    import types

    return types.SimpleNamespace(full=full, full_extent=full_extent,
                                 prepack=prepack_blocks, wire=wire,
                                 full_packed=full_packed,
                                 full_packed_extent=full_packed_extent,
                                 packed=packed_blocks,
                                 wire_packed=wire_packed,
                                 wire_packed_extent=wire_packed_extent,
                                 dc_delta_masked=jax.jit(_dc_delta_masked))


def encode_prepacked_device(planes, quality: int, stage=None,
                            true_shape=None) -> bytes:
    """Device entropy coding -> banded fetch -> native concatenation.

    The prepacked twin of jpegenc._encode_sparse_device: same bucket
    rules (``true_shape`` marks a bucket-padded render; the program keys
    on the padded shape with the extent traced), same fetch discipline
    (whole-buffer band transfers; see utils/transfer.fetch_banded)."""
    import jax.numpy as jnp

    from .. import native
    from ..utils.transfer import fetch_banded
    from .jpegenc import _quant_tables

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
    stages = _prepacked_jit()
    qlum, qchr = _quant_tables(quality)
    if padded:
        lens_d, word_bands, totals = stages.full_extent(
            planes, jnp.asarray(qlum), jnp.asarray(qchr), h, w)
        grid = (ph // 16, pw // 16)
    else:
        lens_d, word_bands, totals = stages.full(
            planes, jnp.asarray(qlum), jnp.asarray(qchr))
        grid = None
    stage("fetch")
    nblocks = -(-ph // 16) * (-(-pw // 16)) * 6
    bounds = _word_band_layout(nblocks)
    tv = np.asarray(totals)
    if int(tv[2]):
        # Lanes whose (run, size) symbol has no Annex-K.3 entry would
        # emit a zero-length Huffman prefix — a silently undecodable
        # stream. Fail loudly; encode_jpeg degrades to the nibble wire
        # (whose coder validates size categories itself).
        raise ValueError(
            f"{int(tv[2])} coefficients outside the baseline Huffman "
            "domain (AC size > 10 or DC delta size > 11)")
    n_words = int(tv[0])
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as pool:
        fw = pool.submit(fetch_banded, word_bands, bounds, n_words)
        host_lens = np.asarray(lens_d)
        host_words = fw.result()
    stage("encode")
    return native.jpeg_encode_prepacked(
        host_lens, host_words, h, w, quality=quality, grid=grid)


def encode_packed_device(planes, quality: int, stage=None,
                         true_shape=None) -> bytes:
    """PACKED wire: the device emits the finished contiguous scan.

    The link carries exactly ceil(total_bits/32) u32 words — no per-
    block length array, no per-block word alignment — and the native
    coder (rpf_jpeg_encode_packed) only writes headers and 0xFF-stuffs.
    Same bucket rules as the other device wires (``true_shape`` marks a
    bucket-padded render). Raises on capacity overflow (dense content
    beyond PACKED_*_WORDS per block) or out-of-domain coefficients —
    encode_jpeg degrades to the prepacked wire, which has no aggregate
    capacity limits."""
    import jax.numpy as jnp

    from .. import native
    from ..utils.transfer import fetch_banded
    from .jpegenc import _quant_tables

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
    stages = _prepacked_jit()
    qlum, qchr = _quant_tables(quality)
    cap_ent, cap_out = PACKED_ENT_WORDS, PACKED_OUT_WORDS
    if padded:
        word_bands, totals = stages.full_packed_extent(
            planes, jnp.asarray(qlum), jnp.asarray(qchr), h, w,
            cap_ent, cap_out)
    else:
        word_bands, totals = stages.full_packed(
            planes, jnp.asarray(qlum), jnp.asarray(qchr),
            cap_ent, cap_out)
    stage("fetch")
    nblocks = -(-ph // 16) * (-(-pw // 16)) * 6
    bounds = _packed_band_layout(nblocks, cap_out)
    tv = np.asarray(totals)
    total_words, total_bits, bad, n_ent, kept = (int(x) for x in tv)
    if bad:
        raise ValueError(
            f"{bad} coefficients outside the baseline Huffman domain "
            "(AC size > 10 or DC delta size > 11)")
    if n_ent > nblocks * cap_ent:
        raise ValueError(
            f"packed entry stream overflow ({n_ent} > "
            f"{nblocks * cap_ent}): content too dense for the packed "
            "wire capacities")
    if total_words > nblocks * cap_out:
        raise ValueError(
            f"packed scan overflow ({total_words} words > "
            f"{nblocks * cap_out})")
    if kept != total_words or total_bits < 0:
        # A device-side invariant break (kept-run count must equal the
        # word count of a contiguous stream) would otherwise ship a
        # silently corrupt file.
        raise ValueError(
            f"packed stream inconsistent (kept={kept}, "
            f"total_words={total_words}, total_bits={total_bits})")
    host_words = fetch_banded(word_bands, bounds, total_words)
    stage("encode")
    return native.jpeg_encode_packed(
        host_words, total_bits, h, w, quality=quality)
