"""A/B the three sparse JPEG export wires on the real TPU at 24MP.

Compares the nibble wire (io/jpegenc._sparse_jit + rpf_jpeg_encode_sparse),
the prepacked entropy wire (io/jpegbits + rpf_jpeg_encode_prepacked), and
the PACKED wire (io/jpegbits.packed + rpf_jpeg_encode_packed: the device
emits the finished contiguous scan) on c5-like noisy content and on
smooth natural-gradient content: fetched bytes per image, per-image wall
time (totals sync -> fetch -> host encode), and byte identity of the
outputs. Run on a QUIET chip; results append to stdout as one JSON line
per (content, wire).

Usage: timeout 1800 python tools/wire_ab.py [n_reps]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax
    import jax.numpy as jnp

    from rawphotoforge_tpu.io import jpegbits, jpegenc
    from rawphotoforge_tpu.kernels import raw_pipeline as rp
    from rawphotoforge_tpu.core.params import EditParameters, pack_params
    from rawphotoforge_tpu.utils.transfer import banded_fetch_elems, fetch_banded

    bh, bw = 4000, 6000
    yy, xx = jnp.mgrid[0:bh, 0:bw].astype(jnp.float32)
    base = 0.35 + 0.3 * jnp.sin(xx / 700.0) * jnp.cos(yy / 500.0)
    noisy = jnp.clip(base + 0.02 * jax.random.normal(
        jax.random.PRNGKey(0), (bh, bw)), 0.0, 1.0)
    smooth = jnp.clip(base + 0.002 * jax.random.normal(
        jax.random.PRNGKey(1), (bh, bw)), 0.0, 1.0)

    p = EditParameters()
    p.set_tone(exposure=0.35, contrast=18)
    p.set_sharpness(60)
    params = pack_params([p], extent=(bh, bw))
    wb = jnp.asarray([2.0, 1.0, 1.5], jnp.float32)
    cam = jnp.eye(3, dtype=jnp.float32)

    @jax.jit
    def develop(m):
        return rp.raw_develop_fused(m, wb, cam, params, jnp.float32(0.8))

    nblocks = (bh // 16) * (bw // 16) * 6
    bmb, vb, eb = jpegenc._band_layout(nblocks)
    wbnd = jpegbits._word_band_layout(nblocks)
    pbnd = jpegbits._packed_band_layout(nblocks)
    caps = (jpegbits.PACKED_ENT_WORDS, jpegbits.PACKED_OUT_WORDS)
    st_n = jpegenc._sparse_jit()
    st_p = jpegbits._prepacked_jit()
    qlum, qchr = (jnp.asarray(t) for t in jpegenc._quant_tables(92))

    from rawphotoforge_tpu import native

    for name, mosaic in [("noisy", noisy), ("smooth", smooth)]:
        srgb = develop(mosaic)
        srgb.block_until_ready()
        # force materialization before timing (tunnel: fetch one element)
        float(srgb[0, 0, 0])

        out_n = out_p = out_k = None
        for wire in ("nibble", "prepacked", "packed"):
            times, moved_l = [], []
            for r in range(reps + 1):  # rep 0 = compile warm, dropped
                t0 = time.perf_counter()
                if wire == "packed":
                    word_bands, totals = st_p.full_packed(
                        srgb, qlum, qchr, *caps)
                    tv = np.asarray(totals)
                    n_words, n_bits = int(tv[0]), int(tv[1])
                    hw = fetch_banded(word_bands, pbnd, n_words)
                    moved = 20 + 4 * banded_fetch_elems(n_words, pbnd)
                    out_k = native.jpeg_encode_packed(
                        hw, n_bits, bh, bw, quality=92)
                elif wire == "nibble":
                    bm_b, val_b, esc_b, totals = st_n.full_banded(
                        srgb, qlum, qchr)
                    n, n_esc = (int(v) for v in np.asarray(totals))
                    hb = fetch_banded(bm_b, bmb, nblocks * 2)
                    hv = fetch_banded(val_b, vb, (n + 1) // 2)
                    he = fetch_banded(esc_b, eb, n_esc)
                    hc = jpegenc._popcount_rows(hb.reshape(nblocks, 2))
                    moved = (8 + 4 * banded_fetch_elems(nblocks * 2, bmb)
                             + banded_fetch_elems((n + 1) // 2, vb)
                             + 2 * banded_fetch_elems(n_esc, eb))
                    out_n = native.jpeg_encode_sparse(
                        hc, hb.reshape(nblocks, 2), hv, he, bh, bw,
                        quality=92)
                else:
                    lens_d, word_bands, totals = st_p.full(srgb, qlum, qchr)
                    n_words = int(np.asarray(totals)[0])
                    hw = fetch_banded(word_bands, wbnd, n_words)
                    hl = np.asarray(lens_d)
                    moved = (8 + 2 * nblocks
                             + 4 * banded_fetch_elems(n_words, wbnd))
                    out_p = native.jpeg_encode_prepacked(
                        hl, hw, bh, bw, quality=92)
                dt = time.perf_counter() - t0
                if r > 0:
                    times.append(dt)
                    moved_l.append(moved)
            rec = {"content": name, "wire": wire,
                   "s_per_image": round(float(np.median(times)), 3),
                   "fetched_mb": round(moved_l[0] / 1e6, 2),
                   "jpeg_mb": round(len(out_n or out_p or out_k) / 1e6, 2)}
            print(json.dumps(rec), flush=True)
        assert out_n == out_p == out_k, \
            f"wire outputs differ on {name} content"
        print(f"# {name}: wires byte-identical "
              f"({len(out_n)} bytes)", flush=True)


if __name__ == "__main__":
    main()
