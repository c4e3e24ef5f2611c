"""Tunnel link probe: A/B the compute/fetch overlap of the banded sparse
export wire on real hardware.

Measures the per-image export cycle (sparse program -> totals sync ->
banded fetch) with and without dispatching image i+1 BEFORE fetching
image i. With slice-at-fetch-time bands the overlap order was 2x SLOWER
(per-band slice programs queued behind the next image's compute on the
device); pre-split band buffers (io/jpegenc._sparse_jit full_banded)
transfer with no device program, so the overlap should now win. Run:

    timeout 1200 python tools/link_probe.py --images 12

Prints per-order medians + the implied c5 projection. Safe to re-run;
the sparse program compile (~1-3 min remote) is paid once per process.
"""

from __future__ import annotations

import argparse
import statistics
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=12)
    ap.add_argument("--h", type=int, default=4000)
    ap.add_argument("--w", type=int, default=6000)
    ap.add_argument("--orders", default="overlap,serial")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rawphotoforge_tpu.io import jpegenc
    from rawphotoforge_tpu.utils.transfer import (
        banded_fetch_elems, fetch_banded, start_banded)

    bh, bw = args.h, args.w
    print(f"device: {jax.devices()[0]}  image {bh}x{bw}")
    # c5's content: smooth base + mild noise (dense-ish coefficients).
    yy, xx = jnp.mgrid[0:bh, 0:bw].astype(jnp.float32)
    base = 0.35 + 0.3 * jnp.sin(xx / 700.0) * jnp.cos(yy / 500.0)
    srcs = [
        jnp.clip(
            jnp.stack([base, base, base])
            + 0.02 * jax.random.normal(jax.random.PRNGKey(i), (3, bh, bw)),
            0.0, 1.0)
        for i in range(2)
    ]
    stages = jpegenc._sparse_jit()
    qlum, qchr = (jnp.asarray(t) for t in jpegenc._quant_tables(92))
    nblocks = (bh // 16) * (bw // 16) * 6
    bmb, vb, eb = jpegenc._band_layout(nblocks)

    def dispatch(i):
        return stages.full_banded(srcs[i % 2], qlum, qchr)

    def fetch(dev, pool):
        tv = np.asarray(dev[3])
        n, n_esc = int(tv[0]), int(tv[1])
        fb = pool.submit(fetch_banded, dev[0], bmb, nblocks * 2)
        fv = pool.submit(fetch_banded, dev[1], vb, (n + 1) // 2)
        he = fetch_banded(dev[2], eb, n_esc)
        hb, hv = fb.result(), fv.result()
        moved = (8 + 4 * banded_fetch_elems(nblocks * 2, bmb)
                 + banded_fetch_elems((n + 1) // 2, vb)
                 + 2 * banded_fetch_elems(n_esc, eb))
        return (hb, hv, he), moved

    t0 = time.perf_counter()
    out = dispatch(0)
    np.asarray(out[3])
    print(f"compile+first run: {time.perf_counter() - t0:.1f} s")

    # Device-only time for the sparse program (chained pair): run two
    # back-to-back dispatches and sync only the second — the gap between
    # that and a single dispatch's sync approximates one program.
    t0 = time.perf_counter()
    a = dispatch(0)
    np.asarray(a[3])
    t1 = time.perf_counter()
    b0, b1 = dispatch(0), dispatch(1)
    np.asarray(b0[3]), np.asarray(b1[3])
    t2 = time.perf_counter()
    print(f"sparse program ~{(t2 - t1) - (t1 - t0):.2f} s/image "
          f"(single-sync {t1 - t0:.2f} s)")

    for order in args.orders.split(","):
        overlap = order.strip() == "overlap"
        times, bytes_moved = [], 0
        with ThreadPoolExecutor(4) as pool:
            dev = dispatch(0)
            for i in range(args.images):
                tf = time.perf_counter()
                tv = np.asarray(dev[3])
                n, n_esc = int(tv[0]), int(tv[1])
                nxt = None
                if overlap:
                    start_banded(dev[0], bmb, nblocks * 2)
                    start_banded(dev[1], vb, (n + 1) // 2)
                    start_banded(dev[2], eb, n_esc)
                    if i + 1 < args.images:
                        nxt = dispatch(i + 1)
                _, moved = fetch(dev, pool)
                if not overlap and i + 1 < args.images:
                    nxt = dispatch(i + 1)
                times.append(time.perf_counter() - tf)
                bytes_moved += moved
                dev = nxt
        med = statistics.median(times)
        mb = bytes_moved / args.images / 1e6
        print(f"{order:>8}: median {med:.2f} s/image "
              f"({mb:.1f} MB/image, {mb / med:.1f} MB/s eff), "
              f"projected 256-image c5 {med * 256:.0f} s")


if __name__ == "__main__":
    main()
