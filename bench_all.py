"""Full benchmark suite: the five BASELINE.json configs on real hardware.

Writes a human-readable report to stderr and a JSON results dict to
bench_results.json. The headline single-line metric stays in bench.py.

Configs (BASELINE.md):
  1. 24MP sRGB: exposure + contrast + tone-curve edit, single image
  2. 24MP Bayer RAW: demosaic + WB + camera-matrix -> sRGB
  3. 45MP RAW full stack: demosaic + develop + sharpen + live histogram
  4. interactive preview loop: per-slider edit sweeps at three pyramid
     levels with dirty-stage caching (reports device ms/frame)
  5. batch develop: 256-image RAW->sRGB export in device-sized chunks

Timing uses chained-loop difference quotients (utils/profiling.device_time)
so remote-tunnel round trips don't pollute device numbers.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from rawphotoforge_tpu.core.params import (
        BRIGHTNESS, HUE, SATURATION, LIGHTNESS, EditParameters, pack_params,
    )
    from rawphotoforge_tpu.kernels import fused
    from rawphotoforge_tpu.ops import demosaic as dm
    from rawphotoforge_tpu.ops.sharpen import unsharp_mask
    from rawphotoforge_tpu.ops.stats import histogram_rgbl
    from rawphotoforge_tpu.utils.profiling import device_time, fetch_sync

    results = {}
    log(f"bench_all: backend={jax.default_backend()} devices={jax.devices()}")

    def edit_params(extent=None):
        p = EditParameters()
        p.set_tone(exposure=0.7, contrast=25, shadow=30, highlight=-20, black=5, white=-5)
        p.set_whitebalance(temperature=25, tint=-10)
        p.set_vignette(40)
        p.set_curve(BRIGHTNESS, [0, 16000, 40000, 65535], [1000, 20000, 46000, 65535])
        p.set_curve(HUE, [0, 30000, 65535], [4000, 33000, 63000])
        p.set_curve(SATURATION, [0, 40000, 65535], [36000, 30000, 36000])
        p.set_curve(LIGHTNESS, [0, 65535], [31000, 35000])
        return jax.device_put(pack_params([p], extent=extent))

    key = jax.random.PRNGKey(0)

    # ---- config 1: 24MP sRGB edit ----------------------------------------
    h, w = 4000, 6000
    planes = jax.random.uniform(key, (3, h, w), dtype=jnp.float32)
    masks = jnp.ones((1, h, w), dtype=jnp.float32)
    params = edit_params()
    dev_fn = functools.partial(fused.develop_post_geo_fused, main_mask_all_ones=True)
    dt = device_time(
        dev_fn, planes, params, masks,
        chain=lambda i, out, a: (out,) + a[1:],
    )
    results["c1_24mp_edit_ms"] = dt * 1e3
    results["c1_24mp_edit_mpix_s"] = h * w / 1e6 / dt
    log(f"config 1: 24MP full edit stack {dt * 1e3:.2f} ms "
        f"= {h * w / 1e6 / dt:.0f} MPix/s")

    # ---- config 2: 24MP Bayer demosaic + WB + matrix ---------------------
    mosaic = jax.random.uniform(key, (h, w), dtype=jnp.float32)
    wb = jnp.asarray([2.0, 1.0, 1.5])
    cam = jnp.asarray(dm.cam_matrix_to_srgb(
        np.array([[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]])
    ))

    @jax.jit
    def raw_develop_step(m):
        rgb = dm.develop_raw(m, wb, cam, pattern="RGGB", method="malvar")
        return rgb

    dt = device_time(
        raw_develop_step, mosaic,
        chain=lambda i, out, a: (out[0],),
    )
    results["c2_24mp_raw_ms"] = dt * 1e3
    results["c2_24mp_raw_mpix_s"] = h * w / 1e6 / dt
    log(f"config 2: 24MP Bayer malvar demosaic + WB + matrix {dt * 1e3:.2f} ms "
        f"= {h * w / 1e6 / dt:.0f} MPix/s")

    # ---- config 3: 45MP RAW full stack + histogram -----------------------
    h3, w3 = 5504, 8256
    mosaic3 = jax.random.uniform(key, (h3, w3), dtype=jnp.float32)
    masks3 = jnp.ones((1, h3, w3), dtype=jnp.float32)
    params3 = edit_params()

    from rawphotoforge_tpu.kernels import raw_pipeline

    @jax.jit
    def full_stack(m):
        # One-pass fused kernel: mosaic is read once, sRGB written once.
        srgb = raw_pipeline.raw_develop_fused(
            m, wb, cam, params3, jnp.float32(0.8))
        hist = histogram_rgbl(srgb)
        return srgb, hist

    dt = device_time(
        full_stack, mosaic3,
        chain=lambda i, out, a: (out[0][0],),
    )
    results["c3_45mp_full_ms"] = dt * 1e3
    results["c3_45mp_full_mpix_s"] = h3 * w3 / 1e6 / dt
    log(f"config 3: 45MP demosaic+sharpen+edit+histogram {dt * 1e3:.2f} ms "
        f"= {h3 * w3 / 1e6 / dt:.0f} MPix/s")

    # ---- config 4: interactive slider sweep ------------------------------
    # Device time of one preview re-render at each pyramid level for a 45MP
    # session (MID 1280, LOW 400 long edge), the drag->LOW / release->MID /
    # idle->FULL policy of the reference UI.
    def level_time(lh, lw):
        pl = jax.random.uniform(key, (3, lh, lw), dtype=jnp.float32)
        mk = jnp.ones((1, lh, lw), dtype=jnp.float32)
        pr = edit_params(extent=(lh, lw))
        # Preview kernels are sub-millisecond: difference-quotient timing
        # needs many chained iterations to rise above launch jitter.
        return max(
            device_time(
                functools.partial(fused.develop_post_geo_fused,
                                  main_mask_all_ones=True), pl, pr, mk, iters=200,
                chain=lambda i, out, a: (out,) + a[1:],
            ),
            0.0,
        )

    t_low = level_time(256, 384)     # ~LOW bucket for 3:2
    t_mid = level_time(896, 1280)    # ~MID bucket
    results["c4_drag_low_ms"] = t_low * 1e3
    results["c4_release_mid_ms"] = t_mid * 1e3
    results["c4_full_45mp_ms"] = results["c3_45mp_full_ms"]
    log(f"config 4: slider-to-preview device time: LOW {t_low * 1e3:.2f} ms, "
        f"MID {t_mid * 1e3:.2f} ms, FULL(45MP w/ demosaic) "
        f"{results['c3_45mp_full_ms']:.1f} ms — north star < 50 ms")

    # ---- config 5: 256-image batch export --------------------------------
    bh, bw = 1024, 1536
    chunk = 16
    mosaics = jax.random.uniform(key, (chunk, bh, bw), dtype=jnp.float32)
    masks5 = jnp.ones((1, bh, bw), dtype=jnp.float32)
    params5 = edit_params(extent=(bh, bw))

    from rawphotoforge_tpu.kernels import raw_pipeline as rp

    @jax.jit
    def export_chunk(ms):
        def one(m):
            srgb = rp.raw_develop_fused(m, wb, cam, params5, jnp.float32(0.8))
            return (jnp.clip(srgb, 0, 1) * 255.0).astype(jnp.uint8)

        # lax.map, not vmap: the one-pass kernel's ANY-memory mosaic input
        # cannot be batch-blocked; sequential per-image is the semantics of
        # an export queue anyway.
        return jax.lax.map(one, ms)

    fetch_sync(export_chunk(mosaics))  # compile
    n_chunks = 256 // chunk
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        out = export_chunk(mosaics)
    fetch_sync(out)
    dt_total = time.perf_counter() - t0
    total_mpix = 256 * bh * bw / 1e6
    results["c5_batch256_s"] = dt_total
    results["c5_batch256_mpix_s"] = total_mpix / dt_total
    log(f"config 5: 256x{bh}x{bw} RAW->sRGB-u8 export {dt_total:.2f} s "
        f"= {total_mpix / dt_total:.0f} MPix/s sustained")

    with open("bench_results.json", "w") as f:
        json.dump({k: round(v, 3) for k, v in results.items()}, f, indent=1)
    log("bench_all: wrote bench_results.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
