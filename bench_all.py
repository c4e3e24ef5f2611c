"""Full benchmark suite: the five BASELINE.json configs on real hardware.

Writes a human-readable report to stderr and a JSON results dict to
bench_results.json. The headline single-line metric stays in bench.py.

Configs (BASELINE.md):
  1. 24MP sRGB: exposure + contrast + tone-curve edit, single image
     (1a: slider-only staircase-shortcut variant; 1b: M=4 regional masks)
  2. 24MP Bayer RAW: demosaic + WB + camera-matrix -> sRGB
  3. 45MP RAW full stack: demosaic + develop + sharpen + live histogram
  4. interactive preview loop: per-slider edit sweeps at three pyramid
     levels with dirty-stage caching (reports device ms/frame)
  5. batch develop: 256x 24MP RAW -> JPEG export, end to end
  6. time-to-first-MID-preview: cold / warm / prewarmed (runs first)
  7. 24MP X-Trans residual demosaic develop

Timing uses chained-loop difference quotients (utils/profiling.device_time)
so remote-tunnel round trips don't pollute device numbers.

``--only 1,2`` re-measures a subset and merges into the existing
bench_results.json (useful to re-run the fast configs on a quiet machine
after the 15-minute config 5).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

RESULTS_PATH = "bench_results.json"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _watchdog(seconds: int, on_timeout):
    """Abort with PARTIAL results instead of hanging on a wedged tunnel.

    Returns a ``rearm(secs)`` callable so long multi-step phases (the
    config-5 export loop) can convert the deadline from total-runtime to
    time-since-last-progress.  On alarm, ``on_timeout()`` runs first
    (it flushes whatever was measured to bench_results.json — round 3
    lost its perf evidence to a silent rc=124), then the process exits 2.
    No-op when RPF_BENCH_TIMEOUT_S=0.
    """
    import os
    import signal

    try:
        timeout = int(float(os.environ.get("RPF_BENCH_TIMEOUT_S", seconds)))
    except ValueError:
        timeout = seconds
    if timeout <= 0:
        return lambda secs: None

    def on_alarm(signum, frame):
        log("bench_all: watchdog expired (tunnel wedged?) — writing "
            "partial results and aborting")
        try:
            on_timeout()
        finally:
            os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(timeout)
    return signal.alarm


def main(argv=None) -> int:
    # Config 5 alone is a real 10-20 min export; leave generous headroom
    # while still refusing to hang forever on a wedged tunnel. Its export
    # loop re-arms this per chunk, so the deadline there is
    # time-since-last-progress, not total runtime — a degraded tunnel
    # (observed: 40x below nominal for two hours) still finishes.
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated config ids (6,1,1a,1b,1c,2,3,4,4e,7,5); "
                         "results merge into the existing JSON")
    cli = ap.parse_args(argv)
    only = set(cli.only.split(",")) if cli.only else None

    def want(cfg: str) -> bool:
        return only is None or cfg in only

    import jax
    import jax.numpy as jnp

    from rawphotoforge_tpu.core.params import (
        BRIGHTNESS, HUE, SATURATION, LIGHTNESS, EditParameters, pack_params,
    )
    from rawphotoforge_tpu.kernels import fused
    from rawphotoforge_tpu.kernels import raw_pipeline as rp
    from rawphotoforge_tpu.ops import demosaic as dm
    from rawphotoforge_tpu.ops.stats import histogram_rgbl
    from rawphotoforge_tpu.utils.profiling import device_time, fetch_sync

    results = {}
    if only is not None:
        try:
            with open(RESULTS_PATH) as f:
                results.update(json.load(f))
        except (OSError, ValueError):
            pass

    def flush_results(partial: bool = False):
        """Write bench_results.json NOW — called after every config so a
        later wedge can never erase earlier measurements."""
        rec = {k: (round(v, 3) if isinstance(v, float) else v)
               for k, v in results.items()}
        if partial:
            rec["bench_incomplete"] = True
        elif "bench_incomplete" in rec:
            del rec["bench_incomplete"]
        with open(RESULTS_PATH, "w") as f:
            json.dump(rec, f, indent=1)

    rearm_watchdog = _watchdog(7200, lambda: flush_results(partial=True))
    log(f"bench_all: backend={jax.default_backend()} devices={jax.devices()}")

    # Tunnel probe BEFORE any compile: one tiny round-trip in an
    # EXPENDABLE subprocess under a hard timeout (a wedged tunnel blocks
    # any thread of this process forever inside PJRT — bench.py's
    # _subprocess_probe note), then the same cycle on this process's
    # main thread to validate our own session.
    from bench import _subprocess_probe
    if not _subprocess_probe(90):
        log("bench_all: tunnel probe made no progress in 90s (wedged?) — "
            "aborting before any compile")
        flush_results(partial=True)
        return 2
    float((jnp.asarray([1.0]) + 1.0)[0])
    log("bench_all: probe ok")

    def main_edit() -> EditParameters:
        p = EditParameters()
        p.set_tone(exposure=0.7, contrast=25, shadow=30, highlight=-20, black=5, white=-5)
        p.set_whitebalance(temperature=25, tint=-10)
        p.set_vignette(40)
        p.set_curve(BRIGHTNESS, [0, 16000, 40000, 65535], [1000, 20000, 46000, 65535])
        p.set_curve(HUE, [0, 30000, 65535], [4000, 33000, 63000])
        p.set_curve(SATURATION, [0, 40000, 65535], [36000, 30000, 36000])
        p.set_curve(LIGHTNESS, [0, 65535], [31000, 35000])
        return p

    def edit_params(extent=None):
        return jax.device_put(pack_params([main_edit()], extent=extent))

    key = jax.random.PRNGKey(0)
    h, w = 4000, 6000
    chain_first = lambda i, out, a: (out,) + a[1:]  # noqa: E731
    dev_fn = functools.partial(fused.develop_post_geo_fused,
                               main_mask_all_ones=True)
    wb = jnp.asarray([2.0, 1.0, 1.5])
    cam = jnp.asarray(dm.cam_matrix_to_srgb(
        np.array([[0.8, -0.1, -0.05], [-0.3, 1.1, 0.15], [-0.05, 0.15, 0.65]])
    ))

    def planes_masks():
        planes = jax.random.uniform(key, (3, h, w), dtype=jnp.float32)
        masks = jnp.ones((1, h, w), dtype=jnp.float32)
        return planes, masks

    if want("6"):
        # Time-to-first-MID-preview (VERDICT r2 #3): wall-clock from
        # PhotoEditor construction (decoded planes in hand) to the first
        # MID preview JPEG bytes — the cold-open pain the reference never
        # has (web/main.ts:652-695 renders immediately). Runs FIRST so
        # configs 1-5 can't pre-populate the in-process jit cache.
        #   cold      - TRUE cold: the persistent compile cache is
        #               redirected to an empty temp dir for this one
        #               measurement, so every program pays the full
        #               remote XLA compile (rounds of bench runs would
        #               otherwise slowly populate .jax_cache with the
        #               jittered aspects and quietly turn "cold" warm)
        #   warm      - same image, new session: in-process jit cache
        #   prewarmed - standard 3:2 24MP from the REAL persistent cache
        #               after warm_shape() of the standard preview
        #               buckets (the server-start path)
        import tempfile

        from rawphotoforge_tpu.engine import prewarm
        from rawphotoforge_tpu.engine.editor import MID, PhotoEditor
        from rawphotoforge_tpu.io import image_io

        def first_preview_s(ppm_bytes):
            # The PRODUCTION open path, driven through the real decode +
            # device-phase entry points (no harness reimplementation
            # that could drift): decode_image_host -> from_host takes
            # the bucket-stable upload_padded closure (host edge-pad,
            # banded u16 upload, on-device normalize, true_shape).
            # PPM16 keeps host codec time negligible, so the number is
            # open->first-MID-preview, not JPEG-decode time.
            from rawphotoforge_tpu.engine.editor import HostOpen

            t0 = time.perf_counter()
            hd = image_io.decode_image_host(ppm_bytes, "PPM16")
            ed = PhotoEditor.from_host(HostOpen(hd, None))
            jpeg = image_io.encode_image(ed.apply(MID), "JPEG", quality=90)
            assert jpeg[:2] == b"\xff\xd8"
            return time.perf_counter() - t0

        def ppm16_of(u16_hwc):
            hh, ww = u16_hwc.shape[:2]
            return (b"P6\n%d %d\n65535\n" % (ww, hh)
                    + u16_hwc.astype(">u2").tobytes())

        rng6 = np.random.default_rng(6)
        # Unseen extents; starts past 4096 so the cold/warm image's
        # 128-bucket can never collide with the prewarmed 4000x6000 run
        # (bucket-stable programs would otherwise let "prewarmed"
        # free-ride the warm run's in-process cache).
        jit_h = 4104 + 8 * (int(time.time()) % 97) + 1
        cold_img = ppm16_of(rng6.integers(0, 65536, size=(jit_h, 6000, 3),
                                          dtype=np.uint16))
        real_cache = jax.config.jax_compilation_cache_dir
        with tempfile.TemporaryDirectory(prefix="rpf_coldcache_") as tmp:
            jax.config.update("jax_compilation_cache_dir", tmp)
            try:
                t_cold = first_preview_s(cold_img)
            finally:
                jax.config.update("jax_compilation_cache_dir", real_cache)
        t_warm = first_preview_s(cold_img)
        # The server-start warm (serve()'s warm_async list), not timed:
        # standard-aspect preview buckets + the canonical-sensor
        # bucket-stable open-path programs. warm_* are best-effort by
        # contract — surface failures here so a silently-broken warm
        # can't masquerade as a prewarmed-regression.
        ok = sum(prewarm.warm_shape(s)
                 for s in prewarm.preview_shapes(1280, 400))
        ok_full = sum(prewarm.warm_full_shape(s, 1280, 400)
                      for s in prewarm.CANONICAL_SENSOR_SHAPES)
        log(f"config 6: warmed {ok} preview shapes, {ok_full} full buckets")
        t_pre = first_preview_s(ppm16_of(rng6.integers(
            0, 65536, size=(4000, 6000, 3), dtype=np.uint16)))
        results["c6_first_preview_cold_s"] = t_cold
        results["c6_first_preview_warm_s"] = t_warm
        results["c6_first_preview_prewarmed_s"] = t_pre

        # X-Trans first preview through the REAL RAW open path — the
        # bucket-stable masked-NC develop (r3): warm the Fuji sensor
        # bucket the way server start does, then open a full-size
        # X-Trans DNG end-to-end (decode -> upload_padded -> develop ->
        # MID preview JPEG).
        from rawphotoforge_tpu.engine.editor import HostOpen
        from rawphotoforge_tpu.io.dng import RawImage, write_dng

        ok_xt = prewarm.warm_full_shape((4160, 6240), 1280, 400,
                                        raw_patterns=("XTRANS",))
        log(f"config 6: X-Trans bucket warm {'ok' if ok_xt else 'FAILED'}")
        xt_blob = write_dng(RawImage(
            mosaic=rng6.integers(512, 16383, size=(4160, 6240),
                                 dtype=np.uint16),
            pattern="XTRANS", black_level=512.0, white_level=16383.0,
            wb_gains=(1.8, 1.0, 1.4), xyz_to_cam=None,
            exif={"Make": "Synthetic", "Model": "rpf-bench"}))
        t0 = time.perf_counter()
        hd6 = image_io.decode_image_host(xt_blob, "DNG")
        assert hd6.upload_padded is not None, "X-Trans not bucket-stable?"
        ed6 = PhotoEditor.from_host(HostOpen(hd6, None))
        jpeg6 = image_io.encode_image(ed6.apply(MID), "JPEG", quality=90)
        assert jpeg6[:2] == b"\xff\xd8"
        results["c6_xtrans_first_preview_prewarmed_s"] = (
            time.perf_counter() - t0)

        # Instant host preview: 24MP DNG container bytes -> the marked
        # stand-in JPEG the async /open serves immediately — pure numpy
        # superpixel develop, ZERO device work (engine/instant.py).
        # Median of 3: the first open in a fresh process additionally
        # pays lazy module imports, which a live server paid at startup.
        from rawphotoforge_tpu.engine import instant as _instant
        from rawphotoforge_tpu.io.dng import RawImage, write_dng

        blob = write_dng(RawImage(
            mosaic=rng6.integers(512, 16383, size=(4000, 6000),
                                 dtype=np.uint16),
            pattern="RGGB", black_level=512.0, white_level=16383.0,
            wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None,
            exif={"Make": "Synthetic", "Model": "rpf-bench"}))
        t_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            ho = PhotoEditor.open_host(blob, "DNG")
            jpeg = _instant.encode_instant_jpeg(ho.instant)
            t_runs.append(time.perf_counter() - t0)
        t_instant = sorted(t_runs)[1]
        assert jpeg[:2] == b"\xff\xd8"
        results["c6_instant_preview_ms"] = t_instant * 1e3

        # Live era-edit frame: hostdev develop + JPEG encode of the
        # instant-resolution planes (what one /edit -> /preview costs
        # while the device phase compiles). Median of 3.
        from rawphotoforge_tpu.engine import hostdev

        era_p = main_edit()
        lin = ho.instant_linear
        t_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            u8 = hostdev.render_u8_hwc(lin, era_p)
            _instant.encode_instant_jpeg(u8)
            t_runs.append(time.perf_counter() - t0)
        results["c6_era_edit_ms"] = sorted(t_runs)[1] * 1e3

        log(f"config 6: open->first MID preview: cold {t_cold:.1f} s "
            f"(fresh {jit_h}x6000 aspect), warm {t_warm:.2f} s, "
            f"prewarmed standard 24MP {t_pre:.2f} s, prewarmed 26MP "
            f"X-Trans DNG "
            f"{results['c6_xtrans_first_preview_prewarmed_s']:.2f} s; "
            f"instant host stand-in {t_instant * 1e3:.0f} ms (24MP DNG)")

        flush_results()

    if want("1"):
        # masks=None: the editor's single-mask dispatch (mask elision) —
        # the kernel never reads a mask plane for the main-mask-only
        # session this config models.
        planes, _ = planes_masks()
        dt = device_time(dev_fn, planes, edit_params(), None,
                         chain=chain_first)
        results["c1_24mp_edit_ms"] = dt * 1e3
        results["c1_24mp_edit_mpix_s"] = h * w / 1e6 / dt
        log(f"config 1: 24MP full edit stack {dt * 1e3:.2f} ms "
            f"= {h * w / 1e6 / dt:.0f} MPix/s")

        flush_results()

    if want("1a"):
        # Slider-only edit (no curves touched): the staircase-shortcut
        # kernel variant the editor uses in that state.
        planes, _ = planes_masks()
        p_sliders = EditParameters()
        p_sliders.set_tone(exposure=0.7, contrast=25, shadow=30,
                           highlight=-20, black=5, white=-5)
        p_sliders.set_whitebalance(temperature=25, tint=-10)
        p_sliders.set_vignette(40)
        params_s = jax.device_put(pack_params([p_sliders]))
        # What the editor actually dispatches in this state: staircase
        # shortcut + identity_oklch (the OKLCH round trip skipped; the
        # default hue/sat/light curves only perturb sub-u8-quantization).
        dev_fast = functools.partial(fused.develop_post_geo_fused,
                                     main_mask_all_ones=True,
                                     default_bright_curves=True,
                                     default_oklch_curves=True,
                                     identity_oklch=True)
        dt = device_time(dev_fast, planes, params_s, None, chain=chain_first)
        results["c1_24mp_sliders_only_ms"] = dt * 1e3
        results["c1_24mp_sliders_only_mpix_s"] = h * w / 1e6 / dt
        log(f"config 1a: 24MP slider-only edit (identity_oklch variant) "
            f"{dt * 1e3:.2f} ms = {h * w / 1e6 / dt:.0f} MPix/s")

        flush_results()

    if want("1c"):
        # Tone-curve drag: brightness curve touched, hue/sat/light
        # untouched — the editor's per-family shortcut flags keep this
        # state on the identity_oklch variant (only the brightness PCHIP
        # sweeps run; the OKLCH round trip stays skipped). Before the
        # flag split this state paid the full general kernel.
        planes, _ = planes_masks()
        p_tc = EditParameters()
        p_tc.set_tone(exposure=0.7, contrast=25, shadow=30,
                      highlight=-20, black=5, white=-5)
        p_tc.set_whitebalance(temperature=25, tint=-10)
        p_tc.set_vignette(40)
        p_tc.set_curve(BRIGHTNESS, [0, 16000, 40000, 65535],
                       [1000, 20000, 46000, 65535])
        params_tc = jax.device_put(pack_params([p_tc]))
        dev_tc = functools.partial(fused.develop_post_geo_fused,
                                   main_mask_all_ones=True,
                                   default_bright_curves=False,
                                   default_oklch_curves=True,
                                   identity_oklch=True)
        dt = device_time(dev_tc, planes, params_tc, None, chain=chain_first)
        results["c1_24mp_tone_curve_ms"] = dt * 1e3
        results["c1_24mp_tone_curve_mpix_s"] = h * w / 1e6 / dt
        log(f"config 1c: 24MP tone-curve drag (identity_oklch + "
            f"brightness sweeps) {dt * 1e3:.2f} ms "
            f"= {h * w / 1e6 / dt:.0f} MPix/s")

        flush_results()

    if want("1b"):
        # The same edit with M=4 masks (the reference's typical
        # regional-edit workload; per-mask loop cost, wgsl:281-331).
        # Measured through the editor's dispatch state: per-mask per-slot
        # default-curve shortcuts (default_curve_slots) elide the curve
        # sweeps nobody edited — bit-identical to the general kernel
        # (tests/test_pallas.py), r5 same-session A/B medians
        # 8.66 -> 6.98 ms (best-rep 7.47 -> 3.78 under chip sharing).
        from rawphotoforge_tpu.core.params import default_curve_slots

        planes, _ = planes_masks()
        regionals = []
        for i in range(3):
            q = EditParameters()
            q.set_tone(exposure=0.4 - 0.2 * i, contrast=10 + 5 * i)
            q.set_curve(SATURATION, [0, 65535], [30000 + 1000 * i, 34000])
            regionals.append(q)
        edits_m4 = [main_edit()] + regionals
        params_m4 = jax.device_put(pack_params(edits_m4))
        # u8 mask rows, like the editor's _mask_stack (r4: the kernel's
        # selects are dtype-agnostic; f32 rows would bench 4x the mask
        # HBM traffic the product actually streams).
        masks_m4 = jnp.concatenate([
            jnp.ones((1, h, w), dtype=jnp.uint8),
            (jax.random.uniform(jax.random.PRNGKey(7), (3, h, w)) > 0.5
             ).astype(jnp.uint8),
        ])
        dev_m4 = functools.partial(
            dev_fn, default_curve_slots=default_curve_slots(edits_m4))
        dt = device_time(dev_m4, planes, params_m4, masks_m4,
                         chain=chain_first)
        results["c1_24mp_edit_m4_ms"] = dt * 1e3
        results["c1_24mp_edit_m4_mpix_s"] = h * w / 1e6 / dt
        log(f"config 1b: 24MP edit with 4 masks {dt * 1e3:.2f} ms "
            f"= {h * w / 1e6 / dt:.0f} MPix/s")

        flush_results()

    if want("2"):
        mosaic = jax.random.uniform(key, (h, w), dtype=jnp.float32)

        @jax.jit
        def raw_develop_step(m):
            return dm.develop_raw(m, wb, cam, pattern="RGGB", method="malvar")

        # The chain must consume EVERY output channel: feeding only
        # out[0] back lets XLA dead-code-eliminate the G/B-specific tail
        # ops inside the timing loop (the 1e-30 scale keeps the next
        # mosaic in range without changing what executes).
        dt = device_time(
            raw_develop_step, mosaic,
            chain=lambda i, out, a: (out[0] + (out[1] + out[2]) * 1e-30,))
        results["c2_24mp_raw_ms"] = dt * 1e3
        results["c2_24mp_raw_mpix_s"] = h * w / 1e6 / dt
        log(f"config 2: 24MP Bayer malvar demosaic + WB + matrix "
            f"{dt * 1e3:.2f} ms = {h * w / 1e6 / dt:.0f} MPix/s")

        flush_results()

    if want("3") or want("4"):
        h3, w3 = 5504, 8256
        mosaic3 = jax.random.uniform(key, (h3, w3), dtype=jnp.float32)
        params3 = edit_params()

        from rawphotoforge_tpu.ops.geometry import (
            resize_bilinear, resize_long_edge_shape)

        mh, mw = resize_long_edge_shape(h3, w3, 1280)

        @jax.jit
        def full_stack(m):
            # One-pass fused kernel: mosaic read once, sRGB written once.
            srgb = rp.raw_develop_fused(m, wb, cam, params3, jnp.float32(0.8))
            # The LIVE histogram sources the display preview, not the
            # 45MP buffer — both in the reference (raw_photo_forge.py:1849
            # feeds cv2 the preview u8) and in this app's server
            # (histogram(MID)). A full-res histogram is a different
            # (non-interactive) workload: ~104 ms at 45MP, measured.
            preview = resize_bilinear(srgb, mh, mw)
            return srgb, histogram_rgbl(preview)

        # Consume all three sRGB channels AND the histogram in the chain:
        # with out[0][0] alone, the histogram (and the G/B tails) were
        # dead inside the timing loop and XLA eliminated them — the old
        # 16.4 ms number never included the histogram it claimed.
        dt = device_time(
            full_stack, mosaic3,
            chain=lambda i, out, a: (
                out[0][0] + (out[0][1] + out[0][2]) * 1e-30
                + out[1].sum().astype(jnp.float32) * 1e-30,))
        results["c3_45mp_full_ms"] = dt * 1e3
        results["c3_45mp_full_mpix_s"] = h3 * w3 / 1e6 / dt
        log(f"config 3: 45MP demosaic+sharpen+edit + preview histogram "
            f"{dt * 1e3:.2f} ms = {h3 * w3 / 1e6 / dt:.0f} MPix/s")

        flush_results()

    if want("4"):
        # Device time of one preview re-render at each pyramid level for a
        # 45MP session (MID 1280, LOW 400 long edge): the drag->LOW /
        # release->MID / idle->FULL policy of the reference UI.
        def level_time(lh, lw):
            pl = jax.random.uniform(key, (3, lh, lw), dtype=jnp.float32)
            mk = jnp.ones((1, lh, lw), dtype=jnp.float32)
            pr = edit_params(extent=(lh, lw))
            # Sub-millisecond: device_time grows the chain until the window
            # beats launch jitter and raises rather than reporting 0.0.
            return device_time(dev_fn, pl, pr, mk, iters=512, chain=chain_first)

        t_low = level_time(256, 384)     # ~LOW bucket for 3:2
        t_mid = level_time(896, 1280)    # ~MID bucket
        results["c4_drag_low_ms"] = t_low * 1e3
        results["c4_release_mid_ms"] = t_mid * 1e3
        results["c4_full_45mp_ms"] = results["c3_45mp_full_ms"]
        log(f"config 4: slider-to-preview device time: LOW {t_low * 1e3:.2f} ms, "
            f"MID {t_mid * 1e3:.2f} ms, FULL(45MP w/ demosaic) "
            f"{results['c3_45mp_full_ms']:.1f} ms — north star < 50 ms")


        flush_results()

    if want("4e") or want("4"):
        # END-TO-END slider-to-preview through the LIVE server (the
        # north star's actual definition — the device-only rows above
        # are a component, not the product number). A 45MP RAW session
        # on the canonical prewarmed sensor bucket; per-slider sweeps
        # at each pyramid level exercising the dirty-stage caches:
        #   drag tick  = POST /edit + GET /preview?level=low
        #                (host-drag path, tunnel-independent)
        #   release    = POST /edit + GET /preview?level=mid (device)
        #   idle FULL  = GET /preview?level=full after an edit
        import json as _json
        import tempfile as _tmpf
        import threading
        import urllib.request

        from rawphotoforge_tpu.app.server import serve
        from rawphotoforge_tpu.engine.session import Settings
        from rawphotoforge_tpu.io.dng import RawImage, write_dng

        rng4 = np.random.default_rng(4)
        # 45MP FF, canonical prewarmed bucket; RPF_C4_SHAPE=HxW shrinks
        # it (and skips prewarm) for smoke runs of the loop structure.
        import os as _os0

        sh, sw = (int(x) for x in _os0.environ.get(
            "RPF_C4_SHAPE", "5464x8192").split("x"))
        c4_prewarm = _os0.environ.get("RPF_C4_PREWARM", "1") != "0"
        blob4 = write_dng(RawImage(
            mosaic=rng4.integers(512, 16000, size=(sh, sw),
                                 dtype=np.uint16),
            pattern="RGGB", black_level=512.0, white_level=16383.0,
            wb_gains=(2.0, 1.0, 1.5), xyz_to_cam=None,
            exif={"Make": "Synthetic", "Model": "rpf-bench-c4"}))
        with _tmpf.TemporaryDirectory(prefix="rpf_c4_") as td4:
            httpd = serve(None, port=0, settings=Settings(),
                          settings_path=td4 + "/settings.json",
                          prewarm=c4_prewarm,
                          initial_file=(blob4, "bench.dng"))
            srv_t = threading.Thread(target=httpd.serve_forever,
                                     daemon=True)
            srv_t.start()
            base = f"http://127.0.0.1:{httpd.server_address[1]}"

            def get4(path):
                with urllib.request.urlopen(base + path, timeout=600) as r:
                    return r.read(), dict(r.headers)

            def post4(path, obj):
                req = urllib.request.Request(
                    base + path, data=_json.dumps(obj).encode(),
                    method="POST")
                with urllib.request.urlopen(req, timeout=600) as r:
                    return r.read()

            # Wait out the instant era: the device phase swaps in the
            # background (prewarmed programs; rearm per poll so only a
            # true wedge aborts).
            t0 = time.perf_counter()
            while True:
                rearm_watchdog(600)
                st4 = _json.loads(get4("/open/status")[0])
                if st4.get("ready"):
                    if st4.get("error"):
                        raise RuntimeError(f"c4 open failed: {st4}")
                    break
                time.sleep(1.0)
            t_swap = time.perf_counter() - t0
            log(f"config 4: {sh}x{sw} session device-ready in {t_swap:.1f} s "
                f"(prewarmed)")
            # One untimed warm-up render per level: the session's FIRST
            # MID/FULL render can pay a one-time remote compile (observed
            # 129 s once), which is a cold-open cost config 6 already
            # measures — here it would poison a 5-sample p95 of the
            # steady interactive loop.
            post4("/edit", {"exposure": 0.1})
            get4("/preview?level=low")
            get4("/preview?level=mid")
            get4("/preview?level=full")

            import os as _os

            sweeps = int(_os.environ.get("RPF_C4_SWEEPS", "4"))
            sliders = [("exposure", (-2.0, 2.0)), ("contrast", (-80, 80)),
                       ("shadow", (-80, 80)), ("vignette", (-90, 90)),
                       ("wb_temperature", (-80, 80))]
            drag_ms, mid_ms, full_ms = [], [], []
            drag_parts = []  # (render_us, encode_us, lock_wait_us)
            state = {}
            for name, (lo4, hi4) in sliders:
                rearm_watchdog(600)
                for i in range(sweeps):
                    v = lo4 + (hi4 - lo4) * i / max(sweeps - 1, 1)
                    state[name] = (round(v, 2)
                                   if isinstance(lo4, float) else int(v))
                    t1 = time.perf_counter()
                    post4("/edit", state)
                    _, hdrs = get4("/preview?level=low")
                    drag_ms.append((time.perf_counter() - t1) * 1e3)
                    tus = hdrs.get("X-RPF-Drag-Us")
                    if tus:
                        drag_parts.append(
                            tuple(int(v) for v in tus.split(",")))
                # Release: MID device render of the final drag state.
                t1 = time.perf_counter()
                post4("/edit", state)
                get4("/preview?level=mid")
                mid_ms.append((time.perf_counter() - t1) * 1e3)
                # Idle: FULL render (45MP device + fetch at FULL... the
                # preview endpoint serves the FULL-level JPEG).
                t1 = time.perf_counter()
                get4("/preview?level=full")
                full_ms.append((time.perf_counter() - t1) * 1e3)
            httpd.shutdown()

            def pct(xs, p):
                return float(np.percentile(np.asarray(xs), p))

            results["c4_e2e_drag_low_p50_ms"] = pct(drag_ms, 50)
            results["c4_e2e_drag_low_p95_ms"] = pct(drag_ms, 95)
            if drag_parts:
                # The p95 drag-tail breakdown (VERDICT r4 #7): which
                # component owns the tail — hostdev render, JPEG encode,
                # handler lock wait, or the residual (HTTP + POST /edit).
                parts = np.asarray(drag_parts, dtype=np.float64) / 1e3
                for label, col in (("render", 0), ("encode", 1),
                                   ("lockwait", 2)):
                    results[f"c4_drag_{label}_p50_ms"] = pct(parts[:, col], 50)
                    results[f"c4_drag_{label}_p95_ms"] = pct(parts[:, col], 95)
                accounted = parts.sum(axis=1)
                resid = np.asarray(drag_ms)[: len(accounted)] - accounted
                results["c4_drag_residual_p95_ms"] = pct(resid, 95)
                log("config 4 drag breakdown (p50/p95 ms): "
                    + ", ".join(
                        f"{lbl} {pct(parts[:, c], 50):.1f}/"
                        f"{pct(parts[:, c], 95):.1f}"
                        for lbl, c in (("render", 0), ("encode", 1),
                                       ("lockwait", 2)))
                    + f", residual p95 {pct(resid, 95):.1f}")
            results["c4_e2e_release_mid_p50_ms"] = pct(mid_ms, 50)
            results["c4_e2e_release_mid_p95_ms"] = pct(mid_ms, 95)
            results["c4_e2e_full_p50_ms"] = pct(full_ms, 50)
            results["c4_e2e_full_p95_ms"] = pct(full_ms, 95)
            log(f"config 4 END-TO-END ({sh * sw / 1e6:.0f}MP live server, {len(drag_ms)} "
                f"drag ticks): drag LOW p50 {pct(drag_ms, 50):.1f} ms / "
                f"p95 {pct(drag_ms, 95):.1f} ms; release MID p50 "
                f"{pct(mid_ms, 50):.0f} ms; FULL p50 "
                f"{pct(full_ms, 50):.0f} ms — north star < 50 ms p50 "
                f"slider-to-preview")
        flush_results()

    if want("7"):
        # 24MP X-Trans develop (VERDICT r2 #7): the 6x6 CFA goes through
        # the directional-green residual demosaic (ops/demosaic
        # .demosaic_cfa) — shift-add normalized convolutions, no gathers.
        # Bayer (config 2) takes the Malvar path; this row quantifies the
        # X-Trans premium the README previously left unmeasured.
        mosaic7 = jax.random.uniform(key, (h, w), dtype=jnp.float32)

        @jax.jit
        def xtrans_step(m):
            return dm.develop_raw(m, wb, cam, pattern="XTRANS",
                                  method="residual")

        dt = device_time(
            xtrans_step, mosaic7,
            chain=lambda i, out, a: (out[0] + (out[1] + out[2]) * 1e-30,))
        results["c7_24mp_xtrans_ms"] = dt * 1e3
        results["c7_24mp_xtrans_mpix_s"] = h * w / 1e6 / dt
        log(f"config 7: 24MP X-Trans residual demosaic + WB + matrix "
            f"{dt * 1e3:.2f} ms = {h * w / 1e6 / dt:.0f} MPix/s")

        # The production CLI path: the whole mosaic -> sRGB chain
        # (demosaic + WB + matrix + sharpen + full edit stack) in ONE
        # Pallas pass — note it does strictly MORE work than the jnp
        # number above yet runs ~2x faster (one HBM read, one write).
        params7 = edit_params(extent=(h, w))
        dt = device_time(
            lambda m: rp.raw_develop_fused(m, wb, cam, params7,
                                           jnp.float32(0.8),
                                           pattern="XTRANS"),
            mosaic7, chain=lambda i, out, a: (out[0],))
        results["c7_24mp_xtrans_fused_ms"] = dt * 1e3
        results["c7_24mp_xtrans_fused_mpix_s"] = h * w / 1e6 / dt
        log(f"config 7: 24MP X-Trans one-pass fused kernel (full stack) "
            f"{dt * 1e3:.2f} ms = {h * w / 1e6 / dt:.0f} MPix/s")

        flush_results()

    if want("5"):
        # The full export path, nothing excluded: device develop (one-pass
        # fused RAW kernel) -> device JPEG fDCT + quantization + Huffman
        # coding + global bit-pack (io/jpegbits `packed`: the TPU emits
        # the FINISHED contiguous scan; the link carries exactly the
        # entropy-coded bytes) -> banded parallel fetch -> native
        # header-writer/0xFF-stuffer (rpf_jpeg_encode_packed, q92) ->
        # file write, host work pipelined behind the device. Under the
        # axon tunnel the fetch pays remote-link bandwidth a
        # locally-attached host would not.
        import os
        import shutil
        import tempfile
        from concurrent.futures import ThreadPoolExecutor

        from rawphotoforge_tpu import native as rpf_native
        from rawphotoforge_tpu.io import jpegbits, jpegenc

        # 24MP per image; RPF_C5_SHAPE=HxW shrinks it for smoke runs of
        # the loop structure (e.g. the mesh branch on the virtual CPU
        # mesh) — the committed artifact always uses the full shape.
        bh, bw = (int(x) for x in os.environ.get(
            "RPF_C5_SHAPE", "4000x6000").split("x"))
        chunk = 4
        yy, xx = jnp.mgrid[0:bh, 0:bw].astype(jnp.float32)
        base = 0.35 + 0.3 * jnp.sin(xx / 700.0) * jnp.cos(yy / 500.0)
        mosaics = [
            jnp.clip(base + 0.02 * jax.random.normal(
                jax.random.PRNGKey(i), (bh, bw)), 0.0, 1.0)
            for i in range(chunk)
        ]
        params5 = edit_params(extent=(bh, bw))

        stages5 = jpegbits._prepacked_jit()
        qlum_h, qchr_h = jpegenc._quant_tables(92)
        qlum_d, qchr_d = jnp.asarray(qlum_h), jnp.asarray(qchr_h)
        nblocks = (bh // 16) * (bw // 16) * 6
        caps5 = (jpegbits.PACKED_ENT_WORDS, jpegbits.PACKED_OUT_WORDS)
        pbnd = jpegbits._packed_band_layout(nblocks)

        @jax.jit
        def export_one(m):
            # One image per dispatch — a lax.map over several images in
            # ONE program hard-crashes the TPU worker at this size (every
            # iteration's sparse outputs + the ~GB of compaction
            # intermediates stay live at once).
            # Banded outputs: the word stream arrives pre-split at fixed
            # boundaries as SEPARATE device buffers, so fetching it is
            # whole-buffer d2h transfers with no slice program — which
            # makes compute/fetch overlap safe (see the loop).
            srgb = rp.raw_develop_fused(m, wb, cam, params5, jnp.float32(0.8))
            return stages5.full_packed(srgb, qlum_d, qchr_d, *caps5)

        outdir = tempfile.mkdtemp(prefix="rpf_export_")

        def encode_one(arg):
            i, words_, bits_ = arg
            data = rpf_native.jpeg_encode_packed(words_, bits_, bh, bw,
                                                 quality=92)
            with open(os.path.join(outdir, f"img{i:04d}.jpg"), "wb") as f:
                f.write(data)

        # Device-side develop throughput for this shape (the end-to-end
        # number below adds host transfer + encode).
        dt_dev = device_time(
            lambda m: rp.raw_develop_fused(m, wb, cam, params5, jnp.float32(0.8)),
            mosaics[0], chain=lambda i, out, a: (out[0],),
        )
        results["c5_device_develop_mpix_s"] = bh * bw / 1e6 / dt_dev

        # RPF_C5_IMAGES shrinks the batch for smoke runs; the committed
        # artifact always comes from the full 256.
        n_images = int(os.environ.get("RPF_C5_IMAGES", "256"))
        # Overlap device compute with the link (default on): the sparse
        # program runs ~0.6 s/image, the fetch ~0.7 s/image — dispatching
        # image i+1 BEFORE fetching image i hides one behind the other.
        # This was 2x SLOWER with slice-at-fetch-time bands (the per-band
        # slice programs queued behind the next image's compute on the
        # device); pre-split band buffers transfer without any device
        # program, so the orders can be A/B'd with RPF_C5_OVERLAP=0.
        ndev5 = len(jax.devices())
        if ndev5 > 1:
            # Multi-device host: bench config 5 takes the MESH path
            # (VERDICT r3 #2) — the per-shard fused-RAW + packed-wire
            # step, one image per device per dispatch. Word rows are
            # fetched at packed capacity (local-host assumption; the
            # tunnel-remote single chip path is the banded loop below).
            from rawphotoforge_tpu.parallel import mesh as pmesh

            msh5 = pmesh.make_mesh(ndev5)
            step5 = jax.jit(pmesh.export_batch_raw_fused_packed_step,
                            static_argnums=(5, 8, 9, 10))
            caps5p = (jpegbits.PACKED_ENT_WORDS, jpegbits.PACKED_OUT_WORDS)
            sharpen5 = jnp.float32(0.8)

            def stack_for(i0):
                return jnp.stack(
                    [mosaics[j % chunk] for j in range(i0, i0 + ndev5)])

            def dispatch5(i0):
                return step5(stack_for(i0), wb, cam, params5, sharpen5,
                             msh5, qlum_d, qchr_d, "RGGB", *caps5p)

            fetch_sync(dispatch5(0))  # compile
            t_fetch = 0.0
            fetched_bytes = 0
            t0 = time.perf_counter()
            with ThreadPoolExecutor(8) as pool:
                pending = []
                dev_cur = dispatch5(0)
                i0 = 0
                while i0 < n_images:
                    rearm_watchdog(600)
                    tf = time.perf_counter()
                    tv = np.asarray(dev_cur[1])
                    nxt = (dispatch5(i0 + ndev5)
                           if i0 + ndev5 < n_images else None)
                    hw = np.asarray(dev_cur[0])
                    t_fetch += time.perf_counter() - tf
                    fetched_bytes += hw.nbytes + tv.nbytes
                    for k in range(min(ndev5, n_images - i0)):
                        nw, nbits = int(tv[k, 0]), int(tv[k, 1])
                        if (int(tv[k, 2]) or int(tv[k, 3]) > nblocks * caps5p[0]
                                or int(tv[k, 4]) != nw):
                            raise RuntimeError(
                                f"packed wire rejected image {i0 + k}: "
                                f"totals={tv[k]}")
                        pending.append(pool.submit(
                            encode_one, (i0 + k, hw[k, :nw], nbits)))
                    if (i0 // ndev5) % 8 == 0:
                        log(f"config 5 (mesh x{ndev5}): image "
                            f"{i0 + 1}/{n_images}, "
                            f"{time.perf_counter() - t0:.0f} s elapsed")
                    i0 += ndev5
                    dev_cur = nxt
                rearm_watchdog(900)
                for f in pending:
                    f.result()
        else:
            overlap = os.environ.get("RPF_C5_OVERLAP", "1") != "0"
            fetch_sync(export_one(mosaics[0]))  # compile
            t_fetch = 0.0
            fetched_bytes = 0
            last_bytes = 0
            last_t = 0.0
            t0 = time.perf_counter()
            from rawphotoforge_tpu.utils.transfer import (
                banded_fetch_elems, fetch_banded, start_banded)

            def fetch_image(dev_i, n_words, n_bits):
                word_bands, _t = dev_i
                hw = fetch_banded(word_bands, pbnd, n_words)
                # Band-rounded bytes actually moved, not the trimmed views —
                # the logged MB/s and c5_fetch_gb must reflect link traffic.
                moved = 20 + 4 * banded_fetch_elems(n_words, pbnd)
                return (hw, n_bits), moved

            with ThreadPoolExecutor(8) as pool:
                pending = []
                dev_i = export_one(mosaics[0])
                for i in range(n_images):
                    # Progress-based deadline: each completed image buys 10
                    # more minutes. Only a true wedge (zero progress) aborts.
                    rearm_watchdog(600)
                    tf = time.perf_counter()
                    tv = np.asarray(dev_i[1])  # totals: the program-i sync
                    n_words, n_bits = int(tv[0]), int(tv[1])
                    if (int(tv[2]) or int(tv[3]) > nblocks * caps5[0]
                            or int(tv[4]) != n_words):
                        raise RuntimeError(
                            f"packed wire rejected image {i}: totals={tv}")
                    dev_next = None
                    if overlap:
                        # Start the d2h transfers, THEN hand the device the
                        # next image's compute: the transfers ride the link
                        # while the device works.
                        start_banded(dev_i[0], pbnd, n_words)
                        if i + 1 < n_images:
                            dev_next = export_one(mosaics[(i + 1) % chunk])
                    host, moved = fetch_image(dev_i, n_words, n_bits)
                    fetched_bytes += moved
                    if not overlap and i + 1 < n_images:
                        dev_next = export_one(mosaics[(i + 1) % chunk])
                    t_fetch += time.perf_counter() - tf
                    dev_i = dev_next
                    if i % 32 == 0 or (time.perf_counter() - tf) > 30.0:
                        mb = (fetched_bytes - last_bytes) / 1e6
                        dt_w = time.perf_counter() - t0 - last_t
                        log(f"config 5: image {i + 1}/{n_images} fetched "
                            f"{mb:.0f} MB in {dt_w:.1f} s "
                            f"({mb / max(dt_w, 1e-9):.1f} MB/s link), "
                            f"{time.perf_counter() - t0:.0f} s elapsed")
                        last_bytes = fetched_bytes
                        last_t = time.perf_counter() - t0
                    pending.append(pool.submit(encode_one, (i, *host)))
                rearm_watchdog(900)  # headroom for the encode-queue drain
                for f in pending:
                    f.result()
        dt_total = time.perf_counter() - t0
        files = os.listdir(outdir)
        total_bytes = sum(
            os.path.getsize(os.path.join(outdir, f)) for f in files
        )
        assert len(files) == n_images, f"export wrote {len(files)} files"
        shutil.rmtree(outdir)
        total_mpix = n_images * bh * bw / 1e6
        ycc_gb = n_images * 1.5 * bh * bw / 1e9
        sp_gb = fetched_bytes / 1e9
        if n_images == 256:
            results["c5_batch256_24mp_s"] = dt_total
            results["c5_batch256_24mp_mpix_s"] = total_mpix / dt_total
            results["c5_fetch_s"] = t_fetch
            results["c5_fetch_gb"] = sp_gb
            results["c5_dense_equiv_gb"] = ycc_gb
            results["c5_jpeg_gb"] = total_bytes / 1e9
        else:
            log(f"config 5: RPF_C5_IMAGES={n_images} smoke run — "
                "c5_batch256_* keys NOT written (they name the full "
                "256-image batch)")
        log(f"config 5: {n_images}x 24MP RAW->JPEG export end-to-end {dt_total:.1f} s "
            f"= {total_mpix / dt_total:.0f} MPix/s sustained; device develop "
            f"alone {results['c5_device_develop_mpix_s']:.0f} MPix/s; "
            f"{t_fetch:.0f} s of that is fetching {sp_gb:.1f} GB of "
            f"device-packed finished JPEG scans over the remote tunnel "
            f"({sp_gb * 1e3 / max(t_fetch, 1e-9):.0f} MB/s link; dense YCbCr "
            f"4:2:0 would be {ycc_gb:.1f} GB); native bit concatenation "
            f"overlaps; {total_bytes / 1e9:.2f} GB of JPEGs written")

    flush_results()
    log("bench_all: wrote bench_results.json")
    # Exit WITHOUT interpreter teardown: the c4e server's background
    # prewarm threads may still be inside PJRT device work, and tearing
    # the runtime down under them aborts libc (observed "FATAL:
    # exception not rethrown" AFTER the artifact was written). All
    # outputs are flushed above; nothing below needs cleanup.
    sys.stderr.flush()
    sys.stdout.flush()
    import os as _os_exit

    _os_exit._exit(0)


if __name__ == "__main__":
    sys.exit(main())
