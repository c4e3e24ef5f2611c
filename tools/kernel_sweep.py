"""One-off fused-kernel tuning sweep on the real TPU (not part of CI).

Measures the production develop kernel at 24MP across tile shapes and
fast-path variants via utils/profiling.device_time (chained-dispatch
difference quotient — CLAUDE.md: never wall-clock one dispatch through
the tunnel). Prints one line per configuration; used to (re)pick
TILE_H/TILE_W/IDENTITY_TILE_W and to attribute the full-stack frame time
between curve evaluation and the OKLCH round trip.

Result snapshot (2026-08, one v5e chip, 24MP): full path is fastest at
16x512 (4.79 ms; every other shape 4.90-5.87); identity_oklch is fastest
at 16x1024 (2.49 ms vs 3.03 at 16x512, still ahead at M=4: 3.95 vs
4.08); curve evals cost ~1.1 ms of the full frame and the OKLCH round
trip ~0.7 ms (full 4.79 / staircase-only 3.71 / +skip-OKLCH 3.03).
"""

import functools
import signal
import sys


def _watchdog(seconds: int) -> None:
    import os

    def on_alarm(signum, frame):
        print(f"sweep: stalled for {seconds}s; aborting", file=sys.stderr)
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main() -> int:
    _watchdog(2400)
    import jax
    import jax.numpy as jnp

    from rawphotoforge_tpu.core.params import (
        BRIGHTNESS, HUE, SATURATION, LIGHTNESS, EditParameters, pack_params,
    )
    from rawphotoforge_tpu.kernels import fused
    from rawphotoforge_tpu.utils.profiling import device_time

    print(f"backend={jax.default_backend()}", file=sys.stderr)

    p = EditParameters()
    p.set_tone(exposure=0.7, contrast=25, shadow=30, highlight=-20,
               black=5, white=-5)
    p.set_whitebalance(temperature=25, tint=-10)
    p.set_vignette(40)
    p.set_curve(BRIGHTNESS, [0, 16000, 40000, 65535],
                [1000, 20000, 46000, 65535])
    p.set_curve(HUE, [0, 30000, 65535], [4000, 33000, 63000])
    p.set_curve(SATURATION, [0, 40000, 65535], [36000, 30000, 36000])
    p.set_curve(LIGHTNESS, [0, 65535], [31000, 35000])
    params = jax.device_put(pack_params([p]))

    pd = EditParameters()
    pd.set_tone(exposure=0.7, contrast=25, shadow=30, highlight=-20,
                black=5, white=-5)
    pd.set_whitebalance(temperature=25, tint=-10)
    pd.set_vignette(40)
    params_default = jax.device_put(pack_params([pd]))

    h, w = 4000, 6000
    planes = jax.random.uniform(jax.random.PRNGKey(0), (3, h, w),
                                dtype=jnp.float32)
    chain_first = lambda i, out, a: (out,) + a[1:]  # noqa: E731

    def run(name, prm, th, tw, dc, io):
        fn = functools.partial(
            fused.develop_post_geo_fused, tile_h=th, tile_w=tw,
            main_mask_all_ones=True, default_bright_curves=dc,
            default_oklch_curves=dc, identity_oklch=io)
        try:
            dt = device_time(fn, planes, prm, None, chain=chain_first)
            print(f"{name:44s} {dt * 1e3:7.3f} ms  "
                  f"{24.0 / dt / 1e3:6.0f} MPix/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:44s} FAILED: {str(e)[:120]}", flush=True)

    # Attribution at the current tile: full vs staircase-only vs +skip-OKLCH.
    run("full 16x512 (prod)", params, 16, 512, False, False)
    run("default_curves only 16x512", params_default, 16, 512, True, False)
    run("default+identity_oklch 16x512", params_default, 16, 512, True, True)

    # Tile sweep on the full path.
    for th, tw in [(8, 512), (24, 512), (32, 512), (16, 256), (16, 768),
                   (16, 1024), (8, 1024), (32, 1024), (64, 512)]:
        run(f"full {th}x{tw}", params, th, tw, False, False)

    # Tile sweep on the slider-only path (fewer temporaries; bigger tiles
    # win where the full path spills — hence IDENTITY_TILE_W).
    for th, tw in [(16, 1024), (32, 512), (32, 1024), (64, 1024)]:
        run(f"identity_oklch {th}x{tw}", params_default, th, tw, True, True)
    return 0


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    sys.exit(main())
