"""Headline benchmark: full develop throughput on a 24MP image (one chip).

Prints ONE JSON line:
  {"metric": "develop_throughput_24mp", "value": <MPix/s>, "unit": "MPix/s",
   "vs_baseline": <value / 1000>}

Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target from BASELINE.json is >= 1 GPix/s/chip full develop, so
vs_baseline = value / 1000 MPix/s (>= 1.0 means the north star is met).

The measured program is the full interactive-frame compute: the fused
Pallas develop kernel (vignette -> per-mask WB/tone/brightness-curve ->
OKLCH hue/sat/light curves -> sRGB encode) on a device-resident image with
device-resident packed params — the steady-state slider-move workload.

Timing methodology: under the remote-tunnel backend, block_until_ready
returns before device completion and any host fetch pays ~60 ms RTT, so a
single-dispatch wall clock is meaningless. Instead K kernel applications
are chained data-dependently inside one jitted fori_loop and per-iteration
time is the difference quotient (T(K) - T(1)) / (K - 1), ended by a tiny
host fetch. Supplementary numbers (45MP slider-to-preview latency, batch
throughput) go to stderr.
"""

import functools
import json
import sys
import time

import numpy as np


def _watchdog(seconds: int):
    """Abort instead of hanging forever if the device backend stalls.

    The tunneled TPU backend can wedge (dispatches never complete, no
    exception raised); a benchmark that blocks indefinitely is worse
    than one that fails loudly. SIGALRM fires in the main thread even
    while blocked in PJRT C++ calls.

    Returns a ``rearm(secs)`` callable so long multi-step phases (the
    config-5 export loop) can convert the deadline from total-runtime to
    time-since-last-progress: a degraded-but-progressing link shouldn't
    abort, only a genuine wedge should. ``rearm`` is a no-op when the
    watchdog is disabled (RPF_BENCH_TIMEOUT_S=0)."""
    import os
    import signal

    try:
        timeout = int(float(os.environ.get("RPF_BENCH_TIMEOUT_S", seconds)))
    except ValueError:
        timeout = seconds  # junk override must not become a startup crash
    if timeout <= 0:
        return lambda secs: None

    def on_alarm(signum, frame):
        print("bench: device backend made no progress before the watchdog "
              "deadline; aborting (tunnel down?)", file=sys.stderr)
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(timeout)
    return signal.alarm


def main() -> int:
    _watchdog(2700)
    import jax
    import jax.numpy as jnp

    from rawphotoforge_tpu.core.params import (
        BRIGHTNESS, HUE, SATURATION, LIGHTNESS, EditParameters, pack_params,
    )
    from rawphotoforge_tpu.kernels import fused

    print(f"bench: backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    # Realistic edit stack (tone + WB + vignette + all four curves).
    p = EditParameters()
    p.set_tone(exposure=0.7, contrast=25, shadow=30, highlight=-20, black=5, white=-5)
    p.set_whitebalance(temperature=25, tint=-10)
    p.set_vignette(40)
    p.set_curve(BRIGHTNESS, [0, 16000, 40000, 65535], [1000, 20000, 46000, 65535])
    p.set_curve(HUE, [0, 30000, 65535], [4000, 33000, 63000])
    p.set_curve(SATURATION, [0, 40000, 65535], [36000, 30000, 36000])
    p.set_curve(LIGHTNESS, [0, 65535], [31000, 35000])
    params = jax.device_put(pack_params([p]))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chained(planes, params, masks, iters):
        def body(_, x):
            return fused.develop_post_geo_fused(
                x, params, masks, main_mask_all_ones=True)
        return jax.lax.fori_loop(0, iters, body, planes)

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0, 0, 0:2])  # forces completion through the tunnel
        return time.perf_counter() - t0

    def per_iter_ms(h, w, k=21, reps=3):
        planes = jax.random.uniform(jax.random.PRNGKey(0), (3, h, w),
                                    dtype=jnp.float32)
        # masks=None is what the editor dispatches for a single-mask
        # session (mask elision: the kernel never reads a mask plane) —
        # the bench measures the production call, not a stale variant
        # that streams an extra 96 MB of all-ones mask per frame.
        masks = None
        timed(lambda: chained(planes, params, masks, 1))   # compile
        timed(lambda: chained(planes, params, masks, k))   # compile
        t1 = min(timed(lambda: chained(planes, params, masks, 1))
                 for _ in range(reps))
        tk = min(timed(lambda: chained(planes, params, masks, k))
                 for _ in range(reps))
        return (tk - t1) / (k - 1) * 1e3

    dt24 = per_iter_ms(4000, 6000)
    value = 24.0 / dt24 * 1000.0
    print(f"bench: 24MP fused develop {dt24:.2f} ms/frame -> {value:.0f} MPix/s",
          file=sys.stderr)

    try:
        dt45 = per_iter_ms(5504, 8256, k=11)
        print(f"bench: 45MP full-res re-render {dt45:.2f} ms/frame "
              f"(north star < 50 ms p50)", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"bench: 45MP supplementary failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "develop_throughput_24mp",
        "value": round(value, 1),
        "unit": "MPix/s",
        "vs_baseline": round(value / 1000.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
