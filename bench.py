"""Headline benchmark: full develop throughput on a 24MP image (one chip).

Prints ONE JSON line to stdout:
  {"metric": "develop_throughput_24mp", "value": <MPix/s>, "unit": "MPix/s",
   "vs_baseline": <value / 1000>, "ok": true|false, ...}

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
host fetch. Supplementary numbers (45MP re-render latency) go to stderr.

Wedge-proofing (round 4): the tunnel can wedge — jax.devices() answers
but every dispatch/transfer blocks forever with no exception, and Python
signal handlers cannot fire while the main thread is parked inside a
blocking PJRT C++ call. So every device-touching step runs in a daemon
worker thread that the main thread join()s with a hard per-phase budget
(<= 300 s); a tiny round-trip PROBE runs before any compile is attempted;
and the JSON artifact is emitted on EVERY exit path — a wedge produces a
parseable {"ok": false, "error": ...} line with whatever was measured,
never a silent timeout.  A SIGALRM total backstop remains as belt and
braces for a wedge in the main thread itself.
"""

import json
import os
import sys
import threading
import time


def _env_f(name: str, default: float) -> float:
    try:
        return float(os.environ.get(name, default))
    except ValueError:
        return default


_PHASE_BUDGET_S = _env_f("RPF_BENCH_PHASE_S", 300)   # per device phase
# Compile phases get more rope: a fresh-bucket remote compile is
# legitimately minutes (10-400 s observed) and must not be mistaken for
# a wedge; only the probe and the measurement loops are fast by design.
_COMPILE_BUDGET_S = _env_f("RPF_BENCH_COMPILE_S", 540)
_PROBE_BUDGET_S = _env_f("RPF_BENCH_PROBE_S", 90)    # tiny round-trip
_emitted = False


def _emit(value: float, ok: bool, error: str = "", extra: dict | None = None):
    """Print the single JSON artifact line (at most once) and flush."""
    global _emitted
    if _emitted:
        return
    _emitted = True
    rec = {
        "metric": "develop_throughput_24mp",
        "value": round(float(value), 1),
        "unit": "MPix/s",
        "vs_baseline": round(float(value) / 1000.0, 3),
        "ok": bool(ok),
    }
    if error:
        rec["error"] = error
    if extra:
        rec.update(extra)
    print(json.dumps(rec))
    sys.stdout.flush()


class _Wedged(RuntimeError):
    pass


def _run_phase(name: str, fn, budget_s: float):
    """Run fn() in a daemon thread; raise _Wedged if it exceeds budget_s.

    The worker is a daemon so os._exit / normal interpreter exit does not
    wait on a thread parked forever inside PJRT.
    """
    box: dict = {}

    def work():
        try:
            box["result"] = fn()
        except BaseException as e:  # noqa: BLE001 — must cross the thread
            box["error"] = e

    t = threading.Thread(target=work, name=f"bench-{name}", daemon=True)
    start = time.perf_counter()
    t.start()
    t.join(budget_s)
    if t.is_alive():
        raise _Wedged(
            f"phase '{name}' made no progress in {budget_s:.0f}s "
            f"(tunnel wedged?)")
    if "error" in box:
        raise box["error"]
    print(f"bench: phase {name} done in {time.perf_counter() - start:.1f}s",
          file=sys.stderr)
    return box.get("result")


def _subprocess_probe(timeout_s: float) -> bool:
    """One tiny device round-trip in an EXPENDABLE subprocess.

    The first contact with a possibly-wedged tunnel must not happen on
    any thread of this process: a wedged dispatch blocks forever inside
    PJRT C++ where SIGALRM's Python-level handler never runs and a
    daemon thread can't be reaped (libc terminate at exit). A subprocess
    under a hard timeout is killable no matter what."""
    if os.environ.get("RPF_BENCH_FAKE_WEDGE") == "probe":
        return False  # test hook: simulate a wedged tunnel
    import subprocess

    plat = os.environ.get("RPF_BENCH_PLATFORM")
    pre = (f"import jax; jax.config.update('jax_platforms', {plat!r}); "
           if plat else "import jax; ")
    code = (pre + "import jax.numpy as jnp; "
            "print(float((jnp.asarray([1.0]) + 1.0)[0]))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s)
        return r.returncode == 0 and b"2.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _total_backstop(seconds: int):
    """Last-resort SIGALRM for a wedge in the main thread itself."""
    import signal

    try:
        timeout = int(float(os.environ.get("RPF_BENCH_TIMEOUT_S", seconds)))
    except ValueError:
        timeout = seconds
    if timeout <= 0:
        return

    def on_alarm(signum, frame):
        _emit(0.0, ok=False, error="total watchdog expired")
        sys.stdout.flush()
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(timeout)


def main() -> int:
    # Total backstop: generous enough for two fresh-bucket compile pairs
    # (24MP headline + 45MP supplementary); the headline JSON line is
    # emitted the moment the 24MP number exists, so even a later abort
    # leaves a parseable artifact.
    _total_backstop(2400)

    measured: dict = {"value": 0.0}
    try:
        import jax

        # Test hook: the wedge-simulation test must not touch the real
        # tunnel, so it runs the bench on the CPU backend.
        plat = os.environ.get("RPF_BENCH_PLATFORM")
        if plat:
            jax.config.update("jax_platforms", plat)

        import jax.numpy as jnp

        from rawphotoforge_tpu.core.params import (
            BRIGHTNESS, HUE, SATURATION, LIGHTNESS, EditParameters,
            pack_params,
        )
        from rawphotoforge_tpu.kernels import fused

        print(f"bench: backend={jax.default_backend()} "
              f"devices={jax.devices()}", file=sys.stderr)

        # --- probe: one tiny dispatch + fetch BEFORE any compile -------
        # Two-stage by necessity (both measured on the axon tunnel):
        #   1. SUBPROCESS probe under a hard timeout — a wedged tunnel
        #      blocks the calling thread forever inside PJRT where
        #      neither SIGALRM nor a thread join can interrupt it, so
        #      the expendable process is the only safe first contact.
        #   2. The same tiny cycle on THIS process's MAIN thread — a
        #      worker thread's device work hangs until the main thread
        #      has completed one full dispatch+fetch, so this both
        #      validates our own tunnel session and unlocks the
        #      watchdogged worker-thread phases below.
        if not _subprocess_probe(_PROBE_BUDGET_S):
            raise _Wedged(
                f"phase 'probe' made no progress in {_PROBE_BUDGET_S:.0f}s "
                f"(tunnel wedged?)")
        float((jnp.asarray([1.0]) + 1.0)[0])
        print("bench: phase probe done", file=sys.stderr)

        # --- workload ---------------------------------------------------
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

        import functools

        @functools.partial(jax.jit, static_argnames=("iters",))
        def chained(planes, params, masks, iters):
            def body(_, x):
                return fused.develop_post_geo_fused(
                    x, params, masks, main_mask_all_ones=True)
            return jax.lax.fori_loop(0, iters, body, planes)

        import numpy as np

        def timed(fn):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[0, 0, 0:2])  # forces completion via the tunnel
            return time.perf_counter() - t0

        def measure(h, w, k=21, reps=3):
            planes = jax.random.uniform(jax.random.PRNGKey(0), (3, h, w),
                                        dtype=jnp.float32)
            # masks=None is the editor's single-mask dispatch (mask
            # elision) — the production call, not a stale variant that
            # streams 96 MB of all-ones mask per frame.
            masks = None
            # Each compile is its own watchdogged phase: a fresh-bucket
            # remote compile can take minutes, a wedge takes forever —
            # only the latter should kill the bench.
            _run_phase(f"compile-{h}x{w}-k1",
                       lambda: timed(lambda: chained(planes, params, masks, 1)),
                       _COMPILE_BUDGET_S)
            _run_phase(f"compile-{h}x{w}-k{k}",
                       lambda: timed(lambda: chained(planes, params, masks, k)),
                       _COMPILE_BUDGET_S)

            def measure_body():
                t1 = min(timed(lambda: chained(planes, params, masks, 1))
                         for _ in range(reps))
                tk = min(timed(lambda: chained(planes, params, masks, k))
                         for _ in range(reps))
                return (tk - t1) / (k - 1) * 1e3

            return _run_phase(f"measure-{h}x{w}", measure_body,
                              _PHASE_BUDGET_S)

        dt24 = measure(4000, 6000)
        value = 24.0 / dt24 * 1000.0
        measured["value"] = value
        print(f"bench: 24MP fused develop {dt24:.2f} ms/frame -> "
              f"{value:.0f} MPix/s", file=sys.stderr)

        # The artifact exists the moment the headline number does; the
        # supplementary below can wedge or fail without erasing it.
        _emit(value, ok=True, extra={"ms_per_frame_24mp": round(dt24, 3)})

        try:
            dt45 = measure(5504, 8256, k=11)
            print(f"bench: 45MP full-res re-render {dt45:.2f} ms/frame "
                  f"(north star < 50 ms p50)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"bench: 45MP supplementary failed: {e}", file=sys.stderr)
        return 0

    except BaseException as e:  # noqa: BLE001 — artifact on EVERY path
        _emit(measured["value"], ok=False, error=f"{type(e).__name__}: {e}")
        if isinstance(e, _Wedged):
            os._exit(2)  # daemon worker may be stuck in PJRT; don't wait
        return 2


if __name__ == "__main__":
    sys.exit(main())
