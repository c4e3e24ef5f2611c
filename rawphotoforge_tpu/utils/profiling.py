"""Profiling / tracing utilities.

The reference's only tracing is per-call wall-clock printouts
(gpu_image_processing.rs:396-397, web/main.ts:781, raw_photo_forge.py:1891).
Here: a device-time measurement helper that works through asynchronous /
remote backends, a stage timer producing a per-stage report, and a
jax.profiler trace context for full XLA traces.
"""

from __future__ import annotations

import contextlib
import functools
import time

import numpy as np


def fetch_sync(x):
    """Force completion by fetching a tiny slice to the host.

    On remote-tunnel backends block_until_ready can return before device
    completion; a host fetch is the only reliable barrier.
    """
    import jax

    leaves = jax.tree.leaves(x)
    for leaf in leaves:
        if hasattr(leaf, "addressable_shards"):
            arr = leaf
            flat = arr.reshape(-1) if arr.ndim else arr
            np.asarray(flat[:1] if arr.ndim else flat)
    return x


def device_time(fn, *args, iters: int = 10, chain=None,
                min_window: float = 0.03, max_iters: int = 16384):
    """Median per-call device time of ``fn(*args)``.

    When ``chain`` is given — a function (i, last_out, args) -> new args —
    K calls are chained data-dependently inside one jitted loop and timed
    by difference quotient (T(K+1) - T(1)) / K, which excludes host/tunnel
    round trips. K grows geometrically until the measured window exceeds
    ``min_window`` seconds, so sub-millisecond kernels yield a real number
    instead of clamping into launch jitter (each K costs one compile; the
    persistent compile cache amortizes re-runs). Raises instead of ever
    returning a non-positive time. Without ``chain``, per-call wall time
    including one tiny fetch is measured.
    """
    import jax

    if chain is None:
        fetch_sync(fn(*args))  # compile + warm
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fetch_sync(fn(*args))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(k, *a):
        def body(i, a_):
            return chain(i, fn(*a_), a_)

        return jax.lax.fori_loop(0, k, body, a)

    def run(k):
        t0 = time.perf_counter()
        fetch_sync(chained(k, *args))
        return time.perf_counter() - t0

    k = max(2, iters)
    while True:
        run(1), run(k + 1)  # compile both variants
        t1 = min(run(1) for _ in range(3))
        tk = min(run(k + 1) for _ in range(3))
        window = tk - t1
        if window >= min_window or k >= max_iters:
            break
        k = min(k * 4, max_iters)
    if window <= 0:
        raise RuntimeError(
            f"device_time: non-positive window {window * 1e3:.3f} ms at "
            f"K={k}; kernel is below the measurable floor — raise max_iters"
        )
    return window / k


class StageTimer:
    """Accumulate named stage timings; print a report (the TPU answer to the
    reference's scattered println timers)."""

    def __init__(self):
        self.stages: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        """Time a block. The context yields a holder whose ``.result``
        the block SETS to its output — the device arrays produced inside
        the block cannot be passed at with-entry (they don't exist yet),
        and without a sync the tunnel backend records dispatch time only:

            with timer.stage("develop") as st:
                st.result = editor.apply()
        """
        class _Holder:
            result = None

        holder = _Holder()
        t0 = time.perf_counter()
        try:
            yield holder
        finally:
            # Record even when the block raises (partial stage evidence
            # beats a silently missing row).
            if holder.result is not None:
                fetch_sync(holder.result)
            self.stages.setdefault(name, []).append(
                time.perf_counter() - t0)

    def report(self) -> str:
        lines = ["stage timings (median over calls):"]
        for name, ts in self.stages.items():
            lines.append(
                f"  {name:<28s} {np.median(ts) * 1e3:8.2f} ms  (n={len(ts)})"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(log_dir: str = "/tmp/rpf_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
