"""rawphotoforge_tpu — a TPU-native RAW photo development framework.

A ground-up JAX/XLA/Pallas re-design with the capability set of
kingyo1205/RawPhotoForge (all four generations): linear-light float32
non-destructive editing with per-mask white balance, tone, 65536-entry
PCHIP tone-curve LUTs, OKLCH hue/saturation/lightness curves, vignette and
lens-distortion correction; Bayer RAW develop (demosaic, camera WB, color
matrix); preview pyramid; histograms; presets; batch export over a TPU mesh.
"""

__version__ = "0.2.0"

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache (set RPF_JAX_CACHE="" to disable).

    Every distinct image-shape bucket costs seconds-to-minutes of XLA
    compile on TPU backends; the persistent cache makes that a one-time
    cost across processes (measured 401 s -> 42 s total for a cold CLI
    develop on the remote-tunnel backend).
    """
    cache = _os.environ.get(
        "RPF_JAX_CACHE",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".jax_cache"),
    )
    if not cache:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


_enable_compile_cache()

from .core.params import (  # noqa: F401
    BRIGHTNESS,
    HUE,
    SATURATION,
    LIGHTNESS,
    EditParameters,
    DevelopParams,
    pack_params,
)
from .core.curve import CURVE_RESOLUTION  # noqa: F401
from .ops.develop import develop, develop_jit, develop_batch  # noqa: F401
from .engine.editor import PhotoEditor  # noqa: F401
