"""rawphotoforge_tpu — a TPU-native RAW photo development framework.

A ground-up JAX/XLA/Pallas re-design with the capability set of
kingyo1205/RawPhotoForge (all four generations): linear-light float32
non-destructive editing with per-mask white balance, tone, 65536-entry
PCHIP tone-curve LUTs, OKLCH hue/saturation/lightness curves, vignette and
lens-distortion correction; Bayer RAW develop (demosaic, camera WB, color
matrix); preview pyramid; histograms; presets; batch export over a TPU mesh.
"""

__version__ = "0.1.0"

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
