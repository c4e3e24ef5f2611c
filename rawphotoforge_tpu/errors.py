"""Error taxonomy — the framework's user-facing exception surface.

Parity with the reference's typed error enums
(rust/photo-editor/src/errors.rs:7-130: read/save/unsupported-format/
GPU-init/GPU-compute/mask-not-found plus the interpolation errors).
All concrete errors derive from PhotoEditorError; catch that one at the
app boundary (the CLI and server do).
"""

from ._errbase import PhotoEditorError
from .core.curve import CurveError
from .io.image_io import ImageIOError
from .io.dng import DngError
from .engine.editor import MaskNotFound

__all__ = [
    "PhotoEditorError",
    "CurveError",
    "ImageIOError",
    "DngError",
    "MaskNotFound",
]
