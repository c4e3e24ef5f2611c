"""External promptable-segmentation adapters for AI masks.

Capability parity with v1's SAM2 point-prompt masking
(python-legacy/raw_image_editor/editor.py:43-44 loads the model,
:1120-1159 create_ai_mask runs predictor.predict on a click point and
stores the logits; raw_photo_forge.py:2375-2479 is the click workflow).
No segmentation weights ship with this framework; instead the adapter
protocol runs *any* external promptable segmenter and feeds its logits
back into the mask pipeline at full resolution:

* ``CallableSegmenter`` — wraps an in-process callable
  ``fn(rgb_u8_hwc, (x, y)) -> logits [h, w]`` (a loaded torch module, a
  JAX model, or a test stub).
* ``SubprocessSegmenter`` — shells out per request with a simple file
  protocol: ``cmd <image.png> <x> <y> <out.npy>``; the command writes
  float logits (any resolution) to ``out.npy``. This is how heavyweight
  models (SAM2 in its own venv/GPU box) integrate without being imported.
* ``TorchScriptSegmenter`` — loads a TorchScript module once and calls
  ``module(image_f32_chw_01, point_xy_tensor) -> logits``.

Labeled multi-point prompts (r5; v1's predictor interface is labeled
point arrays, editor.py:1147-1152 ``point_coords``/``point_labels``):
``segment(rgb_u8, points, labels)`` with points = [(x, y), ...] and
labels = [1/0, ...] (1 include, 0 exclude). Adapter encodings:
callable -> ``fn(rgb_u8, points, labels)``; subprocess ->
``cmd <image.png> --points "x1,y1,l1;x2,y2,l2" <out.npy>``;
torchscript -> ``module(image, points_f32 [N, 2], labels_f32 [N])``.
Single-include-point calls keep the exact legacy encodings above.

Whatever the source resolution of the logits, ``segment_to_mask``
bilinearly resamples them to the image size; thresholding stays in
PhotoEditor.add_mask (mask_range semantics, lib.rs:481-499). As in v1,
the segmenter sees the *currently rendered* image, not the raw original
(editor.py:2409-2411 re-applies edits before predicting).
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np

from .._errbase import PhotoEditorError


class SegmenterError(PhotoEditorError, RuntimeError):
    """External segmenter failed or returned malformed logits."""


class CallableSegmenter:
    def __init__(self, fn, name: str = "callable"):
        self.fn = fn
        self.name = name

    def segment(self, rgb_u8: np.ndarray, point_xy,
                labels=None) -> np.ndarray:
        if labels is None:
            out = self.fn(rgb_u8, tuple(point_xy))
        else:
            out = self.fn(rgb_u8, [tuple(p) for p in point_xy],
                          list(labels))
        out = np.asarray(out, dtype=np.float32)
        if out.ndim != 2:
            raise SegmenterError(
                f"segmenter {self.name!r} returned shape {out.shape}, "
                f"expected 2-D logits"
            )
        return out


class SubprocessSegmenter:
    """Run ``cmd image.png x y out.npy`` per request."""

    def __init__(self, cmd: list[str], timeout: float = 120.0):
        if not cmd:
            raise SegmenterError("empty segmenter command")
        self.cmd = list(cmd)
        self.timeout = timeout
        self.name = os.path.basename(self.cmd[0])

    def segment(self, rgb_u8: np.ndarray, point_xy,
                labels=None) -> np.ndarray:
        from PIL import Image as PILImage

        with tempfile.TemporaryDirectory(prefix="rpf_seg_") as d:
            img_path = os.path.join(d, "image.png")
            out_path = os.path.join(d, "logits.npy")
            PILImage.fromarray(rgb_u8).save(img_path)
            if labels is None:
                x, y = point_xy
                argv = [img_path, str(int(x)), str(int(y)), out_path]
            else:
                spec = ";".join(f"{int(x)},{int(y)},{int(l)}"
                                for (x, y), l in zip(point_xy, labels))
                argv = [img_path, "--points", spec, out_path]
            try:
                proc = subprocess.run(
                    self.cmd + argv,
                    capture_output=True, timeout=self.timeout,
                )
            except (OSError, subprocess.TimeoutExpired) as e:
                raise SegmenterError(f"segmenter {self.name!r} failed: {e}") from e
            if proc.returncode != 0:
                raise SegmenterError(
                    f"segmenter {self.name!r} exited {proc.returncode}: "
                    f"{proc.stderr.decode(errors='replace')[-500:]}"
                )
            try:
                logits = np.load(out_path)
            except (OSError, ValueError) as e:
                raise SegmenterError(
                    f"segmenter {self.name!r} wrote no readable logits"
                ) from e
        if logits.ndim == 3:
            logits = logits[0]
        if logits.ndim != 2:
            raise SegmenterError(f"bad logits shape {logits.shape}")
        return logits.astype(np.float32)


class TorchScriptSegmenter:
    """Load a TorchScript module: module(image_f32_chw, point_f32[2]) ->
    logits tensor."""

    def __init__(self, path: str):
        import torch

        self._torch = torch
        try:
            self.module = torch.jit.load(path, map_location="cpu")
        except (OSError, RuntimeError) as e:
            raise SegmenterError(f"cannot load TorchScript {path!r}: {e}") from e
        self.name = os.path.basename(path)

    def segment(self, rgb_u8: np.ndarray, point_xy,
                labels=None) -> np.ndarray:
        torch = self._torch
        img = torch.from_numpy(
            rgb_u8.astype(np.float32).transpose(2, 0, 1) / 255.0
        )
        if labels is None:
            pt = torch.tensor([float(point_xy[0]), float(point_xy[1])])
        else:
            pt = torch.tensor([[float(x), float(y)] for x, y in point_xy])
            lab = torch.tensor([float(v) for v in labels])
        # torch.jit.Error (script-level `raise` inside forward) is NOT a
        # RuntimeError subclass — its MRO is (Error, Exception); catching
        # only RuntimeError lets the most common TorchScript failure class
        # escape the typed-error contract.
        jit_error = getattr(getattr(torch, "jit", None), "Error", RuntimeError)
        try:
            with torch.no_grad():
                out = (self.module(img, pt) if labels is None
                       else self.module(img, pt, lab))
        except (RuntimeError, jit_error) as e:
            raise SegmenterError(
                f"segmenter {self.name!r} failed: {e}") from e
        logits = out.detach().cpu().numpy()
        if logits.ndim == 3:
            logits = logits[0]
        if logits.ndim != 2:
            raise SegmenterError(f"bad logits shape {logits.shape}")
        return logits.astype(np.float32)


def make_segmenter(spec):
    """Build an adapter from a spec: a callable, a command list/string
    (subprocess), or {"type": ..., ...} dict."""
    if spec is None:
        return None
    if callable(spec):
        return CallableSegmenter(spec)
    if isinstance(spec, str):
        # shlex, not str.split: an executable path containing spaces
        # must be quotable ('"/opt/my tools/sam2.sh" --flag') instead of
        # silently splitting into a nonsense argv.
        import shlex

        return SubprocessSegmenter(shlex.split(spec))
    if isinstance(spec, (list, tuple)):
        return SubprocessSegmenter(list(spec))
    if isinstance(spec, dict):
        kind = spec.get("type", "subprocess")
        if kind == "subprocess":
            if "cmd" not in spec:
                raise SegmenterError("subprocess segmenter spec needs 'cmd'")
            return SubprocessSegmenter(spec["cmd"], spec.get("timeout", 120.0))
        if kind == "torchscript":
            if "path" not in spec:
                raise SegmenterError("torchscript segmenter spec needs 'path'")
            return TorchScriptSegmenter(spec["path"])
        raise SegmenterError(f"unknown segmenter type {kind!r}")
    raise SegmenterError(f"cannot build a segmenter from {type(spec).__name__}")


def segment_to_mask(segmenter, rgb_u8: np.ndarray, point_xy,
                    labels=None) -> np.ndarray:
    """Run the adapter and resample its logits to the image resolution.
    ``labels`` switches to the labeled multi-point protocol (module
    docstring) with ``point_xy`` a list of (x, y) points."""
    h, w = rgb_u8.shape[:2]
    if labels is None:
        # Two-arg call keeps user-supplied legacy adapter objects
        # (duck-typed ``segment(rgb, point)``) working for single-point
        # prompts.
        logits = segmenter.segment(rgb_u8, point_xy)
    else:
        logits = segmenter.segment(rgb_u8, point_xy, labels=labels)
    if logits.shape != (h, w):
        import jax.numpy as jnp

        from ..ops.geometry import resize_bilinear

        logits = np.asarray(
            resize_bilinear(jnp.asarray(logits)[None], h, w)[0]
        )
    return logits
