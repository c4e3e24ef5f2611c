"""On-chip image statistics: histograms and clipping fractions.

The reference computes a 256-bin luma + R/G/B histogram on the CPU with
cv2.calcHist over the preview (python-legacy raw_photo_forge.py:1849-1862)
and overlays it on the brightness-curve editor. Here the histogram is an
on-device reduction fused into the preview render; under a sharded mesh the
per-shard partial histograms combine with a psum (see parallel/mesh.py).

TPU formulation: no scatter. Bin index b of each pixel is compared against
a broadcast iota of the 256 bin ids and summed — 256 x N VPU compare/adds
that XLA vectorizes cleanly, instead of a serialized scatter-add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.color import luma

NUM_BINS = 256


@jax.jit
def histogram_rgbl(srgb_planes: jax.Array) -> jax.Array:
    """sRGB-encoded planes [3, H, W] -> i32 [4, 256]: R, G, B, gray rows.

    The gray row uses the BT.601 weights (0.299/0.587/0.114) on the
    display-encoded planes, matching the reference's histogram source — it
    feeds cv2.cvtColor(RGB2GRAY) with the u8 preview
    (raw_photo_forge.py:1849-1862).

    TPU formulation (measured on v5e, 24MP): a scatter-add serializes
    and compiles pathologically, and a single-accumulator chunk scan
    serializes into thousands of ~70 us steps (394 ms). Per-bin fused
    reductions — vmap over the 256 bin values of sum(idx == b) — let
    XLA tile 256 independent streaming reductions with no scan carry
    and no materialized one-hot: ~30 ms device time / 24MP (~12x the
    scan), 0.9 ms at the 1MP interactive preview size.
    """
    r, g, b = srgb_planes[0], srgb_planes[1], srgb_planes[2]
    # OpenCV RGB2GRAY weights (reference feeds cv2 the u8 preview).
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    vals = jnp.stack([r, g, b, gray]).reshape(4, -1)
    idx = jnp.clip((vals * 255.0).astype(jnp.int32), 0, 255)
    bins = jnp.arange(NUM_BINS, dtype=jnp.int32)

    def count(b_val):
        return jnp.sum((idx == b_val).astype(jnp.int32), axis=1)

    return jax.vmap(count)(bins).T


@jax.jit
def histogram_rgbl_rect(srgb_planes: jax.Array, rect: jax.Array) -> jax.Array:
    """histogram_rgbl restricted to the rows/cols of ``rect`` — a traced
    i32 [4] (y0, y1, x0, x1), exclusive ends.

    The crop-rect histogram path: slicing the render by the rect and
    histogramming the slice would compile one XLA program PER DISTINCT
    RECT (10-400 s each through the remote tunnel, CLAUDE.md) as the
    user drags the crop; with the rect traced, ONE program per render
    shape serves every rect — the invalid pixels are excluded by an
    iota compare fused into the same per-bin reductions."""
    _, h, w = srgb_planes.shape
    r, g, b = srgb_planes[0], srgb_planes[1], srgb_planes[2]
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = ((ys >= rect[0]) & (ys < rect[1])
             & (xs >= rect[2]) & (xs < rect[3])).reshape(1, -1)
    vals = jnp.stack([r, g, b, gray]).reshape(4, -1)
    idx = jnp.clip((vals * 255.0).astype(jnp.int32), 0, 255)
    bins = jnp.arange(NUM_BINS, dtype=jnp.int32)

    def count(b_val):
        return jnp.sum(((idx == b_val) & valid).astype(jnp.int32), axis=1)

    return jax.vmap(count)(bins).T


@jax.jit
def clipping_stats_rect(srgb_planes: jax.Array, rect: jax.Array) -> dict:
    """clipping_stats restricted to a traced (y0, y1, x0, x1) rect —
    same per-rect-compile avoidance as histogram_rgbl_rect."""
    _, h, w = srgb_planes.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = ((ys >= rect[0]) & (ys < rect[1])
             & (xs >= rect[2]) & (xs < rect[3]))
    hi = jnp.any(srgb_planes >= 1.0 - 0.5 / 255.0, axis=0) & valid
    lo = jnp.any(srgb_planes <= 0.5 / 255.0, axis=0) & valid
    n = jnp.maximum((rect[1] - rect[0]) * (rect[3] - rect[2]), 1)
    return {
        "highlight_clip_fraction": jnp.sum(hi) / n,
        "shadow_clip_fraction": jnp.sum(lo) / n,
    }


@jax.jit
def clipping_stats(srgb_planes: jax.Array) -> dict:
    """Fractions of highlight- and shadow-clipped pixels (any channel)."""
    hi = jnp.any(srgb_planes >= 1.0 - 0.5 / 255.0, axis=0)
    lo = jnp.any(srgb_planes <= 0.5 / 255.0, axis=0)
    n = hi.size
    return {
        "highlight_clip_fraction": jnp.sum(hi) / n,
        "shadow_clip_fraction": jnp.sum(lo) / n,
    }


def luma_linear(planes: jax.Array) -> jax.Array:
    """Rec.709 luma of linear planes [3,H,W] (wgpu_shader.wgsl:218)."""
    return luma(planes[0], planes[1], planes[2])
