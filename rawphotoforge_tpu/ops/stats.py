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


_HIST_CHUNK = 16384


@jax.jit
def histogram_rgbl(srgb_planes: jax.Array) -> jax.Array:
    """sRGB-encoded planes [3, H, W] -> i32 [4, 256]: R, G, B, gray rows.

    The gray row uses the BT.601 weights (0.299/0.587/0.114) on the
    display-encoded planes, matching the reference's histogram source — it
    feeds cv2.cvtColor(RGB2GRAY) with the u8 preview
    (raw_photo_forge.py:1849-1862).

    TPU formulation: neither a full [P, 256] one-hot (XLA materializes a
    pixels x bins intermediate — memory and compile blow up) nor a
    scatter-add (serializes, and compiles pathologically on some
    backends). Instead a lax.scan over fixed-size chunks: each step does
    a small compare-and-sum entirely in registers/VMEM, accumulating
    into the per-channel 256-bin carry. Out-of-range pad samples go to a
    scratch bin 256, dropped at the end.
    """
    r, g, b = srgb_planes[0], srgb_planes[1], srgb_planes[2]
    # OpenCV RGB2GRAY weights (reference feeds cv2 the u8 preview).
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    # One fused chunk-scan over all four channels (one image walk, one
    # scan carry) instead of four independent scans; the per-step chunk
    # shrinks by 4x so the compare-and-sum working set stays the same.
    vals = jnp.stack([r, g, b, gray]).reshape(4, -1)
    idx = jnp.clip((vals * 255.0).astype(jnp.int32), 0, 255)
    chunk = _HIST_CHUNK // 4
    n = idx.shape[1]
    pad = (-n) % chunk
    idx = jnp.concatenate(
        [idx, jnp.full((4, pad), NUM_BINS, dtype=jnp.int32)], axis=1)
    chunks = idx.reshape(4, -1, chunk).transpose(1, 0, 2)  # [steps, 4, chunk]
    bins = jnp.arange(NUM_BINS + 1, dtype=jnp.int32)

    def body(carry, ck):
        onehot = (ck[:, :, None] == bins[None, None, :]).astype(jnp.int32)
        return carry + jnp.sum(onehot, axis=1), None

    hist, _ = jax.lax.scan(
        body, jnp.zeros((4, NUM_BINS + 1), dtype=jnp.int32), chunks
    )
    return hist[:, :NUM_BINS]


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
