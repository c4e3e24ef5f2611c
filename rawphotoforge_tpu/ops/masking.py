"""Mask generation and refinement tools.

The reference's masking surface across generations: SAM2 point-prompted AI
masks (python-legacy editor.py:1120-1159), mask ingestion from images
(GDExtension add_mask_from_image, photo-editor-godot/lib.rs:468-512),
threshold binarization (lib.rs:481-499), inversion
(raw_photo_forge.py:2552-2607).

This module owns the TPU-native tools around that surface:

* ``similarity_mask`` — point-prompted selection without an external model:
  OKLab color distance to the sampled reference color, with an optional
  spatial falloff; returns soft logits compatible with the mask_range
  threshold flow (negative = outside, like SAM logits).
* ``feather_mask`` — Gaussian edge softening.
* ``mask_to_image`` / overlay helpers for UI display (get_mask_image,
  editor.py:1173-1189).

External models remain a first-class ingestion path: PhotoEditor.add_mask
accepts any [H, W] float array (SAM logits included).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import color
from .sharpen import gaussian_blur


@functools.partial(jax.jit, static_argnames=("spatial_falloff",))
def similarity_mask(
    planes: jax.Array,
    point_yx: jax.Array,
    color_tolerance: jax.Array,
    spatial_sigma: jax.Array,
    spatial_falloff: bool = True,
) -> jax.Array:
    """Point-prompted selection logits from color similarity.

    Args:
      planes: linear RGB [3, H, W].
      point_yx: i32 [2] prompt pixel.
      color_tolerance: OKLab distance at which the logit crosses zero
        (typ. 0.05-0.2).
      spatial_sigma: optional Gaussian falloff radius in pixels (only used
        when spatial_falloff).

    Returns: f32 [H, W] logits in roughly [-1, 1]; >= 0 means selected at
    the default mask_range of 0. Feed to PhotoEditor.add_mask.
    """
    _, h, w = planes.shape
    L, A, B = _oklab(planes)
    ref_l = L[point_yx[0], point_yx[1]]
    ref_a = A[point_yx[0], point_yx[1]]
    ref_b = B[point_yx[0], point_yx[1]]
    dist = jnp.sqrt(
        (L - ref_l) ** 2 + (A - ref_a) ** 2 + (B - ref_b) ** 2
    )
    logits = 1.0 - dist / jnp.maximum(color_tolerance, 1e-6)
    if spatial_falloff:
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        d2 = (
            (ys - point_yx[0]).astype(jnp.float32) ** 2
            + (xs - point_yx[1]).astype(jnp.float32) ** 2
        )
        spatial = jnp.exp(-0.5 * d2 / jnp.maximum(spatial_sigma, 1.0) ** 2)
        logits = logits * spatial - (1.0 - spatial)
    return jnp.clip(logits, -1.0, 1.0)


def _oklab(planes):
    """Linear RGB planes -> OKLab (L, a, b) — cartesian, not LCh."""
    r, g, b = planes[0], planes[1], planes[2]
    l_, m_, s_ = color._mat3_apply(color.M1, r, g, b)
    l_ = jnp.power(jnp.maximum(l_, 0.0), 1.0 / 3.0)
    m_ = jnp.power(jnp.maximum(m_, 0.0), 1.0 / 3.0)
    s_ = jnp.power(jnp.maximum(s_, 0.0), 1.0 / 3.0)
    return color._mat3_apply(color.M2, l_, m_, s_)


@functools.partial(jax.jit, static_argnames=("radius",))
def feather_mask(mask: jax.Array, radius: int = 4) -> jax.Array:
    """Soften mask edges with a Gaussian (applied before binarization)."""
    return gaussian_blur(mask[None], sigma=max(radius / 2.0, 0.5),
                         radius=radius)[0]


def luminance_range_mask(planes: jax.Array, lo: float, hi: float,
                         softness: float = 0.05) -> jax.Array:
    """Select by linear luminance band [lo, hi] with soft shoulders —
    logits >= 0 inside the band."""
    y = color.luma(planes[0], planes[1], planes[2])
    s = jnp.float32(max(softness, 1e-6))
    rise = (y - (lo - s)) / s
    fall = ((hi + s) - y) / s
    return jnp.clip(jnp.minimum(rise, fall) - 1.0, -1.0, 1.0)


def mask_overlay(srgb_planes: jax.Array, mask01: jax.Array,
                 tint=(1.0, 0.2, 0.2), alpha: float = 0.5) -> jax.Array:
    """Visualize a binarized mask over an sRGB render (get_mask_image
    analog, editor.py:1173-1189)."""
    t = jnp.asarray(tint, dtype=jnp.float32)[:, None, None]
    m = mask01[None] * alpha
    return srgb_planes * (1.0 - m) + t * m
