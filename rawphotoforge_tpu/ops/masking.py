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
* ``smart_select_mask`` — point-prompted *object* selection: edge-aware
  geodesic flood fill (directional lax.scan sweeps), so selection stops at
  contrast boundaries instead of leaking to distant same-colored pixels.
* ``feather_mask`` — Gaussian edge softening.
* ``mask_overlay`` for UI display (get_mask_image, editor.py:1173-1189).

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
    return color.linear_srgb_to_oklab(planes[0], planes[1], planes[2])


def combine_labeled_logits(stack: jax.Array, labels: jax.Array) -> jax.Array:
    """Combine per-point selection logits under include/exclude labels —
    the v1 predictor interface is labeled points (python-legacy
    editor.py:1147-1152: label 1 include, 0 exclude).

    ``stack`` f32 [N, H, W] per-point logits, ``labels`` [N] (1/0).
    Include logits reduce by max (any include point selects); a pixel
    that matches an exclude point at least as strongly as any include is
    CARVED OUT to min(s_inc, -s_exc) — the exclude point's own pixel
    lands at -1 regardless of the include side. With no exclude points
    this is exactly the include max."""
    lab = labels.reshape(-1, 1, 1) > 0
    neg = jnp.float32(-2.0)  # below any clipped logit
    s_inc = jnp.max(jnp.where(lab, stack, neg), axis=0)
    s_exc = jnp.max(jnp.where(lab, neg, stack), axis=0)
    return jnp.where(s_exc >= s_inc, jnp.minimum(s_inc, -s_exc), s_inc)


@functools.partial(jax.jit, static_argnames=("spatial_falloff",))
def similarity_mask_points(
    planes: jax.Array,
    points_yx: jax.Array,
    labels: jax.Array,
    color_tolerance: jax.Array,
    spatial_sigma: jax.Array,
    spatial_falloff: bool = True,
) -> jax.Array:
    """Multi-point labeled similarity selection: per-point
    similarity_mask logits combined under combine_labeled_logits.
    ``points_yx`` i32 [N, 2]; single-include-point calls are identical
    to similarity_mask."""
    n = points_yx.shape[0]
    stack = jnp.stack([
        similarity_mask(planes, points_yx[i], color_tolerance,
                        spatial_sigma, spatial_falloff=spatial_falloff)
        for i in range(n)
    ])
    return combine_labeled_logits(stack, labels)


def _sweep_down(d: jax.Array, step_cost: jax.Array) -> jax.Array:
    """One top->bottom relaxation: d[y] = min(d[y], d[y-1] + cost[y]).

    A lax.scan over rows, vectorized across the row width — the
    TPU-friendly formulation of a raster-scan distance transform."""

    def body(prev, xs):
        dy, cy = xs
        new = jnp.minimum(dy, prev + cy)
        return new, new

    _, rest = jax.lax.scan(body, d[0], (d[1:], step_cost[1:]))
    return jnp.concatenate([d[:1], rest], axis=0)


@functools.partial(jax.jit, static_argnames=("sweeps",))
def geodesic_distance(
    planes: jax.Array,
    point_yx: jax.Array,
    edge_weight: jax.Array,
    spatial_cost: jax.Array,
    sweeps: int = 4,
) -> jax.Array:
    """Edge-aware geodesic distance from a seed pixel.

    4-connected grid with per-step cost
    ``||OKLab(p) - OKLab(q)|| * edge_weight + spatial_cost`` solved by
    alternating directional raster sweeps (Toivanen-style distance
    transform): each round runs down/right/up/left relaxations, every
    sweep a lax.scan whose body is vectorized across the perpendicular
    axis. Paths with at most ``2 * sweeps`` direction changes are exact;
    the result converges to the Dijkstra solution as sweeps grow
    (gated against a scipy Dijkstra oracle in tests).
    """
    _, h, w = planes.shape
    L, A, B = _oklab(planes)

    def grad_cost(axis):
        dl = jnp.diff(L, axis=axis)
        da = jnp.diff(A, axis=axis)
        db = jnp.diff(B, axis=axis)
        g = jnp.sqrt(dl * dl + da * da + db * db) * edge_weight + spatial_cost
        pad_fwd = [(0, 0), (0, 0)]
        pad_fwd[axis] = (1, 0)
        pad_bwd = [(0, 0), (0, 0)]
        pad_bwd[axis] = (0, 1)
        # Forward: cost of entering index i from i-1 is g[i-1..i], padded at
        # the leading edge; backward: entering i from i+1, padded trailing.
        return jnp.pad(g, pad_fwd), jnp.pad(g, pad_bwd)

    cost_down, cost_up = grad_cost(0)
    cost_right, cost_left = grad_cost(1)

    big = jnp.float32(1e9)
    # point_yx may be one [2] seed or an [N, 2] seed set (multi-seed
    # distance IS the elementwise min over per-seed distances, so this
    # generalization is exact).
    seed = jnp.zeros((h, w), jnp.bool_).at[
        point_yx[..., 0], point_yx[..., 1]].set(True)
    d = jnp.where(seed, 0.0, big)

    # Hoist the loop-invariant flips/transposes: XLA does not reliably
    # pull large-tensor invariants out of while-loop bodies, and each
    # would otherwise cost a full-image copy per sweep round.
    cost_up_f = jnp.flip(cost_up, 0)
    cost_right_t = cost_right.T
    cost_left_ft = jnp.flip(cost_left, 1).T

    def one_round(d, _):
        d = _sweep_down(d, cost_down)
        d = jnp.flip(_sweep_down(jnp.flip(d, 0), cost_up_f), 0)
        d = _sweep_down(d.T, cost_right_t).T
        d = jnp.flip(_sweep_down(jnp.flip(d, 1).T, cost_left_ft).T, 1)
        return d, None

    d, _ = jax.lax.scan(one_round, d, None, length=sweeps)
    return d


def smart_select_mask(
    planes: jax.Array,
    point_yx,
    tolerance: float = 0.15,
    edge_weight: float = 12.0,
    spatial_cost: float = 0.002,
    sweeps: int = 4,
) -> jax.Array:
    """Point-prompted object selection without an external model: the
    geodesic flood grows from the prompt until accumulated OKLab contrast
    (object boundaries) exceeds ``tolerance``. Unlike ``similarity_mask``
    this respects connectivity — a same-colored region across a strong
    edge is NOT selected. Returns logits in [-1, 1] (>= 0 selected), the
    same contract as SAM logits / similarity_mask."""
    d = geodesic_distance(
        planes,
        jnp.asarray(point_yx, dtype=jnp.int32),
        jnp.float32(edge_weight),
        jnp.float32(spatial_cost),
        sweeps=sweeps,
    )
    return jnp.clip(1.0 - d / jnp.float32(max(tolerance, 1e-6)), -1.0, 1.0)


def smart_select_points(
    planes: jax.Array,
    include_yx,
    exclude_yx=None,
    tolerance: float = 0.15,
    edge_weight: float = 12.0,
    spatial_cost: float = 0.002,
    sweeps: int = 4,
) -> jax.Array:
    """Labeled multi-point object selection (the v1 predictor interface,
    editor.py:1147-1152): the geodesic flood grows from EVERY include
    seed at once (multi-seed distance = min over seeds, one sweep run);
    exclude seeds run their own flood, and pixels geodesically at least
    as close to an exclude seed are carved out (competing-seeds rule,
    same combination as combine_labeled_logits). A single include point
    reproduces smart_select_mask exactly."""
    inc = jnp.asarray(include_yx, dtype=jnp.int32).reshape(-1, 2)
    li = smart_select_mask(planes, inc, tolerance=tolerance,
                           edge_weight=edge_weight,
                           spatial_cost=spatial_cost, sweeps=sweeps)
    if exclude_yx is None or len(exclude_yx) == 0:
        return li
    exc = jnp.asarray(exclude_yx, dtype=jnp.int32).reshape(-1, 2)
    le = smart_select_mask(planes, exc, tolerance=tolerance,
                           edge_weight=edge_weight,
                           spatial_cost=spatial_cost, sweeps=sweeps)
    return jnp.where(le >= li, jnp.minimum(li, -le), li)


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
