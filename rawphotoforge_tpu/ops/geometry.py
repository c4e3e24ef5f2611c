"""Geometric stages: lens-distortion resampling and bilinear resize.

Contracts:
* lens distortion — wgpu_shader.wgsl:109-164 (barrel/pincushion warp with
  bilinear sampling, out-of-range pixels become black).
* bilinear long-edge resize — the preview-pyramid builder,
  web/main.ts:958-1026 (half-texel-centered sampling, edge clamped).

Both are gather stages: on TPU the warp compiles to an XLA gather. They run
once per geometry-parameter change, not per slider move, and the editor's
dirty-stage cache keeps their outputs resident on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def snap_near_integer(s: jax.Array) -> jax.Array:
    """Snap sampling coordinates within a few ulps of an integer.

    Near-integer coordinates are numerically unstable under fusion: the
    floor() and the weight can see differently-contracted (FMA) copies
    of the same expression an ulp apart across a pixel boundary, turning
    ulp noise into a full-pixel sampling error (observed on the XLA CPU
    backend with identity warps; CLAUDE.md). The threshold scales with
    magnitude so it stays live at production coordinates (one f32 ulp at
    x=4096 is 2.4e-4) while remaining far below visual relevance. ONE
    home for every bilinear warp sampler (lens_distortion here,
    ops/lenscorr.bilinear_sample, parallel/spatial.distortion_sharded);
    callers pin one materialization with optimization_barrier."""
    r = jnp.round(s)
    thr = jnp.maximum(1e-4, jnp.abs(s) * 6e-7)  # ~5 ulps
    return jnp.where(jnp.abs(s - r) < thr, r, s)


def _bilinear_gather(plane, y0, y1, x0, x1, ty, tx):
    """Sample one plane at the four integer corners and lerp."""
    c00 = plane[y0, x0]
    c10 = plane[y0, x1]
    c01 = plane[y1, x0]
    c11 = plane[y1, x1]
    cx0 = c00 * (1.0 - tx) + c10 * tx
    cx1 = c01 * (1.0 - tx) + c11 * tx
    return cx0 * (1.0 - ty) + cx1 * ty


def warp_coords(ys, xs, hf, wf, strength):
    """Source coordinates of the radial warp for destination pixels
    (ys, xs) — the shared math of the single-device and row-sharded
    paths (contract: wgpu_shader.wgsl:109-164).

    Returns (py, px, oob): f32 source pixel coordinates in the full-image
    frame and the out-of-range mask (black pixels).
    """
    u = xs.astype(jnp.float32) / wf
    v = ys.astype(jnp.float32) / hf
    cu = u - 0.5
    cv = v - 0.5
    aspect = wf / hf
    cu = cu * aspect
    r2 = cu * cu + cv * cv
    denom = 1.0 + strength * r2
    du = cu / denom
    dv = cv / denom
    fu = du / aspect + 0.5
    fv = dv + 0.5
    oob = (fu < 0.0) | (fu > 1.0) | (fv < 0.0) | (fv > 1.0)
    px = fu * (wf - 1.0)
    py = fv * (hf - 1.0)
    return py, px, oob


def max_row_displacement(h: int, w: int, max_abs_distortion: float = 100.0):
    """Static bound on |source_row - dest_row| of the warp over the slider
    range (the halo-size analysis for the sharded gather).

    The vertical displacement |dv - cv| = |cv| |s| r2 / |1 + s r2| is
    monotone in |cv| and r2, so the corner (|cv| = 1/2, r2 = R2max)
    evaluated at s = +/-s_max bounds it. Returns None when the
    barrel-model denominator can approach 0 within the range (extreme
    aspect ratios) — callers must then gather everything.
    """
    import math

    smax = 0.5 * max_abs_distortion / 100.0
    a = w / h
    r2max = 0.25 * (1.0 + a * a)
    worst = 0.0
    for s in (smax, -smax):
        denom = 1.0 + s * r2max
        if denom <= 0.05:
            return None
        worst = max(worst, abs(0.5 * s * r2max / denom))
    return math.ceil(worst * h) + 2


def lens_distortion(r, g, b, distortion, extent=None):
    """Radial lens-distortion resample of full planes.

    Contract: wgpu_shader.wgsl:109-164. ``distortion`` is the raw slider
    value (-100..100) as a traced f32 scalar; strength = -0.5 * d / 100.
    When the strength is zero the gather branch is skipped at runtime via
    lax.cond (matching the shader's early return, wgsl:118-120).

    ``extent``: optional traced f32 [2] true (h, w) for bucket-padded
    arrays — coordinate normalization uses the true extent; pixels beyond
    it land out of bounds and come out black (they are cropped anyway).
    """
    h, w = r.shape
    strength = -0.5 * (distortion / 100.0)

    def identity(planes):
        return planes

    def warp(planes):
        rr, gg, bb = planes
        if extent is None:
            hf = jnp.float32(h)
            wf = jnp.float32(w)
        else:
            hf = jnp.where(extent[0] > 0, extent[0], jnp.float32(h))
            wf = jnp.where(extent[1] > 0, extent[1], jnp.float32(w))
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        py, px, oob = warp_coords(ys, xs, hf, wf, strength)
        # Same near-integer stability fix as lenscorr.bilinear_sample
        # (a +-1-slider warp lands center-row coords within ulps of
        # integers; see snap_near_integer).
        px, py = jax.lax.optimization_barrier(
            (snap_near_integer(px), snap_near_integer(py)))
        x0f = jnp.floor(px)
        y0f = jnp.floor(py)
        wi = (wf - 1.0).astype(jnp.int32)
        hi = (hf - 1.0).astype(jnp.int32)
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, wi)
        y0 = jnp.clip(y0f.astype(jnp.int32), 0, hi)
        x1 = jnp.minimum(x0 + 1, wi)
        y1 = jnp.minimum(y0 + 1, hi)
        tx = px - x0f
        ty = py - y0f

        out = tuple(
            jnp.where(oob, 0.0, _bilinear_gather(p, y0, y1, x0, x1, ty, tx))
            for p in (rr, gg, bb)
        )
        return out

    return jax.lax.cond(strength == 0.0, identity, warp, (r, g, b))


def resize_long_edge_shape(h: int, w: int, target_long_edge: int) -> tuple[int, int]:
    """Destination shape of the long-edge resize (web/main.ts:968-977).

    Uses round-half-away-from-zero on the short edge like JS Math.round
    (floor(x + 0.5) for positive x).
    """
    if w >= h:
        dw = target_long_edge
        dh = int(h * (target_long_edge / w) + 0.5)
    else:
        dh = target_long_edge
        dw = int(w * (target_long_edge / h) + 0.5)
    return max(dh, 1), max(dw, 1)


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear(planes, dh: int, dw: int):
    """Half-texel-centered bilinear resize of stacked planes [C, H, W].

    Contract: the CPU pyramid resizer web/main.ts:984-1019 — source
    coordinate s = (d + 0.5) * scale - 0.5, floor clamped at 0, +1 neighbor
    clamped at the edge.
    """
    c, h, w = planes.shape
    scale_y = h / dh
    scale_x = w / dw
    sy = (jnp.arange(dh, dtype=jnp.float32) + 0.5) * scale_y - 0.5
    sx = (jnp.arange(dw, dtype=jnp.float32) + 0.5) * scale_x - 0.5
    y0 = jnp.maximum(jnp.floor(sy), 0.0).astype(jnp.int32)
    x0 = jnp.maximum(jnp.floor(sx), 0.0).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ty = (sy - y0.astype(jnp.float32))[None, :, None]
    tx = (sx - x0.astype(jnp.float32))[None, None, :]

    rows0 = planes[:, y0, :]
    rows1 = planes[:, y1, :]
    c00 = rows0[:, :, x0]
    c10 = rows0[:, :, x1]
    c01 = rows1[:, :, x0]
    c11 = rows1[:, :, x1]
    cx0 = c00 * (1.0 - tx) + c10 * tx
    cx1 = c01 * (1.0 - tx) + c11 * tx
    return cx0 * (1.0 - ty) + cx1 * ty


@functools.partial(jax.jit, static_argnums=(2,))
def resize_bilinear_extents(planes, extents, out_shape: tuple):
    """Bucket-stable bilinear resize: ``resize_bilinear`` semantics with
    the true source/destination extents as TRACED scalars.

    ``planes`` is a bucket-padded [C, Hp, Wp] stack whose top-left
    ``extents[:2]`` = (src_h, src_w) region holds the real image;
    ``extents[2:]`` = (dst_h, dst_w) is the true destination extent and
    ``out_shape`` the static (padded) output grid. Because every extent is
    a runtime value, ONE compiled program serves every image whose padded
    shapes match — the per-image-extent remote compile that
    ``resize_bilinear`` puts on the open path disappears (same reasoning
    as DevelopParams.extent for the develop programs).

    Sampling clamps to the true source extent, so pad values are never
    read; output rows/cols beyond the destination extent replicate the
    last true row/col — exactly the ``mode="edge"`` padding the eager
    path applies, so downstream stencil stages see identical borders.
    In-extent values match ``resize_bilinear`` up to one f32 ulp in the
    scale factor (both compute the same half-texel lerp in f32).
    """
    c, hp, wp = planes.shape
    dhp, dwp = out_shape
    ef = extents.astype(jnp.float32)
    h, w, dh, dw = ef[0], ef[1], ef[2], ef[3]
    # Edge padding beyond the true destination extent: clamp the output
    # index so pad rows/cols recompute (and so bit-match) the last true one.
    di = jnp.minimum(jnp.arange(dhp, dtype=jnp.float32), dh - 1.0)
    dj = jnp.minimum(jnp.arange(dwp, dtype=jnp.float32), dw - 1.0)
    sy = (di + 0.5) * (h / dh) - 0.5
    sx = (dj + 0.5) * (w / dw) - 0.5
    y0f = jnp.maximum(jnp.floor(sy), 0.0)
    x0f = jnp.maximum(jnp.floor(sx), 0.0)
    hi1 = extents[0].astype(jnp.int32) - 1
    wi1 = extents[1].astype(jnp.int32) - 1
    y0 = jnp.minimum(y0f.astype(jnp.int32), hi1)
    x0 = jnp.minimum(x0f.astype(jnp.int32), wi1)
    y1 = jnp.minimum(y0 + 1, hi1)
    x1 = jnp.minimum(x0 + 1, wi1)
    ty = (sy - y0f)[None, :, None]
    tx = (sx - x0f)[None, None, :]

    rows0 = jnp.take(planes, y0, axis=1)
    rows1 = jnp.take(planes, y1, axis=1)
    c00 = jnp.take(rows0, x0, axis=2)
    c10 = jnp.take(rows0, x1, axis=2)
    c01 = jnp.take(rows1, x0, axis=2)
    c11 = jnp.take(rows1, x1, axis=2)
    cx0 = c00 * (1.0 - tx) + c10 * tx
    cx1 = c01 * (1.0 - tx) + c11 * tx
    return cx0 * (1.0 - ty) + cx1 * ty


def orient_exif(planes, orientation: int):
    """Apply an EXIF orientation (1..8) to [C, H, W] planes.

    Semantics per the reference's manual orientation handling
    (rust-godot-legacy/photo-editor/src/image.rs:559-608): the stored image
    is transformed so it displays upright.
    """
    if orientation in (0, 1):
        return planes
    if orientation == 2:  # mirror horizontal
        return planes[:, :, ::-1]
    if orientation == 3:  # rotate 180
        return planes[:, ::-1, ::-1]
    if orientation == 4:  # mirror vertical
        return planes[:, ::-1, :]
    if orientation == 5:  # mirror horizontal + rotate 270 CW
        return jnp.transpose(planes, (0, 2, 1))
    if orientation == 6:  # rotate 90 CW
        return jnp.transpose(planes[:, ::-1, :], (0, 2, 1))
    if orientation == 7:  # mirror horizontal + rotate 90 CW
        return jnp.transpose(planes[:, ::-1, ::-1], (0, 2, 1))
    if orientation == 8:  # rotate 270 CW
        return jnp.transpose(planes[:, :, ::-1], (0, 2, 1))
    raise ValueError(f"invalid EXIF orientation {orientation}")
