"""Profile-driven lens corrections: vignetting, distortion, chromatic
aberration.

Capability parity with v1's lensfun integration
(python-legacy/raw_image_editor/editor.py:425-711): given a lens profile,
apply (1) devignetting gain, (2) geometric distortion remap, (3) per-channel
transverse-chromatic-aberration remap. The lensfun *database* is not
shipped; profiles are explicit parameter sets (JSON-serializable) using the
standard lensfun math models, so any profile's numbers drop in directly.

Models (r = radius normalized so the half-diagonal is 1):
* vignetting 'pa' model:  gain(r) = 1 + k1 r^2 + k2 r^4 + k3 r^6
  (correction multiplies by 1/gain).
* distortion 'poly3':     r_src = r_d (1 - k1 + k1 r_d^2)
* distortion 'poly5':     r_src = r_d (1 + k1 r_d^2 + k2 r_d^4)
* distortion 'ptlens':    r_src = r_d (a r_d^3 + b r_d^2 + c r_d + 1-a-b-c)
* TCA 'linear':           r_src_R = r * vr,  r_src_B = r * vb
  (green is the reference channel).

TPU shape: devignetting is pointwise; the remaps are one fused
coordinate-computation + bilinear gather per channel (same machinery as the
creative lens_distortion stage, ops/geometry.py).
"""

from __future__ import annotations

import dataclasses
import functools
import json
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class LensProfile:
    """One lens+settings correction set (lensfun model parameters)."""

    name: str = "unnamed"
    # Vignetting (pa model), applied on linear light.
    vignetting: Optional[tuple] = None          # (k1, k2, k3)
    # Geometric distortion.
    distortion_model: str = "poly3"             # 'poly3' | 'poly5' | 'ptlens'
    distortion: Optional[tuple] = None          # poly3: (k1,); poly5: (k1, k2);
    #                                             ptlens: (a, b, c)
    # Transverse chromatic aberration (linear model).
    tca: Optional[tuple] = None                 # (vr, vb)
    # Crop-factor coordinate rescale: the model polynomials are evaluated
    # at r_cal = r_image * radius_scale. Lensfun calibrations normalize by
    # the *calibration camera's* frame; applying them to an image from a
    # different-crop body rescales coordinates by
    # calib_crop / camera_crop (a smaller sensor sees the central part of
    # the image circle). 1.0 = same crop as calibration.
    radius_scale: float = 1.0
    # Provenance: True when the coefficients come from a database marked
    # provenance="approximate" (the bundled starter set, data/lenses.xml)
    # rather than calibrated lensfun data. Surfaced end-to-end (CLI
    # output, server /info + UI, export metadata) so a user can always
    # tell a guessed profile from a measured one.
    approximate: bool = False

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "LensProfile":
        d = json.loads(s)
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}  # tolerate extras
        for k in ("vignetting", "distortion", "tca"):
            if d.get(k) is not None:
                d[k] = tuple(d[k])
        return cls(**d)


def _radius2(h, w, extent=None):
    """Squared radius map, normalized so the half-diagonal is 1 (lensfun
    convention), plus the centered coordinate grids."""
    if extent is None:
        hf, wf = jnp.float32(h), jnp.float32(w)
    else:
        hf = jnp.where(extent[0] > 0, extent[0], jnp.float32(h))
        wf = jnp.where(extent[1] > 0, extent[1], jnp.float32(w))
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    cx = (wf - 1.0) * 0.5
    cy = (hf - 1.0) * 0.5
    half_diag = jnp.sqrt(cx * cx + cy * cy)
    dx = (xs - cx) / half_diag
    dy = (ys - cy) / half_diag
    return dx, dy, dx * dx + dy * dy, half_diag, cx, cy, hf, wf


def devignette(planes: jax.Array, k: jax.Array, extent=None,
               radius_scale=1.0) -> jax.Array:
    """Divide out the pa-model vignetting falloff. ``k`` = (k1, k2, k3);
    ``radius_scale`` maps image radii into the calibration frame
    (LensProfile.radius_scale)."""
    _, h, w = planes.shape
    _, _, r2, *_ = _radius2(h, w, extent)
    r2 = r2 * jnp.float32(radius_scale) ** 2
    gain = 1.0 + r2 * (k[0] + r2 * (k[1] + r2 * k[2]))
    return planes / jnp.maximum(gain, 1e-4)


def bilinear_sample(plane: jax.Array, sx: jax.Array, sy: jax.Array,
                    hf, wf) -> jax.Array:
    """Sample ``plane`` at float coordinates (bilinear, edge clamp);
    hf/wf bound the valid extent (true dims under bucket padding)."""
    # Near-integer stability: see ops/geometry.snap_near_integer (the
    # single home of the fix, discovered here) — snap, then pin one
    # materialization.
    from .geometry import snap_near_integer

    sx, sy = jax.lax.optimization_barrier(
        (snap_near_integer(sx), snap_near_integer(sy)))
    wi = (wf - 1.0).astype(jnp.int32)
    hi = (hf - 1.0).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, wi)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, hi)
    x1 = jnp.minimum(x0 + 1, wi)
    y1 = jnp.minimum(y0 + 1, hi)
    # Weights relative to the *clamped* corner: a coordinate an ulp below 0
    # must not interpolate a full step toward the next row/col.
    tx = jnp.clip(sx - x0.astype(jnp.float32), 0.0, 1.0)
    ty = jnp.clip(sy - y0.astype(jnp.float32), 0.0, 1.0)
    c00 = plane[y0, x0]
    c10 = plane[y0, x1]
    c01 = plane[y1, x0]
    c11 = plane[y1, x1]
    return (c00 * (1 - tx) + c10 * tx) * (1 - ty) + (
        c01 * (1 - tx) + c11 * tx
    ) * ty


def _remap_radial(plane: jax.Array, scale: jax.Array, geom) -> jax.Array:
    """Sample ``plane`` at radially scaled coordinates (bilinear, edge clamp).

    ``scale`` is the per-pixel ratio r_src / r_dst; geom is the _radius2
    output tuple."""
    dx, dy, _, half_diag, cx, cy, hf, wf = geom
    sx = dx * scale * half_diag + cx
    sy = dy * scale * half_diag + cy
    return bilinear_sample(plane, sx, sy, hf, wf)


def _distortion_scale(r2: jax.Array, coeffs: jax.Array, model: str) -> jax.Array:
    """Per-pixel r_src/r_dst ratio for a distortion model (lensfun math)."""
    if model == "poly3":
        return 1.0 - coeffs[0] + coeffs[0] * r2
    if model == "poly5":
        return 1.0 + r2 * (coeffs[0] + r2 * coeffs[1])
    if model == "ptlens":
        r = jnp.sqrt(jnp.maximum(r2, 1e-20))
        a, b, c = coeffs[0], coeffs[1], coeffs[2]
        return a * r2 * r + b * r2 + c * r + (1.0 - a - b - c)
    raise ValueError(f"unknown distortion model {model!r}")


@functools.partial(jax.jit, static_argnames=("model",))
def correct_distortion(
    planes: jax.Array, coeffs: jax.Array, model: str = "poly3", extent=None,
    radius_scale=1.0,
) -> jax.Array:
    """Geometric distortion correction: resample at the model's r_src.
    The model is evaluated at calibration-frame radii (r * radius_scale);
    the resulting r_src/r_dst ratio is normalization-invariant."""
    _, h, w = planes.shape
    geom = _radius2(h, w, extent)
    r2c = geom[2] * jnp.float32(radius_scale) ** 2
    scale = _distortion_scale(r2c, coeffs, model)
    return jnp.stack([_remap_radial(planes[i], scale, geom) for i in range(3)])


def _warp_grid(h: int, w: int, center, extent=None):
    """Shared DNG-warp coordinate setup: normalized center-relative
    grids (dx, dy), r^2, and the (cx, cy, mmax, hf, wf) frame — the
    coordinate model WarpRectilinear and WarpFisheye both use (dng_sdk
    dng_lens_correction: normalize by the max center-to-corner
    distance)."""
    if extent is None:
        hf, wf = jnp.float32(h), jnp.float32(w)
    else:
        hf = jnp.where(extent[0] > 0, extent[0], jnp.float32(h))
        wf = jnp.where(extent[1] > 0, extent[1], jnp.float32(w))
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    cx = center[0] * (wf - 1.0)
    cy = center[1] * (hf - 1.0)
    # Max distance from the optical center to any image corner.
    mx = jnp.maximum(cx, (wf - 1.0) - cx)
    my = jnp.maximum(cy, (hf - 1.0) - cy)
    mmax = jnp.sqrt(mx * mx + my * my)
    dx = (xs - cx) / mmax
    dy = (ys - cy) / mmax
    r2 = dx * dx + dy * dy
    return dx, dy, r2, cx, cy, mmax, hf, wf


@jax.jit
def warp_rectilinear(planes: jax.Array, coefs: jax.Array,
                     center: jax.Array, extent=None) -> jax.Array:
    """DNG WarpRectilinear (OpcodeList3 opcode 1) — the geometric
    distortion correction phone DNGs carry.

    ``coefs`` f32 [P, 6] with P in {1, 3} (shared or per-RGB-plane):
    kr0..kr3 radial, kt0/kt1 tangential. ``center`` f32 [2] = optical
    center in relative (x, y) image coordinates. Model (DNG 1.3 spec /
    dng_sdk dng_lens_correction convention): coordinates about the
    center, normalized by the maximum center-to-corner distance;
      f(r) = kr0 + kr1 r^2 + kr2 r^4 + kr3 r^6
      x_src = f x + kt0 (2 x y) + kt1 (r^2 + 2 x^2)
      y_src = f y + kt1 (2 x y) + kt0 (r^2 + 2 y^2)
    """
    _, h, w = planes.shape
    dx, dy, r2, cx, cy, mmax, hf, wf = _warp_grid(h, w, center, extent)

    n_coef = coefs.shape[0]
    out = []
    for p in range(3):
        k = coefs[min(p, n_coef - 1)]
        fr = k[0] + r2 * (k[1] + r2 * (k[2] + r2 * k[3]))
        sx_n = fr * dx + k[4] * (2.0 * dx * dy) + k[5] * (r2 + 2.0 * dx * dx)
        sy_n = fr * dy + k[5] * (2.0 * dx * dy) + k[4] * (r2 + 2.0 * dy * dy)
        sx = sx_n * mmax + cx
        sy = sy_n * mmax + cy
        out.append(bilinear_sample(planes[p], sx, sy, hf, wf))
    return jnp.stack(out)


@jax.jit
def warp_fisheye(planes: jax.Array, coefs: jax.Array,
                 center: jax.Array, extent=None) -> jax.Array:
    """DNG WarpFisheye (OpcodeList3 opcode 2) — fisheye-to-rectilinear
    remapping, closing the last DNG 1.3 opcode (VERDICT r4 #5).

    ``coefs`` f32 [P, 4] with P in {1, 3}: kr0..kr3 radial terms over
    theta. Same coordinate frame as WarpRectilinear; per the DNG 1.3
    spec / dng_sdk dng_warp_params_fisheye::EvaluateRatio, with r the
    normalized center distance and t = atan(r):
      r_src = t (kr0 + kr1 t^2 + kr2 t^4 + kr3 t^6)
      (x_src, y_src) = (dx, dy) * r_src / r     (ratio -> kr0 as r -> 0,
                                                 since t/r -> 1)
    No tangential terms — the opcode body carries 4 coefficients."""
    _, h, w = planes.shape
    dx, dy, r2, cx, cy, mmax, hf, wf = _warp_grid(h, w, center, extent)
    r = jnp.sqrt(r2)
    t = jnp.arctan(r)
    t2 = t * t

    n_coef = coefs.shape[0]
    out = []
    for p in range(3):
        k = coefs[min(p, n_coef - 1)]
        poly = k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3]))
        # ratio = t*poly/r with the exact r->0 limit poly (t/r -> 1).
        ratio = jnp.where(r > 1e-12, t * poly / jnp.maximum(r, 1e-12), poly)
        sx = dx * ratio * mmax + cx
        sy = dy * ratio * mmax + cy
        out.append(bilinear_sample(planes[p], sx, sy, hf, wf))
    return jnp.stack(out)


def vignette_radial_gain(h: int, w: int, k, center, extent=None):
    """DNG FixVignetteRadial (OpcodeList3 opcode 3) gain surface on
    device, f32: gain = 1 + k0 r^2 + ... + k4 r^10 with r the distance
    from the optical center (relative [0,1] coordinates), normalized so
    the farthest corner has r = 1 (dng_sdk dng_vignette_radial_params;
    same formula as io/dng._vignette_radial_gain's host f64 version, kept
    for the list-2 normalized-mosaic stage).

    ``extent``: traced (th, tw) when (h, w) is a bucket-padded grid —
    coordinates normalize by the TRUE extent, so the true region's gain
    matches an unpadded evaluation elementwise (the bucket-stable
    develop for opcode-carrying DNGs, VERDICT r3 #4)."""
    if extent is None:
        hf, wf = jnp.float32(h), jnp.float32(w)
    else:
        hf = jnp.where(extent[0] > 0, extent[0].astype(jnp.float32),
                       jnp.float32(h))
        wf = jnp.where(extent[1] > 0, extent[1].astype(jnp.float32),
                       jnp.float32(w))
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    center = jnp.asarray(center, dtype=jnp.float32)
    cy = center[1] * (hf - 1.0)
    cx = center[0] * (wf - 1.0)
    m2 = (jnp.maximum(cy, (hf - 1.0) - cy) ** 2
          + jnp.maximum(cx, (wf - 1.0) - cx) ** 2)
    dy = ys - cy
    dx = xs - cx
    r2 = (dy * dy + dx * dx) / jnp.maximum(m2, 1e-12)
    k = jnp.asarray(k, dtype=jnp.float32)
    # Horner in r2: 1 + r2(k0 + r2(k1 + r2(k2 + r2(k3 + r2 k4)))).
    g = k[4]
    for i in (3, 2, 1, 0):
        g = k[i] + r2 * g
    return 1.0 + r2 * g


@jax.jit
def correct_tca(planes: jax.Array, vr: jax.Array, vb: jax.Array, extent=None) -> jax.Array:
    """Linear-model TCA: radially rescale R and B toward green."""
    _, h, w = planes.shape
    geom = _radius2(h, w, extent)
    ones = jnp.ones((h, w), dtype=jnp.float32)
    r_fix = _remap_radial(planes[0], ones * vr, geom)
    b_fix = _remap_radial(planes[2], ones * vb, geom)
    return jnp.stack([r_fix, planes[1], b_fix])


@functools.partial(jax.jit, static_argnames=("model",))
def correct_tca_distortion(
    planes: jax.Array, coeffs: jax.Array, vr: jax.Array, vb: jax.Array,
    model: str = "poly3", extent=None, radius_scale=1.0,
) -> jax.Array:
    """TCA + distortion as ONE composed remap per channel.

    Both corrections are radial scales about the same center, so they
    compose exactly: r_src = r * s_dist(r) * v_channel. One bilinear
    gather per channel instead of two (half the gather cost, and no
    bilinear-of-bilinear softening) — the single composed remap the
    reference's lensfunpy apply_subpixel_geometry_distortion performs
    (editor.py:620-650)."""
    _, h, w = planes.shape
    geom = _radius2(h, w, extent)
    r2c = geom[2] * jnp.float32(radius_scale) ** 2
    scale = _distortion_scale(r2c, coeffs, model)
    return jnp.stack([
        _remap_radial(planes[0], scale * vr, geom),
        _remap_radial(planes[1], scale, geom),
        _remap_radial(planes[2], scale * vb, geom),
    ])


def apply_profile(planes: jax.Array, profile: LensProfile, extent=None) -> jax.Array:
    """Full correction chain (lensfun order: devignette -> TCA -> distortion,
    editor.py:425-711 applies color modification first, then subpixel
    remaps, then geometry). TCA and distortion fuse into one composed
    remap when both are present."""
    rs = jnp.float32(getattr(profile, "radius_scale", 1.0) or 1.0)
    if profile.vignetting is not None:
        planes = devignette(
            planes, jnp.asarray(profile.vignetting, dtype=jnp.float32),
            extent, radius_scale=rs,
        )
    if profile.tca is not None and profile.distortion is not None:
        return correct_tca_distortion(
            planes,
            jnp.asarray(profile.distortion, dtype=jnp.float32),
            jnp.float32(profile.tca[0]),
            jnp.float32(profile.tca[1]),
            model=profile.distortion_model,
            extent=extent,
            radius_scale=rs,
        )
    if profile.tca is not None:
        planes = correct_tca(
            planes,
            jnp.float32(profile.tca[0]),
            jnp.float32(profile.tca[1]),
            extent,
        )
    if profile.distortion is not None:
        planes = correct_distortion(
            planes,
            jnp.asarray(profile.distortion, dtype=jnp.float32),
            model=profile.distortion_model,
            extent=extent,
            radius_scale=rs,
        )
    return planes
