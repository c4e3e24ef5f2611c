"""The full non-destructive develop stack — pure-jnp semantics anchor.

This is the TPU re-expression of the reference's single fused compute pass
(wgpu_shader.wgsl:265-337): lens distortion -> vignette -> per-mask
(WB -> tone -> brightness LUT) -> OKLCH per-mask (hue/sat/light by hue LUT)
-> sRGB encode. One jitted, vmappable function of (planes, params, masks);
the whole image is touched once and XLA fuses the pointwise chain.

This module keeps the *exact* LUT-gather semantics (65536-entry i32 tables,
floor indexing, truncating stores) and is the correctness oracle for the
Pallas kernel path (kernels/fused.py), which replaces the gathers with
branchless piecewise-polynomial curve evaluation.

Layout: planar float32 [3, H, W] (channel-first — keeps W on the TPU lane
axis). Masks are float32 [M, H, W], binarized 0/1; mask 0 is the all-ones
main mask (lib.rs:100-113). The shader applies a mask's edits only where the
mask value equals 1.0 exactly (wgpu_shader.wgsl:281,314).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import color
from ..core.params import BRIGHTNESS, HUE, SATURATION, LIGHTNESS, DevelopParams
from . import pointwise
from .geometry import lens_distortion

LUT_MAX = 65535.0


def _lut_index(v):
    """WGSL `u32(v * 65535)` — truncation toward zero of a non-negative value."""
    return (v * LUT_MAX).astype(jnp.int32)


def _fetch(lut_row, idx):
    """lut_fetch (wgpu_shader.wgsl:184-194): clamp table values to [0, 65535]."""
    return jnp.clip(jnp.take(lut_row, idx, axis=0), 0, 65535)


def geometry_stage(
    planes: jax.Array, distortion: jax.Array, extent: jax.Array | None = None
) -> jax.Array:
    """Lens-distortion resample as a separable stage.

    The one gather stage of the pipeline; the editor's dirty-stage cache
    keys its output on the distortion value so slider moves elsewhere never
    re-run the warp (the reference recomputes it every frame,
    wgpu_shader.wgsl:273). ``extent``: true (h, w) for bucket-padded arrays.
    """
    r, g, b = lens_distortion(planes[0], planes[1], planes[2], distortion, extent)
    return jnp.stack([r, g, b])


def develop_post_geo(
    planes: jax.Array, params: DevelopParams, masks: jax.Array
) -> jax.Array:
    """Develop stack *after* lens distortion: vignette -> per-mask linear
    pass -> per-mask OKLCH pass -> sRGB encode. Pure pointwise; XLA fuses it
    into one pass over the image.

    ``masks=None`` is the single-mask session: mask row 0 is all-ones by
    construction (lib.rs:100-113), so its selects are elided and no
    [1, H, W] ones stack is ever materialized (~180 MB of device memory
    at 45MP; the same elision the fused kernel's main_mask_all_ones
    applies). The math is identical; the differently-fused XLA program
    differs from the explicit-mask one by f32 reassociation noise only
    (~1e-5, gated in tests/test_editor.py)."""
    r, g, b = planes[0], planes[1], planes[2]
    h_img, w_img = r.shape
    num_masks = 1 if masks is None else masks.shape[0]

    hf = jnp.where(params.extent[0] > 0, params.extent[0], jnp.float32(h_img))
    wf = jnp.where(params.extent[1] > 0, params.extent[1], jnp.float32(w_img))
    ys = jax.lax.broadcasted_iota(jnp.int32, (h_img, w_img), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h_img, w_img), 1)
    r, g, b = pointwise.vignette(r, g, b, params.vignette, hf, wf, ys, xs)

    # Per-mask linear-RGB pass: WB -> tone -> brightness LUT (wgsl:279-308).
    for k in range(num_masks):
        sel = None if masks is None else masks[k] != 0
        rk, gk, bk = pointwise.white_balance(r, g, b, params.gains[k])
        rk, gk, bk = pointwise.tone(rk, gk, bk, params.tone[k])
        lut = params.luts[k, BRIGHTNESS]
        # Channel selector (v1 tone_curve_lut channel arg; 3 = all, the v4
        # semantics): non-selected channels skip the curve.
        ch = params.bright_channel[k]
        rc = _fetch(lut, _lut_index(rk)).astype(jnp.float32) / LUT_MAX
        gc = _fetch(lut, _lut_index(gk)).astype(jnp.float32) / LUT_MAX
        bc = _fetch(lut, _lut_index(bk)).astype(jnp.float32) / LUT_MAX
        rk = jnp.where((ch == 0) | (ch == 3), rc, rk)
        gk = jnp.where((ch == 1) | (ch == 3), gc, gk)
        bk = jnp.where((ch == 2) | (ch == 3), bc, bk)
        if sel is None:
            r, g, b = rk, gk, bk
        else:
            r = jnp.where(sel, rk, r)
            g = jnp.where(sel, gk, g)
            b = jnp.where(sel, bk, b)

    # Per-mask OKLCH pass: hue remap + sat/light gains by hue (wgsl:310-331).
    L, C, H = color.linear_srgb_to_oklch(r, g, b)
    for k in range(num_masks):
        sel = None if masks is None else masks[k] != 0
        h_idx = _lut_index(H)
        new_hue = _fetch(params.luts[k, HUE], h_idx).astype(jnp.float32) / LUT_MAX
        sat_gain = _fetch(params.luts[k, SATURATION], h_idx).astype(jnp.float32) / 32767.5
        light_gain = _fetch(params.luts[k, LIGHTNESS], h_idx).astype(jnp.float32) / 32767.5
        if sel is None:
            H, C, L = new_hue, C * sat_gain, L * light_gain
        else:
            H = jnp.where(sel, new_hue, H)
            C = jnp.where(sel, C * sat_gain, C)
            L = jnp.where(sel, L * light_gain, L)
    r, g, b = color.oklch_to_linear_srgb(L, C, H)

    out = jnp.stack(
        [color.linear_to_srgb(r), color.linear_to_srgb(g), color.linear_to_srgb(b)]
    )
    return jnp.clip(out, 0.0, 1.0)


def develop(planes: jax.Array, params: DevelopParams, masks: jax.Array) -> jax.Array:
    """Run the whole develop stack.

    Args:
      planes: f32 [3, H, W] linear-sRGB original image.
      params: packed per-mask parameters (mask count M must match masks).
      masks:  f32 [M, H, W] binarized masks; row 0 is all-ones.

    Returns:
      f32 [3, H, W] sRGB-encoded output clamped to [0, 1]
      (wgpu_shader.wgsl:335-336).
    """
    return develop_post_geo(
        geometry_stage(planes, params.distortion, params.extent), params, masks
    )


develop_jit = jax.jit(develop)
geometry_stage_jit = jax.jit(geometry_stage)


@functools.partial(jax.jit, static_argnames=("th", "tw"))
def replicate_true_edges(planes: jax.Array, th: int, tw: int) -> jax.Array:
    """Re-edge-replicate the true image into the bucket pad after a warp.

    The lens-distortion warp maps pad pixels out of bounds → black (the
    reference's OOB semantics, correct inside the true frame). A
    downstream stencil (unsharp_mask, radius 2) must see replicated
    edges like the unwarped path does, or the last true rows/cols
    sharpen against black and the export shows a bright fringe."""
    ph, pw = planes.shape[1], planes.shape[2]
    if ph > th:
        planes = jnp.concatenate(
            [planes[:, :th],
             jnp.broadcast_to(planes[:, th - 1:th], (3, ph - th, pw))],
            axis=1)
    if pw > tw:
        planes = jnp.concatenate(
            [planes[:, :, :tw],
             jnp.broadcast_to(planes[:, :, tw - 1:tw], (3, ph, pw - tw))],
            axis=2)
    return planes


@jax.jit
def replicate_true_edges_traced(planes: jax.Array, extent: jax.Array
                                ) -> jax.Array:
    """Extent-traced replicate_true_edges: gather-based edge replication
    of the true [*, :th, :tw] region into the bucket pad, with (th, tw)
    as a traced i32 [2] so ONE program serves every extent within a
    bucket (the bucket-stable open path's contract — io/raw
    develop_raw_image_padded normalizes its reflect/crop pad content to
    the mode='edge' convention every stencil consumer assumes). True
    region is untouched (indices below the extent map to themselves)."""
    c, hp, wp = planes.shape
    rows = jnp.minimum(jnp.arange(hp), extent[0] - 1)
    cols = jnp.minimum(jnp.arange(wp), extent[1] - 1)
    planes = jnp.take(planes, rows, axis=1)
    return jnp.take(planes, cols, axis=2)


develop_post_geo_jit = jax.jit(develop_post_geo)


def encode_u8(srgb_planes: jax.Array) -> jax.Array:
    """sRGB f32 [3,H,W] in [0,1] -> u8, truncating like Rust `as u8`
    (image.rs:375-383)."""
    return (jnp.clip(srgb_planes, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def encode_u16(srgb_planes: jax.Array) -> jax.Array:
    """sRGB f32 [3,H,W] in [0,1] -> u16 (for 16-bit PNG/TIFF export)."""
    return (jnp.clip(srgb_planes, 0.0, 1.0) * 65535.0).astype(jnp.uint16)


develop_batch = jax.jit(jax.vmap(develop, in_axes=(0, None, None)))
"""Batch develop: identical params/masks applied to a stack of images
[N, 3, H, W] — the kernel of the 256-image export benchmark config."""
