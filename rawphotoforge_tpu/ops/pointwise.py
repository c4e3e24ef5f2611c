"""Pointwise develop-stack stages: white balance, tone, vignette.

Numerical contract: wgpu_shader.wgsl — tone() at :200-259, vignette() at
:166-178, WB multiply at :286-288. All functions are planar (r, g, b) float32
and branch-free (scalar predicates become jnp.where), so they are valid both
in traced jnp code and inside Pallas kernel bodies.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.color import luma


def white_balance(r, g, b, gains):
    """Per-channel gains; gains is a length-3 vector (r_gain, g_gain, b_gain)."""
    return r * gains[0], g * gains[1], b * gains[2]


def tone(r, g, b, tone_vec):
    """Exposure / shadow / highlight / black / white / contrast + clamp.

    Contract: wgpu_shader.wgsl:200-259. ``tone_vec`` is the packed
    [exposure_ev, contrast, shadow, highlight, black, white] row (already
    /100-scaled). The WGSL `if x != 0` branches around black/white/contrast
    are reproduced with selects so the zero case is bit-identical.
    """
    exposure, contrast, shadow, highlight, black, white = (
        tone_vec[0], tone_vec[1], tone_vec[2], tone_vec[3], tone_vec[4], tone_vec[5],
    )
    mul = jnp.exp2(exposure)
    r, g, b = r * mul, g * mul, b * mul

    y = luma(r, g, b)

    shadow_gain = 1.0 + shadow * jnp.clip(1.0 - y, 0.0, 1.0)
    r, g, b = r * shadow_gain, g * shadow_gain, b * shadow_gain

    highlight_gain = 1.0 + highlight * jnp.clip(y, 0.0, 1.0)
    r, g, b = r * highlight_gain, g * highlight_gain, b * highlight_gain

    t = jnp.clip(y, 0.0, 1.0)
    black_lift = black * ((1.0 - t) * (1.0 - t))
    apply_black = black != 0.0
    r = jnp.where(apply_black, r + black_lift, r)
    g = jnp.where(apply_black, g + black_lift, g)
    b = jnp.where(apply_black, b + black_lift, b)

    white_lift = white * (t * t)
    apply_white = white != 0.0
    r = jnp.where(apply_white, r + white_lift, r)
    g = jnp.where(apply_white, g + white_lift, g)
    b = jnp.where(apply_white, b + white_lift, b)

    c = 1.0 + contrast
    apply_c = contrast != 0.0
    r = jnp.where(apply_c, (r - 0.5) * c + 0.5, r)
    g = jnp.where(apply_c, (g - 0.5) * c + 0.5, g)
    b = jnp.where(apply_c, (b - 0.5) * c + 0.5, b)

    return (
        jnp.clip(r, 0.0, 1.0),
        jnp.clip(g, 0.0, 1.0),
        jnp.clip(b, 0.0, 1.0),
    )


def vignette(r, g, b, vignette_value, full_h, full_w, ys, xs):
    """Vignette multiply. ``ys``/``xs`` are integer row/col index arrays
    (broadcastable to the plane shape); full_h/full_w are the *full image*
    dimensions (static ints). Contract: wgpu_shader.wgsl:166-178."""
    strength = (-vignette_value / 100.0) * 2.0
    cy = (ys.astype(jnp.float32) / full_h - 0.5) * 1.5
    cx = (xs.astype(jnp.float32) / full_w - 0.5) * 1.5
    dist = jnp.sqrt(cx * cx + cy * cy)
    t = jnp.clip((dist - 0.25) / 0.75, 0.0, 1.0)
    falloff = t * jnp.sqrt(t)  # pow(t, 1.5) without the exp/log pow path
    gain = jnp.clip(1.0 - strength * falloff, 0.0, 4.0)
    apply = strength != 0.0
    return (
        jnp.where(apply, r * gain, r),
        jnp.where(apply, g * gain, g),
        jnp.where(apply, b * gain, b),
    )
