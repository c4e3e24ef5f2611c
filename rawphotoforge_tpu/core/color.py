"""Color-space primitives for the TPU-native develop pipeline.

Numerical contract: the current-main WGSL kernel of the reference
(rust/photo-editor/src/wgpu_shader.wggl — sRGB EOTF/OETF at
wgpu_shader.wgsl:85-103, OKLab matrices at wgpu_shader.wgsl:40-62,
OKLCH round trip at wgpu_shader.wgsl:64-83). The matrix constants are the
standard OKLab matrices (Björn Ottosson); the WGSL file stores them
column-major, re-derived here row-major.

All functions operate on *planar* channel tuples ``(r, g, b)`` of identically
shaped float32 arrays. On TPU the planar layout keeps the trailing array
dimension a large image axis (lane-friendly), instead of a 3-wide channel
axis that would waste 125 of 128 lanes. Everything is pure jax.numpy, usable
inside jit / vmap / shard_map and inside Pallas kernel bodies.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 6.28318530718  # 2 * 3.14159265359, matches the WGSL literal

# Rec.709 / sRGB luma weights (wgpu_shader.wgsl:218).
LUMA_R = 0.2126
LUMA_G = 0.7152
LUMA_B = 0.0722

# linear sRGB -> LMS (OKLab M1), row-major.
M1 = (
    (0.4122214708, 0.5363325363, 0.0514459929),
    (0.2119034982, 0.6806995451, 0.1073969566),
    (0.0883024619, 0.2817188376, 0.6299787005),
)

# LMS -> linear sRGB (OKLab M1^-1), row-major.
M1_INV = (
    (4.0767416621, -3.3077115913, 0.2309699292),
    (-1.2684380046, 2.6097574011, -0.3413193965),
    (-0.0041960863, -0.7034186147, 1.7076147010),
)

# cbrt(LMS) -> OKLab (M2), row-major.
M2 = (
    (0.2104542553, 0.7936177850, -0.0040720468),
    (1.9779984951, -2.4285922050, 0.4505937099),
    (0.0259040371, 0.7827717662, -0.8086757660),
)

# OKLab -> cbrt(LMS) (M2^-1), row-major.
M2_INV = (
    (1.0, 0.3963377774, 0.2158037573),
    (1.0, -0.1055613458, -0.0638541728),
    (1.0, -0.0894841775, -1.2914855480),
)


def _mat3_apply(m, a, b, c):
    """Row-major 3x3 matrix times planar vector, as fused multiply-adds.

    Unrolled instead of einsum so each output plane is three VPU
    multiply-adds over full image planes — no tiny-contraction matmul.
    """
    x = m[0][0] * a + m[0][1] * b + m[0][2] * c
    y = m[1][0] * a + m[1][1] * b + m[1][2] * c
    z = m[2][0] * a + m[2][1] * b + m[2][2] * c
    return x, y, z


def srgb_to_linear(c):
    """sRGB-encoded [0,1] -> linear-light. EOTF of wgpu_shader.wgsl:85-93."""
    return jnp.where(
        c <= 0.04045,
        c / 12.92,
        jnp.power((c + 0.055) / 1.055, 2.4),
    )


def linear_to_srgb(c):
    """Linear-light -> sRGB-encoded. OETF of wgpu_shader.wgsl:95-103.

    Mirrors the WGSL exactly, including that values are *not* clamped here
    (the shader clamps the final vec4 at store time, wgpu_shader.wgsl:336).
    Negative inputs follow the `c <= 0.0031308` linear branch.
    """
    return jnp.where(
        c <= 0.0031308,
        c * 12.92,
        1.055 * jnp.power(jnp.maximum(c, 0.0), 1.0 / 2.4) - 0.055,
    )


def _atan2_turns_jnp(y, x):
    h = jnp.arctan2(y, x) / TWO_PI
    return jnp.where(h < 0.0, h + 1.0, h)


def _sincos_turns_jnp(h):
    ang = h * TWO_PI
    return jnp.sin(ang), jnp.cos(ang)


def _cbrt_jnp(x):
    return jnp.power(jnp.maximum(x, 0.0), 1.0 / 3.0)


def linear_srgb_to_oklab(r, g, b, cbrt=_cbrt_jnp):
    """Planar linear sRGB -> cartesian OKLab (L, a, b).

    LMS is clamped at 0 before the cube root (wgpu_shader.wgsl:64-72);
    ``cbrt`` is injectable for the Pallas kernels."""
    l_, m_, s_ = _mat3_apply(M1, r, g, b)
    l_ = cbrt(l_)
    m_ = cbrt(m_)
    s_ = cbrt(s_)
    return _mat3_apply(M2, l_, m_, s_)


def linear_srgb_to_oklch(r, g, b, atan2_turns=_atan2_turns_jnp,
                         cbrt=_cbrt_jnp):
    """Planar linear sRGB -> (L, C, h) with h in turns [0, 1).

    Contract: wgpu_shader.wgsl:64-75. LMS is clamped at 0 before the cube
    root; hue is atan2 / 2pi, wrapped into [0, 1). ``atan2_turns`` and
    ``cbrt`` are injectable: the Pallas kernel passes the polynomial atan2
    (Mosaic has no atan2) and the Halley-iteration cube root (cheaper than
    the exp/log pow lowering) from kernels/ktrig.py.
    """
    L, A, B = linear_srgb_to_oklab(r, g, b, cbrt=cbrt)
    C = jnp.sqrt(A * A + B * B)
    return L, C, atan2_turns(B, A)


def oklch_to_linear_srgb(L, C, h, sincos_turns=_sincos_turns_jnp):
    """Planar (L, C, h-in-turns) -> linear sRGB. Contract: wgpu_shader.wgsl:77-84."""
    sin_h, cos_h = sincos_turns(h)
    A = C * cos_h
    B = C * sin_h
    l_, m_, s_ = _mat3_apply(M2_INV, L, A, B)
    l_ = l_ * l_ * l_
    m_ = m_ * m_ * m_
    s_ = s_ * s_ * s_
    return _mat3_apply(M1_INV, l_, m_, s_)


def luma(r, g, b):
    """Rec.709 relative luminance of linear RGB (wgpu_shader.wgsl:218)."""
    return LUMA_R * r + LUMA_G * g + LUMA_B * b


def apply_gamma(x, gamma=(2.222, 4.5 / 255.0)):
    """v1's rawpy-style display gamma (python-legacy editor.py:47-76).

    Piecewise (g, c) transfer: clip to [0,1]; below
    ``threshold = (c/(g-1))**g`` a linear segment ``x * c/(g-1)``, above it
    ``(1+c) * x**(1/g) - c``. Faithful to the reference including its
    quirk of dividing the slope argument by 255 *again* inside (so the
    default's effective c is 4.5/255/255 and the linear toe is
    vanishingly small) — parity means reproducing that behavior, not the
    textbook BT.709 curve. Not used by the v4 develop contract (which is
    sRGB, linear_to_srgb above); provided for v1-workflow compatibility.
    """
    g, c = gamma
    c = c / 255.0
    x = jnp.clip(x, 0.0, 1.0)
    threshold = (c / (g - 1.0)) ** g
    return jnp.where(
        x < threshold,
        x * (c / (g - 1.0)),
        (1.0 + c) * jnp.power(x, 1.0 / g) - c,
    ).astype(jnp.float32)
