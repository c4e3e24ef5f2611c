"""Polynomial/iterative math for Pallas TPU kernels.

Mosaic has no atan2/sin/cos lowering, so the OKLCH hue round trip inside the
fused kernel uses these f32 polynomial implementations (Cephes-style
argument reduction; absolute error ~1e-7 rad, far below the 9.6e-5 rad width
of one 65536-entry hue-LUT step). All inputs/outputs are *turns* in [0, 1),
matching the hue encoding of wgpu_shader.wgsl:72-74.

Also here, as benchmarked-and-REJECTED alternatives (kept for the
accuracy tests and future re-evaluation, NOT used by the kernels):
``cbrt_fast`` (exponent bit-hack seed + two Halley iterations, ~1 ulp
over the OKLab LMS domain) and ``linear_to_srgb_fast``
(x^(1/2.4) = cbrt(sqrt(sqrt(x^5))), exact algebra over cheap VPU
primitives). Measured on hardware, Mosaic's native exp/log pow lowering
beats them in the spill-sensitive fused kernel (the Halley divisions and
extra live temporaries cost more than exp/log; see kernels/fused.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TWO_PI = 6.28318530718
_PI = 3.14159265359
_HALF_PI = 1.5707963267948966
_QUARTER_PI = 0.7853981633974483
_TAN_PI_8 = 0.41421356237309503


def _atan_unit(t):
    """atan(t) for t in [0, 1], Cephes atanf reduction + odd polynomial."""
    hi = t > _TAN_PI_8
    tr = jnp.where(hi, (t - 1.0) / (t + 1.0), t)
    s = tr * tr
    p = ((8.05374449538e-2 * s - 1.38776856032e-1) * s + 1.99777106478e-1) * s \
        - 3.33329491539e-1
    r = tr + tr * s * p
    return jnp.where(hi, r + _QUARTER_PI, r)


def atan2_turns(y, x):
    """atan2(y, x) / 2pi wrapped into [0, 1) — the WGSL hue computation
    (wgpu_shader.wgsl:72-74) without a hardware atan2."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    r = _atan_unit(t)
    r = jnp.where(ay > ax, _HALF_PI - r, r)
    r = jnp.where(x < 0.0, _PI - r, r)
    r = jnp.where(y < 0.0, -r, r)
    h = r * (1.0 / _TWO_PI)
    return jnp.where(h < 0.0, h + 1.0, h)


def cbrt_fast(x):
    """max(x, 0)^(1/3): bit-hack exponent seed + two Halley iterations.

    Seed: reinterpret the f32 bits, divide by 3 and add a magic bias —
    a ~3%-accurate cube root; Halley (cubic convergence) then lands within
    ~1 ulp for normal inputs. x == 0 stays (numerically) 0.
    """
    # abs() after the clamp: maximum(-0.0, 0.0) may keep -0.0, whose sign
    # bit would turn the bit-hack seed into a NaN pattern.
    x = jnp.abs(jnp.maximum(x, 0.0))
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    y = jax.lax.bitcast_convert_type(i // 3 + 709921077, jnp.float32)
    for _ in range(2):
        y3 = y * y * y
        # Guard must be a NORMAL float: 1e-38 is subnormal and flushes to
        # zero on FTZ backends, making x == 0 divide 0/0.
        y = y * (y3 + 2.0 * x) / (2.0 * y3 + x + 1e-30)
    return y


def linear_to_srgb_fast(c):
    """The sRGB OETF (wgpu_shader.wgsl:95-103) with the pow replaced by
    exact exponent algebra: x^(1/2.4) = x^(5/12) = cbrt(sqrt(sqrt(x^5))) —
    three multiplies, two square roots, one fast cube root."""
    x = jnp.maximum(c, 0.0)
    x5 = x * x
    x5 = x5 * x5 * x
    root = cbrt_fast(jnp.sqrt(jnp.sqrt(x5)))
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * root - 0.055)


def sincos_turns(h):
    """(sin, cos) of 2*pi*h for h in [0, 1).

    Reduction: k = floor(2h + 1/2) in {0, 1, 2}; u = h - k/2 in
    [-1/4, 1/4]; sin(2*pi*h) = (-1)^k sin(2*pi*u), likewise cos. The
    |z| <= pi/2 polynomials are odd/even Taylor series with error < 5e-8.
    """
    k = jnp.floor(2.0 * h + 0.5)
    u = h - 0.5 * k
    sign = 1.0 - 2.0 * (k - 2.0 * jnp.floor(0.5 * k))  # (-1)^k without int ops
    z = u * _TWO_PI
    z2 = z * z
    sin_p = z * (1.0 + z2 * (-1.6666667163e-1 + z2 * (8.3333337680e-3
            + z2 * (-1.9841270114e-4 + z2 * (2.7557314297e-6
            + z2 * -2.5050759689e-8)))))
    cos_p = 1.0 + z2 * (-0.5 + z2 * (4.1666667908e-2 + z2 * (-1.3888889225e-3
            + z2 * (2.4801587642e-5 + z2 * (-2.7557314297e-7
            + z2 * 2.0875723372e-9)))))
    return sign * sin_p, sign * cos_p
