"""Unsharp-mask sharpening (separable Gaussian), a stencil stage.

The north-star develop stack includes sharpening (BASELINE.json; the
reference itself exposes no sharpen slider — this is a capability the RAW
develop chain is expected to own). Runs on linear-light planes between the
geometry stage and the pointwise stack.

TPU formulation: fixed-radius separable Gaussian as two 1-D shift-and-FMA
passes (static unrolled taps — no conv op, fuses with neighbors), then
``out = x + amount * (x - blur)`` with optional luma threshold.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _gauss_taps(sigma: float, radius: int) -> np.ndarray:
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur_axis(x: jax.Array, taps: np.ndarray, axis: int) -> jax.Array:
    radius = (len(taps) - 1) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    # reflect requires pad < dim; degrade to edge replication for images
    # (or feather radii) thinner than the blur support instead of
    # raising at trace time.
    mode = "reflect" if x.shape[axis] > radius else "edge"
    xp = jnp.pad(x, pad, mode=mode)
    out = jnp.zeros_like(x)
    n = x.shape[axis]
    for i, w in enumerate(taps):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + n)
        out = out + w * xp[tuple(sl)]
    return out


@functools.partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(planes: jax.Array, sigma: float = 1.0, radius: int = 2) -> jax.Array:
    """Separable Gaussian blur of [C, H, W] planes (reflect padding)."""
    taps = _gauss_taps(sigma, radius)
    return _blur_axis(_blur_axis(planes, taps, 1), taps, 2)


@functools.partial(jax.jit, static_argnames=("sigma", "radius", "threshold"))
def unsharp_mask(
    planes: jax.Array,
    amount: jax.Array,
    sigma: float = 1.0,
    radius: int = 2,
    threshold: float = 0.0,
) -> jax.Array:
    """Unsharp mask on linear planes [3, H, W].

    out = x + amount * highpass, where highpass = x - gaussian(x); pixels
    whose |highpass| is below ``threshold`` are left untouched (noise
    guard). ``amount`` may be a traced scalar so slider moves don't
    recompile; amount == 0 is the identity.
    """
    blur = gaussian_blur(planes, sigma=sigma, radius=radius)
    high = planes - blur
    if threshold > 0.0:
        high = jnp.where(jnp.abs(high) >= threshold, high, 0.0)
    out = planes + amount * high
    return jnp.where(amount != 0.0, jnp.maximum(out, 0.0), planes)
