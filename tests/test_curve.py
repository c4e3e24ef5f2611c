"""PCHIP / LUT tests: scipy cross-check, reference semantics, packed form."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import interpolate

from rawphotoforge_tpu.core import curve as cv


def test_pchip_matches_scipy_interior():
    # Interior knot tangents use the same Fritsch–Carlson harmonic-mean rule
    # as scipy; endpoints differ by design (the reference uses the one-sided
    # secant, interpolation.rs:60-61, while scipy uses a three-point
    # formula) — so compare interior segments only. f32-vs-f64 tolerance.
    x = np.array([0, 10000, 30000, 50000, 65535], dtype=np.int32)
    y = np.array([0, 20000, 25000, 42000, 65535], dtype=np.int32)
    xe = np.linspace(10000, 50000, 5000, dtype=np.float32)
    ours = cv.pchip_eval_f32(x, y, xe)
    ref = interpolate.PchipInterpolator(x, y)(xe)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2.0)


def test_pchip_endpoint_secant_slope():
    # Endpoint tangent = one-sided secant (interpolation.rs:60-61).
    x = np.array([0, 1000, 65535], dtype=np.int32)
    y = np.array([0, 3000, 65535], dtype=np.int32)
    s = cv.pchip_slopes_f32(x, y)
    assert abs(s[0] - 3.0) < 1e-6
    assert abs(s[-1] - (65535 - 3000) / (65535 - 1000)) < 1e-6


def test_pchip_monotone_preserving():
    x = np.array([0, 20000, 40000, 65535], dtype=np.int32)
    y = np.array([0, 30000, 31000, 65535], dtype=np.int32)
    lut = cv.build_lut(x, y)
    assert np.all(np.diff(lut.astype(np.int64)) >= 0)


def test_pchip_flat_on_sign_change():
    # Interior knot where secants change sign must get slope 0
    # (interpolation.rs:66-67): the local max is exactly attained.
    x = np.array([0, 30000, 65535], dtype=np.int32)
    y = np.array([0, 50000, 20000], dtype=np.int32)
    out = cv.pchip_eval_f32(x, y, np.array([30000.0], dtype=np.float32))
    assert out[0] == 50000.0


def test_pchip_clamped_extrapolation():
    x = np.array([10000, 50000], dtype=np.int32)
    y = np.array([20000, 40000], dtype=np.int32)
    out = cv.pchip_eval_f32(x, y, np.array([0.0, 9999.0, 50001.0, 65535.0], dtype=np.float32))
    np.testing.assert_array_equal(out, [20000.0, 20000.0, 40000.0, 40000.0])


def test_pchip_errors():
    with pytest.raises(cv.CurveError):
        cv.pchip_slopes_f32(np.array([0]), np.array([0]))
    with pytest.raises(cv.CurveError):
        cv.pchip_slopes_f32(np.array([0, 0, 10]), np.array([0, 1, 2]))
    with pytest.raises(cv.CurveError):
        cv.pchip_slopes_f32(np.array([0, 5]), np.array([0, 1, 2]))


def test_identity_lut_build():
    # Evaluating the identity control points through the f32 Hermite form
    # wobbles +/-1 around exact integers before truncation — exactly as the
    # reference does when a user sets identity *points* (the reference's
    # *default* is the exact arange table, which CurveState reproduces).
    x = np.array([0, 65535], dtype=np.int32)
    lut = cv.build_lut(x, x)
    assert np.abs(lut.astype(np.int64) - cv.identity_lut()).max() <= 1


def test_default_luts():
    assert cv.identity_lut()[12345] == 12345
    assert np.all(cv.constant_lut() == 32767)
    assert cv.identity_lut().shape == (65536,)


def test_lut_i32_truncation():
    # Rust `f32 as i32` truncates toward zero; the LUT must floor, not round.
    x = np.array([0, 65535], dtype=np.int32)
    y = np.array([0, 32767], dtype=np.int32)  # slope ~0.5 -> many .49995 values
    lut = cv.build_lut(x, y)
    xe = np.arange(65536, dtype=np.float32)
    exact = cv.pchip_eval_f32(x, y, xe)
    np.testing.assert_array_equal(lut, np.trunc(exact).astype(np.int32))


@pytest.mark.parametrize(
    "pts",
    [
        ([0, 65535], [0, 65535]),
        ([0, 65535], [32767, 32767]),
        ([0, 16000, 30000, 50000, 65535], [0, 10000, 40000, 60000, 65535]),
        ([0, 30000, 65535], [10000, 50000, 20000]),
        ([5000, 60000], [10000, 62000]),  # clamped ends
    ],
)
def test_packed_coeffs_match_lut(pts):
    """The packed piecewise-polynomial form must reproduce the LUT to
    within one LUT step (f32 Hermite-vs-monomial reassociation)."""
    x = np.array(pts[0], dtype=np.int32)
    y = np.array(pts[1], dtype=np.int32)
    lut = cv.build_lut(x, y)
    breaks, coeffs = cv.pchip_coeffs(x, y)
    u = jnp.arange(65536, dtype=jnp.float32)
    vals = np.asarray(cv.eval_packed(u, jnp.asarray(breaks), jnp.asarray(coeffs)))
    quant = np.clip(np.trunc(vals), 0, 65535).astype(np.int64)
    diff = np.abs(quant - lut.astype(np.int64))
    assert diff.max() <= 1, f"max LUT deviation {diff.max()}"
    # And quantization-free agreement is tight.
    exact = cv.pchip_eval_f32(x, y, np.arange(65536, dtype=np.float32))
    np.testing.assert_allclose(vals, exact, rtol=2e-5, atol=0.51)


def test_packed_padding_never_selected():
    x = np.array([0, 40000, 65535], dtype=np.int32)
    y = np.array([0, 30000, 65535], dtype=np.int32)
    breaks, coeffs = cv.pchip_coeffs(x, y, max_ctrl=8)
    assert breaks.shape == (8,)
    assert coeffs.shape == (8, 4)
    assert np.all(breaks[3:] > 65535)
    # Evaluate exactly at the last knot: clamped value.
    v = np.asarray(cv.eval_packed(jnp.float32(65535.0), jnp.asarray(breaks), jnp.asarray(coeffs)))
    assert abs(float(v) - 65535.0) < 0.5
