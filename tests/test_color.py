"""Color-space primitive tests (core/color vs independent oracle + known values)."""

import numpy as np
import jax.numpy as jnp

from rawphotoforge_tpu.core import color

import oracle


def test_srgb_roundtrip():
    v = np.linspace(0.0, 1.0, 4096, dtype=np.float32)
    lin = np.asarray(color.srgb_to_linear(jnp.asarray(v)))
    back = np.asarray(color.linear_to_srgb(jnp.asarray(lin)))
    np.testing.assert_allclose(back, v, atol=6e-6)


def test_srgb_matches_oracle_and_breakpoints():
    v = np.concatenate(
        [
            np.linspace(0, 1, 1000, dtype=np.float32),
            np.array([0.04045, 0.040451, 0.0031308, 0.00313081], dtype=np.float32),
        ]
    )
    ours = np.asarray(color.srgb_to_linear(jnp.asarray(v)))
    np.testing.assert_allclose(ours, oracle.srgb_to_linear(v), atol=1e-5)
    ours_enc = np.asarray(color.linear_to_srgb(jnp.asarray(v)))
    np.testing.assert_allclose(ours_enc, oracle.linear_to_srgb(v), atol=1e-5)


def test_oklch_known_values():
    # White: L=1, C~0. Pure red: standard OKLab values (Ottosson's reference:
    # L=0.62796, a=0.22486, b=0.12585 -> C=0.25768, h=atan2(b,a)).
    r, g, b = (jnp.float32(1.0),) * 3
    L, C, _ = color.linear_srgb_to_oklch(r, g, b)
    assert abs(float(L) - 1.0) < 1e-4
    assert float(C) < 1e-4

    L, C, h = color.linear_srgb_to_oklch(
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0)
    )
    assert abs(float(L) - 0.62796) < 1e-3
    assert abs(float(C) - 0.25768) < 1e-3
    expected_h = np.arctan2(0.12585, 0.22486) / (2 * np.pi)
    assert abs(float(h) - expected_h) < 1e-3


def test_oklch_roundtrip_random(rng):
    rgb = rng.random((64, 64, 3), dtype=np.float32)
    r, g, b = [jnp.asarray(rgb[..., i]) for i in range(3)]
    L, C, h = color.linear_srgb_to_oklch(r, g, b)
    r2, g2, b2 = color.oklch_to_linear_srgb(L, C, h)
    np.testing.assert_allclose(np.asarray(r2), rgb[..., 0], atol=3e-5)
    np.testing.assert_allclose(np.asarray(g2), rgb[..., 1], atol=3e-5)
    np.testing.assert_allclose(np.asarray(b2), rgb[..., 2], atol=3e-5)


def test_oklch_matches_oracle(rng):
    rgb = (rng.random((32, 48, 3), dtype=np.float32) * 1.2).astype(np.float32)
    r, g, b = [jnp.asarray(rgb[..., i]) for i in range(3)]
    L, C, h = color.linear_srgb_to_oklch(r, g, b)
    Lo, Co, ho = oracle.to_oklch(rgb)
    np.testing.assert_allclose(np.asarray(L), Lo, atol=2e-5)
    np.testing.assert_allclose(np.asarray(C), Co, atol=2e-5)
    # Hue is circular; compare via wrapped difference away from C~0 pixels.
    dh = np.abs(np.asarray(h) - ho)
    dh = np.minimum(dh, 1.0 - dh)
    assert np.max(dh[Co > 1e-4]) < 1e-4


def test_hue_in_unit_turn_range(rng):
    rgb = rng.random((16, 16, 3), dtype=np.float32)
    _, _, h = color.linear_srgb_to_oklch(
        jnp.asarray(rgb[..., 0]), jnp.asarray(rgb[..., 1]), jnp.asarray(rgb[..., 2])
    )
    h = np.asarray(h)
    assert np.all(h >= 0.0) and np.all(h < 1.0)


def test_apply_gamma_v1_contract():
    """Hand-computed points of the v1 piecewise gamma (editor.py:47-76),
    including its internal second /255 of the slope argument."""
    import numpy as np

    from rawphotoforge_tpu.core.color import apply_gamma

    g, c_arg = 2.222, 4.5 / 255.0
    c = c_arg / 255.0
    x = np.array([0.0, 1e-12, 0.25, 0.5, 1.0], dtype=np.float32)
    thr = (c / (g - 1.0)) ** g
    expect = np.where(x < thr, x * (c / (g - 1.0)),
                      (1.0 + c) * np.power(x, 1.0 / g) - c)
    got = np.asarray(apply_gamma(x))
    np.testing.assert_allclose(got, expect.astype(np.float32), atol=2e-7)
    # Monotone, endpoints pinned.
    assert got[0] == 0.0 and abs(got[-1] - 1.0) < 1e-6
    assert (np.diff(got) >= 0).all()
    # Out-of-range input is clipped first (reference behavior).
    assert np.asarray(apply_gamma(np.array([2.0], np.float32)))[0] == got[-1]
