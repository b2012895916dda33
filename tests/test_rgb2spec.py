import jax.numpy as jnp
import numpy as np

from hikari_tpu.spectral.cie import _SRGB_FROM_XYZ, sample_cie_xyz, sample_d65
from hikari_tpu.spectral.rgb2spec import (
    rgb_albedo_eval, rgb_illuminant_eval, rgb_to_coeffs, rgb_unbounded_eval,
    sigmoid_poly_max_value, srgb_table,
)


def _roundtrip_rgb(rgbs):
    """Uplift to spectra, integrate against D65 + CMFs, convert back to sRGB."""
    t = srgb_table()
    lam = jnp.arange(360.0, 831.0)
    s = rgb_albedo_eval(t, rgbs, jnp.broadcast_to(lam, (rgbs.shape[0], lam.shape[0])))
    cmf = sample_cie_xyz(lam)
    d65 = sample_d65(lam)
    w = cmf * d65[:, None]
    norm = jnp.sum(cmf[:, 1] * d65)
    xyz = (s @ w) / norm
    return jnp.einsum("ij,nj->ni", _SRGB_FROM_XYZ, xyz)


def test_albedo_roundtrip():
    rgbs = jnp.array(
        [
            [0.7, 0.3, 0.2], [0.1, 0.8, 0.3], [0.2, 0.3, 0.9],
            [0.5, 0.5, 0.5], [0.9, 0.9, 0.1], [0.05, 0.02, 0.01],
            [1.0, 1.0, 1.0], [0.0, 0.0, 0.0],
        ]
    )
    out = _roundtrip_rgb(rgbs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgbs), atol=2e-3)


def test_spectra_bounded():
    t = srgb_table()
    key_rgbs = jnp.array([[0.9, 0.1, 0.1], [0.33, 0.44, 0.22]])
    lam = jnp.linspace(360.0, 830.0, 100)
    s = rgb_albedo_eval(t, key_rgbs, jnp.broadcast_to(lam, (2, 100)))
    assert float(jnp.min(s)) >= 0.0
    assert float(jnp.max(s)) <= 1.0


def test_gray_exact():
    t = srgb_table()
    c = rgb_to_coeffs(t, jnp.array([0.25, 0.25, 0.25]))
    # constant polynomial: sigmoid(c2) == 0.25
    from hikari_tpu.spectral.rgb2spec import sigmoid

    assert abs(float(sigmoid(c[2])) - 0.25) < 1e-6
    assert float(c[0]) == 0.0 and float(c[1]) == 0.0


def test_unbounded_scales():
    t = srgb_table()
    rgb = jnp.array([4.0, 2.0, 1.0])
    lam = jnp.linspace(400.0, 700.0, 32)
    s = rgb_unbounded_eval(t, rgb, lam)
    assert float(jnp.max(s)) > 1.0  # unbounded values exceed 1


def test_illuminant_uses_d65():
    t = srgb_table()
    lam = jnp.array([560.0])
    s = rgb_illuminant_eval(t, jnp.array([1.0, 1.0, 1.0]), lam)
    # white illuminant at 560nm: 2*0.5 * D65(560) ~ 100
    assert 80.0 < float(s[0]) < 120.0


def test_max_value():
    t = srgb_table()
    c = rgb_to_coeffs(t, jnp.array([0.8, 0.4, 0.2]))
    mv = float(sigmoid_poly_max_value(c))
    lam = jnp.linspace(360.0, 830.0, 1000)
    from hikari_tpu.spectral.rgb2spec import eval_sigmoid_poly

    dense_max = float(jnp.max(eval_sigmoid_poly(c, lam)))
    assert mv >= dense_max - 1e-4
