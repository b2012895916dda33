import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.spectral.cie import (
    CIE_Y_INTEGRAL, cie_tables, compute_white_balance_matrix, linear_srgb_to_xyz,
    linear_to_srgb_gamma, sample_cie_xyz, sample_d65, spectral_to_xyz,
    srgb_gamma_to_linear, xyz_e_to_linear_srgb, xyz_to_linear_srgb,
)
from hikari_tpu.spectral.piecewise import blackbody_normalized, metal_eta_k
from hikari_tpu.spectral.spectrum import (
    SampledWavelengths, sample_wavelengths_uniform, sample_wavelengths_visible,
    terminate_secondary, visible_wavelengths_pdf,
)


def test_cie_y_integral():
    t = np.asarray(cie_tables())
    assert abs(t[1].sum() - CIE_Y_INTEGRAL) < 0.01


def test_cie_peak_wavelengths():
    # ybar peaks at 555nm; xbar main peak ~600nm; zbar ~445nm
    lam = jnp.arange(360.0, 831.0)
    xyz = sample_cie_xyz(lam[:, None])[:, 0, :]
    assert abs(float(lam[jnp.argmax(xyz[:, 1])]) - 555.0) <= 2.0
    assert abs(float(lam[jnp.argmax(xyz[:, 0])]) - 599.0) <= 3.0
    assert abs(float(lam[jnp.argmax(xyz[:, 2])]) - 446.0) <= 3.0


def test_visible_sampling_pdf_normalized():
    # integral of the sech^2 pdf over [360,830] should be ~1
    lam = jnp.linspace(360.0, 830.0, 4701)
    pdf = visible_wavelengths_pdf(lam)
    integral = float(jnp.trapezoid(pdf, lam))
    assert abs(integral - 1.0) < 1e-3


def test_visible_sampling_inverse_cdf_consistency():
    from hikari_tpu.spectral.spectrum import sample_visible_wavelength

    u = jnp.linspace(0.001, 0.999, 999)
    lam = sample_visible_wavelength(u)
    assert float(jnp.min(lam)) >= 360.0 and float(jnp.max(lam)) <= 830.0
    # d(lam)/du = 1/pdf(lam): check via finite differences
    du = 1e-4
    lam2 = sample_visible_wavelength(u + du)
    deriv = (lam2 - lam) / du
    pdf = visible_wavelengths_pdf(lam)
    np.testing.assert_allclose(np.asarray(deriv * pdf), 1.0, rtol=2e-2)


def test_hero_wavelengths_stratified():
    wl = sample_wavelengths_visible(jnp.array([0.2]))
    lam = np.asarray(wl.lam)[0]
    assert len(np.unique(lam)) == 4
    assert np.all(lam >= 360.0) and np.all(lam <= 830.0)
    wl2 = terminate_secondary(wl)
    assert np.asarray(wl2.pdf)[0, 1:].sum() == 0.0
    assert np.asarray(wl2.pdf)[0, 0] > 0.0


def test_flat_spectrum_is_white():
    # A constant (equal-energy) radiance spectrum must map to XYZ with x=y=z
    # chromaticity 1/3, and through the E-adapted matrix to neutral RGB.
    u = jnp.linspace(0.0, 1.0, 512, endpoint=False)
    wl = sample_wavelengths_visible(u)
    L = jnp.ones_like(wl.lam)
    xyz = jnp.mean(spectral_to_xyz(L, wl.lam, wl.pdf), axis=0) / CIE_Y_INTEGRAL
    # Y of equal-energy spectrum integrates to CIE_Y_INTEGRAL -> y=1
    np.testing.assert_allclose(float(xyz[1]), 1.0, rtol=5e-3)
    rgb = xyz_e_to_linear_srgb(xyz)
    np.testing.assert_allclose(np.asarray(rgb), 1.0, rtol=2e-2)


def test_srgb_matrices_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.8], [1.0, 0.0, 0.0], [0.3, 0.3, 0.3]])
    back = xyz_to_linear_srgb(linear_srgb_to_xyz(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)


def test_gamma_roundtrip():
    c = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(
        np.asarray(srgb_gamma_to_linear(linear_to_srgb_gamma(c))), np.asarray(c),
        atol=1e-5,
    )


def test_d65_normalization():
    # raw D65 is ~100 at 560nm
    assert abs(float(sample_d65(jnp.array(560.0))) - 100.0) < 1.5


def test_white_balance_identityish():
    # 6500K source is close to D65 -> matrix near identity
    m = np.asarray(compute_white_balance_matrix(6500.0))
    assert np.allclose(m, np.eye(3), atol=0.05)


def test_metal_spectra():
    eta, k = metal_eta_k("AU")
    # gold at 600nm: eta ~0.2-0.3, k ~3
    e = float(eta(jnp.array(600.0)))
    kk = float(k(jnp.array(600.0)))
    assert 0.1 < e < 0.5, e
    assert 2.5 < kk < 3.5, kk


def test_blackbody_peak():
    # 6500K blackbody peaks near 445nm (Wien)
    lam = jnp.linspace(360.0, 830.0, 471)
    le = blackbody_normalized(lam, 6500.0)
    assert float(jnp.max(le)) <= 1.0 + 1e-5
    peak = float(lam[jnp.argmax(le)])
    assert abs(peak - 445.8) < 5.0


def test_stratified_wavelengths():
    """One wavelength per quarter stratum, uniform pdf (spectral.jl:162-174)."""
    import numpy as np
    from hikari_tpu.spectral.spectrum import (
        LAMBDA_MAX, LAMBDA_MIN, LAMBDA_RANGE, sample_wavelengths_stratified,
    )

    u = jnp.asarray(np.random.RandomState(0).rand(128, 4), jnp.float32)
    wl = sample_wavelengths_stratified(u)
    lam = np.asarray(wl.lam)
    assert lam.shape == (128, 4)
    q = LAMBDA_RANGE / 4
    for i in range(4):
        assert np.all(lam[:, i] >= LAMBDA_MIN + i * q)
        assert np.all(lam[:, i] <= LAMBDA_MIN + (i + 1) * q)
    assert np.allclose(np.asarray(wl.pdf), 1.0 / LAMBDA_RANGE)
