"""Spectral BSDF sampling / evaluation per material type.

Parity with the reference's spectral dispatch system
(/root/reference/src/materials/spectral-eval.jl: sample_bsdf_spectral,
evaluate_bsdf_spectral, get_albedo_spectral, get_emission_spectral for
Matte/Mirror/Glass/Conductor). Everything operates on whole wavefronts in
the *local shading frame* (z = shading normal); the integrator converts
to/from world space. Spectra are (..., 4) hero-wavelength arrays.

Dispatch strategy (TPU translation of `with_index` type dispatch): the
integrator evaluates each material type present in the scene densely over
all lanes and `where`-selects by the per-lane type tag — divergence becomes
a handful of vectorized passes instead of a branch tree.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.pytree import pytree_dataclass
from ..core.vecmath import abs_cos_theta, normalize, reflect, refract, same_hemisphere
from ..sampling.distributions import cosine_sample_hemisphere
from ..spectral.rgb2spec import RGBToSpectrumTable, rgb_albedo_eval
from .fresnel import fresnel_conductor, fresnel_dielectric
from .microfacet import (
    effectively_smooth, regularize_alpha, tr_d, tr_g, tr_g1, tr_pdf,
    tr_sample_wm,
)
from ..textures.atlas import eval_rgb, eval_scalar
from .types import MaterialBanks

INV_PI = 1.0 / jnp.pi


def _tex_rgb(banks_field, tex_field, idx, tex):
    """Resolve a possibly-textured RGB field. tex = (atlas, ctx) or None."""
    const = banks_field[idx]
    if tex is None:
        return const
    atlas, ctx = tex
    return eval_rgb(atlas, tex_field[idx], const, ctx)


def _tex_alpha(base_alpha, tex_field, idx, tex):
    """Textured roughness: texture value (remapped sqrt) replaces the
    baked-in alpha where a texture is bound."""
    if tex is None:
        return base_alpha
    atlas, ctx = tex
    t = tex_field[idx]
    r = eval_scalar(atlas, t, jnp.zeros_like(base_alpha), ctx)
    return jnp.where(t >= 0, jnp.sqrt(jnp.clip(r, 0.0, 1.0)), base_alpha)


@pytree_dataclass
class BSDFSample:
    """Reference SpectralBSDFSample (spectral-eval.jl:18-28)."""

    wi: jnp.ndarray          # (..., 3) local
    f: jnp.ndarray           # (..., 4)
    pdf: jnp.ndarray         # (...,)
    specular: jnp.ndarray    # (...,) bool
    transmission: jnp.ndarray  # (...,) bool
    eta_scale: jnp.ndarray   # (...,) radiance-compression factor (eta'^2)
    valid: jnp.ndarray       # (...,) bool


def _invalid(shape):
    z = jnp.zeros(shape, jnp.float32)
    wi = jnp.zeros(shape + (3,), jnp.float32).at[..., 2].set(1.0)
    return BSDFSample(
        wi=wi, f=jnp.zeros(shape + (4,), jnp.float32), pdf=z,
        specular=jnp.zeros(shape, bool), transmission=jnp.zeros(shape, bool),
        eta_scale=jnp.ones(shape, jnp.float32), valid=jnp.zeros(shape, bool),
    )


def _sample_dense_spectrum(table_rows: jnp.ndarray, idx: jnp.ndarray, lam: jnp.ndarray):
    """Linear interp of dense 1nm [360,830] spectra. table_rows (M, 471),
    idx (...,), lam (..., 4) -> (..., 4)."""
    n = table_rows.shape[-1]
    x = jnp.clip(lam - 360.0, 0.0, n - 1.001)
    i0 = jnp.floor(x).astype(jnp.int32)
    f = x - i0.astype(jnp.float32)
    rows = table_rows[idx]  # (..., 471)
    v0 = jnp.take_along_axis(rows, i0, axis=-1)
    v1 = jnp.take_along_axis(rows, jnp.minimum(i0 + 1, n - 1), axis=-1)
    return v0 * (1.0 - f) + v1 * f


# --- Matte (Lambert / Oren-Nayar; spectral-eval.jl:29-120) --------------------


def _oren_nayar_factor(sigma, wo, wi):
    """Oren-Nayar A + B * max(0, cos(phi_i - phi_o)) sin(alpha) tan(beta)."""
    sigma_r = sigma * jnp.pi / 180.0
    s2 = sigma_r * sigma_r
    a = 1.0 - s2 / (2.0 * (s2 + 0.33))
    b = 0.45 * s2 / (s2 + 0.09)
    from ..core.vecmath import cos_phi, sin_phi, sin_theta

    sin_ti = sin_theta(wi)
    sin_to = sin_theta(wo)
    cos_dphi = jnp.maximum(
        0.0, cos_phi(wi) * cos_phi(wo) + sin_phi(wi) * sin_phi(wo)
    )
    abs_ci = jnp.maximum(abs_cos_theta(wi), 1e-6)
    abs_co = jnp.maximum(abs_cos_theta(wo), 1e-6)
    sin_alpha = jnp.where(abs_ci > abs_co, sin_to, sin_ti)
    tan_beta = jnp.where(abs_ci > abs_co, sin_ti / abs_ci, sin_to / abs_co)
    return a + b * cos_dphi * sin_alpha * tan_beta


def sample_matte(
    banks: MaterialBanks, idx, table: RGBToSpectrumTable, wo, lam, u2, uc,
    tex=None,
) -> BSDFSample:
    kd_rgb = _tex_rgb(banks.matte_kd, banks.matte_kd_tex, idx, tex)
    kd = rgb_albedo_eval(table, jnp.clip(kd_rgb, 0.0, 1.0), lam)
    sigma = banks.matte_sigma[idx]
    wi = cosine_sample_hemisphere(u2)
    wi = jnp.where(wo[..., 2:3] < 0.0, wi * jnp.array([1.0, 1.0, -1.0]), wi)
    pdf = abs_cos_theta(wi) * INV_PI
    f = kd * INV_PI
    f = f * jnp.where(sigma > 0.0, _oren_nayar_factor(sigma, wo, wi), 1.0)[..., None]
    valid = (pdf > 0.0) & (jnp.abs(wo[..., 2]) > 1e-6)
    shape = pdf.shape
    return BSDFSample(
        wi=wi, f=f, pdf=pdf,
        specular=jnp.zeros(shape, bool), transmission=jnp.zeros(shape, bool),
        eta_scale=jnp.ones(shape, jnp.float32), valid=valid,
    )


def eval_matte(banks, idx, table, wo, wi, lam, tex=None):
    kd_rgb = _tex_rgb(banks.matte_kd, banks.matte_kd_tex, idx, tex)
    kd = rgb_albedo_eval(table, jnp.clip(kd_rgb, 0.0, 1.0), lam)
    sigma = banks.matte_sigma[idx]
    same = same_hemisphere(wo, wi)
    f = kd * INV_PI
    f = f * jnp.where(sigma > 0.0, _oren_nayar_factor(sigma, wo, wi), 1.0)[..., None]
    f = jnp.where(same[..., None], f, 0.0)
    pdf = jnp.where(same, abs_cos_theta(wi) * INV_PI, 0.0)
    return f, pdf


# --- Mirror (spectral-eval.jl Mirror) ----------------------------------------


def sample_mirror(banks, idx, table, wo, lam, u2, uc, tex=None) -> BSDFSample:
    kr_rgb = _tex_rgb(banks.mirror_kr, banks.mirror_kr_tex, idx, tex)
    kr = rgb_albedo_eval(table, jnp.clip(kr_rgb, 0.0, 1.0), lam)
    wi = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    cos_i = jnp.maximum(abs_cos_theta(wi), 1e-6)
    f = kr / cos_i[..., None]
    shape = cos_i.shape
    return BSDFSample(
        wi=wi, f=f, pdf=jnp.ones(shape, jnp.float32),
        specular=jnp.ones(shape, bool), transmission=jnp.zeros(shape, bool),
        eta_scale=jnp.ones(shape, jnp.float32),
        valid=jnp.abs(wo[..., 2]) > 1e-6,
    )


# --- Glass: smooth dielectric (spectral-eval.jl Glass, pbrt DielectricBxDF) ---


def sample_glass(banks, idx, table, wo, lam, u2, uc, tex=None) -> BSDFSample:
    kr = rgb_albedo_eval(
        table, jnp.clip(_tex_rgb(banks.glass_kr, banks.glass_kr_tex, idx, tex), 0.0, 1.0), lam
    )
    kt = rgb_albedo_eval(
        table, jnp.clip(_tex_rgb(banks.glass_kt, banks.glass_kt_tex, idx, tex), 0.0, 1.0), lam
    )
    eta = banks.glass_eta[idx]

    cos_o = wo[..., 2]
    fr = fresnel_dielectric(cos_o, eta)

    # reflect branch
    wi_r = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    # transmit branch: refract about +z oriented normal
    n = jnp.zeros_like(wo).at[..., 2].set(1.0)
    n = jnp.where(cos_o[..., None] < 0.0, -n, n)
    eta_p = jnp.where(cos_o > 0.0, eta, 1.0 / eta)
    ok_t, wi_t = refract(wo, n, eta_p)

    choose_r = uc < fr
    wi = jnp.where(choose_r[..., None], wi_r, wi_t)
    cos_i = jnp.maximum(abs_cos_theta(wi), 1e-6)

    f_r = kr * (fr / cos_i)[..., None]
    # radiance transport carries 1/eta'^2 compression (pbrt 9.5.2)
    f_t = kt * ((1.0 - fr) / cos_i / (eta_p * eta_p))[..., None]
    f = jnp.where(choose_r[..., None], f_r, f_t)
    pdf = jnp.where(choose_r, fr, 1.0 - fr)
    valid = (jnp.abs(cos_o) > 1e-6) & (choose_r | ok_t) & (pdf > 0.0)
    shape = pdf.shape
    return BSDFSample(
        wi=wi, f=f, pdf=pdf,
        specular=jnp.ones(shape, bool),
        transmission=~choose_r,
        eta_scale=jnp.where(choose_r, 1.0, eta_p * eta_p),
        valid=valid,
    )


# --- Conductor (spectral-eval.jl Conductor, pbrt ConductorBxDF) ---------------


def _conductor_alpha(banks, idx, regularize, tex=None):
    ax = _tex_alpha(banks.cond_ax[idx], banks.cond_rough_tex, idx, tex)
    ay = _tex_alpha(banks.cond_ay[idx], banks.cond_rough_tex, idx, tex)
    if regularize is not None:
        ax = jnp.where(regularize, regularize_alpha(ax), ax)
        ay = jnp.where(regularize, regularize_alpha(ay), ay)
    return ax, ay


def sample_conductor(
    banks, idx, table, wo, lam, u2, uc, regularize=None, tex=None
) -> BSDFSample:
    eta = _sample_dense_spectrum(banks.cond_eta, idx, lam)
    k = _sample_dense_spectrum(banks.cond_k, idx, lam)
    ax, ay = _conductor_alpha(banks, idx, regularize, tex)
    smooth = effectively_smooth(ax, ay)

    # smooth: delta reflection
    wi_s = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    cos_s = jnp.maximum(abs_cos_theta(wi_s), 1e-6)
    f_s = fresnel_conductor(cos_s, eta, k) / cos_s[..., None]

    # rough: microfacet
    wm = tr_sample_wm(wo, u2, ax, ay)
    wi_m = reflect(wo, wm)
    same = same_hemisphere(wo, wi_m)
    cos_o = jnp.maximum(abs_cos_theta(wo), 1e-6)
    cos_i = jnp.maximum(abs_cos_theta(wi_m), 1e-6)
    fr = fresnel_conductor(jnp.abs(jnp.sum(wo * wm, -1)), eta, k)
    d = tr_d(wm, ax, ay)
    g = tr_g(wo, wi_m, ax, ay)
    f_m = fr * (d * g / (4.0 * cos_o * cos_i))[..., None]
    pdf_m = tr_pdf(wo, wm, ax, ay) / (4.0 * jnp.maximum(jnp.abs(jnp.sum(wo * wm, -1)), 1e-8))

    wi = jnp.where(smooth[..., None], wi_s, wi_m)
    f = jnp.where(smooth[..., None], f_s, f_m)
    pdf = jnp.where(smooth, 1.0, pdf_m)
    valid = (jnp.abs(wo[..., 2]) > 1e-6) & (smooth | (same & (pdf_m > 0.0)))
    shape = pdf.shape
    return BSDFSample(
        wi=wi, f=f, pdf=pdf,
        specular=smooth, transmission=jnp.zeros(shape, bool),
        eta_scale=jnp.ones(shape, jnp.float32), valid=valid,
    )


def eval_conductor(banks, idx, table, wo, wi, lam, regularize=None, tex=None):
    eta = _sample_dense_spectrum(banks.cond_eta, idx, lam)
    k = _sample_dense_spectrum(banks.cond_k, idx, lam)
    ax, ay = _conductor_alpha(banks, idx, regularize, tex)
    smooth = effectively_smooth(ax, ay)
    same = same_hemisphere(wo, wi)

    wm = wo + wi
    wm_len = jnp.linalg.norm(wm, axis=-1, keepdims=True)
    wm = jnp.where(wm_len > 1e-9, wm / jnp.maximum(wm_len, 1e-9), 0.0)
    wm = jnp.where(wm[..., 2:3] < 0.0, -wm, wm)
    cos_o = jnp.maximum(abs_cos_theta(wo), 1e-6)
    cos_i = jnp.maximum(abs_cos_theta(wi), 1e-6)
    fr = fresnel_conductor(jnp.abs(jnp.sum(wo * wm, -1)), eta, k)
    d = tr_d(wm, ax, ay)
    g = tr_g(wo, wi, ax, ay)
    f = fr * (d * g / (4.0 * cos_o * cos_i))[..., None]
    pdf = tr_pdf(wo, wm, ax, ay) / (4.0 * jnp.maximum(jnp.abs(jnp.sum(wo * wm, -1)), 1e-8))
    ok = same & ~smooth & (wm_len[..., 0] > 1e-9)
    return jnp.where(ok[..., None], f, 0.0), jnp.where(ok, pdf, 0.0)


# --- Emission (emissive.jl, used via get_emission_spectral) -------------------


def emitted_radiance(banks, idx, table, lam, cos_wo, tex=None):
    """Le(lambda) for emissive materials; zero on back side unless two_sided."""
    from ..spectral.cie import D65_PHOTOMETRIC
    from ..spectral.rgb2spec import rgb_illuminant_eval

    le_rgb = _tex_rgb(banks.emissive_le, banks.emissive_le_tex, idx, tex)
    le = rgb_illuminant_eval(table, jnp.maximum(le_rgb, 0.0), lam)
    le = le * (banks.emissive_scale[idx] / D65_PHOTOMETRIC)[..., None]
    front = (cos_wo > 0.0) | banks.emissive_two_sided[idx]
    return jnp.where(front[..., None], le, 0.0)
