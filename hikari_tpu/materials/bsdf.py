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

import jax
import jax.numpy as jnp

from ..core.lookup import bank_lookup as _bl

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
    const = _bl(banks_field, idx)
    if tex is None:
        return const
    atlas, ctx = tex
    return eval_rgb(atlas, _bl(tex_field, idx), const, ctx)


def _albedo_spec(banks, c4_field, rgb_field, tex_field, idx, tex, table, lam):
    """Spectral reflectance of a possibly-textured RGB field: constant
    lanes use the precomputed sigmoid coefficients (one polynomial eval);
    the runtime table uplift only exists in scenes that actually bind
    textures (banks.has_textures is static)."""
    from ..spectral.rgb2spec import coeff4_eval
    from ..textures.atlas import CONST_TEX

    spec = coeff4_eval(_bl(c4_field, idx), lam)
    if tex is None or not banks.has_textures:
        return spec
    atlas, ctx = tex
    t = _bl(tex_field, idx)
    rgb_t = eval_rgb(atlas, t, _bl(rgb_field, idx), ctx)
    spec_t = rgb_albedo_eval(table, jnp.clip(rgb_t, 0.0, 1.0), lam)
    return jnp.where((t == CONST_TEX)[..., None], spec, spec_t)


def _tex_alpha(base_alpha, tex_field, idx, tex):
    """Textured roughness: texture value (remapped sqrt) replaces the
    baked-in alpha where a texture is bound."""
    if tex is None:
        return base_alpha
    atlas, ctx = tex
    t = _bl(tex_field, idx)
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
    idx (...,), lam (..., 4) -> (..., 4).

    Gathers only the two needed bins per wavelength via flattened
    (row, bin) indices — materializing whole 471-entry rows per lane costs
    ~100x more gather traffic than the 8 values actually used."""
    n = table_rows.shape[-1]
    x = jnp.clip(lam - 360.0, 0.0, n - 1.001)
    i0 = jnp.floor(x).astype(jnp.int32)
    f = x - i0.astype(jnp.float32)
    flat = table_rows.reshape(-1)
    base = idx[..., None] * n
    v0 = flat[base + i0]
    v1 = flat[base + jnp.minimum(i0 + 1, n - 1)]
    # keep the gather in its own small fusion: XLA folding these lookups
    # into large consumer fusions emits a ~10x slower gather loop
    return jax.lax.optimization_barrier(v0 * (1.0 - f) + v1 * f)


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
    kd = _albedo_spec(banks, banks.matte_kd_c4, banks.matte_kd,
                      banks.matte_kd_tex, idx, tex, table, lam)
    sigma = _bl(banks.matte_sigma, idx)
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
    kd = _albedo_spec(banks, banks.matte_kd_c4, banks.matte_kd,
                      banks.matte_kd_tex, idx, tex, table, lam)
    sigma = _bl(banks.matte_sigma, idx)
    same = same_hemisphere(wo, wi)
    f = kd * INV_PI
    f = f * jnp.where(sigma > 0.0, _oren_nayar_factor(sigma, wo, wi), 1.0)[..., None]
    f = jnp.where(same[..., None], f, 0.0)
    pdf = jnp.where(same, abs_cos_theta(wi) * INV_PI, 0.0)
    return f, pdf


# --- Mirror (spectral-eval.jl Mirror) ----------------------------------------


def sample_mirror(banks, idx, table, wo, lam, u2, uc, tex=None) -> BSDFSample:
    kr = _albedo_spec(banks, banks.mirror_kr_c4, banks.mirror_kr,
                      banks.mirror_kr_tex, idx, tex, table, lam)
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


# --- Glass: dielectric, smooth + rough microfacet ------------------------------
# (spectral-eval.jl Glass; pbrt DielectricBxDF with TR distribution)


def _glass_alpha(banks, idx, regularize, tex):
    ax = _tex_alpha(_bl(banks.glass_ax, idx), banks.glass_rough_tex, idx, tex)
    ay = _tex_alpha(_bl(banks.glass_ay, idx), banks.glass_rough_tex, idx, tex)
    if regularize is not None:
        ax = jnp.where(regularize, regularize_alpha(ax), ax)
        ay = jnp.where(regularize, regularize_alpha(ay), ay)
    return ax, ay


def glass_eta_hero(banks, idx, lam):
    """Dispersive IOR at the hero wavelength (spectral IOR eval,
    spectral-eval.jl:207-221): measured three-term Sellmeier
    n^2 = 1 + sum B_i L / (L - C_i) when the bank row carries
    coefficients (B1 > 0), else the Cauchy eta + B / lambda_um^2 fit."""
    L = jnp.maximum((lam[..., 0] * 1e-3) ** 2, 1e-6)  # um^2
    cauchy = (_bl(banks.glass_eta, idx)
              + _bl(banks.glass_cauchy, idx) / L)
    sell = _bl(banks.glass_sell, idx)                  # (..., 6)
    b, c = sell[..., 0:3], sell[..., 3:6]
    Le = L[..., None]
    n2 = 1.0 + jnp.sum(b * Le / jnp.where(jnp.abs(Le - c) < 1e-9,
                                          1e-9, Le - c), axis=-1)
    eta_sell = jnp.sqrt(jnp.maximum(n2, 1.0))
    return jnp.where(sell[..., 0] > 0.0, eta_sell, cauchy)


def sample_glass(banks, idx, table, wo, lam, u2, uc, tex=None, regularize=None) -> BSDFSample:
    kr = _albedo_spec(banks, banks.glass_kr_c4, banks.glass_kr,
                      banks.glass_kr_tex, idx, tex, table, lam)
    kt = _albedo_spec(banks, banks.glass_kt_c4, banks.glass_kt,
                      banks.glass_kt_tex, idx, tex, table, lam)
    eta = glass_eta_hero(banks, idx, lam)
    ax, ay = _glass_alpha(banks, idx, regularize, tex)
    smooth = effectively_smooth(ax, ay)

    cos_o = wo[..., 2]
    eta_p = jnp.where(cos_o > 0.0, eta, 1.0 / eta)

    # ---- smooth branch (delta lobes)
    fr_s = fresnel_dielectric(cos_o, eta)
    wi_rs = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    n = jnp.zeros_like(wo).at[..., 2].set(1.0)
    n = jnp.where(cos_o[..., None] < 0.0, -n, n)
    ok_ts, wi_ts = refract(wo, n, eta_p)

    # ---- rough branch: sample a visible microfacet normal
    wm = tr_sample_wm(wo, u2, ax, ay)
    dot_om = jnp.sum(wo * wm, -1)
    fr_m = fresnel_dielectric(dot_om, eta)
    # reflect off wm
    wi_rm = reflect(wo, wm)
    ok_rm = same_hemisphere(wo, wi_rm)
    # refract about wm oriented toward wo
    wm_o = jnp.where(dot_om[..., None] < 0.0, -wm, wm)
    ok_tm, wi_tm = refract(wo, wm_o, eta_p)
    ok_tm = ok_tm & ~same_hemisphere(wo, wi_tm)

    fr = jnp.where(smooth, fr_s, fr_m)
    choose_r = uc < fr

    wi = jnp.where(
        smooth[..., None],
        jnp.where(choose_r[..., None], wi_rs, wi_ts),
        jnp.where(choose_r[..., None], wi_rm, wi_tm),
    )
    cos_i = jnp.maximum(abs_cos_theta(wi), 1e-6)
    cos_oa = jnp.maximum(jnp.abs(cos_o), 1e-6)

    # smooth f/pdf
    f_rs = kr * (fr_s / cos_i)[..., None]
    f_ts = kt * ((1.0 - fr_s) / cos_i / (eta_p * eta_p))[..., None]
    pdf_s = jnp.where(choose_r, fr_s, 1.0 - fr_s)

    # rough f/pdf (pbrt 9.34-9.40): reflect part
    d = tr_d(wm, ax, ay)
    g = tr_g(wo, wi, ax, ay)
    abs_dot_om = jnp.maximum(jnp.abs(dot_om), 1e-8)
    f_rm = kr * (d * g * fr_m / (4.0 * cos_oa * cos_i))[..., None]
    pdf_rm = tr_pdf(wo, wm, ax, ay) / (4.0 * abs_dot_om) * fr_m
    # transmit part: generalized Jacobian
    dot_im = jnp.sum(wi * wm, -1)
    denom_t = (dot_im + dot_om / eta_p) ** 2
    dwm_dwi = jnp.abs(dot_im) / jnp.maximum(denom_t, 1e-12)
    ft_scale = (
        d * g * (1.0 - fr_m)
        * jnp.abs(dot_im * dot_om / jnp.maximum(cos_i * cos_oa * denom_t, 1e-12))
        / (eta_p * eta_p)
    )
    f_tm = kt * ft_scale[..., None]
    pdf_tm = tr_pdf(wo, wm, ax, ay) * dwm_dwi * (1.0 - fr_m)

    f = jnp.where(
        smooth[..., None],
        jnp.where(choose_r[..., None], f_rs, f_ts),
        jnp.where(choose_r[..., None], f_rm, f_tm),
    )
    pdf = jnp.where(smooth, pdf_s, jnp.where(choose_r, pdf_rm, pdf_tm))
    ok_branch = jnp.where(
        smooth,
        choose_r | ok_ts,
        jnp.where(choose_r, ok_rm, ok_tm),
    )
    valid = (jnp.abs(cos_o) > 1e-6) & ok_branch & (pdf > 1e-12)
    return BSDFSample(
        wi=wi, f=f, pdf=pdf,
        specular=smooth,
        transmission=~choose_r,
        eta_scale=jnp.where(choose_r, 1.0, eta_p * eta_p),
        valid=valid,
    )


def eval_glass(banks, idx, table, wo, wi, lam, regularize=None, tex=None):
    """(f, pdf) of the rough-dielectric lobe for NEE MIS; zero when the
    surface is effectively smooth (delta lobes carry no NEE weight)."""
    kr = _albedo_spec(banks, banks.glass_kr_c4, banks.glass_kr,
                      banks.glass_kr_tex, idx, tex, table, lam)
    kt = _albedo_spec(banks, banks.glass_kt_c4, banks.glass_kt,
                      banks.glass_kt_tex, idx, tex, table, lam)
    eta = glass_eta_hero(banks, idx, lam)
    ax, ay = _glass_alpha(banks, idx, regularize, tex)
    smooth = effectively_smooth(ax, ay)

    cos_o = wo[..., 2]
    cos_i = wi[..., 2]
    is_reflect = cos_o * cos_i > 0.0
    eta_p = jnp.where(is_reflect, 1.0, jnp.where(cos_o > 0.0, eta, 1.0 / eta))

    # generalized half-vector (pbrt 9.35)
    wm_raw = wi * eta_p[..., None] + wo
    wm_len = jnp.linalg.norm(wm_raw, axis=-1, keepdims=True)
    wm = wm_raw / jnp.maximum(wm_len, 1e-12)
    wm = jnp.where(wm[..., 2:3] < 0.0, -wm, wm)
    dot_om = jnp.sum(wo * wm, -1)
    dot_im = jnp.sum(wi * wm, -1)
    # microfacet back-face test
    backface = (dot_im * cos_i < 0.0) | (dot_om * cos_o < 0.0)

    fr = fresnel_dielectric(dot_om, eta)
    d = tr_d(wm, ax, ay)
    g = tr_g(wo, wi, ax, ay)
    cos_oa = jnp.maximum(jnp.abs(cos_o), 1e-6)
    cos_ia = jnp.maximum(jnp.abs(cos_i), 1e-6)
    abs_dot_om = jnp.maximum(jnp.abs(dot_om), 1e-8)

    f_r = kr * (d * g * fr / (4.0 * cos_oa * cos_ia))[..., None]
    pdf_r = tr_pdf(wo, wm, ax, ay) / (4.0 * abs_dot_om) * fr

    denom_t = (dot_im + dot_om / eta_p) ** 2
    dwm_dwi = jnp.abs(dot_im) / jnp.maximum(denom_t, 1e-12)
    ft_scale = (
        d * g * (1.0 - fr)
        * jnp.abs(dot_im * dot_om / jnp.maximum(cos_ia * cos_oa * denom_t, 1e-12))
        / (eta_p * eta_p)
    )
    f_t = kt * ft_scale[..., None]
    pdf_t = tr_pdf(wo, wm, ax, ay) * dwm_dwi * (1.0 - fr)

    f = jnp.where(is_reflect[..., None], f_r, f_t)
    pdf = jnp.where(is_reflect, pdf_r, pdf_t)
    ok = (
        ~smooth & ~backface & (wm_len[..., 0] > 1e-9)
        & (jnp.abs(cos_o) > 1e-6) & (jnp.abs(cos_i) > 1e-6)
    )
    return jnp.where(ok[..., None], f, 0.0), jnp.where(ok, pdf, 0.0)


# --- bare dielectric interface (shared by glass and the layered walk) ----------


def dielectric_interface_sample(wo, eta, ax, ay, u2, uc):
    """Sample the colorless dielectric interface (smooth or rough).

    Returns dict(wi, weight (scalar f*cos/pdf), pdf, is_trans, specular,
    valid). Used standalone by the LayeredBxDF random walk
    (spectral-eval.jl:827+)."""
    smooth = effectively_smooth(ax, ay)
    cos_o = wo[..., 2]
    eta_p = jnp.where(cos_o > 0.0, eta, 1.0 / eta)

    # smooth
    fr_s = fresnel_dielectric(cos_o, eta)
    wi_rs = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    n = jnp.zeros_like(wo).at[..., 2].set(1.0)
    n = jnp.where(cos_o[..., None] < 0.0, -n, n)
    ok_ts, wi_ts = refract(wo, n, eta_p)

    # rough
    wm = tr_sample_wm(wo, u2, ax, ay)
    dot_om = jnp.sum(wo * wm, -1)
    fr_m = fresnel_dielectric(dot_om, eta)
    wi_rm = reflect(wo, wm)
    ok_rm = same_hemisphere(wo, wi_rm)
    wm_o = jnp.where(dot_om[..., None] < 0.0, -wm, wm)
    ok_tm, wi_tm = refract(wo, wm_o, eta_p)
    ok_tm = ok_tm & ~same_hemisphere(wo, wi_tm)

    fr = jnp.where(smooth, fr_s, fr_m)
    choose_r = uc < fr
    wi = jnp.where(
        smooth[..., None],
        jnp.where(choose_r[..., None], wi_rs, wi_ts),
        jnp.where(choose_r[..., None], wi_rm, wi_tm),
    )
    cos_i = jnp.maximum(abs_cos_theta(wi), 1e-6)
    cos_oa = jnp.maximum(jnp.abs(cos_o), 1e-6)

    # weight = f*cos/pdf. Smooth: 1 (radiance compression handled by caller
    # only when crossing into a different eta; inside the layered walk the
    # ray re-exits so eta_scale cancels). Rough: G2/G1 style weight.
    d = tr_d(wm, ax, ay)
    g = tr_g(wo, wi, ax, ay)
    abs_dot_om = jnp.maximum(jnp.abs(dot_om), 1e-8)
    pdf_rm = tr_pdf(wo, wm, ax, ay) / (4.0 * abs_dot_om) * fr_m
    w_rm = jnp.where(
        pdf_rm > 1e-12,
        (d * g * fr_m / (4.0 * cos_oa * cos_i)) * cos_i / jnp.maximum(pdf_rm, 1e-12),
        0.0,
    )
    dot_im = jnp.sum(wi * wm, -1)
    denom_t = (dot_im + dot_om / eta_p) ** 2
    dwm_dwi = jnp.abs(dot_im) / jnp.maximum(denom_t, 1e-12)
    pdf_tm = tr_pdf(wo, wm, ax, ay) * dwm_dwi * (1.0 - fr_m)
    ft = (
        d * g * (1.0 - fr_m)
        * jnp.abs(dot_im * dot_om / jnp.maximum(cos_i * cos_oa * denom_t, 1e-12))
        / (eta_p * eta_p)
    )
    w_tm = jnp.where(pdf_tm > 1e-12, ft * cos_i / jnp.maximum(pdf_tm, 1e-12), 0.0)

    weight = jnp.where(
        smooth, 1.0, jnp.where(choose_r, w_rm, w_tm)
    )
    # the walk re-crosses the interface, so undo radiance compression for
    # rough transmission the same way (keeps reciprocity inside the slab)
    weight = jnp.where(~smooth & ~choose_r, weight * eta_p * eta_p, weight)
    pdf = jnp.where(
        smooth, jnp.where(choose_r, fr_s, 1.0 - fr_s),
        jnp.where(choose_r, pdf_rm, pdf_tm),
    )
    ok = jnp.where(
        smooth, choose_r | ok_ts, jnp.where(choose_r, ok_rm, ok_tm)
    )
    return dict(
        wi=wi, weight=weight, pdf=pdf, is_trans=~choose_r,
        specular=smooth, valid=ok & (jnp.abs(cos_o) > 1e-6),
    )


def dielectric_interface_f(wo, wi, eta, ax, ay):
    """(f, pdf) of the rough interface; zero when effectively smooth."""
    smooth = effectively_smooth(ax, ay)
    cos_o = wo[..., 2]
    cos_i = wi[..., 2]
    is_reflect = cos_o * cos_i > 0.0
    eta_p = jnp.where(is_reflect, 1.0, jnp.where(cos_o > 0.0, eta, 1.0 / eta))
    wm_raw = wi * eta_p[..., None] + wo
    wm_len = jnp.linalg.norm(wm_raw, axis=-1, keepdims=True)
    wm = wm_raw / jnp.maximum(wm_len, 1e-12)
    wm = jnp.where(wm[..., 2:3] < 0.0, -wm, wm)
    dot_om = jnp.sum(wo * wm, -1)
    dot_im = jnp.sum(wi * wm, -1)
    backface = (dot_im * cos_i < 0.0) | (dot_om * cos_o < 0.0)
    fr = fresnel_dielectric(dot_om, eta)
    d = tr_d(wm, ax, ay)
    g = tr_g(wo, wi, ax, ay)
    cos_oa = jnp.maximum(jnp.abs(cos_o), 1e-6)
    cos_ia = jnp.maximum(jnp.abs(cos_i), 1e-6)
    f_r = d * g * fr / (4.0 * cos_oa * cos_ia)
    pdf_r = tr_pdf(wo, wm, ax, ay) / (4.0 * jnp.maximum(jnp.abs(dot_om), 1e-8)) * fr
    denom_t = (dot_im + dot_om / eta_p) ** 2
    f_t = (
        d * g * (1.0 - fr)
        * jnp.abs(dot_im * dot_om / jnp.maximum(cos_ia * cos_oa * denom_t, 1e-12))
    )
    pdf_t = (
        tr_pdf(wo, wm, ax, ay)
        * jnp.abs(dot_im) / jnp.maximum(denom_t, 1e-12) * (1.0 - fr)
    )
    f = jnp.where(is_reflect, f_r, f_t)
    pdf = jnp.where(is_reflect, pdf_r, pdf_t)
    ok = ~smooth & ~backface & (wm_len[..., 0] > 1e-9)
    return jnp.where(ok, f, 0.0), jnp.where(ok, pdf, 0.0)


# --- ThinDielectric (thin-dielectric.jl:45; pbrt ThinDielectricBxDF) -----------


def sample_thin_dielectric(banks, idx, table, wo, lam, u2, uc, tex=None) -> BSDFSample:
    from ..spectral.rgb2spec import coeff4_eval

    kr = coeff4_eval(_bl(banks.thin_kr_c4, idx), lam)
    kt = coeff4_eval(_bl(banks.thin_kt_c4, idx), lam)
    eta = _bl(banks.thin_eta, idx)
    cos_o = wo[..., 2]

    r0 = fresnel_dielectric(jnp.abs(cos_o), eta)
    # account for interreflection inside the slab: R' = 2R/(1+R)
    r = jnp.where(r0 < 1.0, 2.0 * r0 / (1.0 + r0), 1.0)
    t = 1.0 - r

    choose_r = uc < r
    wi_r = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    wi_t = -wo  # straight through, no bending
    wi = jnp.where(choose_r[..., None], wi_r, wi_t)
    cos_i = jnp.maximum(abs_cos_theta(wi), 1e-6)

    f = jnp.where(
        choose_r[..., None], kr * (r / cos_i)[..., None], kt * (t / cos_i)[..., None]
    )
    pdf = jnp.where(choose_r, r, t)
    shape = pdf.shape
    return BSDFSample(
        wi=wi, f=f, pdf=pdf,
        specular=jnp.ones(shape, bool),
        # both slab interfaces are crossed: the ray ends in the SAME medium,
        # so this is not a medium transition
        transmission=jnp.zeros(shape, bool),
        eta_scale=jnp.ones(shape, jnp.float32),
        valid=(jnp.abs(cos_o) > 1e-6) & (pdf > 1e-9),
    )


# --- DiffuseTransmission (diffuse-transmission.jl:39) ---------------------------


def _dt_albedos(banks, idx, table, lam, tex):
    r = _albedo_spec(banks, banks.dt_refl_c4, banks.dt_refl,
                     banks.dt_refl_tex, idx, tex, table, lam)
    t = _albedo_spec(banks, banks.dt_trans_c4, banks.dt_trans,
                     banks.dt_trans_tex, idx, tex, table, lam)
    pr = jnp.maximum(jnp.max(r, -1), 1e-9)
    pt = jnp.maximum(jnp.max(t, -1), 0.0)
    return r, t, pr / (pr + pt)


def sample_diffuse_transmission(banks, idx, table, wo, lam, u2, uc, tex=None) -> BSDFSample:
    r, t, p_refl = _dt_albedos(banks, idx, table, lam, tex)
    choose_r = uc < p_refl
    wi = cosine_sample_hemisphere(u2)
    # reflect stays on wo's side; transmit flips
    side = jnp.where(choose_r, jnp.sign(wo[..., 2]), -jnp.sign(wo[..., 2]))
    wi = wi * jnp.stack([jnp.ones_like(side), jnp.ones_like(side), side], -1)
    cos_i = abs_cos_theta(wi)
    f = jnp.where(choose_r[..., None], r, t) * INV_PI
    pdf = cos_i * INV_PI * jnp.where(choose_r, p_refl, 1.0 - p_refl)
    shape = pdf.shape
    return BSDFSample(
        wi=wi, f=f, pdf=pdf,
        specular=jnp.zeros(shape, bool),
        transmission=~choose_r,
        eta_scale=jnp.ones(shape, jnp.float32),
        valid=(pdf > 1e-9) & (jnp.abs(wo[..., 2]) > 1e-6),
    )


def eval_diffuse_transmission(banks, idx, table, wo, wi, lam, tex=None):
    r, t, p_refl = _dt_albedos(banks, idx, table, lam, tex)
    same = same_hemisphere(wo, wi)
    f = jnp.where(same[..., None], r, t) * INV_PI
    pdf = abs_cos_theta(wi) * INV_PI * jnp.where(same, p_refl, 1.0 - p_refl)
    return f, pdf


# --- Conductor (spectral-eval.jl Conductor, pbrt ConductorBxDF) ---------------


def _conductor_alpha(banks, idx, regularize, tex=None):
    ax = _tex_alpha(_bl(banks.cond_ax, idx), banks.cond_rough_tex, idx, tex)
    ay = _tex_alpha(_bl(banks.cond_ay, idx), banks.cond_rough_tex, idx, tex)
    if regularize is not None:
        ax = jnp.where(regularize, regularize_alpha(ax), ax)
        ay = jnp.where(regularize, regularize_alpha(ay), ay)
    return ax, ay


def _cond_eta_k(banks, idx, lam):
    """Spectral eta/k via the piecewise-cubic bank fits (<0.2%% of the dense
    tables; the per-lane table gather costs ~20 ms per 640k-lane call on the
    TPU scalar core)."""
    from ..spectral.piecewise_poly import piecewise_eval_banked

    eta = piecewise_eval_banked(banks.cond_eta_pw, idx[..., None], lam)
    k = piecewise_eval_banked(banks.cond_k_pw, idx[..., None], lam)
    return eta, k


def sample_conductor(
    banks, idx, table, wo, lam, u2, uc, regularize=None, tex=None
) -> BSDFSample:
    eta, k = _cond_eta_k(banks, idx, lam)
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
    eta, k = _cond_eta_k(banks, idx, lam)
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

    from ..spectral.rgb2spec import coeff4_illuminant_eval
    from ..textures.atlas import CONST_TEX

    le = coeff4_illuminant_eval(_bl(banks.emissive_le_c4, idx), lam)
    if tex is not None and banks.has_textures:
        atlas, ctx = tex
        t_id = _bl(banks.emissive_le_tex, idx)
        rgb_t = eval_rgb(atlas, t_id, _bl(banks.emissive_le, idx), ctx)
        le_t = rgb_illuminant_eval(table, jnp.maximum(rgb_t, 0.0), lam)
        le = jnp.where((t_id == CONST_TEX)[..., None], le, le_t)
    le = le * (_bl(banks.emissive_scale, idx) / D65_PHOTOMETRIC)[..., None]
    front = (cos_wo > 0.0) | _bl(banks.emissive_two_sided, idx)
    return jnp.where(front[..., None], le, 0.0)
