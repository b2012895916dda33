"""Fast preview integrators: FastWavefront and Whitted.

Parity with /root/reference/src/integrators/fast-wavefront.jl (interactive
preview: primary hit + hard shadows + one reflection level, 9 KA kernels)
and src/integrators/sampler.jl (Whitted: direct lighting + specular
recursion, tile megakernel). Both are expressed here as short dense
wavefront pipelines sharing the VolPath building blocks — on TPU a
"megakernel per tile" and a "kernel per queue" both lower to the same
fused XLA program over the full frame.

Whitted shades through the REAL spectral BSDF stack at four fixed hero
wavelengths (the reference Whitted shades through its RGB UberBxDF system,
material.jl:22-180 + sampler.jl:17-118 — same physics, different color
basis): NEE evaluates the material's f, specular recursion follows
sampled BSDF lobes, and the carried throughput is spectral, converted to
display RGB once per path. FastWavefront keeps the cheap albedo-weighted
path (the reference extracts FastMaterialProps{base_color, metallic,
roughness} rather than building BSDFs, fast-wavefront.jl:106-121).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..camera.camera import CameraSample, PerspectiveCamera
from ..core.ray import RayDifferentials, spawn_ray
from ..core.vecmath import dot, make_frame, reflect, refract, to_local, to_world
from ..film.film import Film, film_add_sample, make_film
from ..lights import types as lt
from ..materials import bsdf as mb
from ..materials import types as mt
from ..sampling import sobol as sb
from ..scene.scene import SceneData
from ..spectral.cie import spectral_to_xyz, xyz_to_linear_srgb
from .volpath import (
    _albedo_rgb_dispatch, _eval_bsdf_dispatch, _sample_bsdf_dispatch,
    _surface_data, scene_any_hit, scene_closest_hit,
)

# fixed hero wavelengths for preview shading
_PREVIEW_LAM = (470.0, 540.0, 600.0, 660.0)


def _preview_spec_to_rgb(L4):
    """Convert preview-wavelength spectral radiance (n, 4) to linear sRGB.

    A naive spectral_to_xyz at the four fixed lambdas with uniform pdf
    reads ~2x hot (the points sit on CMF-heavy wavelengths: white
    (25,25,25) round-tripped to ~(51,48,37) while VolPath's averaged hero
    sampling converges to 25). Instead, a 3x4 linear map is solved ONCE so
    each sRGB-primary ILLUMINANT uplift evaluated at the preview lambdas
    maps exactly to its converged XYZ (rank-3 exact fit; smooth spectra in
    between interpolate at preview-grade accuracy), then XYZ -> sRGB."""
    return jnp.einsum("...j,ij->...i", L4, _preview_rgb_m())


def _preview_rgb_m():
    global _PREVIEW_RGB_M
    if _PREVIEW_RGB_M is not None:
        return _PREVIEW_RGB_M
    import numpy as np

    # first call may happen inside a jit trace; the fit must run eagerly
    import jax as _jax
    with _jax.ensure_compile_time_eval():
        _PREVIEW_RGB_M = _fit_preview_rgb_m(np)
    return _PREVIEW_RGB_M


def _fit_preview_rgb_m(np):

    from ..lights.types import _illum
    from ..spectral.cie import _SRGB_FROM_XYZ, sample_cie_xyz
    from ..spectral.rgb2spec import srgb_table

    table = srgb_table()
    lam_g = jnp.linspace(360.0, 830.0, 471)[None, :]
    cmf_g = np.asarray(sample_cie_xyz(lam_g))[0]          # (471, 3)
    lam4 = jnp.asarray([list(_PREVIEW_LAM)], jnp.float32)
    # the rgb2spec illuminant uplift is NONLINEAR in rgb, so the map is
    # least-squares fit over a broad sample of illuminant colors (white
    # upweighted: neutral lights dominate real scenes)
    rng = np.random.RandomState(0)
    rgbs = np.concatenate([
        np.ones((8, 3), np.float32),                      # white x8 weight
        np.eye(3, dtype=np.float32),
        rng.rand(96, 3).astype(np.float32) * 0.95 + 0.05,
    ])
    spec_g = np.asarray(_illum(table, jnp.asarray(rgbs), lam_g))   # (N, 471)
    spec4 = np.asarray(_illum(table, jnp.asarray(rgbs), lam4))     # (N, 4)
    targets = spec_g @ cmf_g                               # (N, 3) true XYZ
    m_xyz, *_ = np.linalg.lstsq(spec4, targets, rcond=None)  # (4, 3)
    return jnp.asarray(np.asarray(_SRGB_FROM_XYZ) @ m_xyz.T, jnp.float32)


_PREVIEW_RGB_M = None


def _direct_light_rgb(scene: SceneData, p, ns, albedo, ul, u2, active):
    """One-sample direct lighting with hard shadows (fast_shade_primary!).

    Fixed hero wavelengths; the spectral light sample is converted to
    display RGB through the same CIE pipeline as VolPath so magnitudes
    match the reference integrator.

    ul is a dedicated 1d uniform for light selection — reusing u2[...,0]
    for both selection and the light position sample makes that coordinate
    non-uniform conditioned on the selected light (same fix as
    _direct_light_bsdf)."""
    n = p.shape[0]
    if scene.n_lights == 0:
        return jnp.zeros((n, 3))
    li_flat, pmf = lt.sample_light_index(scene.lights, ul)
    ltype = scene.lights.light_type[li_flat]
    lidx = scene.lights.light_idx[li_flat]
    lam4 = jnp.tile(jnp.asarray([list(_PREVIEW_LAM)], jnp.float32), (n, 1))
    ls = lt.sample_li(
        scene.lights, scene.rgb2spec, ltype, lidx, p, lam4, u2,
        scene.scene_radius,
    )
    cos_i = jnp.maximum(dot(ns, ls.wi), 0.0)
    o_sh = spawn_ray(p, ns, ls.wi)
    occluded = scene_any_hit(scene, o_sh, ls.wi, ls.t_max, active=active & ls.valid)
    l_spec = ls.li * (cos_i / jnp.maximum(ls.pdf * pmf, 1e-9))[..., None]
    light_rgb = _preview_spec_to_rgb(l_spec)
    contrib = albedo / jnp.pi * jnp.maximum(light_rgb, 0.0)
    ok = active & ls.valid & (cos_i > 0.0) & ~occluded
    return jnp.where(ok[..., None], contrib, 0.0)


def _direct_light_bsdf(scene: SceneData, sd, wo, ul, u2, u2e, uce, active):
    """Direct lighting through the real BSDF f at the preview wavelengths
    (reference shade_lights, material.jl:130-180). Returns spectral (n, 4).

    ul is a dedicated 1d uniform for light selection — reusing u2[...,0]
    for both selection and the light position sample makes that coordinate
    non-uniform conditioned on the selected light, biasing area-light
    position sampling (VolPath draws separate Sobol dims the same way)."""
    n = wo.shape[0]
    lam4 = jnp.tile(jnp.asarray([list(_PREVIEW_LAM)], jnp.float32), (n, 1))
    if scene.n_lights == 0:
        return jnp.zeros_like(lam4)
    li_flat, pmf = lt.sample_light_index(scene.lights, ul)
    ltype = scene.lights.light_type[li_flat]
    lidx = scene.lights.light_idx[li_flat]
    ls = lt.sample_li(
        scene.lights, scene.rgb2spec, ltype, lidx, sd["p"], lam4, u2,
        scene.scene_radius,
    )
    t, b, nrm = make_frame(sd["ns"])
    wo_l = to_local(t, b, nrm, wo)
    wi_l = to_local(t, b, nrm, ls.wi)
    f, _ = _eval_bsdf_dispatch(
        scene, sd["mat_type"], sd["mat_idx"], wo_l, wi_l, lam4, None,
        sd["tex"], u2e, uce,
    )
    cos_i = jnp.abs(wi_l[..., 2])
    o_sh = spawn_ray(sd["p"], sd["ng"], ls.wi)
    ok = active & ls.valid & jnp.any(f > 0.0, -1)
    occluded = scene_any_hit(scene, o_sh, ls.wi, ls.t_max, active=ok)
    contrib = f * ls.li * (cos_i / jnp.maximum(ls.pdf * pmf, 1e-9))[..., None]
    return jnp.where((ok & ~occluded)[..., None], contrib, 0.0)


@dataclass(frozen=True)
class FastWavefront:
    """Interactive preview: primary hit, hard-shadow direct light, one
    mirror-reflection level (fast-wavefront.jl:271-691)."""

    samples_per_pixel: int = 1
    seed: int = 0


@dataclass(frozen=True)
class Whitted:
    """Direct lighting + specular bounce recursion to max_depth
    (sampler.jl:4-118), shading through the spectral BSDF stack at fixed
    preview wavelengths. No diffuse indirect."""

    max_depth: int = 5
    samples_per_pixel: int = 4
    seed: int = 0


def _is_specular_type(mat_type):
    return (mat_type == mt.MIRROR) | (mat_type == mt.GLASS) | (
        mat_type == mt.THIN_DIELECTRIC
    )


def _whitted_lanes(scene, camera, sample_idx, spp, seed, n_bounces):
    """Whitted through the real BSDF stack: spectral throughput at fixed
    hero wavelengths, NEE via _eval_bsdf_dispatch, specular recursion via
    _sample_bsdf_dispatch lobes (sampler.jl li_iterative +
    material.jl specular_bounce)."""
    w, h = camera.resolution
    n = w * h
    lanes = jnp.arange(n, dtype=jnp.uint32)
    px = lanes % w
    py = lanes // w
    si = jnp.broadcast_to(sample_idx, (n,))
    zcfg = sb.make_zsobol(w, h, max(spp, 1), seed=seed)
    ps = sb.compute_pixel_sample(zcfg, px, py, si)
    p_film = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + \
        0.5 + (ps.jitter - 0.5)
    o, d = camera.generate_rays(
        CameraSample(p_film=p_film, lens=ps.lens, time=ps.time,
                     filter_weight=jnp.ones((n,)))
    )
    # TRUE ray differentials: +1-pixel shifted film samples (same lens/
    # time), contracted by 1/sqrt(spp) like the reference's
    # scale_differentials (generate_ray_differential, camera.jl:57-75 +
    # sampler.jl:30-37). The iterative reference Whitted drops
    # differentials after specular bounces (sampler.jl:463,478), so only
    # the primary hit consumes them.
    diff = None
    if scene.materials.has_textures:
        fw = jnp.ones((n,))
        sc = 1.0 / float(max(spp, 1)) ** 0.5
        rx_o, rx_d = camera.generate_rays(CameraSample(
            p_film=p_film + jnp.asarray([[1.0, 0.0]], jnp.float32),
            lens=ps.lens, time=ps.time, filter_weight=fw))
        ry_o, ry_d = camera.generate_rays(CameraSample(
            p_film=p_film + jnp.asarray([[0.0, 1.0]], jnp.float32),
            lens=ps.lens, time=ps.time, filter_weight=fw))
        diff = RayDifferentials(
            rx_o=o + (rx_o - o) * sc, rx_d=d + (rx_d - d) * sc,
            ry_o=o + (ry_o - o) * sc, ry_d=d + (ry_d - d) * sc)

    lam4 = jnp.tile(jnp.asarray([list(_PREVIEW_LAM)], jnp.float32), (n, 1))
    L4 = jnp.zeros((n, 4))
    beta4 = jnp.ones((n, 4))
    alive = jnp.ones((n,), bool)

    for depth in range(n_bounces):
        t_max = jnp.full((n,), jnp.inf)
        rec = scene_closest_hit(scene, o, d, t_max, active=alive)
        hit = alive & rec.hit
        sd = _surface_data(scene, rec, o, d, diff=diff if depth == 0 else None)
        wo = -d
        # two-sided shading like VolPath: face the shading normal to the viewer
        flip = dot(sd["ns"], d) > 0.0
        sd["ns"] = jnp.where(flip[..., None], -sd["ns"], sd["ns"])
        sd["ng"] = jnp.where(flip[..., None], -sd["ng"], sd["ng"])

        # emissive surfaces: real emitted radiance (area-light Le)
        is_emit = hit & (sd["mat_type"] == mt.EMISSIVE)
        cos_wo = dot(sd["ng"], wo)
        le = mb.emitted_radiance(
            scene.materials, jnp.maximum(sd["mat_idx"], 0), scene.rgb2spec,
            lam4, cos_wo, sd["tex"],
        )
        L4 = L4 + jnp.where(is_emit[..., None], beta4 * le, 0.0)

        # NEE through the real BSDF f (zero for pure-specular lobes)
        shade = hit & ~is_emit & (sd["mat_type"] != mt.INTERFACE)
        u2 = jnp.stack(sb.path_sample_2d(zcfg, px, py, si, depth, 0), -1)
        u2e = jnp.stack(sb.path_sample_2d(zcfg, px, py, si, depth, 7), -1)
        uce = sb.path_sample_1d(zcfg, px, py, si, depth, 9)
        ul = sb.path_sample_1d(zcfg, px, py, si, depth, 10)
        L4 = L4 + beta4 * _direct_light_bsdf(
            scene, sd, wo, ul, u2, u2e, uce, shade)

        # specular recursion: sample the BSDF, continue only on delta lobes
        # (Whitted semantics — glossy/diffuse paths stop at direct light)
        t, b, nrm = make_frame(sd["ns"])
        wo_l = to_local(t, b, nrm, wo)
        ub = jnp.stack(sb.path_sample_2d(zcfg, px, py, si, depth, 3), -1)
        uc = sb.path_sample_1d(zcfg, px, py, si, depth, 5)
        bs = _sample_bsdf_dispatch(
            scene, sd["mat_type"], sd["mat_idx"], wo_l, lam4, ub, uc, None,
            sd["tex"],
        )
        wi = to_world(t, b, nrm, bs.wi)
        thr = bs.f * (jnp.abs(bs.wi[..., 2]) /
                      jnp.maximum(bs.pdf, 1e-9))[..., None]
        cont = shade & bs.valid & bs.specular & jnp.any(thr > 0.0, -1)
        o = jnp.where(cont[..., None], spawn_ray(sd["p"], sd["ng"], wi), o)
        d = jnp.where(cont[..., None], wi, d)
        beta4 = jnp.where(cont[..., None], beta4 * thr, beta4)
        alive = cont

    # clamp like _direct_light_rgb: the least-squares spectral->RGB map
    # can emit small negative components
    return jnp.maximum(_preview_spec_to_rgb(L4), 0.0)


def _preview_lanes(scene, camera, sample_idx, spp, seed, n_bounces):
    """FastWavefront: albedo-weighted direct light + Fresnel-split mirror
    bounces (the reference's FastMaterialProps approximation)."""
    w, h = camera.resolution
    n = w * h
    lanes = jnp.arange(n, dtype=jnp.uint32)
    px = lanes % w
    py = lanes // w
    zcfg = sb.make_zsobol(w, h, max(spp, 1), seed=seed)
    ps = sb.compute_pixel_sample(zcfg, px, py, jnp.broadcast_to(sample_idx, (n,)))
    p_film = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + \
        0.5 + (ps.jitter - 0.5)
    o, d = camera.generate_rays(
        CameraSample(p_film=p_film, lens=ps.lens, time=ps.time,
                     filter_weight=jnp.ones((n,)))
    )

    rgb = jnp.zeros((n, 3))
    tint = jnp.ones((n, 3))
    alive = jnp.ones((n,), bool)

    for depth in range(n_bounces):
        t_max = jnp.full((n,), jnp.inf)
        rec = scene_closest_hit(scene, o, d, t_max, active=alive)
        hit = alive & rec.hit
        sd = _surface_data(scene, rec, o, d)
        albedo = _albedo_rgb_dispatch(scene, sd["mat_type"], sd["mat_idx"], sd["tex"])
        # two-sided shading like VolPath: face the shading normal to the viewer
        flip = dot(sd["ns"], d) > 0.0
        sd["ns"] = jnp.where(flip[..., None], -sd["ns"], sd["ns"])
        sd["ng"] = jnp.where(flip[..., None], -sd["ng"], sd["ng"])

        # emissive surfaces: add directly
        is_emit = hit & (sd["mat_type"] == mt.EMISSIVE)
        rgb = rgb + jnp.where(is_emit[..., None], tint * albedo * 5.0, 0.0)

        # smooth conductors join the specular set with Fresnel-tinted
        # mirror bounces
        b = scene.materials
        idx = jnp.maximum(sd["mat_idx"], 0)
        is_cond = sd["mat_type"] == mt.CONDUCTOR
        cond_smooth = is_cond & (
            jnp.maximum(b.cond_ax[idx], b.cond_ay[idx]) < 0.01
        )
        spec = _is_specular_type(sd["mat_type"]) | cond_smooth
        diffuse_hit = hit & ~spec & ~is_emit
        si_b = jnp.broadcast_to(sample_idx, (n,))
        u2 = jnp.stack(sb.path_sample_2d(zcfg, px, py, si_b, depth, 0), -1)
        ul = sb.path_sample_1d(zcfg, px, py, si_b, depth, 10)
        direct = _direct_light_rgb(scene, sd["p"], sd["ns"], albedo, ul, u2,
                                   diffuse_hit)
        rgb = rgb + tint * direct

        # specular continuation with one-sample Fresnel branch selection
        from ..materials.fresnel import fresnel_dielectric

        wo = -d
        ci = jnp.maximum(dot(sd["ns"], wo), 1e-6)
        entering = dot(d, sd["ng_raw"]) < 0.0
        is_glass = sd["mat_type"] == mt.GLASS
        is_thin = sd["mat_type"] == mt.THIN_DIELECTRIC
        eta_mat = jnp.where(is_thin, b.thin_eta[idx], b.glass_eta[idx])
        eta_rel = jnp.where(entering | is_thin, eta_mat, 1.0 / eta_mat)
        F = fresnel_dielectric(ci, eta_rel)
        # thin surface: interreflection-summed reflectance (R' = 2F/(1+F))
        F = jnp.where(is_thin, 2.0 * F / (1.0 + F), F)
        ok_t, wt = refract(wo, sd["ns"], eta_rel)
        u_spec = sb.path_sample_1d(
            zcfg, px, py, jnp.broadcast_to(sample_idx, (n,)), depth, 2)
        choose_refl = (u_spec < F) | (~ok_t & ~is_thin)
        refl_only = (sd["mat_type"] == mt.MIRROR) | cond_smooth
        choose_refl = choose_refl | refl_only

        wi_r = reflect(wo, sd["ns"])
        wi_t = jnp.where(is_thin[..., None], d, wt)  # thin: passes straight
        wi = jnp.where(choose_refl[..., None], wi_r, wi_t)

        schlick = albedo + (1.0 - albedo) * ((1.0 - ci) ** 5)[..., None]
        tint_refl = jnp.where(
            cond_smooth[..., None], schlick,
            jnp.where(is_glass[..., None], b.glass_kr[idx],
                      jnp.where(is_thin[..., None], b.thin_kr[idx], albedo)),
        )
        tint_trans = jnp.where(is_thin[..., None], b.thin_kt[idx], b.glass_kt[idx])
        t_mul = jnp.where(choose_refl[..., None], tint_refl, tint_trans)

        cont = hit & spec
        o = jnp.where(cont[..., None], spawn_ray(sd["p"], sd["ng"], wi), o)
        d = jnp.where(cont[..., None], wi, d)
        tint = jnp.where(cont[..., None], tint * jnp.clip(t_mul, 0.0, 1.0), tint)
        alive = cont

    return rgb


@partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
def _preview_step(integ, scene, camera, film, sample_idx):
    if isinstance(integ, FastWavefront):
        rgb = _preview_lanes(
            scene, camera, jnp.uint32(sample_idx), integ.samples_per_pixel,
            integ.seed, 2,
        )
    else:
        rgb = _whitted_lanes(
            scene, camera, jnp.uint32(sample_idx), integ.samples_per_pixel,
            integ.seed, integ.max_depth,
        )
    w, h = camera.resolution
    img = rgb.reshape(h, w, 3)
    return film_add_sample(film, img, jnp.ones((h, w)))


def render_preview(integ, scene: SceneData, camera: PerspectiveCamera) -> Film:
    """Run a preview integrator; same call shape as volpath.render."""
    film = make_film(*camera.resolution)
    for s in range(integ.samples_per_pixel):
        film = _preview_step(integ, scene, camera, film, jnp.uint32(s))
    return film
