"""Fast preview integrators: FastWavefront and Whitted.

Parity with /root/reference/src/integrators/fast-wavefront.jl (interactive
preview: primary hit + hard shadows + one reflection level, 9 KA kernels)
and src/integrators/sampler.jl (Whitted: direct lighting + specular
recursion, tile megakernel). Both are expressed here as short dense
wavefront pipelines sharing the VolPath building blocks — on TPU a
"megakernel per tile" and a "kernel per queue" both lower to the same
fused XLA program over the full frame.

These are RGB-approximate preview paths (albedo-weighted direct light,
mirror reflections); the spectral VolPath remains the reference-quality
integrator.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..camera.camera import CameraSample, PerspectiveCamera
from ..core.ray import spawn_ray
from ..core.vecmath import dot, normalize, reflect, refract
from ..film.film import Film, film_add_sample, make_film
from ..lights import types as lt
from ..materials import types as mt
from ..sampling import sobol as sb
from ..scene.scene import SceneData
from .volpath import _albedo_rgb_dispatch, _surface_data, scene_any_hit, scene_closest_hit


def _direct_light_rgb(scene: SceneData, p, ns, albedo, u2, active):
    """One-sample direct lighting with hard shadows (fast_shade_primary!).

    Fixed hero wavelengths; the spectral light sample is converted to
    display RGB through the same CIE pipeline as VolPath so magnitudes
    match the reference integrator."""
    from ..spectral.cie import spectral_to_xyz, xyz_to_linear_srgb

    n = p.shape[0]
    if scene.n_lights == 0:
        return jnp.zeros((n, 3))
    ul = u2[..., 0]
    li_flat, pmf = lt.sample_light_index(scene.lights, ul)
    ltype = scene.lights.light_type[li_flat]
    lidx = scene.lights.light_idx[li_flat]
    lam4 = jnp.tile(jnp.asarray([[470.0, 540.0, 600.0, 660.0]], jnp.float32), (n, 1))
    pdf4 = jnp.full((n, 4), 1.0 / 471.0)  # uniform over [360, 830]
    ls = lt.sample_li(
        scene.lights, scene.rgb2spec, ltype, lidx, p, lam4, u2,
        scene.scene_radius,
    )
    cos_i = jnp.maximum(dot(ns, ls.wi), 0.0)
    o_sh = spawn_ray(p, ns, ls.wi)
    occluded = scene_any_hit(scene, o_sh, ls.wi, ls.t_max, active=active & ls.valid)
    l_spec = ls.li * (cos_i / jnp.maximum(ls.pdf * pmf, 1e-9))[..., None]
    light_rgb = xyz_to_linear_srgb(spectral_to_xyz(l_spec, lam4, pdf4))
    contrib = albedo / jnp.pi * jnp.maximum(light_rgb, 0.0)
    ok = active & ls.valid & (cos_i > 0.0) & ~occluded
    return jnp.where(ok[..., None], contrib, 0.0)


@dataclass(frozen=True)
class FastWavefront:
    """Interactive preview: primary hit, hard-shadow direct light, one
    mirror-reflection level (fast-wavefront.jl:271-691)."""

    samples_per_pixel: int = 1
    seed: int = 0


@dataclass(frozen=True)
class Whitted:
    """Direct lighting + specular bounce recursion to max_depth
    (sampler.jl:4-118). No diffuse indirect."""

    max_depth: int = 5
    samples_per_pixel: int = 4
    seed: int = 0


def _is_specular_type(mat_type):
    return (mat_type == mt.MIRROR) | (mat_type == mt.GLASS) | (
        mat_type == mt.THIN_DIELECTRIC
    )


def _preview_lanes(scene, camera, sample_idx, spp, seed, n_bounces):
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
        # mirror bounces (reference Whitted shades through the full RGB
        # BSDF system incl. conductor Fresnel, material.jl:22-180)
        b = scene.materials
        idx = jnp.maximum(sd["mat_idx"], 0)
        is_cond = sd["mat_type"] == mt.CONDUCTOR
        cond_smooth = is_cond & (
            jnp.maximum(b.cond_ax[idx], b.cond_ay[idx]) < 0.01
        )
        spec = _is_specular_type(sd["mat_type"]) | cond_smooth
        diffuse_hit = hit & ~spec & ~is_emit
        u2 = jnp.stack(sb.path_sample_2d(zcfg, px, py,
                                         jnp.broadcast_to(sample_idx, (n,)),
                                         depth, 0), -1)
        direct = _direct_light_rgb(scene, sd["p"], sd["ns"], albedo, u2, diffuse_hit)
        rgb = rgb + tint * direct

        # specular continuation with real Fresnel physics
        # (material.jl specular_bounce: reflection vs refraction split)
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
        # one-sample Fresnel-weighted branch selection keeps the wavefront
        # dense (the reference's recursion follows both branches; picking
        # with probability F has the same expectation)
        choose_refl = (u_spec < F) | (~ok_t & ~is_thin)
        refl_only = (sd["mat_type"] == mt.MIRROR) | cond_smooth
        choose_refl = choose_refl | refl_only

        wi_r = reflect(wo, sd["ns"])
        wi_t = jnp.where(is_thin[..., None], d, wt)  # thin: passes straight
        wi = jnp.where(choose_refl[..., None], wi_r, wi_t)

        # per-branch tint: mirror/conductor albedo (conductor gets a
        # Schlick-Fresnel curve on its normal-incidence color), glass kr/kt
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
    n_bounces = 2 if isinstance(integ, FastWavefront) else integ.max_depth
    rgb = _preview_lanes(
        scene, camera, jnp.uint32(sample_idx), integ.samples_per_pixel,
        integ.seed, n_bounces,
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
