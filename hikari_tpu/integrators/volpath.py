"""VolPath: spectral wavefront path tracer (flagship integrator).

TPU re-architecture of the reference's VolPath
(/root/reference/src/integrators/volpath/volpath.jl): the reference drives 8
atomic GPU work queues through per-bounce kernels; here the whole wavefront
is a dense SoA array of one path per pixel with masked lanes, advanced one
bounce at a time inside a single jit — queue pushes become `where`-selects,
atomic film adds become elementwise accumulation, and `with_index` material
dispatch becomes dense per-type evaluation over lanes (only for the types
present in the scene, a static property).

Feature parity this stage: hero-wavelength spectral transport, ZSobol
per-bounce sampling (camera dims {1,3,4,6}, path dims 6+8*depth), filter
importance sampling, NEE with MIS against area/env/delta lights, specular
paths, Russian roulette with eta_scale compensation, firefly clamping,
progressive accumulation. Volumetric transport (delta tracking) is layered
on in media.py / this file's medium hooks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..camera.camera import CameraSample, PerspectiveCamera
from ..core.ray import spawn_ray
from ..core.vecmath import dot, face_forward, make_frame, normalize, to_local, to_world
from ..film.film import Film, film_add_sample
from ..film.filters import FilterSampler, filter_sample, make_filter
from ..geometry.traverse import any_hit, closest_hit
from ..geometry.triangle import interpolate, triangle_normal
from ..lights import types as lt
from ..materials import bsdf as mb
from ..materials import types as mt
from ..sampling import sobol as sb
from ..sampling.distributions import power_heuristic
from ..scene.scene import SceneData
from ..spectral import spectrum as sp
from ..spectral.cie import spectral_to_xyz, xyz_to_linear_srgb


@dataclass(frozen=True)
class VolPath:
    """Config mirrors the reference's keyword set (volpath.jl:75-101)."""

    max_depth: int = 5
    samples_per_pixel: int = 16
    russian_roulette_depth: int = 3
    regularize: bool = False
    max_component_value: float = 1e6  # firefly clamp
    seed: int = 0


# --- material dispatch helpers ------------------------------------------------


def _sample_bsdf_dispatch(scene: SceneData, mat_type, mat_idx, wo, lam, u2, uc, regularize):
    """Dense per-type BSDF sampling, selected by tag (multi-material-eval's
    :none mode; sorted batching is a later optimization)."""
    table = scene.rgb2spec
    banks = scene.materials
    out = mb._invalid(mat_type.shape)

    def merge(out, s, type_tag):
        m = mat_type == type_tag
        return mb.BSDFSample(
            wi=jnp.where(m[..., None], s.wi, out.wi),
            f=jnp.where(m[..., None], s.f, out.f),
            pdf=jnp.where(m, s.pdf, out.pdf),
            specular=jnp.where(m, s.specular, out.specular),
            transmission=jnp.where(m, s.transmission, out.transmission),
            eta_scale=jnp.where(m, s.eta_scale, out.eta_scale),
            valid=jnp.where(m, s.valid, out.valid),
        )

    present = scene.present_materials
    if mt.MATTE in present:
        out = merge(out, mb.sample_matte(banks, mat_idx, table, wo, lam, u2, uc), mt.MATTE)
    if mt.MIRROR in present:
        out = merge(out, mb.sample_mirror(banks, mat_idx, table, wo, lam, u2, uc), mt.MIRROR)
    if mt.GLASS in present:
        out = merge(out, mb.sample_glass(banks, mat_idx, table, wo, lam, u2, uc), mt.GLASS)
    if mt.CONDUCTOR in present:
        out = merge(
            out,
            mb.sample_conductor(banks, mat_idx, table, wo, lam, u2, uc, regularize),
            mt.CONDUCTOR,
        )
    return out


def _eval_bsdf_dispatch(scene: SceneData, mat_type, mat_idx, wo, wi, lam, regularize):
    """(f, pdf) for NEE MIS; zero for specular-only materials."""
    table = scene.rgb2spec
    banks = scene.materials
    f = jnp.zeros(lam.shape, jnp.float32)
    pdf = jnp.zeros(mat_type.shape, jnp.float32)
    present = scene.present_materials
    if mt.MATTE in present:
        fm, pm = mb.eval_matte(banks, mat_idx, table, wo, wi, lam)
        m = mat_type == mt.MATTE
        f = jnp.where(m[..., None], fm, f)
        pdf = jnp.where(m, pm, pdf)
    if mt.CONDUCTOR in present:
        fc, pc = mb.eval_conductor(banks, mat_idx, table, wo, wi, lam, regularize)
        m = mat_type == mt.CONDUCTOR
        f = jnp.where(m[..., None], fc, f)
        pdf = jnp.where(m, pc, pdf)
    return f, pdf


# --- the per-sample render step ------------------------------------------------


def render_sample(
    vp: VolPath,
    scene: SceneData,
    camera: PerspectiveCamera,
    film: Film,
    filt: FilterSampler,
    sample_idx: jnp.ndarray,
) -> Film:
    """Trace one sample for every pixel and accumulate into the film.

    Mirrors render!(vp, scene, film, camera) (volpath.jl:445-636) — one
    progressive sample per call, jit-compiled as a single TPU program.
    """
    w, h = camera.resolution
    n = w * h
    lanes = jnp.arange(n, dtype=jnp.uint32)
    px = lanes % w
    py = lanes // w
    si = jnp.broadcast_to(jnp.asarray(sample_idx, jnp.uint32), (n,))

    zcfg = sb.make_zsobol(w, h, max(vp.samples_per_pixel, 1), seed=vp.seed)

    # camera stage (vp_generate_camera_rays_kernel!, volpath.jl:125-205)
    ps = sb.compute_pixel_sample(zcfg, px, py, si)
    offset, filter_w = filter_sample(filt, ps.jitter)
    p_film = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + 0.5 + offset
    wl = sp.sample_wavelengths_visible(ps.wavelength_u)
    cam_sample_time = ps.time
    o, d = camera.generate_rays(
        CameraSample(
            p_film=p_film, lens=ps.lens, time=cam_sample_time,
            filter_weight=filter_w,
        )
    )

    # path state (VPRayWorkItem analog, workitems.jl:38-52)
    beta = jnp.ones((n, 4), jnp.float32)
    L = jnp.zeros((n, 4), jnp.float32)
    alive = jnp.ones((n,), bool)
    specular = jnp.ones((n,), bool)  # camera rays count as specular for MIS
    prev_pdf = jnp.ones((n,), jnp.float32)
    eta_scale = jnp.ones((n,), jnp.float32)
    any_nonspec = jnp.zeros((n,), bool)
    lam = wl.lam
    n_lights = scene.n_lights

    for depth in range(vp.max_depth):
        t_max = jnp.full((n,), jnp.inf, jnp.float32)
        rec = closest_hit(scene.bvh, o, d, t_max)
        hit = rec.hit & alive

        # --- escaped rays: environment + ambient (intersection.jl:622-677)
        escaped = alive & ~rec.hit
        if scene.lights.has_env:
            le_env, pdf_env = lt.env_radiance(scene.lights, scene.rgb2spec, d, lam)
            pmf = 1.0 / max(n_lights, 1)
            w_mis = jnp.where(
                specular, 1.0, power_heuristic(1.0, prev_pdf, 1.0, pdf_env * pmf)
            )
            L = L + jnp.where(escaped[..., None], beta * le_env * w_mis[..., None], 0.0)
        # ambient lights contribute unoccluded constant radiance
        amb = scene.lights.ambient_l
        if int(amb.shape[0]) > 0:
            amb_rgb = jnp.sum(amb, axis=0)
            le_amb = lt._illum(scene.rgb2spec, amb_rgb, lam)
            has_amb = jnp.any(amb_rgb > 0.0)
            L = L + jnp.where(
                (escaped & has_amb)[..., None], beta * le_amb, 0.0
            )
        alive = alive & rec.hit

        # --- surface interaction (vp_process_surface_hits_kernel!)
        tri = jnp.maximum(rec.tri, 0)
        p0 = scene.bvh.p0[tri]
        p1 = scene.bvh.p1[tri]
        p2 = scene.bvh.p2[tri]
        p_hit = o + rec.t[..., None] * d
        ng = triangle_normal(p0, p1, p2)
        ns = normalize(interpolate(rec.b1, rec.b2, scene.n0[tri], scene.n1[tri], scene.n2[tri]))
        ns = jnp.where(jnp.sum(ns * ns, -1, keepdims=True) > 0.5, ns, ng)
        ng = face_forward(ng, ns)
        wo = -d

        mat_type = scene.mat_type[tri]
        mat_idx = scene.mat_idx[tri]

        # --- area-light emission with MIS (surface-eval.jl:147-237)
        al_idx = scene.arealight_idx[tri]
        is_emitter = hit & (al_idx >= 0)
        if mt.EMISSIVE in scene.present_materials:
            cos_wo = dot(ng, wo)
            le = mb.emitted_radiance(
                scene.materials, jnp.maximum(mat_idx, 0), scene.rgb2spec, lam, cos_wo
            )
            pmf = 1.0 / max(n_lights, 1)
            pdf_light = lt.area_light_pdf(
                scene.lights, jnp.maximum(al_idx, 0), o, p_hit, ng
            ) * pmf
            w_mis = jnp.where(
                specular, 1.0, power_heuristic(1.0, prev_pdf, 1.0, pdf_light)
            )
            L = L + jnp.where(is_emitter[..., None], beta * le * w_mis[..., None], 0.0)

        # --- NEE: sample one light (surface_direct_lighting_inner!)
        if n_lights > 0:
            ul = sb.path_sample_1d(zcfg, px, py, si, depth, 0)
            ul2 = jnp.stack(
                sb.path_sample_2d(zcfg, px, py, si, depth, 1), -1
            )
            li_flat = jnp.minimum((ul * n_lights).astype(jnp.int32), n_lights - 1)
            ltype = scene.lights.light_type[li_flat]
            lidx = scene.lights.light_idx[li_flat]
            ls = lt.sample_li(
                scene.lights, scene.rgb2spec, ltype, lidx, p_hit, lam, ul2,
                scene.scene_radius,
            )
            t, b, nrm = make_frame(ns)
            wo_l = to_local(t, b, nrm, wo)
            wi_l = to_local(t, b, nrm, ls.wi)
            reg = any_nonspec if vp.regularize else None
            f, pdf_b = _eval_bsdf_dispatch(scene, mat_type, mat_idx, wo_l, wi_l, lam, reg)
            pmf = 1.0 / n_lights
            pdf_l = ls.pdf * pmf
            cos_i = jnp.abs(wi_l[..., 2])
            contrib_ok = (
                alive & ls.valid & (pdf_l > 0.0) & (cos_i > 0.0)
                & jnp.any(f > 0.0, axis=-1)
            )
            # shadow ray (vp_trace_shadow_rays!; transmittance chain arrives
            # with media support)
            o_sh = spawn_ray(p_hit, ng, ls.wi)
            occluded = any_hit(scene.bvh, o_sh, ls.wi, ls.t_max)
            contrib_ok = contrib_ok & ~occluded
            w_mis = jnp.where(
                ls.is_delta, 1.0, power_heuristic(1.0, pdf_l, 1.0, pdf_b)
            )
            ld = beta * f * ls.li * (cos_i * w_mis / jnp.maximum(pdf_l, 1e-12))[..., None]
            L = L + jnp.where(contrib_ok[..., None], ld, 0.0)

        # --- BSDF sampling & continuation (evaluate_material_inner!)
        ub = jnp.stack(sb.path_sample_2d(zcfg, px, py, si, depth, 3), -1)
        uc = sb.path_sample_1d(zcfg, px, py, si, depth, 5)
        t, b, nrm = make_frame(ns)
        wo_l = to_local(t, b, nrm, wo)
        reg = any_nonspec if vp.regularize else None
        bs = _sample_bsdf_dispatch(scene, mat_type, mat_idx, wo_l, lam, ub, uc, reg)
        wi_w = to_world(t, b, nrm, bs.wi)
        cos_i = jnp.abs(bs.wi[..., 2])
        thr = bs.f * (cos_i / jnp.maximum(bs.pdf, 1e-12))[..., None]
        alive = alive & bs.valid & (bs.pdf > 0.0) & jnp.any(thr > 0.0, axis=-1)
        beta = jnp.where(alive[..., None], beta * thr, beta)
        eta_scale = jnp.where(alive, eta_scale * bs.eta_scale, eta_scale)
        specular = bs.specular
        any_nonspec = any_nonspec | (alive & ~bs.specular)
        prev_pdf = bs.pdf
        o = spawn_ray(p_hit, ng, wi_w)
        d = wi_w

        # --- Russian roulette (russian_roulette_spectral)
        if depth >= vp.russian_roulette_depth:
            u_rr = sb.path_sample_1d(zcfg, px, py, si, depth, 6)
            rr_beta = sp.max_component(beta) * eta_scale
            q = jnp.clip(rr_beta, 0.0, 0.95)
            survive = u_rr < q
            beta = jnp.where(
                (alive & survive)[..., None], beta / jnp.maximum(q, 1e-6)[..., None], beta
            )
            alive = alive & survive

    # --- film accumulation (vp_accumulate_to_rgb_kernel!, volpath.jl:326-375)
    xyz = spectral_to_xyz(L, lam, wl.pdf)
    rgb = xyz_to_linear_srgb(xyz)
    # firefly clamp on max component
    mx = jnp.max(rgb, axis=-1)
    scale = jnp.where(
        mx > vp.max_component_value, vp.max_component_value / jnp.maximum(mx, 1e-12), 1.0
    )
    rgb = rgb * scale[..., None]
    rgb = jnp.nan_to_num(rgb, nan=0.0, posinf=0.0, neginf=0.0)

    rgb_img = rgb.reshape(h, w, 3)
    w_img = filter_w.reshape(h, w)
    return film_add_sample(film, rgb_img, w_img)


@partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
def render_sample_jit(vp, scene, camera, film, filt, sample_idx):
    return render_sample(vp, scene, camera, film, filt, sample_idx)


def render(
    vp: VolPath, scene: SceneData, camera: PerspectiveCamera, film: Film | None = None,
    filt: FilterSampler | None = None,
):
    """Full render: samples_per_pixel progressive passes (volpath.jl:655-670)."""
    from ..film.film import make_film

    if film is None:
        film = make_film(*camera.resolution)
    if filt is None:
        filt = make_filter()
    for s in range(vp.samples_per_pixel):
        film = render_sample_jit(vp, scene, camera, film, filt, jnp.uint32(s))
    return film
