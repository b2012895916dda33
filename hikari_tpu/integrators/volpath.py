"""VolPath: spectral volumetric wavefront path tracer (flagship integrator).

TPU re-architecture of the reference's VolPath
(/root/reference/src/integrators/volpath/volpath.jl): the reference drives 8
atomic GPU work queues through per-bounce kernels; here the whole wavefront
is a dense SoA array of one path per pixel with masked lanes, advanced one
bounce at a time by a lax.fori_loop inside a single jit — queue pushes
become `where`-selects, atomic film adds become elementwise accumulation,
and `with_index` material dispatch becomes dense per-type evaluation over
lanes (only for the material types present in the scene, a static
property).

Transport parity with the reference:
- hero-wavelength spectra with pbrt-v4 rescaled path probabilities
  (beta, r_u, r_l — workitems.jl:38-52) so spectral MIS weights match;
- volumetric transport via delta tracking with null scattering
  (delta-tracking.jl) and HG phase scattering (medium-scatter.jl);
- NEE with shadow-ray transmittance through medium interfaces
  (ratio tracking, intersection.jl:302-563);
- ZSobol per-bounce sampling (camera dims {1,3,4,6}, path dims 6+8*depth),
  filter importance sampling, Russian roulette with eta_scale, firefly
  clamping, progressive accumulation.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import os as _os

import jax
import jax.numpy as jnp

from ..core.lookup import bank_lookup as _bl

from ..camera.camera import CameraSample, PerspectiveCamera
from ..core.ray import spawn_ray
from ..core.vecmath import dot, face_forward, make_frame, normalize, to_local, to_world
from ..film.film import Film, film_add_sample, film_add_weighted
from ..film.filters import FilterSampler, filter_sample, make_filter
from ..geometry.traverse import closest_hit
from ..geometry.triangle import interpolate, triangle_normal
from ..lights import types as lt
from ..materials import bsdf as mb
from ..materials import types as mt
from ..media import sample as ms
from ..sampling import sobol as sb
from ..scene.scene import SceneData
from ..spectral import spectrum as sp
from ..spectral.cie import spectral_to_xyz, xyz_to_linear_srgb

MAX_INTERFACE_CROSSINGS = 10  # shadow-ray boundary chain cap (intersection.jl:302)


def scene_closest_hit(scene: SceneData, o, d, t_max, active=None,
                      compact=None, presorted=False):
    """Dispatch to the scene's traversal engine (static choice).

    compact: pass False when the caller already runs on a live-compacted
    static prefix (the resident bounce loop), so the traversal skips its
    own redundant prefix cascade.

    presorted: the caller's lanes are already tile-coherent live-first
    (the resident loop sorts by the engines' own ray_sort_keys once per
    bounce) — skip the engines' internal sort/unsort too."""
    if scene.has_instances:
        from ..geometry.instanced import closest_hit_instanced

        return closest_hit_instanced(
            scene.inst, o, d, t_max, scene.world_lo, scene.world_hi,
            interpret=scene.traversal == "packets_interp", active=active,
            compact=compact, presorted=presorted,
        )
    if scene.traversal == "skiplink":
        if active is not None:
            t_max = jnp.where(active, t_max, 0.0)
        return closest_hit(scene.bvh, o, d, t_max)
    from ..geometry.wavefront import BAND_FRAC, closest_hit_packets

    band = (
        BAND_FRAC * jnp.linalg.norm(scene.world_hi - scene.world_lo)
        if BAND_FRAC > 0.0 else None
    )
    return closest_hit_packets(
        scene.treelets, o, d, t_max, scene.world_lo, scene.world_hi,
        interpret=scene.traversal == "packets_interp", active=active,
        band=band, compact=compact, presorted=presorted,
    )


def scene_any_hit(scene: SceneData, o, d, t_max, active=None, group=None,
                  compact=None):
    if scene.has_instances:
        from ..geometry.instanced import any_hit_instanced

        return any_hit_instanced(
            scene.inst, o, d, t_max, scene.world_lo, scene.world_hi,
            interpret=scene.traversal == "packets_interp", active=active,
            group=group, compact=compact,
        )
    if scene.traversal == "skiplink":
        from ..geometry.traverse import any_hit

        if active is not None:
            t_max = jnp.where(active, t_max, 0.0)
        return any_hit(scene.bvh, o, d, t_max)
    from ..geometry.wavefront import any_hit_packets

    return any_hit_packets(
        scene.treelets, o, d, t_max, scene.world_lo, scene.world_hi,
        interpret=scene.traversal == "packets_interp", active=active,
        group=group, compact=compact,
    )


@dataclass(frozen=True)
class VolPath:
    """Config mirrors the reference's keyword set (volpath.jl:75-101).

    material_coherence: 'none' evaluates every present material type
    densely over all lanes each bounce; 'gated' wraps each type in a
    lax.cond so types with NO occupant lanes this bounce skip entirely at
    runtime — the TPU translation of the reference's :per_type queue
    launches (multi-material-eval.jl:58-445), where an empty queue costs
    nothing. Gating wins for scenes with many material types that appear
    on few surfaces; 'none' compiles smaller programs. 'sorted' is the
    :sorted queue re-design (multi-material-eval.jl:450-574): lanes are
    stable-sorted by material tag and each type evaluates on a
    dynamic-slice window over its contiguous run, sized by a static
    cascade (n, n/4, n/16, n/64) — shading cost tracks per-type
    occupancy instead of paying full wavefront width per type.

    resident: 'on' | 'off' | 'auto' — keep the bounce-loop path state
    RESIDENT in sorted-compacted lane order: each bounce permutes the
    wavefront once (live lanes first, spatially sorted) and runs the
    ENTIRE bounce body — traversal, media, shading, NEE — on a
    lax.cond-selected static prefix sized to the live-lane count, so every
    per-bounce cost (not just the pair sweeps) tracks path termination.
    Lane order is restored once at the film write, not per sweep; the
    per-sweep full-wavefront sort/unsort (~16 ms each at 640k lanes)
    collapses into one permutation per bounce. 'auto' = on for the packet
    traversal engines, off for skiplink. Per-lane transport is
    permutation-invariant (samplers key on pixel ids, tracking RNG on ray
    geometry), so results match the non-resident path to fp tolerance.

    resident_levels: cascade depth for the resident prefix (n, n/2, ...);
    0 = auto (4 compiled, 1 in interpret mode where extra traced branches
    only slow tests). Each level traces the bounce body once more."""

    max_depth: int = 5
    samples_per_pixel: int = 16
    russian_roulette_depth: int = 3
    regularize: bool = False
    max_component_value: float = 1e6  # firefly clamp
    seed: int = 0
    material_coherence: str = "none"  # 'none' | 'gated' | 'sorted'
    # K consecutive samples dispatched as one K*w*h-lane wavefront: per-op
    # fixed cost amortizes, K x state memory. Default 4 since the round-4
    # phase-2 same-session ladder (PERF.md: 2.918 / 3.070 / 3.261 Mray/s
    # at K = 1 / 2 / 4, 800^2 v5e; K=4 became legal once the int32
    # pair-meta tile-field overflow was fixed -- round 3 misread that
    # crash as a TPU program-size limit). HIKARI_SAMPLE_BATCH overrides
    # the default: the CPU test suite pins 1 so every render test isn't
    # 4x the lanes to compile (test_jit_compat covers K>1 explicitly).
    sample_batch: int = int(_os.environ.get("HIKARI_SAMPLE_BATCH", "4"))
    resident: str = "auto"  # 'on' | 'off' | 'auto'
    resident_levels: int = 0  # 0 = auto
    # nee=False disables next-event estimation: light arrives only via
    # BSDF/phase sampling, with emitter/env hits unweighted (MIS denom =
    # r_u alone). Delta lights become invisible. Used by estimator-
    # agreement tests (NEE-on vs BSDF-only must converge to the same image).
    nee: bool = True


# --- material dispatch helpers ------------------------------------------------


def _sorted_window_levels(n: int, max_levels: int = 4) -> list[int]:
    """Descending static window sizes (factor 4) for the sorted material
    dispatch: n, n/4, n/16, n/64 (floor 1024). Each level is one more
    trace of the type body, so the ladder is short and geometric."""
    levels = [n]
    while len(levels) < max_levels:
        s = max(1024, -(-levels[-1] // 4))
        if s >= levels[-1]:
            break
        levels.append(s)
    return levels


def _sorted_type_dispatch(mat_type, per_lane, out_init, present, run_type):
    """Material-sorted shading batches: the TPU re-design of the
    reference's :sorted mode, which counts, prefix-offsets and
    scatter-sorts the material queue by type then launches one kernel
    per contiguous run (multi-material-eval.jl:450-574).

    Here: one stable sort of the lane ids by material tag, then each
    present type is evaluated on a `lax.dynamic_slice` WINDOW anchored at
    its run's start. The window size is picked by a lax.cond ladder of
    static sizes (n, n/4, n/16, n/64), so the evaluation cost of a type
    tracks its occupancy instead of the full wavefront — dense types pay
    full width, rare types pay the 1024-lane floor. Windows clamp at the
    array end (XLA dynamic_slice semantics shift the start back), so the
    merge re-masks against the sorted tags before writing back.

    mat_type: (N,) int32 tags; per_lane: pytree of (N, ...) inputs;
    out_init: pytree of (N, ...) identity outputs; run_type(tag, sliced)
    -> pytree matching out_init's structure over the window."""
    tm = jax.tree_util.tree_map
    order = jnp.argsort(mat_type).astype(jnp.int32)
    mt_s = jnp.take(mat_type, order, axis=0)
    pl_s = tm(lambda x: jnp.take(x, order, axis=0), per_lane)
    out = tm(lambda x: jnp.take(x, order, axis=0), out_init)
    n = mat_type.shape[0]
    levels = _sorted_window_levels(n)

    for tag in present:
        start = jnp.searchsorted(mt_s, tag, side="left").astype(jnp.int32)
        cnt = jnp.searchsorted(mt_s, tag, side="right").astype(jnp.int32) - start

        def run(W, out, tag=tag, start=start):
            sl = tm(lambda x: jax.lax.dynamic_slice_in_dim(x, start, W), pl_s)
            res = run_type(tag, sl)
            m = jax.lax.dynamic_slice_in_dim(mt_s, start, W) == tag
            cur = tm(lambda x: jax.lax.dynamic_slice_in_dim(x, start, W), out)
            merged = tm(
                lambda new, old: jnp.where(
                    m.reshape(m.shape + (1,) * (new.ndim - 1)), new, old),
                res, cur)
            return tm(
                lambda o, w: jax.lax.dynamic_update_slice_in_dim(o, w, start, 0),
                out, merged)

        def ladder(idx, out, run=run):
            W = levels[idx]
            if idx == len(levels) - 1:
                return run(W, out)
            return jax.lax.cond(
                cnt <= levels[idx + 1],
                lambda o: ladder(idx + 1, o),
                lambda o: run(W, o),
                out)

        out = jax.lax.cond(cnt > 0, lambda o: ladder(0, o), lambda o: o, out)

    inv = jnp.zeros_like(order).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return tm(lambda x: jnp.take(x, inv, axis=0), out)


def _sample_bsdf_dispatch(
    scene: SceneData, mat_type, mat_idx, wo, lam, u2, uc, regularize, tex=None,
    coherence: str = "none",
):
    """Per-type BSDF sampling, selected by tag. coherence='none' is the
    multi-material-eval :none mode (dense evaluation of every present
    type); 'gated' skips unoccupied types at runtime via lax.cond (the
    :per_type empty-queue behavior)."""
    table = scene.rgb2spec
    banks = scene.materials
    out = mb._invalid(mat_type.shape)
    present = scene.present_materials

    if coherence == "sorted":
        sample_tags = [t for t in present if t in (
            mt.MATTE, mt.MIRROR, mt.GLASS, mt.CONDUCTOR, mt.THIN_DIELECTRIC,
            mt.DIFFUSE_TRANSMISSION, mt.COATED_DIFFUSE, mt.COATED_CONDUCTOR,
            mt.COATED_DIFFUSE_TRANSMISSION)]
        per_lane = {"idx": mat_idx, "wo": wo, "lam": lam, "u2": u2, "uc": uc}
        if regularize is not None:
            per_lane["reg"] = regularize
        if tex is not None:
            per_lane["ctx"] = tex[1]

        def run_type(tag, pl):
            from ..materials import layered as ml

            idx, wo_s, lam_s = pl["idx"], pl["wo"], pl["lam"]
            u2_s, uc_s = pl["u2"], pl["uc"]
            reg = pl.get("reg")
            tex_s = None if tex is None else (tex[0], pl["ctx"])
            if tag == mt.MATTE:
                return mb.sample_matte(banks, idx, table, wo_s, lam_s, u2_s,
                                       uc_s, tex_s)
            if tag == mt.MIRROR:
                return mb.sample_mirror(banks, idx, table, wo_s, lam_s, u2_s,
                                        uc_s, tex_s)
            if tag == mt.GLASS:
                return mb.sample_glass(banks, idx, table, wo_s, lam_s, u2_s,
                                       uc_s, tex_s, reg)
            if tag == mt.CONDUCTOR:
                return mb.sample_conductor(banks, idx, table, wo_s, lam_s,
                                           u2_s, uc_s, reg, tex_s)
            if tag == mt.THIN_DIELECTRIC:
                return mb.sample_thin_dielectric(banks, idx, table, wo_s,
                                                 lam_s, u2_s, uc_s, tex_s)
            if tag == mt.DIFFUSE_TRANSMISSION:
                return mb.sample_diffuse_transmission(banks, idx, table, wo_s,
                                                      lam_s, u2_s, uc_s, tex_s)
            if tag == mt.COATED_DIFFUSE:
                return ml.sample_coated_diffuse(banks, idx, table, wo_s,
                                                lam_s, u2_s, uc_s, tex_s)
            if tag == mt.COATED_CONDUCTOR:
                return ml.sample_coated_conductor(banks, idx, table, wo_s,
                                                  lam_s, u2_s, uc_s, tex_s)
            if tag == mt.COATED_DIFFUSE_TRANSMISSION:
                return ml.sample_coated_diffuse_transmission(
                    banks, idx, table, wo_s, lam_s, u2_s, uc_s, tex_s)
            raise ValueError(f"unknown material tag {tag}")

        return _sorted_type_dispatch(mat_type, per_lane, out, sample_tags,
                                     run_type)

    def merge(out, s_fn, type_tag):
        m = mat_type == type_tag

        def apply(o):
            s = s_fn()
            return mb.BSDFSample(
                wi=jnp.where(m[..., None], s.wi, o.wi),
                f=jnp.where(m[..., None], s.f, o.f),
                pdf=jnp.where(m, s.pdf, o.pdf),
                specular=jnp.where(m, s.specular, o.specular),
                transmission=jnp.where(m, s.transmission, o.transmission),
                eta_scale=jnp.where(m, s.eta_scale, o.eta_scale),
                valid=jnp.where(m, s.valid, o.valid),
            )

        if coherence == "gated":
            return jax.lax.cond(jnp.any(m), apply, lambda o: o, out)
        return apply(out)

    if mt.MATTE in present:
        out = merge(out, lambda: mb.sample_matte(
            banks, mat_idx, table, wo, lam, u2, uc, tex), mt.MATTE)
    if mt.MIRROR in present:
        out = merge(out, lambda: mb.sample_mirror(
            banks, mat_idx, table, wo, lam, u2, uc, tex), mt.MIRROR)
    if mt.GLASS in present:
        out = merge(out, lambda: mb.sample_glass(
            banks, mat_idx, table, wo, lam, u2, uc, tex, regularize), mt.GLASS)
    if mt.CONDUCTOR in present:
        out = merge(out, lambda: mb.sample_conductor(
            banks, mat_idx, table, wo, lam, u2, uc, regularize, tex),
            mt.CONDUCTOR)
    if mt.THIN_DIELECTRIC in present:
        out = merge(out, lambda: mb.sample_thin_dielectric(
            banks, mat_idx, table, wo, lam, u2, uc, tex), mt.THIN_DIELECTRIC)
    if mt.DIFFUSE_TRANSMISSION in present:
        out = merge(out, lambda: mb.sample_diffuse_transmission(
            banks, mat_idx, table, wo, lam, u2, uc, tex),
            mt.DIFFUSE_TRANSMISSION)
    if mt.COATED_DIFFUSE in present:
        from ..materials import layered as ml

        out = merge(out, lambda: ml.sample_coated_diffuse(
            banks, mat_idx, table, wo, lam, u2, uc, tex), mt.COATED_DIFFUSE)
    if mt.COATED_CONDUCTOR in present:
        from ..materials import layered as ml

        out = merge(out, lambda: ml.sample_coated_conductor(
            banks, mat_idx, table, wo, lam, u2, uc, tex), mt.COATED_CONDUCTOR)
    if mt.COATED_DIFFUSE_TRANSMISSION in present:
        from ..materials import layered as ml

        out = merge(out, lambda: ml.sample_coated_diffuse_transmission(
            banks, mat_idx, table, wo, lam, u2, uc, tex),
            mt.COATED_DIFFUSE_TRANSMISSION)
    return out


def _eval_bsdf_dispatch(
    scene: SceneData, mat_type, mat_idx, wo, wi, lam, regularize, tex=None,
    eval_u2=None, eval_uc=None, coherence: str = "none",
):
    """(f, pdf) for NEE MIS; zero for specular-only materials. eval_u2 /
    eval_uc drive the stochastic layered-material evaluation. coherence
    as in _sample_bsdf_dispatch ('gated' skips unoccupied types)."""
    table = scene.rgb2spec
    banks = scene.materials
    f = jnp.zeros(lam.shape, jnp.float32)
    pdf = jnp.zeros(mat_type.shape, jnp.float32)
    present = scene.present_materials

    if coherence == "sorted":
        layered_tags = (mt.COATED_DIFFUSE, mt.COATED_CONDUCTOR,
                        mt.COATED_DIFFUSE_TRANSMISSION)
        eval_tags = [t for t in present if t in (
            mt.MATTE, mt.CONDUCTOR, mt.GLASS, mt.DIFFUSE_TRANSMISSION)]
        if eval_u2 is not None:
            eval_tags += [t for t in present if t in layered_tags]
        per_lane = {"idx": mat_idx, "wo": wo, "wi": wi, "lam": lam}
        if regularize is not None:
            per_lane["reg"] = regularize
        if tex is not None:
            per_lane["ctx"] = tex[1]
        if eval_u2 is not None:
            per_lane["u2"] = eval_u2
            per_lane["uc"] = eval_uc

        def run_type(tag, pl):
            from ..materials import layered as ml

            idx, wo_s, wi_s, lam_s = pl["idx"], pl["wo"], pl["wi"], pl["lam"]
            reg = pl.get("reg")
            tex_s = None if tex is None else (tex[0], pl["ctx"])
            if tag == mt.MATTE:
                return mb.eval_matte(banks, idx, table, wo_s, wi_s, lam_s,
                                     tex_s)
            if tag == mt.CONDUCTOR:
                return mb.eval_conductor(banks, idx, table, wo_s, wi_s, lam_s,
                                         reg, tex_s)
            if tag == mt.GLASS:
                return mb.eval_glass(banks, idx, table, wo_s, wi_s, lam_s,
                                     reg, tex_s)
            if tag == mt.DIFFUSE_TRANSMISSION:
                return mb.eval_diffuse_transmission(banks, idx, table, wo_s,
                                                    wi_s, lam_s, tex_s)
            if tag == mt.COATED_DIFFUSE:
                return ml.eval_coated_diffuse(banks, idx, table, wo_s, wi_s,
                                              lam_s, pl["u2"], pl["uc"], tex_s)
            if tag == mt.COATED_CONDUCTOR:
                return ml.eval_coated_conductor(banks, idx, table, wo_s, wi_s,
                                                lam_s, pl["u2"], pl["uc"],
                                                tex_s)
            if tag == mt.COATED_DIFFUSE_TRANSMISSION:
                return ml.eval_coated_diffuse_transmission(
                    banks, idx, table, wo_s, wi_s, lam_s, pl["u2"], pl["uc"],
                    tex_s)
            raise ValueError(f"unknown material tag {tag}")

        return _sorted_type_dispatch(mat_type, per_lane, (f, pdf), eval_tags,
                                     run_type)

    def put(f, pdf, fn, type_tag):
        m = mat_type == type_tag

        def apply(fp):
            f0, p0 = fp
            fe, pe = fn()
            return (jnp.where(m[..., None], fe, f0), jnp.where(m, pe, p0))

        if coherence == "gated":
            return jax.lax.cond(jnp.any(m), apply, lambda fp: fp, (f, pdf))
        return apply((f, pdf))

    if mt.MATTE in present:
        f, pdf = put(f, pdf, lambda: mb.eval_matte(
            banks, mat_idx, table, wo, wi, lam, tex), mt.MATTE)
    if mt.CONDUCTOR in present:
        f, pdf = put(f, pdf, lambda: mb.eval_conductor(
            banks, mat_idx, table, wo, wi, lam, regularize, tex), mt.CONDUCTOR)
    if mt.GLASS in present:
        f, pdf = put(f, pdf, lambda: mb.eval_glass(
            banks, mat_idx, table, wo, wi, lam, regularize, tex), mt.GLASS)
    if mt.DIFFUSE_TRANSMISSION in present:
        f, pdf = put(f, pdf, lambda: mb.eval_diffuse_transmission(
            banks, mat_idx, table, wo, wi, lam, tex), mt.DIFFUSE_TRANSMISSION)
    if eval_u2 is not None and (
        mt.COATED_DIFFUSE in present or mt.COATED_CONDUCTOR in present
        or mt.COATED_DIFFUSE_TRANSMISSION in present
    ):
        from ..materials import layered as ml

        if mt.COATED_DIFFUSE in present:
            f, pdf = put(f, pdf, lambda: ml.eval_coated_diffuse(
                banks, mat_idx, table, wo, wi, lam, eval_u2, eval_uc, tex),
                mt.COATED_DIFFUSE)
        if mt.COATED_CONDUCTOR in present:
            f, pdf = put(f, pdf, lambda: ml.eval_coated_conductor(
                banks, mat_idx, table, wo, wi, lam, eval_u2, eval_uc, tex),
                mt.COATED_CONDUCTOR)
        if mt.COATED_DIFFUSE_TRANSMISSION in present:
            f, pdf = put(f, pdf, lambda: ml.eval_coated_diffuse_transmission(
                banks, mat_idx, table, wo, wi, lam, eval_u2, eval_uc, tex),
                mt.COATED_DIFFUSE_TRANSMISSION)
    return f, pdf


def _uv_screen_derivatives(camera, p, p0, p1, p2, uv0, uv1, uv2):
    """Camera-based texture-filter derivatives: pbrt's approximate_dp_dxy
    (one-pixel footprint scaled by camera depth) solved against the
    triangle's dp/duv for (duvdx, duvdy)
    (surface-eval.jl:32-141 / pbrt-v4 Camera::Approximate_dp_dxy)."""
    w2c = camera.camera_to_world.inverse()
    z = jnp.abs(w2c.apply_point(p)[..., 2:3])
    dpdx = camera.camera_to_world.apply_vector(camera.dx_camera)[None, :] * z
    dpdy = camera.camera_to_world.apply_vector(camera.dy_camera)[None, :] * z
    return _solve_duv(p0, p1, p2, uv0, uv1, uv2, dpdx, dpdy)


def _uv_diff_derivatives(diff, p, ng, p0, p1, p2, uv0, uv1, uv2):
    """TRUE ray-differential texture derivatives: transfer the +x / +y
    auxiliary camera rays to the hit plane (p, ng) and solve the position
    offsets against the triangle's dp/duv
    (compute_differentials, /root/reference/src/surface_interaction.jl:136-174;
    generated by generate_ray_differential, camera.jl:57-75)."""
    rx_o, rx_d, ry_o, ry_d = diff.rx_o, diff.rx_d, diff.ry_o, diff.ry_d

    def transfer(ro, rd):
        den = jnp.sum(ng * rd, -1)
        ok = jnp.abs(den) > 1e-12
        t = jnp.sum((p - ro) * ng, -1) / jnp.where(ok, den, 1.0)
        dp = ro + t[..., None] * rd - p
        return jnp.where((ok & jnp.isfinite(t))[..., None], dp, 0.0)

    return _solve_duv(p0, p1, p2, uv0, uv1, uv2,
                      transfer(rx_o, rx_d), transfer(ry_o, ry_d))


def _solve_duv(p0, p1, p2, uv0, uv1, uv2, dpdx, dpdy):
    """Least-squares (duvdx, duvdy) from world-space footprint vectors and
    the triangle's dp/duv (pbrt-v4 SurfaceInteraction::ComputeDifferentials)."""
    dp1 = p1 - p0
    dp2 = p2 - p0
    duv1 = uv1 - uv0
    duv2 = uv2 - uv0
    det = duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0]
    ok_uv = jnp.abs(det) > 1e-12
    inv = 1.0 / jnp.where(ok_uv, det, 1.0)
    dpdu = (duv2[..., 1:2] * dp1 - duv1[..., 1:2] * dp2) * inv[..., None]
    dpdv = (-duv2[..., 0:1] * dp1 + duv1[..., 0:1] * dp2) * inv[..., None]

    a00 = jnp.sum(dpdu * dpdu, -1)
    a01 = jnp.sum(dpdu * dpdv, -1)
    a11 = jnp.sum(dpdv * dpdv, -1)
    det_a = a00 * a11 - a01 * a01
    ok = ok_uv & (jnp.abs(det_a) > 1e-20)
    inv_a = 1.0 / jnp.where(ok, det_a, 1.0)

    def solve(dp):
        b0 = jnp.sum(dpdu * dp, -1)
        b1 = jnp.sum(dpdv * dp, -1)
        du = (a11 * b0 - a01 * b1) * inv_a
        dv = (a00 * b1 - a01 * b0) * inv_a
        duv = jnp.stack([du, dv], -1)
        return jnp.where(ok[..., None], duv, 0.0)

    return solve(dpdx), solve(dpdy)


def _face_decode(scene: SceneData, tri_raw):
    """Hit-record tri id -> (attribute face index, instance id | None).

    Instanced scenes return tri = world_treelet * TREELET + j
    (geometry/instanced.py); the shared object-space attribute row is
    ti_obj[wt] * TREELET + j. World-space reconstruction parity:
    surface_interaction.jl:313-482."""
    tri = jnp.maximum(tri_raw, 0)
    if not scene.has_instances:
        return tri, None
    from ..geometry.wavefront import TREELET

    wt = tri // TREELET
    j = tri - wt * TREELET
    obj = scene.inst.ti_obj[wt] * TREELET + j
    return obj, scene.inst.ti_inst[wt]


def _inst_xform_normal(scene: SceneData, inst, n_obj):
    """Object->world normal transform (inverse-transpose rows)."""
    m = scene.inst_nrm[inst]                     # (N, 3, 3)
    return jnp.einsum("...ij,...j->...i", m, n_obj)


def _inst_xform_point(scene: SceneData, inst, p_obj):
    m = scene.inst_l2w[inst]                     # (N, 3, 4)
    return jnp.einsum("...ij,...j->...i", m[..., :3], p_obj) + m[..., 3]


def _surface_data(scene: SceneData, rec, o, d, camera=None, diff=None):
    """Gather hit-point attributes. Returns dict of per-lane arrays.

    diff: optional (rx_o, rx_d, ry_o, ry_d) TRUE ray differentials — when
    given, texture-filter derivatives come from plane-transferring the
    auxiliary rays (Whitted's primary hits, sampler.jl:30-37) instead of
    the camera footprint approximation.

    TPU gathers cost per ADDRESS (~5 ms fixed at 640k lanes regardless of
    row width), so every per-face attribute — winding normal, three vertex
    normals, packed material word, area-light id, medium pair — rides ONE
    (F, 17) row gather (scene.face_rows); uv / vertex-color / vertex-
    position fetches only exist in scenes that bind textures (static
    property)."""
    from ..textures.atlas import TexCtx

    tri, inst = _face_decode(scene, rec.tri)
    p_hit = o + rec.t[..., None] * d
    rows = scene.face_rows[tri]           # (..., 17) one gather
    ng_raw = rows[..., 0:3]               # winding normal: points "outside"
    ns = normalize(
        interpolate(rec.b1, rec.b2, rows[..., 3:6], rows[..., 6:9],
                    rows[..., 9:12])
    )
    ns = jnp.where(jnp.sum(ns * ns, -1, keepdims=True) > 0.5, ns, ng_raw)
    if inst is not None:
        ng_raw = normalize(_inst_xform_normal(scene, inst, ng_raw))
        ns = normalize(_inst_xform_normal(scene, inst, ns))
    ng = face_forward(ng_raw, ns)

    duvdx = duvdy = None
    if scene.materials.has_textures:
        trows = scene.tex_rows[tri]       # one gather: uv + vertex colors
        uv = interpolate(rec.b1, rec.b2, trows[..., 0:2], trows[..., 2:4],
                         trows[..., 4:6])
        vcol = interpolate(rec.b1, rec.b2, trows[..., 6:9], trows[..., 9:12],
                           trows[..., 12:15])
        if camera is not None or diff is not None:
            q0 = scene.bvh.p0[tri]
            q1 = scene.bvh.p1[tri]
            q2 = scene.bvh.p2[tri]
            if inst is not None:
                q0 = _inst_xform_point(scene, inst, q0)
                q1 = _inst_xform_point(scene, inst, q1)
                q2 = _inst_xform_point(scene, inst, q2)
            if diff is not None:
                duvdx, duvdy = _uv_diff_derivatives(
                    diff, p_hit, ng_raw, q0, q1, q2,
                    trows[..., 0:2], trows[..., 2:4], trows[..., 4:6],
                )
            else:
                duvdx, duvdy = _uv_screen_derivatives(
                    camera, p_hit, q0, q1, q2,
                    trows[..., 0:2], trows[..., 2:4], trows[..., 4:6],
                )
    else:
        uv = jnp.zeros(tri.shape + (2,), jnp.float32)
        vcol = jnp.ones(tri.shape + (3,), jnp.float32)

    packed = (rows[..., 12].astype(jnp.int32) << 16) | \
        rows[..., 13].astype(jnp.int32)
    if inst is not None:
        ov = scene.inst_mat_packed[inst]  # per-instance material override
        packed = jnp.where(ov >= 0, ov, packed)
    mat_type = packed >> 24
    mat_idx = packed & 0xFFFFFF
    if mt.MIX in scene.present_materials:
        # resolve Mix to a concrete child with a deterministic hash of the
        # hit point (mix-material.jl:39-57): stable across samples so the
        # material never flickers
        from ..sampling.hashes import hash_u32x2

        b = scene.materials
        is_mix = mat_type == mt.MIX
        mi = jnp.maximum(mat_idx, 0)
        hx = jax.lax.bitcast_convert_type(rec.b1 + 0.123, jnp.uint32)
        hy = jax.lax.bitcast_convert_type(rec.b2 + 0.456, jnp.uint32)
        h = hash_u32x2(hx ^ tri.astype(jnp.uint32), hy)
        from ..sampling import u64 as u64m

        u_mix = u64m.to_u32(u64m.shr(h, 32)).astype(jnp.float32) * jnp.float32(2.3283064e-10)
        amount = b.mix_amount[mi]
        if b.has_textures:
            from ..textures.atlas import TexCtx as _TexCtx
            from ..textures.atlas import eval_scalar as _eval_scalar

            amount = _eval_scalar(
                scene.atlas, b.mix_amount_tex[mi], amount,
                _TexCtx(uv=uv, vcolor=vcol),
            )
        use1 = u_mix < amount
        child_t = jnp.where(use1, b.mix_m1_type[mi], b.mix_m2_type[mi])
        child_i = jnp.where(use1, b.mix_m1_idx[mi], b.mix_m2_idx[mi])
        mat_type = jnp.where(is_mix, child_t, mat_type)
        mat_idx = jnp.where(is_mix, child_i, mat_idx)

    if mt.EMISSIVE in scene.present_materials:
        arealight = rows[..., 14].astype(jnp.int32) - 1
    else:
        arealight = jnp.full_like(tri, -1)
    if scene.has_media or mt.INTERFACE in scene.present_materials:
        inside_med = rows[..., 15].astype(jnp.int32) - 1
        outside_med = rows[..., 16].astype(jnp.int32) - 1
    else:
        inside_med = jnp.full_like(tri, -1)
        outside_med = jnp.full_like(tri, -1)
    return dict(
        tri=tri, p=p_hit, ng=ng, ng_raw=ng_raw, ns=ns,
        mat_type=mat_type, mat_idx=mat_idx,
        arealight=arealight,
        inside_med=inside_med, outside_med=outside_med,
        tex=(scene.atlas, TexCtx(uv=uv, vcolor=vcol, duvdx=duvdx, duvdy=duvdy)),
    )


def _crossing_medium(sd, direction):
    """Medium entered when crossing the surface along `direction`
    (get_medium_index, materials/medium-interface.jl:96-105)."""
    entering_inside = dot(direction, sd["ng_raw"]) < 0.0
    return jnp.where(entering_inside, sd["inside_med"], sd["outside_med"])


ALPHA_ROUNDS = 16  # stochastic alpha re-trace cap (intersection.jl:223);
# each round clears ONE rejected hit per lane, so any alpha stack deeper
# than the cap would render opaque — tests/test_alpha_mix.py pins this


def _alpha_keep(scene: SceneData, rec, p_hit, u_salt: int = 0):
    """Stochastic alpha test at a hit: keep with probability alpha, using a
    deterministic hash of the WORLD hit position + face id, so the decision
    is stable per point yet independent across lanes (stochastic alpha via
    hashed RNG, intersection.jl:223-252 — hashing t alone correlates every
    lane of a parallel ray packet crossing a plane)."""
    from ..sampling.hashes import hash_u32x2
    from ..sampling import u64 as u64m
    from ..textures.atlas import TexCtx, eval_scalar

    tri, _ = _face_decode(scene, rec.tri)
    trows = scene.tex_rows[tri]           # one gather: alpha + uv
    a = trows[..., 15]
    uv = interpolate(rec.b1, rec.b2, trows[..., 0:2], trows[..., 2:4],
                     trows[..., 4:6])
    ctx = TexCtx(uv=uv, vcolor=jnp.ones(uv.shape[:-1] + (3,), jnp.float32))
    a = eval_scalar(scene.atlas, trows[..., 16].astype(jnp.int32) - 1, a, ctx)
    hx = jax.lax.bitcast_convert_type(p_hit[..., 0], jnp.uint32)
    hy = jax.lax.bitcast_convert_type(p_hit[..., 1], jnp.uint32)
    hz = jax.lax.bitcast_convert_type(p_hit[..., 2], jnp.uint32)
    salt = (0x9E3779B9 * (u_salt + 1)) & 0xFFFFFFFF
    h = hash_u32x2(hx ^ ((hy << 16) | (hy >> 16)),
                   hz ^ tri.astype(jnp.uint32) ^ jnp.uint32(salt))
    u = u64m.to_u32(u64m.shr(h, 32)).astype(jnp.float32) * jnp.float32(2.3283064e-10)
    return (~rec.hit) | (u < a)


def _closest_hit_surface(scene: SceneData, o, d, t_max, active, compact=None,
                         presorted=False):
    """Closest hit with stochastic alpha: hits that fail the alpha test are
    skipped by re-tracing past them (bounded rounds; surviving lanes then
    accept whatever they stand on, matching the reference's 16-try cap).

    Returns a HitRecord with t relative to the original origin."""
    from ..geometry.traverse import HitRecord

    rec = scene_closest_hit(scene, o, d, t_max, active=active, compact=compact,
                            presorted=presorted)
    if not scene.has_alpha:
        return rec
    o_cur = o
    t_off = jnp.zeros_like(rec.t)
    live = active  # lanes whose current rec still needs the alpha test
    for k in range(ALPHA_ROUNDS):
        keep = _alpha_keep(scene, rec, o_cur + rec.t[..., None] * d, u_salt=k)
        retrace = live & rec.hit & ~keep
        t_adv = rec.t + 1e-4
        o_new = jnp.where(retrace[..., None], o_cur + t_adv[..., None] * d, o_cur)
        t_off_new = jnp.where(retrace, t_off + t_adv, t_off)
        rec2 = scene_closest_hit(
            scene, o_new, d, jnp.maximum(t_max - t_off_new, 0.0),
            active=retrace, compact=compact, presorted=presorted,
        )
        rec = HitRecord(
            hit=jnp.where(retrace, rec2.hit, rec.hit),
            t=jnp.where(retrace, rec2.t, rec.t),
            tri=jnp.where(retrace, rec2.tri, rec.tri),
            b1=jnp.where(retrace, rec2.b1, rec.b1),
            b2=jnp.where(retrace, rec2.b2, rec.b2),
        )
        o_cur = o_new
        t_off = t_off_new
        live = retrace
    return HitRecord(hit=rec.hit, t=rec.t + t_off, tri=rec.tri, b1=rec.b1, b2=rec.b2)


def _trace_shadow(scene: SceneData, o_sh, wi, t_max, medium_sh, lam, active,
                  light_group=None, compact=None):
    """Shadow ray with transmittance: walk through up to
    MAX_INTERFACE_CROSSINGS interface boundaries, ratio-tracking the medium
    transmittance of each segment (trace_shadow_transmittance,
    intersection.jl:302-563).

    Returns (T_ray, r_l_mul, r_u_mul): (N,4) multipliers; T_ray=0 if blocked.
    """
    from ..geometry.traverse import any_hit

    ones4 = 1.0 + jnp.zeros_like(lam)
    if (not scene.has_media and mt.INTERFACE not in scene.present_materials
            and not scene.has_alpha):
        # fast path: plain occlusion test
        occluded = scene_any_hit(scene, o_sh, wi, t_max, active=active,
                                 group=light_group, compact=compact)
        T_ray = jnp.where(occluded[..., None], 0.0, ones4)
        return T_ray, ones4, ones4

    T_ray = ones4
    r_l_m = ones4
    r_u_m = ones4
    running = active
    o_cur = o_sh
    t_rem = t_max
    med = medium_sh

    for _ in range(MAX_INTERFACE_CROSSINGS):
        rec = scene_closest_hit(scene, o_cur, wi, t_rem, active=running,
                                compact=compact)
        seg_t = jnp.where(rec.hit, rec.t, t_rem)

        if scene.has_media:
            in_med = running & (med >= 0)
            T_seg, rl_seg, ru_seg = ms.ratio_track_tr(
                scene.media, scene.rgb2spec, med, o_cur, wi, seg_t, lam, in_med
            )
            T_ray = T_ray * T_seg
            r_l_m = r_l_m * rl_seg
            r_u_m = r_u_m * ru_seg

        hit_something = running & rec.hit
        tri, sh_inst = _face_decode(scene, rec.tri)
        rows = scene.face_rows[tri]       # one gather: mat | ng | media
        mp = (rows[..., 12].astype(jnp.int32) << 16) | \
            rows[..., 13].astype(jnp.int32)
        if sh_inst is not None:
            ov = scene.inst_mat_packed[sh_inst]
            mp = jnp.where(ov >= 0, ov, mp)
        is_interface = (mp >> 24) == mt.INTERFACE
        passthrough = is_interface
        if scene.has_alpha:
            # alpha-failed occluders are transparent to shadow rays too
            passthrough = passthrough | ~_alpha_keep(
                scene, rec, o_cur + rec.t[..., None] * wi, u_salt=7)
        blocked = hit_something & ~passthrough
        T_ray = jnp.where(blocked[..., None], 0.0, T_ray)

        crossing = hit_something & passthrough
        # advance through the interface
        p_hit = o_cur + rec.t[..., None] * wi
        ng_raw = rows[..., 0:3]
        if sh_inst is not None:
            ng_raw = _inst_xform_normal(scene, sh_inst, ng_raw)
        entering_inside = jnp.sum(wi * ng_raw, -1) < 0.0
        new_med = jnp.where(entering_inside,
                            rows[..., 15].astype(jnp.int32) - 1,
                            rows[..., 16].astype(jnp.int32) - 1)
        med = jnp.where(crossing, new_med, med)
        o_cur = jnp.where(crossing[..., None], p_hit + 1e-4 * wi, o_cur)
        t_rem = jnp.where(crossing, t_rem - rec.t - 1e-4, t_rem)
        running = crossing & (t_rem > 0.0)

    return T_ray, r_l_m, r_u_m


def _albedo_rgb_dispatch(scene: SceneData, mat_type, mat_idx, tex):
    """Approximate RGB surface albedo per lane (get_albedo_spectral analog,
    spectral-eval.jl) for the denoiser aux buffers."""
    b = scene.materials
    idx = jnp.maximum(mat_idx, 0)
    out = jnp.full(mat_type.shape + (3,), 0.5, jnp.float32)
    present = scene.present_materials

    def put(tag, rgb):
        nonlocal out
        out = jnp.where((mat_type == tag)[..., None], rgb, out)

    if mt.MATTE in present:
        put(mt.MATTE, mb._tex_rgb(b.matte_kd, b.matte_kd_tex, idx, tex))
    if mt.MIRROR in present:
        put(mt.MIRROR, mb._tex_rgb(b.mirror_kr, b.mirror_kr_tex, idx, tex))
    if mt.GLASS in present:
        put(mt.GLASS, jnp.ones(mat_type.shape + (3,), jnp.float32))
    if mt.CONDUCTOR in present:
        # normal-incidence Fresnel at ~(610, 550, 465) nm
        li = jnp.asarray([250, 190, 105], jnp.int32)  # offsets from 360nm
        eta = b.cond_eta[idx][..., li]
        k = b.cond_k[idx][..., li]
        r0 = ((eta - 1.0) ** 2 + k * k) / ((eta + 1.0) ** 2 + k * k)
        put(mt.CONDUCTOR, r0)
    if mt.COATED_DIFFUSE in present:
        put(mt.COATED_DIFFUSE, mb._tex_rgb(b.cd_refl, b.cd_refl_tex, idx, tex))
    if mt.COATED_DIFFUSE_TRANSMISSION in present:
        put(
            mt.COATED_DIFFUSE_TRANSMISSION,
            mb._tex_rgb(b.cdt_refl, b.cdt_refl_tex, idx, tex)
            + mb._tex_rgb(b.cdt_trans, b.cdt_trans_tex, idx, tex),
        )
    if mt.DIFFUSE_TRANSMISSION in present:
        put(
            mt.DIFFUSE_TRANSMISSION,
            mb._tex_rgb(b.dt_refl, b.dt_refl_tex, idx, tex)
            + mb._tex_rgb(b.dt_trans, b.dt_trans_tex, idx, tex),
        )
    if mt.EMISSIVE in present:
        put(mt.EMISSIVE, mb._tex_rgb(b.emissive_le, b.emissive_le_tex, idx, tex))
    return out


@partial(jax.jit, static_argnums=())
def render_aux(scene: SceneData, camera: PerspectiveCamera):
    """Primary-visibility pass for the denoiser: (albedo, normal, depth)
    images (fill_aux_buffers!, film.jl:410-483)."""
    w, h = camera.resolution
    n = w * h
    lanes = jnp.arange(n, dtype=jnp.uint32)
    px = lanes % w
    py = lanes // w
    p_film = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + 0.5
    o, d = camera.generate_rays(
        CameraSample(
            p_film=p_film, lens=jnp.zeros((n, 2)), time=jnp.zeros((n,)),
            filter_weight=jnp.ones((n,)),
        )
    )
    t_max = jnp.full((n,), jnp.inf)
    rec = scene_closest_hit(scene, o, d, t_max)
    sd = _surface_data(scene, rec, o, d)
    albedo = _albedo_rgb_dispatch(scene, sd["mat_type"], sd["mat_idx"], sd["tex"])
    hit = rec.hit
    albedo = jnp.where(hit[..., None], albedo, 0.0)
    normal = jnp.where(hit[..., None], sd["ns"], 0.0)
    depth = jnp.where(hit, rec.t, 0.0)
    return (
        albedo.reshape(h, w, 3), normal.reshape(h, w, 3), depth.reshape(h, w)
    )


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

    `vp.sample_batch = K` dispatches K consecutive samples of the whole
    frame as ONE wavefront of K*w*h lanes (sample_idx is then the FIRST
    sample of the batch: samples sample_idx .. sample_idx+K-1). Fixed
    per-op overhead on (8, 128, T) blocks amortizes over K× more live
    work — hardware A/B on the v5e measured +9% at K=2 on the 800×800
    bench scene (PERF.md round 3) — at the cost of K× the transient
    path-state memory.
    """
    # the film's crop window (film.jl:61-183 crop_bounds): lanes cover
    # only the window's pixels, so cropped progressive previews cost
    # proportionally fewer rays
    w, h = film.width, film.height
    n = w * h
    k = max(1, int(vp.sample_batch))
    lanes = jnp.arange(n, dtype=jnp.uint32)
    px = jnp.uint32(film.crop_x0) + lanes % w
    py = jnp.uint32(film.crop_y0) + lanes // w
    si = sample_idx
    if k > 1:
        px = jnp.tile(px, k)
        py = jnp.tile(py, k)
        si = sample_idx + jnp.repeat(jnp.arange(k, dtype=jnp.uint32), n)
    rgb, filter_w, stats = render_lanes(vp, scene, camera, filt, si, px, py)
    if k > 1:
        # Pre-weight per sample BEFORE summing over the batch: the film
        # accumulates Σ rgb_i·w_i and Σ w_i, not (Σ rgb_i)·(Σ w_i).
        rgbw = (rgb * filter_w[:, None]).reshape(k, h, w, 3).sum(0)
        w_img = filter_w.reshape(k, h, w).sum(0)
        return film_add_weighted(film, rgbw, w_img, n_samples=k)
    return film_add_sample(film, rgb.reshape(h, w, 3), filter_w.reshape(h, w))


# resident-state channel layout for the one-per-bounce permutation gather
# (TPU gathers cost per ADDRESS: one (n, 42) row gather costs about the
# same as one (n, 8), so the whole path state rides a single gather)
_RES_F3 = ["o", "d", "prev_p", "prev_ns"]
_RES_F4 = ["beta", "r_u", "r_l", "L", "lam"]
_RES_SF = ["eta"]                              # f32 scalars
_RES_SB = ["alive", "spec", "anyns", "disp"]   # bools
_RES_SI = ["med", "lane"]                      # int32 (exact in f32: < 2^24)
_RES_SU = ["px", "py", "si"]                   # uint32 (< 2^24)


def _res_pack(st):
    """State dict -> (n, C) f32 rows for the permutation row gather.

    Integer channels ride as f32: every value is < 2^24 (pixel coords,
    medium ids, lane ids up to 16M, sample indices) so the round trip is
    exact — unlike bitcasting, which NaN-canonicalizes on TPU float paths
    (see wavefront._unsort_hits)."""
    cols = [st[k] for k in _RES_F3 + _RES_F4]
    cols += [st[k][:, None] for k in _RES_SF]
    cols += [st[k].astype(jnp.float32)[:, None]
             for k in _RES_SB + _RES_SI + _RES_SU]
    return jnp.concatenate(cols, axis=1)


def _res_unpack(rows):
    st = {}
    c = 0
    for k in _RES_F3:
        st[k] = rows[:, c:c + 3]
        c += 3
    for k in _RES_F4:
        st[k] = rows[:, c:c + 4]
        c += 4
    for k in _RES_SF:
        st[k] = rows[:, c]
        c += 1
    for k in _RES_SB:
        st[k] = rows[:, c] > 0.5
        c += 1
    for k in _RES_SI:
        st[k] = rows[:, c].astype(jnp.int32)
        c += 1
    for k in _RES_SU:
        st[k] = rows[:, c].astype(jnp.uint32)
        c += 1
    return st


def _resident_bounce_loop(vp, scene, st0, rays_traced, bounce_core, n):
    """Drive the bounce loop with path state RESIDENT in sorted-compacted
    order: each bounce permutes the wavefront once (live lanes first, then
    by the traversal's spatial sort key) with a single packed row gather,
    and runs the ENTIRE bounce body on the smallest static prefix holding
    the live lanes (nested lax.cond over descending RAY_TILE-multiple
    sizes, as in wavefront._run_cascade). Dead lanes beyond the prefix
    keep their carried state (L, etc.) untouched via concatenation.

    Lane order is restored ONCE after the loop by an inverse-permutation
    row gather keyed on the carried lane ids — the per-sweep full-size
    sort/unsort inside the traversal engines is skipped entirely
    (compact=False there), so every per-bounce cost tracks path
    termination. Returns (st, rays_traced, L, disp_term) with L/disp in
    original lane order."""
    from ..geometry.wavefront import (
        RAY_TILE, _prefix_levels, _run_cascade, ray_sort_keys)

    interp = scene.traversal == "packets_interp"
    lv = vp.resident_levels or (1 if interp else 4)
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    padk = n_pad - n
    if padk:
        st0 = {k: jnp.concatenate(
            [v, jnp.zeros((padk,) + v.shape[1:], v.dtype)])
            for k, v in st0.items()}
        # pad lanes are dead (alive=False already via zeros) but need unit
        # directions (sort keys), their own lane ids (the final inverse
        # permutation must be a bijection), and no medium
        st0["d"] = st0["d"].at[n:].set(1.0)
        st0["lane"] = st0["lane"].at[n:].set(
            jnp.arange(n, n_pad, dtype=jnp.int32))
        st0["med"] = st0["med"].at[n:].set(-1)
    levels = _prefix_levels(n_pad, max_levels=lv)

    def bounce(depth, carry):
        st, rays = carry
        keys = ray_sort_keys(st["o"], st["d"], scene.world_lo, scene.world_hi)
        keys = jnp.minimum(keys, jnp.uint32(0xFFFFFFFE))
        keys = jnp.where(st["alive"], keys, jnp.uint32(0xFFFFFFFF))
        _, order = jax.lax.sort_key_val(
            keys, jnp.arange(n_pad, dtype=jnp.int32))
        srt = _res_unpack(_res_pack(st)[order])

        def run(sz):
            sub = {k: v[:sz] for k, v in srt.items()}
            out, r2 = bounce_core(depth, sub, rays)
            if sz < n_pad:
                out = {k: jnp.concatenate([v, srt[k][sz:]])
                       for k, v in out.items()}
            return out, r2

        if len(levels) > 1:
            live = jnp.sum(srt["alive"].astype(jnp.int32))
            return _run_cascade(live, levels, run)
        return run(n_pad)

    st, rays_traced = jax.lax.fori_loop(
        0, vp.max_depth, bounce, (st0, rays_traced))

    # restore lane order once: inverse permutation + one packed row gather
    inv = jnp.zeros((n_pad,), jnp.int32).at[st["lane"]].set(
        jnp.arange(n_pad, dtype=jnp.int32))
    packed = jnp.concatenate(
        [st["L"], st["disp"].astype(jnp.float32)[:, None]], axis=1)[inv][:n]
    return st, rays_traced, packed[:, 0:4], packed[:, 4] > 0.5


def render_lanes(
    vp: VolPath,
    scene: SceneData,
    camera: PerspectiveCamera,
    filt: FilterSampler,
    sample_idx: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    depth_lo=None,
    depth_hi=None,
    carry_in=None,
    return_carry: bool = False,
):
    """Trace one path for each lane (px, py). The lane set is arbitrary —
    the whole frame on one chip, or a shard of rows under pjit/shard_map.

    Returns (rgb (n, 3), filter_weight (n,), stats dict).

    depth_lo/depth_hi/carry_in/return_carry split the bounce loop across
    MULTIPLE dispatches (render_lanes_segmented): the remote TPU worker
    kills any single dispatch running past ~60 s (PERF.md round-5
    bisect), which a depth-32 volumetric frame at full resolution
    exceeds. The bounds are traced scalars, so one compiled segment
    function serves every segment. Plain (non-resident) mode only."""
    w, h = camera.resolution
    n = px.shape[0]
    si = jnp.broadcast_to(jnp.asarray(sample_idx, jnp.uint32), (n,))

    zcfg = sb.make_zsobol(w, h, max(vp.samples_per_pixel, 1), seed=vp.seed)

    # camera stage (vp_generate_camera_rays_kernel!, volpath.jl:125-205)
    ps = sb.compute_pixel_sample(zcfg, px, py, si)
    offset, filter_w = filter_sample(filt, ps.jitter)
    p_film = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + 0.5 + offset
    wl = sp.sample_wavelengths_visible(ps.wavelength_u)
    o, d = camera.generate_rays(
        CameraSample(p_film=p_film, lens=ps.lens, time=ps.time, filter_weight=filter_w)
    )

    # path state (VPRayWorkItem analog, workitems.jl:38-52); every carry is
    # derived from lane data so shard_map varying-axes types line up
    zero = o[..., 0] * 0.0
    rays_traced = jnp.sum(zero)
    lam = wl.lam
    ones4 = 1.0 + jnp.zeros_like(lam)
    n_lights = scene.n_lights

    st0 = dict(
        o=o,
        d=d,
        beta=ones4,
        r_u=ones4,
        r_l=ones4,
        L=jnp.zeros_like(lam),
        alive=zero == 0.0,
        spec=zero == 0.0,  # camera rays count as specular for MIS
        eta=1.0 + zero,
        anyns=zero != 0.0,
        med=zero.astype(jnp.int32) + scene.camera_medium,
        prev_p=o,  # last real scattering vertex (for area-light pdf)
        prev_ns=jnp.zeros_like(o),  # its shading normal (BVH pmf replay)
        disp=zero != 0.0,  # secondary wavelengths terminated (dispersion)
        lam=lam,
        px=px.astype(jnp.uint32),
        py=py.astype(jnp.uint32),
        si=si,
        lane=jnp.arange(n, dtype=jnp.int32) + zero.astype(jnp.int32),
    )

    # resident mode: the bounce body runs on a live-compacted sorted prefix
    # (see VolPath.resident); the traversal engines then skip their own
    # internal prefix cascade (compact=False)
    # resident 'auto' resolves OFF: the hardware A/B (r3 phase 1, one v5e,
    # 800x800 bench) measured resident=on at 1.476 Mray/s vs off at 2.651 —
    # the one-permutation-per-bounce thesis loses to the engines' internal
    # sort until the bounce-body fixed costs shrink. Request 'on' explicitly
    # to re-test.
    use_resident = vp.resident == "on"
    trav_compact = False if use_resident else None

    def bounce_core(depth, st, rays_traced):
        """One bounce over an arbitrary-size lane subset `st` (the whole
        wavefront, or a live-compacted sorted prefix of it)."""
        (o, d, beta, r_u, r_l, L, alive, specular, eta_scale, any_nonspec,
         medium_idx, prev_p, prev_ns, disp_term) = (
            st["o"], st["d"], st["beta"], st["r_u"], st["r_l"], st["L"],
            st["alive"], st["spec"], st["eta"], st["anyns"], st["med"],
            st["prev_p"], st["prev_ns"], st["disp"])
        lam, px, py, si = st["lam"], st["px"], st["py"], st["si"]
        n = o.shape[0]
        zero = o[..., 0] * 0.0

        t_max = jnp.full((n,), jnp.inf, jnp.float32) + zero
        rays_traced = rays_traced + jnp.sum(alive.astype(jnp.float32))
        rec = _closest_hit_surface(scene, o, d, t_max, alive,
                                   compact=trav_compact,
                                   presorted=use_resident)
        t_hit = jnp.where(rec.hit, rec.t, t_max)

        # --- volumetric segment: delta tracking up to the surface
        if scene.has_media:
            in_medium = alive & (medium_idx >= 0)
            dt = ms.delta_track(
                scene.media, scene.rgb2spec, medium_idx, o, d, t_hit, lam,
                beta, r_u, r_l, in_medium,
                max_depth_hit=jnp.broadcast_to(depth >= vp.max_depth - 1, (n,)),
            )
            L = L + dt.L_emit
            beta, r_u, r_l = dt.beta, dt.r_u, dt.r_l
            scattered = in_medium & (dt.status == ms.SCATTERED)
            absorbed = in_medium & (dt.status == ms.ABSORBED)
            alive = alive & ~absorbed
            p_scatter = dt.p_scatter
            g_scatter = dt.g
            # deflected media bend the ray at null events; the carried
            # direction feeds the env lookup and phase frame
            # (delta-tracking.jl:442 + escaped-ray handling)
            d_med = jnp.where(in_medium[..., None], dt.d_out, d)
        else:
            scattered = zero != 0.0
            p_scatter = o
            g_scatter = zero
            d_med = d

        reach = alive & ~scattered  # lanes that reach the surface / escape

        # --- escaped rays: environment + ambient (intersection.jl:622-677)
        escaped = reach & ~rec.hit
        if scene.lights.has_env:
            le_env, pdf_env = lt.env_radiance(scene.lights, scene.rgb2spec, d_med, lam)
            # pmf of selecting the env light (flat list tail)
            if scene.light_sampler == "bvh":
                from ..lights.bvh_sampler import bvh_pmf

                pmf_env = bvh_pmf(
                    scene.light_bvh, prev_p, prev_ns,
                    jnp.full_like(medium_idx, scene.lights.n_flat - 1),
                )
            else:
                pmf_env = scene.lights.pmf[scene.lights.n_flat - 1]
            r_l_hat = r_l * (pdf_env * pmf_env)[..., None]
            denom = jnp.where(
                specular | (not vp.nee), jnp.mean(r_u, -1),
                jnp.mean(r_u + r_l_hat, -1),
            )
            contrib = beta * le_env / jnp.maximum(denom[..., None], 1e-12)
            L = L + jnp.where((escaped & (denom > 0.0))[..., None], contrib, 0.0)
        amb = scene.lights.ambient_l
        if int(amb.shape[0]) > 0:
            amb_rgb = jnp.sum(amb, axis=0)
            le_amb = lt._illum(scene.rgb2spec, amb_rgb, lam)
            has_amb = jnp.any(amb_rgb > 0.0)
            contrib = beta * le_amb / jnp.maximum(jnp.mean(r_u, -1)[..., None], 1e-12)
            L = L + jnp.where((escaped & has_amb)[..., None], contrib, 0.0)
        alive = alive & (rec.hit | scattered)

        # --- surface interaction (vp_process_surface_hits_kernel!)
        sd = _surface_data(scene, rec, o, d, camera)
        hit = reach & rec.hit
        wo = -d
        is_interface = sd["mat_type"] == mt.INTERFACE

        # --- area-light emission with MIS (surface-eval.jl:147-237)
        if mt.EMISSIVE in scene.present_materials:
            is_emitter = hit & (sd["arealight"] >= 0)
            cos_wo = dot(sd["ng"], wo)
            le = mb.emitted_radiance(
                scene.materials, jnp.maximum(sd["mat_idx"], 0), scene.rgb2spec,
                lam, cos_wo, sd["tex"],
            )
            area_flat = jnp.clip(
                scene.lights.area_flat_base + sd["arealight"], 0,
                scene.lights.pmf.shape[0] - 1,
            )
            if scene.light_sampler == "bvh":
                from ..lights.bvh_sampler import bvh_pmf

                pmf_area = bvh_pmf(scene.light_bvh, prev_p, prev_ns, area_flat)
            else:
                pmf_area = _bl(scene.lights.pmf, area_flat)
            pdf_light = lt.area_light_pdf(
                scene.lights, jnp.maximum(sd["arealight"], 0), prev_p, sd["p"], sd["ng"]
            ) * pmf_area
            r_l_hat = r_l * pdf_light[..., None]
            denom = jnp.where(
                specular | (not vp.nee), jnp.mean(r_u, -1),
                jnp.mean(r_u + r_l_hat, -1),
            )
            contrib = beta * le / jnp.maximum(denom[..., None], 1e-12)
            L = L + jnp.where((is_emitter & (denom > 0.0))[..., None], contrib, 0.0)

        # --- NEE from surfaces and medium-scatter points
        # (surface_direct_lighting_inner! + medium_direct_lighting_inner!)
        if n_lights > 0 and vp.nee:
            nee_surface = hit & ~is_interface
            nee_any = nee_surface | scattered
            ul = sb.path_sample_1d(zcfg, px, py, si, depth, 0)
            ul2 = jnp.stack(sb.path_sample_2d(zcfg, px, py, si, depth, 1), -1)
            p_ref_s = jnp.where(scattered[..., None], p_scatter, sd["p"])
            if scene.light_sampler == "bvh":
                from ..lights.bvh_sampler import bvh_sample_light

                ns_ref = jnp.where(scattered[..., None], 0.0, sd["ns"])
                li_flat, pmf_sel = bvh_sample_light(
                    scene.light_bvh, p_ref_s, ns_ref, ul
                )
            else:
                li_flat, pmf_sel = lt.sample_light_index(scene.lights, ul)
            ltype = _bl(scene.lights.light_type, li_flat)
            lidx = _bl(scene.lights.light_idx, li_flat)
            p_ref = jnp.where(scattered[..., None], p_scatter, sd["p"])
            ls = lt.sample_li(
                scene.lights, scene.rgb2spec, ltype, lidx, p_ref, lam, ul2,
                scene.scene_radius,
            )
            # surface lanes: BSDF f_hat & pdf
            t, b, nrm = make_frame(sd["ns"])
            wo_l = to_local(t, b, nrm, wo)
            wi_l = to_local(t, b, nrm, ls.wi)
            reg = any_nonspec if vp.regularize else None
            u2e = jnp.stack(sb.path_sample_2d(zcfg, px, py, si, depth, 7), -1)
            uce = sb.path_sample_1d(zcfg, px, py, si, depth, 9)
            f_s, pdf_s = _eval_bsdf_dispatch(
                scene, sd["mat_type"], sd["mat_idx"], wo_l, wi_l, lam, reg,
                sd["tex"], u2e, uce, coherence=vp.material_coherence,
            )
            f_hat_s = f_s * jnp.abs(wi_l[..., 2])[..., None]
            # medium lanes: phase function value (= its pdf)
            wo_ph = -jnp.where(scattered[..., None], d_med, d)
            ph = ms.hg_eval(g_scatter, wo_ph, ls.wi)
            f_hat = jnp.where(scattered[..., None], ph[..., None], f_hat_s)
            pdf_b = jnp.where(scattered, ph, pdf_s)

            pdf_l = ls.pdf * pmf_sel
            contrib_ok = (
                nee_any & ls.valid & (pdf_l > 0.0) & jnp.any(f_hat > 0.0, -1)
            )
            o_sh = jnp.where(
                scattered[..., None],
                p_scatter,
                spawn_ray(sd["p"], sd["ng"], ls.wi),
            )
            med_sh = jnp.where(scattered, medium_idx, _crossing_medium(sd, ls.wi))
            rays_traced = rays_traced + jnp.sum(contrib_ok.astype(jnp.float32))
            T_ray, rl_m, ru_m = _trace_shadow(
                scene, o_sh, ls.wi, ls.t_max, med_sh, lam, contrib_ok,
                light_group=li_flat, compact=trav_compact,
            )
            # pbrt SampleLd: r_l' = r_u*pdf_l*rl_m, r_u' = r_u*pdf_b*ru_m
            r_l_sh = r_u * pdf_l[..., None] * rl_m
            r_u_sh = r_u * pdf_b[..., None] * ru_m
            denom = jnp.where(
                ls.is_delta, jnp.mean(r_l_sh, -1), jnp.mean(r_l_sh + r_u_sh, -1)
            )
            ld = beta * f_hat * T_ray * ls.li / jnp.maximum(denom[..., None], 1e-12)
            ok = contrib_ok & (denom > 0.0) & jnp.any(T_ray > 0.0, -1)
            L = L + jnp.where(ok[..., None], ld, 0.0)

        # --- continuation -----------------------------------------------------
        ub = jnp.stack(sb.path_sample_2d(zcfg, px, py, si, depth, 3), -1)
        uc = sb.path_sample_1d(zcfg, px, py, si, depth, 5)

        # surface BSDF sample (evaluate_material_inner!)
        t, b, nrm = make_frame(sd["ns"])
        wo_l = to_local(t, b, nrm, wo)
        reg = any_nonspec if vp.regularize else None
        bs = _sample_bsdf_dispatch(
            scene, sd["mat_type"], sd["mat_idx"], wo_l, lam, ub, uc, reg,
            sd["tex"], coherence=vp.material_coherence,
        )
        wi_surf = to_world(t, b, nrm, bs.wi)
        cos_i = jnp.abs(bs.wi[..., 2])
        thr = bs.f * (cos_i / jnp.maximum(bs.pdf, 1e-12))[..., None]

        # medium HG sample (vp_sample_medium_scatter!, medium-scatter.jl)
        wi_med, pdf_med = ms.hg_sample(
            g_scatter, -jnp.where(scattered[..., None], d_med, d), ub)

        surf_go = hit & ~is_interface & bs.valid & (bs.pdf > 0.0) & jnp.any(thr > 0.0, -1)
        med_go = scattered & (pdf_med > 0.0)
        iface_go = hit & is_interface

        beta = jnp.where(surf_go[..., None], beta * thr, beta)
        # r_l = r_u / pdf (pbrt volpath); phase: pdf cancels with f -> r_u/pdf
        r_l_new_s = r_u / jnp.maximum(bs.pdf, 1e-12)[..., None]
        r_l_new_m = r_u / jnp.maximum(pdf_med, 1e-12)[..., None]
        r_l = jnp.where(
            surf_go[..., None], r_l_new_s,
            jnp.where(med_go[..., None], r_l_new_m, r_l),
        )
        eta_scale = jnp.where(surf_go, eta_scale * bs.eta_scale, eta_scale)
        # dispersion: refracting through a Cauchy/Sellmeier glass makes the
        # hero wavelength the only valid one (pbrt TerminateSecondary)
        if mt.GLASS in scene.present_materials:
            gi = jnp.maximum(sd["mat_idx"], 0)
            dispersive = (
                (sd["mat_type"] == mt.GLASS)
                & ((scene.materials.glass_cauchy[gi] > 0.0)
                   | (scene.materials.glass_sell[gi, 0] > 0.0))
            )
            disp_term = disp_term | (surf_go & bs.transmission & dispersive)
        # interface crossings leave MIS state untouched; medium scatters are
        # never specular
        specular = jnp.where(surf_go, bs.specular, specular)
        specular = jnp.where(med_go, False, specular)
        any_nonspec = any_nonspec | (surf_go & ~bs.specular) | med_go

        # medium transitions (get_medium_index on transmission)
        new_med_surf = jnp.where(
            bs.transmission, _crossing_medium(sd, wi_surf), medium_idx
        )
        new_med_iface = _crossing_medium(sd, d)
        medium_idx = jnp.where(
            surf_go, new_med_surf, jnp.where(iface_go, new_med_iface, medium_idx)
        )

        new_o = jnp.where(
            surf_go[..., None], spawn_ray(sd["p"], sd["ng"], wi_surf),
            jnp.where(
                med_go[..., None], p_scatter,
                jnp.where(iface_go[..., None], sd["p"] + 1e-4 * d, o),
            ),
        )
        new_d = jnp.where(
            surf_go[..., None], wi_surf,
            jnp.where(med_go[..., None], wi_med, d),
        )
        prev_p = jnp.where((surf_go | med_go)[..., None], new_o, prev_p)
        prev_ns = jnp.where(
            surf_go[..., None], sd["ns"],
            jnp.where(med_go[..., None], 0.0, prev_ns),
        )
        o = new_o
        d = new_d
        alive = alive & (surf_go | med_go | iface_go)

        # --- Russian roulette (russian_roulette_spectral); q=1 below rr depth
        u_rr = sb.path_sample_1d(zcfg, px, py, si, depth, 6)
        rr_beta = sp.max_component(beta) * eta_scale / jnp.maximum(
            jnp.mean(r_u, -1), 1e-12
        )
        q = jnp.where(
            depth >= vp.russian_roulette_depth, jnp.clip(rr_beta, 0.0, 0.95), 1.0
        )
        survive = u_rr < q
        beta = jnp.where(
            (alive & survive & (q < 1.0))[..., None],
            beta / jnp.maximum(q, 1e-6)[..., None],
            beta,
        )
        alive = alive & survive

        out = dict(st)
        out.update(o=o, d=d, beta=beta, r_u=r_u, r_l=r_l, L=L, alive=alive,
                   spec=specular, eta=eta_scale, anyns=any_nonspec,
                   med=medium_idx, prev_p=prev_p, prev_ns=prev_ns,
                   disp=disp_term)
        return out, rays_traced

    segmented = (depth_lo is not None or depth_hi is not None
                 or carry_in is not None or return_carry)
    if not use_resident:
        def body(i, carry):
            return bounce_core(i, carry[0], carry[1])

        if carry_in is not None:
            st0, rays_traced = carry_in
        lo = 0 if depth_lo is None else depth_lo
        hi = vp.max_depth if depth_hi is None else depth_hi
        st, rays_traced = jax.lax.fori_loop(lo, hi, body, (st0, rays_traced))
        if return_carry:
            return st, rays_traced
        L = st["L"]
        disp_term = st["disp"]
    else:
        assert not segmented, "depth segmentation requires resident='off'"
        st, rays_traced, L, disp_term = _resident_bounce_loop(
            vp, scene, st0, rays_traced, bounce_core, n)

    # --- film accumulation (vp_accumulate_to_rgb_kernel!, volpath.jl:326-375)
    # dispersion termination: zero the secondary-lambda pdfs and give the
    # hero 4x weight (pbrt SampledWavelengths.TerminateSecondary)
    hero_only = jnp.zeros_like(wl.pdf).at[..., 0].set(0.25)
    pdf_eff = jnp.where(disp_term[..., None], wl.pdf * hero_only, wl.pdf)
    xyz = spectral_to_xyz(L, lam, pdf_eff)
    rgb = xyz_to_linear_srgb(xyz)
    mx = jnp.max(rgb, axis=-1)
    scale = jnp.where(
        mx > vp.max_component_value, vp.max_component_value / jnp.maximum(mx, 1e-12), 1.0
    )
    rgb = rgb * scale[..., None]
    # the reference hard-asserts on non-finite radiance (@real_assert,
    # Hikari.jl:55-62); we sanitize but COUNT, so bugs surface in stats
    # instead of silently vanishing into black pixels
    bad = ~jnp.all(jnp.isfinite(rgb), axis=-1)
    rgb = jnp.nan_to_num(rgb, nan=0.0, posinf=0.0, neginf=0.0)

    return rgb, filter_w, {
        "rays_traced": rays_traced,
        "nonfinite_lanes": jnp.sum(bad.astype(jnp.float32)),
    }


@partial(jax.jit, static_argnames=("vp", "return_carry"),
         donate_argnames=("carry_in",))
def _render_lanes_seg_jit(vp, scene, camera, filt, sample_idx, px, py,
                          depth_lo, depth_hi, carry_in, return_carry):
    return render_lanes(vp, scene, camera, filt, sample_idx, px, py,
                        depth_lo=depth_lo, depth_hi=depth_hi,
                        carry_in=carry_in, return_carry=return_carry)


def render_lanes_segmented(
    vp: VolPath, scene: SceneData, camera: PerspectiveCamera,
    filt: FilterSampler, sample_idx, px, py, n_segments: int,
):
    """render_lanes split into n_segments dispatches over the depth axis.

    Each dispatch runs ceil(max_depth / n_segments) bounces and hands the
    packed path state to the next; the final dispatch finalizes to RGB.
    Use when one full-depth dispatch would exceed the remote worker's
    ~60 s wall-time kill (deep volumetric frames at full resolution —
    PERF.md round-5 bisect). Bit-identical to render_lanes: the segments
    re-enter the same fori body at the carried depth."""
    assert vp.resident != "on", "depth segmentation requires resident off"
    seg = max(1, -(-vp.max_depth // max(n_segments, 1)))
    carry = None
    d0 = 0
    while d0 + seg < vp.max_depth:
        carry = _render_lanes_seg_jit(
            vp, scene, camera, filt, sample_idx, px, py,
            jnp.int32(d0), jnp.int32(d0 + seg), carry, True)
        # sync so each dispatch's wall-time is its own (the watchdog
        # meters the dispatch, not the Python call)
        jax.block_until_ready(carry[1])
        d0 += seg
    return _render_lanes_seg_jit(
        vp, scene, camera, filt, sample_idx, px, py,
        jnp.int32(d0), jnp.int32(vp.max_depth), carry, False)


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
    k = max(1, int(vp.sample_batch))
    for s in range(vp.samples_per_pixel // k):
        film = render_sample_jit(
            vp, scene, camera, film, filt, jnp.uint32(s * k))
    rem = vp.samples_per_pixel % k
    if rem:
        # trailing partial batch: one extra compile at width rem
        import dataclasses

        vp_rem = dataclasses.replace(vp, sample_batch=rem)
        film = render_sample_jit(
            vp_rem, scene, camera, film, filt,
            jnp.uint32(vp.samples_per_pixel - rem))
    return film
