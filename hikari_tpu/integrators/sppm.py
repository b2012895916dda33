"""SPPM: stochastic progressive photon mapping.

Parity with /root/reference/src/integrators/sppm.jl (visible-point pass,
photon tracing, grid-accelerated gathering, progressive radius shrink). The
reference is CPU-oriented with a dynamic spatial hash; the TPU shape here:

- camera pass: one visible point per pixel (first non-specular hit reached
  through <= max_depth specular bounces), plus NEE direct lighting;
- photon pass: a dense wavefront of photons traced from the lights with
  cosine/uniform direction sampling and RGB albedo throughput;
- gather: photons are binned to a uniform grid by sorting; each visible
  point scans its 27 neighbor cells with a bounded per-cell photon budget —
  variable-length lists become (sorted array + searchsorted ranges), the
  scatter/gather-free TPU translation of the reference's grid;
- per-pixel SPPM state (radius^2, N, tau) updated with the standard
  alpha = 2/3 shrink rule.

RGB transport (like the reference's SPPM, which predates the spectral
path); VolPath remains the spectral reference integrator.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..camera.camera import CameraSample, PerspectiveCamera
from ..core.ray import spawn_ray
from ..core.vecmath import dot, make_frame, to_world
from ..lights import types as lt
from ..materials import types as mt
from ..sampling import sobol as sb
from ..sampling.distributions import cosine_sample_hemisphere, uniform_sample_sphere
from ..scene.scene import SceneData
from .preview import _direct_light_rgb, _is_specular_type
from .volpath import _albedo_rgb_dispatch, _surface_data, scene_closest_hit

MAX_PER_CELL = 64  # photon budget a visible point reads per neighbor cell
# cells holding more photons than the budget are handled by reading a
# random subset (sort order within a cell is arbitrary) and scaling by
# count/budget — unbiased, unlike silent truncation


@dataclass(frozen=True)
class SPPM:
    """Config mirrors the reference's SPPM keywords (sppm.jl:1-60)."""

    iterations: int = 8
    photons_per_iteration: int = 65536
    initial_radius: float = 0.1
    alpha: float = 2.0 / 3.0
    max_depth: int = 5
    seed: int = 0


def _visible_points(scene, camera, zcfg, sample_idx, max_depth):
    """Camera pass: (p, ns, beta_rgb, valid, direct_rgb) per pixel."""
    w, h = camera.resolution
    n = w * h
    lanes = jnp.arange(n, dtype=jnp.uint32)
    px = lanes % w
    py = lanes // w
    si = jnp.broadcast_to(sample_idx, (n,))
    ps = sb.compute_pixel_sample(zcfg, px, py, si)
    p_film = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + \
        0.5 + (ps.jitter - 0.5)
    o, d = camera.generate_rays(
        CameraSample(p_film=p_film, lens=ps.lens, time=ps.time,
                     filter_weight=jnp.ones((n,)))
    )
    beta = jnp.ones((n, 3))
    searching = jnp.ones((n,), bool)
    vp_p = jnp.zeros((n, 3))
    vp_ns = jnp.zeros((n, 3))
    vp_valid = jnp.zeros((n,), bool)
    direct = jnp.zeros((n, 3))

    for depth in range(max_depth):
        rec = scene_closest_hit(scene, o, d, jnp.full((n,), jnp.inf), active=searching)
        hit = searching & rec.hit
        sd = _surface_data(scene, rec, o, d)
        flip = dot(sd["ns"], d) > 0.0
        ns = jnp.where(flip[..., None], -sd["ns"], sd["ns"])
        albedo = _albedo_rgb_dispatch(scene, sd["mat_type"], sd["mat_idx"], sd["tex"])

        spec = _is_specular_type(sd["mat_type"])
        diffuse = hit & ~spec & (sd["mat_type"] != mt.EMISSIVE)
        vp_p = jnp.where(diffuse[..., None], sd["p"], vp_p)
        vp_ns = jnp.where(diffuse[..., None], ns, vp_ns)
        vp_valid = vp_valid | diffuse

        u2 = jnp.stack(
            sb.path_sample_2d(zcfg, px, py, si, depth, 0), -1
        )
        ul = sb.path_sample_1d(zcfg, px, py, si, depth, 10)
        direct = direct + beta * _direct_light_rgb(
            scene, sd["p"], ns, albedo, ul, u2, diffuse
        )

        cont = hit & spec
        from ..core.vecmath import reflect

        wi = reflect(-d, ns)
        o = jnp.where(cont[..., None], spawn_ray(sd["p"], sd["ng"], wi), o)
        d = jnp.where(cont[..., None], wi, d)
        beta = jnp.where(cont[..., None], beta * jnp.clip(albedo, 0.0, 1.0), beta)
        searching = cont

    # photon-pass throughput at the visible point includes its albedo/pi BRDF
    return vp_p, vp_ns, beta, vp_valid, direct


def _trace_photons(scene, zcfg, it, n_photons, max_depth, key):
    """Photon pass: returns (pos (P,3), power_rgb (P,3), normal (P,3),
    valid (P,)) deposit events — one deposit per diffuse bounce.

    Photons carry SPECTRAL power at the fixed preview wavelengths and
    bounce through the real BSDF samplers (_sample_bsdf_dispatch), so
    glossy-conductor and rough-glass caustics are distributed by the true
    microfacet lobes — reference photons bounce via sample_f
    (sppm.jl:217,447). Power converts to RGB once, at deposit time."""
    from .preview import _PREVIEW_LAM, _preview_spec_to_rgb
    from .volpath import _sample_bsdf_dispatch

    kp = jax.random.fold_in(key, it)
    u_sel = jax.random.uniform(jax.random.fold_in(kp, 0), (n_photons,))
    li_flat, pmf = lt.sample_light_index(scene.lights, u_sel)
    ltype = scene.lights.light_type[li_flat]
    lidx = scene.lights.light_idx[li_flat]
    banks = scene.lights
    lam4 = jnp.tile(jnp.asarray([list(_PREVIEW_LAM)], jnp.float32),
                    (n_photons, 1))

    # emission point + direction per light type (point / spot / area;
    # distant & env photons are launched from the scene bound)
    u2a = jax.random.uniform(jax.random.fold_in(kp, 1), (n_photons, 2))
    u2b = jax.random.uniform(jax.random.fold_in(kp, 2), (n_photons, 2))

    # point: uniform sphere
    p_pt = banks.point_pos[lidx % banks.point_pos.shape[0]]
    d_pt = uniform_sample_sphere(u2a)
    pow_pt = lt._illum(
        scene.rgb2spec, banks.point_i[lidx % banks.point_i.shape[0]], lam4
    ) * (4.0 * jnp.pi)

    # area: cosine hemisphere about the face normal
    ai = lidx % banks.area_p0.shape[0]
    from ..geometry.triangle import sample_triangle

    p_ar, _, _ = sample_triangle(
        u2a[:, 0], u2a[:, 1], banks.area_p0[ai], banks.area_p1[ai], banks.area_p2[ai]
    )
    n_ar = banks.area_n[ai]
    t, b, nrm = make_frame(n_ar)
    d_ar = to_world(t, b, nrm, cosine_sample_hemisphere(u2b))
    pow_ar = lt._illum(scene.rgb2spec, banks.area_le[ai], lam4) * (
        jnp.pi * banks.area_area[ai]
    )[..., None]

    is_area = ltype == lt.AREA
    p0 = jnp.where(is_area[..., None], p_ar, p_pt)
    d0 = jnp.where(is_area[..., None], d_ar, d_pt)
    power = jnp.where(is_area[..., None], pow_ar, pow_pt)
    power = power / jnp.maximum(pmf, 1e-9)[..., None] / n_photons
    alive = (ltype == lt.POINT) | is_area

    dep_p = []
    dep_pow = []
    dep_n = []
    dep_ok = []
    o = spawn_ray(p0, d0, d0)
    d = d0
    for depth in range(max_depth):
        rec = scene_closest_hit(scene, o, d, jnp.full((n_photons,), jnp.inf),
                                active=alive)
        hit = alive & rec.hit
        sd = _surface_data(scene, rec, o, d)
        flip = dot(sd["ns"], d) > 0.0
        ns = jnp.where(flip[..., None], -sd["ns"], sd["ns"])
        spec = _is_specular_type(sd["mat_type"])
        diffuse = hit & ~spec & (sd["mat_type"] != mt.EMISSIVE)

        # deposit only from depth >= 1 (direct lighting is handled by NEE)
        if depth > 0:
            dep_p.append(sd["p"])
            # clamp: the least-squares 3x4 spectral->RGB map can produce
            # small negative components; negative photon energy would
            # locally darken the gather below zero
            dep_pow.append(jnp.maximum(_preview_spec_to_rgb(power), 0.0))
            dep_n.append(ns)
            dep_ok.append(diffuse)

        # continue through the REAL BSDF sample at the photon's fixed
        # wavelengths (reference sppm.jl:217,447 bounces via sample_f).
        # Note: samplers are radiance-mode; the eta^2 importance-transport
        # asymmetry of refraction is not corrected (RGB-preview-grade, as
        # in the reference's RGB SPPM).
        u2 = jax.random.uniform(jax.random.fold_in(kp, 10 + depth), (n_photons, 2))
        uc = jax.random.uniform(jax.random.fold_in(kp, 70 + depth), (n_photons,))
        u_rr = jax.random.uniform(jax.random.fold_in(kp, 40 + depth), (n_photons,))
        t, b, nrm = make_frame(ns)
        wo_l = -jnp.stack([dot(d, t), dot(d, b), dot(d, nrm)], -1)
        bs = _sample_bsdf_dispatch(
            scene, sd["mat_type"], sd["mat_idx"], wo_l, lam4, u2, uc, None,
            sd["tex"],
        )
        wi = to_world(t, b, nrm, bs.wi)
        thr = bs.f * (jnp.abs(bs.wi[..., 2]) /
                      jnp.maximum(bs.pdf, 1e-9))[..., None]
        thr = jnp.where(bs.valid[..., None], thr, 0.0)
        # RR on throughput luminance
        q = jnp.clip(thr.mean(-1), 0.05, 1.0)
        survive = u_rr < q
        power = power * thr / jnp.maximum(q, 1e-6)[..., None]
        o = jnp.where(hit[..., None], spawn_ray(sd["p"], sd["ng"], wi), o)
        d = jnp.where(hit[..., None], wi, d)
        alive = hit & survive & jnp.any(thr > 0.0, -1)

    return (
        jnp.concatenate(dep_p), jnp.concatenate(dep_pow),
        jnp.concatenate(dep_n), jnp.concatenate(dep_ok),
    )


def _gather(vp_p, vp_ns, vp_valid, r2, ph_p, ph_pow, ph_n, ph_ok,
            world_lo, cell_size, grid_res):
    """Sorted-grid photon gather: each visible point scans 27 neighbor
    cells; photons sorted by cell id with searchsorted ranges."""
    def cell_of(p):
        c = jnp.floor((p - world_lo) / cell_size).astype(jnp.int32)
        return jnp.clip(c, 0, grid_res - 1)

    ph_c = cell_of(ph_p)
    ph_cid = (ph_c[:, 2] * grid_res + ph_c[:, 1]) * grid_res + ph_c[:, 0]
    ph_cid = jnp.where(ph_ok, ph_cid, jnp.int32(grid_res ** 3))  # park invalid
    order = jnp.argsort(ph_cid)
    ph_cid_s = ph_cid[order]
    ph_p_s = ph_p[order]
    ph_pow_s = ph_pow[order]
    ph_n_s = ph_n[order]

    vp_c = cell_of(vp_p)
    offsets = jnp.asarray(
        [(dx, dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)], jnp.int32,
    )  # (27, 3)

    def step(i, acc):
        tau_add, m_add = acc
        nb = i // MAX_PER_CELL
        k = i % MAX_PER_CELL
        nc = jnp.clip(vp_c + offsets[nb], 0, grid_res - 1)
        cid = (nc[:, 2] * grid_res + nc[:, 1]) * grid_res + nc[:, 0]
        start = jnp.searchsorted(ph_cid_s, cid)
        # over-full cells: the budget reads an arbitrary subset, so scale
        # by count/budget to stay unbiased (reference grid is unbounded)
        count = jnp.searchsorted(ph_cid_s, cid, side="right") - start
        scale = jnp.maximum(count.astype(jnp.float32) / MAX_PER_CELL, 1.0)
        j = jnp.minimum(start + k, ph_cid_s.shape[0] - 1)
        in_cell = ph_cid_s[j] == cid
        dist2 = jnp.sum((ph_p_s[j] - vp_p) ** 2, -1)
        same_side = jnp.sum(ph_n_s[j] * vp_ns, -1) > 0.0
        ok = vp_valid & in_cell & (dist2 <= r2) & same_side
        tau_add = tau_add + jnp.where(ok[..., None], ph_pow_s[j] * scale[..., None], 0.0)
        m_add = m_add + ok.astype(jnp.float32) * scale
        return tau_add, m_add

    tau_add, m_add = jax.lax.fori_loop(
        0, 27 * MAX_PER_CELL, step,
        (jnp.zeros_like(vp_p), jnp.zeros(vp_p.shape[0])),
    )
    return tau_add, m_add


@partial(jax.jit, static_argnums=(0,))
def _sppm_iteration(integ: SPPM, scene: SceneData, camera: PerspectiveCamera,
                    state, it):
    w, h = camera.resolution
    zcfg = sb.make_zsobol(w, h, max(integ.iterations, 1), seed=integ.seed)
    key = jax.random.PRNGKey(integ.seed)

    vp_p, vp_ns, vp_beta, vp_valid, direct = _visible_points(
        scene, camera, zcfg, it.astype(jnp.uint32), integ.max_depth
    )
    ph_p, ph_pow, ph_n, ph_ok = _trace_photons(
        scene, zcfg, it, integ.photons_per_iteration, integ.max_depth, key
    )

    ext = jnp.maximum(scene.world_hi - scene.world_lo, 1e-6)
    cell = jnp.maximum(jnp.sqrt(state["r2"]).max(), 1e-4)
    grid_res = 64
    cell_size = jnp.maximum(ext.max() / grid_res, cell)

    tau_add, m = _gather(
        vp_p, vp_ns, vp_valid, state["r2"], ph_p, ph_pow, ph_n, ph_ok,
        scene.world_lo, cell_size, grid_res,
    )

    # SPPM progressive radius/flux update (sppm.jl pixel updates)
    n_old = state["n"]
    has = m > 0.0
    n_new = jnp.where(has, n_old + integ.alpha * m, n_old)
    ratio = jnp.where(has, n_new / jnp.maximum(n_old + m, 1e-6), 1.0)
    r2_new = state["r2"] * ratio
    # albedo/pi BRDF at the visible point folded into beta at display time
    tau_new = (state["tau"] + vp_beta * tau_add) * ratio[..., None]
    return dict(
        r2=r2_new, n=n_new, tau=tau_new,
        direct=state["direct"] + direct,
        iters=state["iters"] + 1,
    )


def render_sppm(integ: SPPM, scene: SceneData, camera: PerspectiveCamera):
    """Full SPPM render -> (H, W, 3) linear RGB."""
    w, h = camera.resolution
    n = w * h
    state = dict(
        r2=jnp.full((n,), integ.initial_radius ** 2),
        n=jnp.zeros((n,)),
        tau=jnp.zeros((n, 3)),
        direct=jnp.zeros((n, 3)),
        iters=jnp.zeros((), jnp.int32),
    )
    for it in range(integ.iterations):
        state = _sppm_iteration(integ, scene, camera, state, jnp.int32(it))

    n_iter = integ.iterations
    n_photons_total = n_iter * integ.photons_per_iteration
    # L = tau / (N_emitted * pi r^2); photon power already divided per
    # iteration, so scale by 1/iterations
    indirect = state["tau"] / (
        n_iter * jnp.pi * jnp.maximum(state["r2"], 1e-12)
    )[..., None]
    img = state["direct"] / n_iter + indirect
    return img.reshape(h, w, 3)
