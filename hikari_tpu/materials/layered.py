"""LayeredBxDF: stochastic random-walk evaluation of coated materials.

Parity with /root/reference/src/materials/spectral-eval.jl:827-3448
(CoatedDiffuse / CoatedConductor via the pbrt-v4 LayeredBxDF algorithm): a
dielectric interface sits above an opaque bottom layer (diffuse or
conductor) with an optional absorbing/scattering medium of optical
`thickness`, HG asymmetry `g`, and single-scattering `albedo` in between.
Sampling simulates the light transport between the two layers with a
bounded per-lane random walk; evaluation runs the same walk but connects to
the query direction at every bottom vertex (pbrt's stochastic f()).

TPU shape: the walk is one lax.fori_loop over MAX_WALK steps with per-lane
live masks — all lanes advance in lockstep, exited lanes idle. RNG is a
per-lane PCG32 seeded from the integrator's sampler draws, so renders stay
deterministic per (pixel, sample).

Conventions: local shading frame, z up; wo/wi point away from the surface.
Like pbrt we return *premultiplied* samples: BSDFSample.f is constructed as
weight * pdf_approx / cos so the integrator's f*cos/pdf reproduces the true
walk estimate, while pdf_approx is used only for MIS weighting (approximate
MIS pdfs keep the estimator unbiased, only mildly suboptimal).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.lookup import bank_lookup as _bl

from ..core.vecmath import abs_cos_theta
from ..sampling.distributions import cosine_sample_hemisphere
from ..spectral.rgb2spec import coeff4_eval, rgb_albedo_eval
from .bsdf import (
    INV_PI, BSDFSample, dielectric_interface_f, dielectric_interface_sample,
    _albedo_spec, _sample_dense_spectrum, _tex_rgb,
)
from .fresnel import fresnel_conductor
from .microfacet import (
    effectively_smooth, tr_d, tr_g, tr_pdf, tr_sample_wm,
)

MAX_WALK = 10  # pbrt LayeredBxDF maxDepth default


# --- tiny per-lane RNG (LCG; decorrelated from the path sampler) ---------------


def _rng_init(u2, uc):
    a = jax.lax.bitcast_convert_type(u2[..., 0] + 1.0, jnp.uint32)
    b = jax.lax.bitcast_convert_type(u2[..., 1] + 2.0, jnp.uint32)
    c = jax.lax.bitcast_convert_type(uc + 3.0, jnp.uint32)
    s = a * jnp.uint32(0x9E3779B9) ^ b * jnp.uint32(0x85EBCA6B) ^ c
    return s | jnp.uint32(1)


def _rng_next(s):
    s = s * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((s >> ((s >> 28) + jnp.uint32(4))) ^ s) * jnp.uint32(277803737)
    word = (word >> 22) ^ word
    u = word.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
    return s, jnp.minimum(u, jnp.float32(1.0 - 2**-24))


def _rng_next2(s):
    s, a = _rng_next(s)
    s, b = _rng_next(s)
    return s, jnp.stack([a, b], -1)


# --- HG phase in the slab -------------------------------------------------------


def _hg_p(g, cos_t):
    g = jnp.clip(g, -0.99, 0.99)
    g2 = g * g
    d = jnp.maximum(1.0 + g2 - 2.0 * g * cos_t, 1e-7)
    return (1.0 - g2) / (4.0 * jnp.pi * d * jnp.sqrt(d))


def _hg_sample_dir(g, w, u2):
    """Sample a new propagation direction around w."""
    from ..core.vecmath import coordinate_system, normalize

    g = jnp.clip(g, -0.99, 0.99)
    iso = jnp.abs(g) < 1e-3
    gs = jnp.where(iso, 0.5, g)
    g2 = gs * gs
    sqr = (1.0 - g2) / (1.0 - gs + 2.0 * gs * u2[..., 0])
    cos_t = jnp.where(
        iso, 1.0 - 2.0 * u2[..., 0],
        jnp.clip((1.0 + g2 - sqr * sqr) / (2.0 * gs), -1.0, 1.0),
    )
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2[..., 1]
    t1, t2 = coordinate_system(w)
    return normalize(
        (sin_t * jnp.cos(phi))[..., None] * t1
        + (sin_t * jnp.sin(phi))[..., None] * t2
        + cos_t[..., None] * w
    )


# --- bottom layers ---------------------------------------------------------------


def _bottom_diffuse_sample(refl4, w_down, u2):
    """Cosine-sample the diffuse bottom. w_down points down (z<0).
    Returns (w_up, weight4): weight = f*cos/pdf = refl."""
    wi = cosine_sample_hemisphere(u2)  # z > 0
    return wi, refl4


def _bottom_diffuse_f(refl4, w_down, wi_up):
    return refl4 * INV_PI


def _bottom_conductor_sample(eta4, k4, ax, ay, w_down, u2):
    """Microfacet conductor bottom. Returns (w_up, weight4, valid)."""
    wo = -w_down  # away from bottom surface, z > 0
    smooth = effectively_smooth(ax, ay)
    # smooth: mirror
    wi_s = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    f_s = fresnel_conductor(jnp.abs(wo[..., 2]), eta4, k4)
    # rough
    wm = tr_sample_wm(wo, u2, ax, ay)
    from ..core.vecmath import reflect, same_hemisphere

    wi_m = reflect(wo, wm)
    ok_m = same_hemisphere(wo, wi_m)
    cos_o = jnp.maximum(abs_cos_theta(wo), 1e-6)
    cos_i = jnp.maximum(abs_cos_theta(wi_m), 1e-6)
    fr = fresnel_conductor(jnp.abs(jnp.sum(wo * wm, -1)), eta4, k4)
    d = tr_d(wm, ax, ay)
    g_ = tr_g(wo, wi_m, ax, ay)
    pdf_m = tr_pdf(wo, wm, ax, ay) / (
        4.0 * jnp.maximum(jnp.abs(jnp.sum(wo * wm, -1)), 1e-8)
    )
    w_m = fr * (d * g_ / (4.0 * cos_o * cos_i) * cos_i / jnp.maximum(pdf_m, 1e-12))[..., None]
    wi = jnp.where(smooth[..., None], wi_s, wi_m)
    weight = jnp.where(smooth[..., None], f_s, w_m)
    valid = jnp.where(smooth, wo[..., 2] > 1e-6, ok_m & (pdf_m > 1e-12))
    return wi, jnp.where(valid[..., None], weight, 0.0), valid


def _bottom_dt_sample(refl4, trans4, w_down, u2, uc):
    """Diffuse-transmission bottom (CoatedDiffuseTransmission): reflect up
    with probability p_refl, else transmit down *through* the bottom layer
    (the walk then exits the material). weight = f*cos/pdf of the chosen
    lobe (pbrt DiffuseTransmissionBxDF::Sample_f)."""
    pr = jnp.maximum(jnp.max(refl4, -1), 1e-9)
    pt = jnp.maximum(jnp.max(trans4, -1), 0.0)
    p_refl = pr / (pr + pt)
    choose_r = uc < p_refl
    wi = cosine_sample_hemisphere(u2)  # z > 0
    sgn_z = jnp.where(choose_r, 1.0, -1.0)
    wi = wi * jnp.stack([jnp.ones_like(sgn_z), jnp.ones_like(sgn_z), sgn_z], -1)
    weight = jnp.where(
        choose_r[..., None],
        refl4 / p_refl[..., None],
        trans4 / jnp.maximum(1.0 - p_refl, 1e-9)[..., None],
    )
    return wi, weight, jnp.ones(w_down.shape[:-1], bool)


def _bottom_dt_f(refl4, trans4, w_down, wi):
    """f of the diffuse-transmission bottom: wi up = reflection lobe, wi
    down = transmission lobe (both Lambertian)."""
    up = wi[..., 2] > 0.0
    return jnp.where(up[..., None], refl4, trans4) * INV_PI


def _bottom_diffuse_pdf(w_down, wi):
    """Solid-angle pdf of the cosine-sampled diffuse bottom."""
    return jnp.maximum(wi[..., 2], 0.0) * INV_PI


def _bottom_dt_pdf(refl4, trans4, w_down, wi):
    """pdf of the two-lobe diffuse-transmission bottom (lobe choice by
    max-component probability, each lobe cosine-distributed)."""
    pr = jnp.maximum(jnp.max(refl4, -1), 1e-9)
    pt = jnp.maximum(jnp.max(trans4, -1), 0.0)
    p_refl = pr / (pr + pt)
    cos_pdf = jnp.abs(wi[..., 2]) * INV_PI
    return jnp.where(wi[..., 2] > 0.0, p_refl * cos_pdf,
                     (1.0 - p_refl) * cos_pdf)


def _bottom_conductor_pdf(ax, ay, w_down, wi):
    """pdf of the microfacet conductor bottom (zero when smooth: delta)."""
    wo = -w_down
    smooth = effectively_smooth(ax, ay)
    wm_raw = wo + wi
    ln = jnp.linalg.norm(wm_raw, axis=-1, keepdims=True)
    wm = wm_raw / jnp.maximum(ln, 1e-9)
    wm = jnp.where(wm[..., 2:3] < 0.0, -wm, wm)
    pdf = tr_pdf(wo, wm, ax, ay) / (
        4.0 * jnp.maximum(jnp.abs(jnp.sum(wo * wm, -1)), 1e-8)
    )
    ok = ~smooth & (ln[..., 0] > 1e-9) & (wo[..., 2] > 0) & (wi[..., 2] > 0)
    return jnp.where(ok, pdf, 0.0)


def _bottom_conductor_f(eta4, k4, ax, ay, w_down, wi_up):
    """f of the conductor bottom for NEE connections (zero when smooth)."""
    wo = -w_down
    smooth = effectively_smooth(ax, ay)
    wm_raw = wo + wi_up
    ln = jnp.linalg.norm(wm_raw, axis=-1, keepdims=True)
    wm = wm_raw / jnp.maximum(ln, 1e-9)
    wm = jnp.where(wm[..., 2:3] < 0.0, -wm, wm)
    cos_o = jnp.maximum(abs_cos_theta(wo), 1e-6)
    cos_i = jnp.maximum(abs_cos_theta(wi_up), 1e-6)
    fr = fresnel_conductor(jnp.abs(jnp.sum(wo * wm, -1)), eta4, k4)
    d = tr_d(wm, ax, ay)
    g_ = tr_g(wo, wi_up, ax, ay)
    f = fr * (d * g_ / (4.0 * cos_o * cos_i))[..., None]
    ok = ~smooth & (ln[..., 0] > 1e-9) & (wo[..., 2] > 0) & (wi_up[..., 2] > 0)
    return jnp.where(ok[..., None], f, 0.0)


# --- the layered walk -------------------------------------------------------------


def _slab_transit(rng, w, thick, albedo4, g, beta):
    """Advance across the slab: either pass to the other interface (with
    exponential-sampled absorption/scattering) or scatter inside.

    Returns (rng, w, beta, crossed: bool). sigma_t = 1 in optical units, so
    a crossing covers tau = thick/|w_z|; P(pass) = exp(-tau) is realized by
    sampling the free-flight distance."""
    has_med = jnp.any(albedo4 > 0.0, axis=-1)
    tau = thick / jnp.maximum(jnp.abs(w[..., 2]), 1e-6)
    rng, u = _rng_next(rng)
    t_free = -jnp.log1p(-u)
    scatter = has_med & (t_free < tau)
    rng, u2 = _rng_next2(rng)
    w_new = _hg_sample_dir(g, w, u2)
    w = jnp.where(scatter[..., None], w_new, w)
    beta = jnp.where(scatter[..., None], beta * albedo4, beta)
    # without a scattering medium the slab is a pure absorber
    beta = jnp.where((~has_med)[..., None], beta * jnp.exp(-tau)[..., None], beta)
    return rng, w, beta, ~scatter


def layered_sample(
    wo, lam, u2, uc,
    top_eta, top_ax, top_ay,
    thick, albedo4, g,
    bottom_sample,  # fn(w_down, u2, uc) -> (w_new, weight4, valid)
    bottom_pdf=None,  # fn(w_down, wi) -> scalar pdf (for the MIS estimate)
    bottom_smooth=None,
    bottom_exits: bool = False,
) -> BSDFSample:
    """Stochastic LayeredBxDF sample (pbrt Sample_f).

    bottom_exits: the bottom layer transmits (CoatedDiffuseTransmission,
    coated-diffuse-transmission.jl:10 — LayeredBxDF<Dielectric,
    DiffuseTransmission, true>); a bottom sample that continues downward
    exits the material as an overall transmission."""
    n = wo.shape[0]
    flip = wo[..., 2] < 0.0
    sgn = jnp.where(flip, -1.0, 1.0)
    wo_l = wo * jnp.stack([jnp.ones_like(sgn), jnp.ones_like(sgn), sgn], -1)

    s_top = dielectric_interface_sample(wo_l, top_eta, top_ax, top_ay, u2, uc)
    refl_exit = s_top["valid"] & ~s_top["is_trans"]
    entered = s_top["valid"] & s_top["is_trans"]

    rng = _rng_init(u2, uc)
    ones4 = jnp.ones(lam.shape, jnp.float32)

    state = dict(
        rng=rng,
        w=s_top["wi"],                                  # pointing down
        beta=ones4 * s_top["weight"][..., None],
        alive=entered,
        exited=jnp.zeros((n,), bool),
        trans_out=jnp.zeros((n,), bool),
        wi_out=jnp.zeros_like(wo).at[..., 2].set(1.0),
        w_out=jnp.zeros_like(lam),
    )

    def step(_, st):
        rng, w, beta, crossed = _slab_transit(
            st["rng"], st["w"], thick, albedo4, g, st["beta"]
        )
        at_iface = st["alive"] & crossed
        going_down = w[..., 2] < 0.0

        # bottom event
        rng, ub2 = _rng_next2(rng)
        rng, ubc = _rng_next(rng)
        w_b, bw, b_ok = bottom_sample(w, ub2, ubc)
        hit_bottom = at_iface & going_down
        beta = jnp.where(hit_bottom[..., None], beta * bw, beta)
        w = jnp.where(hit_bottom[..., None], w_b, w)
        dead_b = hit_bottom & ~b_ok
        # transmission exit through the bottom layer
        if bottom_exits:
            escape_b = hit_bottom & b_ok & (w_b[..., 2] < 0.0)
        else:
            escape_b = jnp.zeros((n,), bool)

        # top event (from inside): the interface query direction points away
        # from the interface, i.e. opposite the propagation direction
        # (pbrt: interface.Sample_f(-w))
        rng, ut2 = _rng_next2(rng)
        rng, utc = _rng_next(rng)
        s = dielectric_interface_sample(-w, top_eta, top_ax, top_ay, ut2, utc)
        hit_top = at_iface & ~going_down & ~hit_bottom
        escape = hit_top & s["valid"] & s["is_trans"]
        bounce = hit_top & s["valid"] & ~s["is_trans"]
        dead_t = hit_top & ~s["valid"]

        wi_out = jnp.where(escape[..., None], s["wi"], st["wi_out"])
        wi_out = jnp.where(escape_b[..., None], w, wi_out)
        w_out = jnp.where(
            escape[..., None], beta * s["weight"][..., None], st["w_out"]
        )
        w_out = jnp.where(escape_b[..., None], beta, w_out)
        beta = jnp.where(bounce[..., None], beta * s["weight"][..., None], beta)
        w = jnp.where(bounce[..., None], s["wi"], w)

        alive = st["alive"] & ~escape & ~escape_b & ~dead_b & ~dead_t
        # kill fully absorbed lanes
        alive = alive & jnp.any(beta > 1e-9, -1)
        return dict(
            rng=rng, w=w, beta=beta, alive=alive,
            exited=st["exited"] | escape | escape_b,
            trans_out=st["trans_out"] | escape_b,
            wi_out=wi_out, w_out=w_out,
        )

    state = jax.lax.fori_loop(0, MAX_WALK, step, state)

    # --- assemble: reflection exit at the entry interface, or walk exit
    wi_l = jnp.where(refl_exit[..., None], s_top["wi"], state["wi_out"])
    wi = wi_l * jnp.stack([jnp.ones_like(sgn), jnp.ones_like(sgn), sgn], -1)
    cos_i = jnp.maximum(abs_cos_theta(wi_l), 1e-6)

    pdf_a = layered_pdf_stochastic(
        wo_l, wi_l, state["rng"], top_eta, top_ax, top_ay,
        bottom_pdf, bottom_sample, bottom_smooth, two_sided=bottom_exits,
    )
    # premultiplied: f*cos/pdf_a == walk weight
    weight4 = jnp.where(
        refl_exit[..., None],
        jnp.ones_like(state["w_out"]) * s_top["weight"][..., None],
        state["w_out"],
    )
    f = weight4 * (pdf_a / cos_i)[..., None]
    valid = refl_exit | (state["exited"] & jnp.any(state["w_out"] > 0.0, -1))
    shape = valid.shape
    # specular only when the top is smooth AND the sample was the mirror exit
    spec = refl_exit & s_top["specular"]
    return BSDFSample(
        wi=wi, f=f,
        pdf=jnp.where(spec, 1.0, pdf_a),
        specular=spec,
        transmission=state["trans_out"],
        eta_scale=jnp.ones(shape, jnp.float32),
        valid=valid & (pdf_a > 1e-9),
    )


def _power_heuristic(pf, pg):
    f2 = pf * pf
    return jnp.where(f2 > 0.0, f2 / jnp.maximum(f2 + pg * pg, 1e-30), 0.0)


def layered_pdf_stochastic(
    wo_l, wi_l, rng,
    top_eta, top_ax, top_ay,
    bottom_pdf, bottom_sample, bottom_smooth=None,
    two_sided=False,
):
    """Stochastic solid-angle pdf for MIS — pbrt LayeredBxDF::PDF
    (reference spectral-eval.jl:827+ wraps the same estimator): a one-sample
    TRT estimate blended 0.9/0.1 with the uniform-sphere pdf.

    Terms (reflection query, wo/wi same hemisphere):
      R   — the top interface's own reflection pdf (deterministic; zero
            for a smooth top, whose delta lobe carries no MIS pdf).
      TRT — refract wo and wi through the top interface (the lobe choice
            is forced to transmission, matching pbrt's
            Sample_f(..., Transmission); near-TIR lanes fail like pbrt's
            rejected samples) and combine the bottom pdf between the
            refracted directions with the top-exit pdf of a sampled
            bottom bounce via the power heuristic. A delta bottom
            (smooth conductor) uses the top-exit pdf alone.
    Transmission query (two_sided, opposite hemispheres): the bottom layer
    is the exit interface, so the bottom lobe's pdf between the
    entry-refracted direction and wi stands in for pbrt's z==exitZ branch.

    bottom_pdf(w_down, wi) -> scalar solid-angle pdf; bottom_sample as in
    layered_sample; bottom_smooth: per-lane bool marking delta bottoms.
    The sampled-lobe pdfs keep their Fresnel lobe-probability factor (pbrt
    strips it for forced-transmission draws); the discrepancy only
    perturbs the power-heuristic weights of an already-approximate MIS
    pdf."""
    same = wo_l[..., 2] * wi_l[..., 2] > 0.0
    shape = same.shape

    # R term
    _, pdf_top = dielectric_interface_f(wo_l, wi_l, top_eta, top_ax, top_ay)
    pdf_sum = jnp.where(same, pdf_top, 0.0)

    # transmission-forced refractions of wo and wi through the top
    force_t = jnp.full(shape, 0.999999, jnp.float32)
    rng, uo2 = _rng_next2(rng)
    so = dielectric_interface_sample(wo_l, top_eta, top_ax, top_ay, uo2, force_t)
    o_ok = so["valid"] & so["is_trans"]
    w_o = so["wi"]                      # points down into the slab
    # callers flip wo_l into the upper hemisphere, so a same-hemisphere wi
    # is already up; the transmission query (wi below) never reads si
    wi_q = jnp.where((wi_l[..., 2] < 0.0)[..., None], -wi_l, wi_l)
    rng, ui2 = _rng_next2(rng)
    si = dielectric_interface_sample(wi_q, top_eta, top_ax, top_ay, ui2, force_t)
    i_ok = si["valid"] & si["is_trans"]
    w_i = si["wi"]                      # points down (refracted from wi side)

    # TRT: bottom pdf between the refracted directions ...
    r_pdf = bottom_pdf(w_o, -w_i)
    # ... MIS-combined with the top-exit pdf of a sampled bottom bounce
    rng, ub2 = _rng_next2(rng)
    rng, ubc = _rng_next(rng)
    w_b, _, b_ok = bottom_sample(w_o, ub2, ubc)
    rs_pdf = bottom_pdf(w_o, w_b)
    _, t_pdf = dielectric_interface_f(-w_b, wi_q, top_eta, top_ax, top_ay)
    smooth_top = effectively_smooth(top_ax, top_ay)
    if bottom_smooth is None:
        bottom_smooth = jnp.zeros(shape, bool)
    trt = jnp.where(
        smooth_top,
        # smooth top: the exit refraction is deterministic — the bottom
        # pdf between the two refracted directions IS the TRT pdf
        r_pdf,
        jnp.where(
            bottom_smooth,
            # delta bottom: only the top-exit channel has a pdf
            jnp.where(b_ok, t_pdf, 0.0),
            _power_heuristic(si["pdf"], r_pdf) * r_pdf
            + jnp.where(b_ok, _power_heuristic(rs_pdf, t_pdf) * t_pdf, 0.0),
        ),
    )
    pdf_sum = pdf_sum + jnp.where(same & o_ok & i_ok, trt, 0.0)

    if two_sided:
        # transmission query: exit through the bottom layer
        tt = jnp.where(o_ok, bottom_pdf(w_o, wi_l), 0.0)
        pdf_sum = pdf_sum + jnp.where(~same, tt, 0.0)

    out = 0.9 * pdf_sum + 0.1 / (4.0 * jnp.pi)
    if two_sided:
        return out
    return jnp.where(same, out, 0.0)


def layered_f(
    wo, wi, lam, u2, uc,
    top_eta, top_ax, top_ay,
    thick, albedo4, g,
    bottom_sample, bottom_f,
    bottom_pdf=None, bottom_smooth=None,
    bottom_exits: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stochastic (f, pdf) for NEE MIS (pbrt LayeredBxDF::f).

    Runs an entry walk from wo; at every bottom vertex connects through the
    top interface to wi via a sampled exit channel. With a smooth top the
    interface f is a delta, so the single-scatter top term vanishes and the
    connection uses the deterministic refraction channel implicitly through
    bottom_sample-driven exits — matching pbrt, those terms are then covered
    by BSDF sampling instead and f returns only the rough-top contribution.

    bottom_exits: the bottom layer transmits; for a wi in the hemisphere
    opposite wo the bottom layer IS the exit interface, so every bottom
    vertex connects directly through its transmission lobe (pbrt's
    `z == exitZ` branch of LayeredBxDF::f).
    """
    n = wo.shape[0]
    flip = wo[..., 2] < 0.0
    sgn = jnp.where(flip, -1.0, 1.0)
    mul = jnp.stack([jnp.ones_like(sgn), jnp.ones_like(sgn), sgn], -1)
    wo_l = wo * mul
    wi_l = wi * mul
    same = wo_l[..., 2] * wi_l[..., 2] > 0.0

    # single-scatter reflection off the rough top
    f_top, _ = dielectric_interface_f(wo_l, wi_l, top_eta, top_ax, top_ay)
    f_sum = f_top[..., None] * jnp.ones(lam.shape, jnp.float32)

    smooth_top = effectively_smooth(top_ax, top_ay)

    # exit channel: sample a transmitted direction from the wi side; by
    # reciprocity its weight applies to the exit crossing. For a SMOOTH top
    # this is pbrt's `wis` (LayeredBxDF::f samples the specular exit
    # interface's deterministic refraction with its Fresnel weight) — the
    # bottom-vertex connection through it makes f nonzero for smooth coats;
    # only the pure delta mirror lobe stays out of NEE. Dropping these
    # connections (round-2 behavior) lost ~4x energy on coated surfaces
    # under NEE (tests/test_furnace.py::test_coated_diffuse_nee_vs_bsdf_only).
    rng = _rng_init(u2, uc + 0.5)
    rng, ue2 = _rng_next2(rng)
    rng, uec = _rng_next(rng)
    s_exit = dielectric_interface_sample(wi_l, top_eta, top_ax, top_ay, ue2, uec)
    exit_ok = s_exit["valid"] & s_exit["is_trans"]
    w_exit_in = s_exit["wi"]      # direction pointing down inside the slab
    exit_w = s_exit["weight"]

    # entry walk from wo
    s_top = dielectric_interface_sample(wo_l, top_eta, top_ax, top_ay, u2, uc)
    entered = s_top["valid"] & s_top["is_trans"]
    ones4 = jnp.ones(lam.shape, jnp.float32)

    state = dict(
        rng=rng,
        w=s_top["wi"],
        beta=ones4 * s_top["weight"][..., None],
        alive=entered & (same | bottom_exits),
        f=jnp.zeros_like(lam),
    )

    # radiance-mode entry crossing compresses radiance by 1/eta^2 (pbrt
    # SpecularTransmission in Radiance mode; wo_l is canonicalized to the
    # upper hemisphere so the entry is always outside -> inside at top_eta).
    # The walk's SAMPLING path re-exits through the top, where the inverse
    # crossing multiplies eta^2 back — hence weight=1 there — but the NEE
    # connection exits through the importance-mode exit channel (pbrt's
    # `wis`, sampled with ~mode: no eta factor), so eval must carry the
    # 1/eta^2 explicitly. Composition check: smooth top, thickness 0 gives
    # f = T(wo) T(wi) (R/pi) / eta^2, matching pbrt's
    # beta * fb * |cos wis| * Tr * wis.f/wis.pdf with wis.f = T/(|cos| eta^2)
    # ... eta^2 on the wi side absent in importance mode. The previous code
    # multiplied by |cos wis| and skipped 1/eta^2 — ~2x hot (caught by
    # tests/test_furnace.py + the eval-vs-sampled-albedo integral).
    inv_eta2 = 1.0 / jnp.maximum(top_eta * top_eta, 1e-6)

    def step(_, st):
        rng, w, beta, crossed = _slab_transit(
            st["rng"], st["w"], thick, albedo4, g, st["beta"]
        )
        at_iface = st["alive"] & crossed
        going_down = w[..., 2] < 0.0
        hit_bottom = at_iface & going_down

        # NEE connection (reflection query): bottom vertex -> (upward
        # through slab) -> exit channel -> wi. Transmittance of the upward
        # crossing:
        tau_up = thick / jnp.maximum(jnp.abs(w_exit_in[..., 2]), 1e-6)
        tr_up = jnp.exp(-tau_up)
        fb = bottom_f(w, -w_exit_in)
        contrib = beta * fb * (tr_up * exit_w * inv_eta2)[..., None]
        f_acc = st["f"] + jnp.where(
            (hit_bottom & exit_ok & same)[..., None], contrib, 0.0
        )
        if bottom_exits:
            # transmission query: the bottom layer is the exit interface —
            # connect directly through its transmission lobe (wi_l is down)
            contrib_t = beta * bottom_f(w, wi_l)
            f_acc = f_acc + jnp.where(
                (hit_bottom & ~same)[..., None], contrib_t, 0.0
            )

        # continue the walk
        rng, ub2 = _rng_next2(rng)
        rng, ubc = _rng_next(rng)
        w_b, bw, b_ok = bottom_sample(w, ub2, ubc)
        beta = jnp.where(hit_bottom[..., None], beta * bw, beta)
        w = jnp.where(hit_bottom[..., None], w_b, w)
        dead_b = hit_bottom & ~b_ok
        # a transmitting bottom may pass the walk out of the material
        exit_b = hit_bottom & (w_b[..., 2] < 0.0) if bottom_exits else (
            jnp.zeros_like(hit_bottom)
        )

        rng, ut2 = _rng_next2(rng)
        rng, utc = _rng_next(rng)
        s = dielectric_interface_sample(-w, top_eta, top_ax, top_ay, ut2, utc)
        hit_top = at_iface & ~going_down & ~hit_bottom
        escape = hit_top & s["valid"] & s["is_trans"]  # walk leaves: stop
        bounce = hit_top & s["valid"] & ~s["is_trans"]
        beta = jnp.where(bounce[..., None], beta * s["weight"][..., None], beta)
        w = jnp.where(bounce[..., None], s["wi"], w)

        alive = st["alive"] & ~escape & ~exit_b & ~dead_b & ~(hit_top & ~s["valid"])
        alive = alive & jnp.any(beta > 1e-9, -1)
        return dict(rng=rng, w=w, beta=beta, alive=alive, f=f_acc)

    # full MAX_WALK budget: one interface event per iteration means only
    # every other step connects, and the internal-TIR interreflection
    # series (ratio ~0.45 at eta 1.5) needs ~5 connections to converge —
    # MAX_WALK//2 truncated ~15% of the white-base energy
    state = jax.lax.fori_loop(0, MAX_WALK, step, state)
    valid_q = same | bottom_exits
    f_sum = f_sum + jnp.where(same[..., None], state["f"], 0.0)
    if bottom_exits:
        f_sum = jnp.where(same[..., None], f_sum, state["f"])

    pdf = layered_pdf_stochastic(
        wo_l, wi_l, state["rng"], top_eta, top_ax, top_ay,
        bottom_pdf, bottom_sample, bottom_smooth, two_sided=bottom_exits,
    )
    return jnp.where(valid_q[..., None], f_sum, 0.0), pdf


# --- material-bank entry points ---------------------------------------------------


def sample_coated_diffuse(banks, idx, table, wo, lam, u2, uc, tex=None) -> BSDFSample:
    refl = _albedo_spec(banks, banks.cd_refl_c4, banks.cd_refl,
                        banks.cd_refl_tex, idx, tex, table, lam)
    alb = coeff4_eval(_bl(banks.cd_albedo_c4, idx), lam)

    def bottom(w_down, ub2, ubc):
        wi, wgt = _bottom_diffuse_sample(refl, w_down, ub2)
        return wi, wgt, jnp.ones(w_down.shape[:-1], bool)

    return layered_sample(
        wo, lam, u2, uc,
        _bl(banks.cd_eta, idx), _bl(banks.cd_ax, idx), _bl(banks.cd_ay, idx),
        _bl(banks.cd_thick, idx), alb, _bl(banks.cd_g, idx),
        bottom, bottom_pdf=_bottom_diffuse_pdf,
    )


def eval_coated_diffuse(banks, idx, table, wo, wi, lam, u2, uc, tex=None):
    refl = _albedo_spec(banks, banks.cd_refl_c4, banks.cd_refl,
                        banks.cd_refl_tex, idx, tex, table, lam)
    alb = coeff4_eval(_bl(banks.cd_albedo_c4, idx), lam)

    def bottom(w_down, ub2, ubc):
        wi_b, wgt = _bottom_diffuse_sample(refl, w_down, ub2)
        return wi_b, wgt, jnp.ones(w_down.shape[:-1], bool)

    def bottom_f(w_down, wi_up):
        return _bottom_diffuse_f(refl, w_down, wi_up)

    return layered_f(
        wo, wi, lam, u2, uc,
        _bl(banks.cd_eta, idx), _bl(banks.cd_ax, idx), _bl(banks.cd_ay, idx),
        _bl(banks.cd_thick, idx), alb, _bl(banks.cd_g, idx),
        bottom, bottom_f, bottom_pdf=_bottom_diffuse_pdf,
    )


def sample_coated_conductor(banks, idx, table, wo, lam, u2, uc, tex=None) -> BSDFSample:
    from ..spectral.piecewise_poly import piecewise_eval_banked
    eta4 = piecewise_eval_banked(banks.cc_cond_eta_pw, idx[..., None], lam)
    k4 = piecewise_eval_banked(banks.cc_cond_k_pw, idx[..., None], lam)
    alb = coeff4_eval(_bl(banks.cc_albedo_c4, idx), lam)
    cax = _bl(banks.cc_cax, idx)
    cay = _bl(banks.cc_cay, idx)

    def bottom(w_down, ub2, ubc):
        return _bottom_conductor_sample(eta4, k4, cax, cay, w_down, ub2)

    def bottom_pdf(w_down, wi_q):
        return _bottom_conductor_pdf(cax, cay, w_down, wi_q)

    return layered_sample(
        wo, lam, u2, uc,
        _bl(banks.cc_eta, idx), _bl(banks.cc_iax, idx), _bl(banks.cc_iay, idx),
        _bl(banks.cc_thick, idx), alb, _bl(banks.cc_g, idx),
        bottom, bottom_pdf=bottom_pdf,
        bottom_smooth=effectively_smooth(cax, cay),
    )


def eval_coated_conductor(banks, idx, table, wo, wi, lam, u2, uc, tex=None):
    from ..spectral.piecewise_poly import piecewise_eval_banked
    eta4 = piecewise_eval_banked(banks.cc_cond_eta_pw, idx[..., None], lam)
    k4 = piecewise_eval_banked(banks.cc_cond_k_pw, idx[..., None], lam)
    alb = coeff4_eval(_bl(banks.cc_albedo_c4, idx), lam)
    cax = _bl(banks.cc_cax, idx)
    cay = _bl(banks.cc_cay, idx)

    def bottom(w_down, ub2, ubc):
        return _bottom_conductor_sample(eta4, k4, cax, cay, w_down, ub2)

    def bottom_f(w_down, wi_up):
        return _bottom_conductor_f(eta4, k4, cax, cay, w_down, wi_up)

    def bottom_pdf(w_down, wi_q):
        return _bottom_conductor_pdf(cax, cay, w_down, wi_q)

    return layered_f(
        wo, wi, lam, u2, uc,
        _bl(banks.cc_eta, idx), _bl(banks.cc_iax, idx), _bl(banks.cc_iay, idx),
        _bl(banks.cc_thick, idx), alb, _bl(banks.cc_g, idx),
        bottom, bottom_f, bottom_pdf=bottom_pdf,
        bottom_smooth=effectively_smooth(cax, cay),
    )


def sample_coated_diffuse_transmission(
    banks, idx, table, wo, lam, u2, uc, tex=None
) -> BSDFSample:
    """CoatedDiffuseTransmission (coated-diffuse-transmission.jl:12;
    spectral-eval.jl:2243-2856): dielectric coating over a diffuse layer
    that both reflects and transmits — the layered walk may exit through
    the bottom."""
    refl = _albedo_spec(banks, banks.cdt_refl_c4, banks.cdt_refl,
                        banks.cdt_refl_tex, idx, tex, table, lam)
    trans = _albedo_spec(banks, banks.cdt_trans_c4, banks.cdt_trans,
                         banks.cdt_trans_tex, idx, tex, table, lam)
    alb = coeff4_eval(_bl(banks.cdt_albedo_c4, idx), lam)

    def bottom(w_down, ub2, ubc):
        return _bottom_dt_sample(refl, trans, w_down, ub2, ubc)

    def bottom_pdf(w_down, wi_q):
        return _bottom_dt_pdf(refl, trans, w_down, wi_q)

    return layered_sample(
        wo, lam, u2, uc,
        _bl(banks.cdt_eta, idx), _bl(banks.cdt_ax, idx), _bl(banks.cdt_ay, idx),
        _bl(banks.cdt_thick, idx), alb, _bl(banks.cdt_g, idx),
        bottom, bottom_pdf=bottom_pdf, bottom_exits=True,
    )


def eval_coated_diffuse_transmission(
    banks, idx, table, wo, wi, lam, u2, uc, tex=None
):
    refl = _albedo_spec(banks, banks.cdt_refl_c4, banks.cdt_refl,
                        banks.cdt_refl_tex, idx, tex, table, lam)
    trans = _albedo_spec(banks, banks.cdt_trans_c4, banks.cdt_trans,
                         banks.cdt_trans_tex, idx, tex, table, lam)
    alb = coeff4_eval(_bl(banks.cdt_albedo_c4, idx), lam)

    def bottom(w_down, ub2, ubc):
        return _bottom_dt_sample(refl, trans, w_down, ub2, ubc)

    def bottom_f(w_down, wi_q):
        return _bottom_dt_f(refl, trans, w_down, wi_q)

    def bottom_pdf(w_down, wi_q):
        return _bottom_dt_pdf(refl, trans, w_down, wi_q)

    return layered_f(
        wo, wi, lam, u2, uc,
        _bl(banks.cdt_eta, idx), _bl(banks.cdt_ax, idx), _bl(banks.cdt_ay, idx),
        _bl(banks.cdt_thick, idx), alb, _bl(banks.cdt_g, idx),
        bottom, bottom_f, bottom_pdf=bottom_pdf, bottom_exits=True,
    )
