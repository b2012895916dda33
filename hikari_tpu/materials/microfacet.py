"""Trowbridge-Reitz (GGX) microfacet distribution, pbrt-v4 forms.

Parity with /root/reference/src/reflection/microfacet.jl (D, Lambda, G,
visible-normal sampling, roughness remap, effectively-smooth cutoff,
regularization). All functions operate in the local shading frame (z = n)
over batched lanes.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import cross, normalize
from ..sampling.distributions import concentric_sample_disk

SMOOTH_ALPHA = 1e-3  # pbrt EffectivelySmooth cutoff


def roughness_to_alpha(roughness):
    """pbrt-v4 remap (microfacet.jl:72-85)."""
    return jnp.sqrt(jnp.maximum(roughness, 0.0))


def effectively_smooth(alpha_x, alpha_y):
    return jnp.maximum(alpha_x, alpha_y) < SMOOTH_ALPHA


def regularize_alpha(alpha):
    """Roughen near-specular lobes after non-specular bounces
    (microfacet.jl regularize)."""
    return jnp.where(alpha < 0.3, jnp.clip(2.0 * alpha, 0.1, 0.3), alpha)


def tr_d(wm, ax, ay):
    """Microfacet area distribution D(wm)."""
    t = wm[..., 0] ** 2 / (ax * ax) + wm[..., 1] ** 2 / (ay * ay) + wm[..., 2] ** 2
    return 1.0 / jnp.maximum(jnp.pi * ax * ay * t * t, 1e-20)


def tr_lambda(w, ax, ay):
    cos2 = w[..., 2] ** 2
    a2 = (ax * w[..., 0]) ** 2 + (ay * w[..., 1]) ** 2
    return 0.5 * (-1.0 + jnp.sqrt(1.0 + a2 / jnp.maximum(cos2, 1e-12)))


def tr_g1(w, ax, ay):
    return 1.0 / (1.0 + tr_lambda(w, ax, ay))


def tr_g(wo, wi, ax, ay):
    return 1.0 / (1.0 + tr_lambda(wo, ax, ay) + tr_lambda(wi, ax, ay))


def tr_d_visible(wo, wm, ax, ay):
    """Visible-normal distribution used as the sampling PDF."""
    cos_o = jnp.abs(wo[..., 2])
    dot_om = jnp.abs(jnp.sum(wo * wm, axis=-1))
    return tr_g1(wo, ax, ay) / jnp.maximum(cos_o, 1e-12) * tr_d(wm, ax, ay) * dot_om


def tr_sample_wm(wo, u, ax, ay):
    """Sample a visible microfacet normal (pbrt-v4 ellipsoid method)."""
    wh = normalize(
        jnp.stack([ax * wo[..., 0], ay * wo[..., 1], wo[..., 2]], -1)
    )
    wh = jnp.where(wh[..., 2:3] < 0.0, -wh, wh)

    z = jnp.zeros_like(wh).at[..., 2].set(1.0)
    t1_raw = cross(z, wh)
    t1_len = jnp.linalg.norm(t1_raw, axis=-1, keepdims=True)
    x_axis = jnp.zeros_like(wh).at[..., 0].set(1.0)
    t1 = jnp.where(wh[..., 2:3] < 0.999, t1_raw / jnp.maximum(t1_len, 1e-12), x_axis)
    t2 = cross(wh, t1)

    p = concentric_sample_disk(u)
    h = jnp.sqrt(jnp.maximum(0.0, 1.0 - p[..., 0] ** 2))
    lerp_t = (1.0 + wh[..., 2]) / 2.0
    py = h + lerp_t * (p[..., 1] - h)
    pz = jnp.sqrt(jnp.maximum(0.0, 1.0 - p[..., 0] ** 2 - py * py))
    nh = p[..., 0:1] * t1 + py[..., None] * t2 + pz[..., None] * wh
    wm = normalize(
        jnp.stack(
            [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(1e-6, nh[..., 2])], -1
        )
    )
    return wm


def tr_pdf(wo, wm, ax, ay):
    """PDF of sampling wm via tr_sample_wm."""
    return tr_d_visible(wo, wm, ax, ay)
