"""Batched ray-triangle intersection (Moller-Trumbore) and triangle helpers.

Plays the role of Raycore.jl's triangle intersection used via closest_hit
(/root/reference/src/integrators/volpath/intersection.jl:200-324). Built for
SoA wavefronts: every function broadcasts over leading axes and runs on the
TPU VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import cross, dot, normalize

TRI_EPS = 1e-9


def intersect_triangle(o, d, p0, p1, p2, t_max):
    """Moller-Trumbore. All inputs (..., 3) / (...,). Returns
    (hit, t, b1, b2) where (b1, b2) are barycentrics of p1/p2."""
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > TRI_EPS, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    tvec = o - p0
    b1 = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    b2 = dot(d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    hit = (
        (jnp.abs(det) > TRI_EPS)
        & (b1 >= 0.0)
        & (b2 >= 0.0)
        & (b1 + b2 <= 1.0)
        & (t > TRI_EPS)
        & (t < t_max)
    )
    return hit, t, b1, b2


def triangle_normal(p0, p1, p2):
    """Geometric normal (unnormalized area vector direction)."""
    return normalize(cross(p1 - p0, p2 - p0))


def triangle_area(p0, p1, p2):
    return 0.5 * jnp.linalg.norm(cross(p1 - p0, p2 - p0), axis=-1)


def interpolate(b1, b2, a0, a1, a2):
    """Barycentric interpolation of per-vertex attributes."""
    b0 = (1.0 - b1 - b2)[..., None]
    return b0 * a0 + b1[..., None] * a1 + b2[..., None] * a2


def triangle_dpduv(p0, p1, p2, uv0, uv1, uv2):
    """Partial derivatives dp/du, dp/dv from vertex uvs (pbrt-style;
    reference surface_interaction.jl partial_derivatives)."""
    duv02 = uv0 - uv2
    duv12 = uv1 - uv2
    dp02 = p0 - p2
    dp12 = p1 - p2
    det = duv02[..., 0] * duv12[..., 1] - duv02[..., 1] * duv12[..., 0]
    degenerate = jnp.abs(det) < 1e-9
    inv = 1.0 / jnp.where(degenerate, 1.0, det)
    dpdu = (duv12[..., 1:2] * dp02 - duv02[..., 1:2] * dp12) * inv[..., None]
    dpdv = (-duv12[..., 0:1] * dp02 + duv02[..., 0:1] * dp12) * inv[..., None]
    # fallback: build a frame around the geometric normal
    from ..core.vecmath import coordinate_system

    n = triangle_normal(p0, p1, p2)
    fu, fv = coordinate_system(n)
    dpdu = jnp.where(degenerate[..., None], fu, dpdu)
    dpdv = jnp.where(degenerate[..., None], fv, dpdv)
    return dpdu, dpdv


def sample_triangle(u1, u2, p0, p1, p2):
    """Uniform area sampling of a triangle; returns (p, b1, b2)."""
    su = jnp.sqrt(jnp.maximum(u1, 0.0))
    b1 = 1.0 - su
    b2 = u2 * su
    p = interpolate(b1, b2, p0, p1, p2)
    return p, b1, b2
