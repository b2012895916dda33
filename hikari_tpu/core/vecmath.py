"""Batched 3-vector math on ``(..., 3)`` float32 arrays.

Everything in the engine is structure-of-arrays: a "vector" is the last axis
of a batched array, so all helpers broadcast over leading axes and vectorize
on the TPU VPU. Mirrors the math helpers Hikari.jl gets from GeometryBasics /
LinearAlgebra and src/surface_interaction.jl; built fresh for array semantics.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis; keeps leading axes."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length_squared(v: jnp.ndarray) -> jnp.ndarray:
    return dot(v, v)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_squared(v))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    """Safe normalize: returns v/|v|, or 0 where |v| ~ 0."""
    len2 = length_squared(v)
    inv = jnp.where(len2 > EPS * EPS, 1.0 / jnp.sqrt(jnp.maximum(len2, EPS * EPS)), 0.0)
    return v * inv[..., None]


def distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return length(a - b)


def lerp(t: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return a + t * (b - a)


def face_forward(n: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Flip n so that it lies in the same hemisphere as v."""
    return jnp.where(dot(n, v)[..., None] < 0.0, -n, n)


def reflect(wo: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror-reflect wo about n (both pointing away from surface)."""
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def refract(wi: jnp.ndarray, n: jnp.ndarray, eta: jnp.ndarray):
    """Refract wi (pointing away from surface) about n with relative IOR eta.

    Returns (valid_mask, wt). Follows pbrt conventions as used by
    /root/reference/src/reflection/bxdf.jl:45-66.
    """
    cos_theta_i = dot(n, wi)
    sin2_theta_i = jnp.maximum(0.0, 1.0 - cos_theta_i * cos_theta_i)
    sin2_theta_t = sin2_theta_i / (eta * eta)
    valid = sin2_theta_t < 1.0
    cos_theta_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_theta_t))
    wt = -wi / eta[..., None] + (cos_theta_i / eta - cos_theta_t)[..., None] * n
    return valid, wt


def coordinate_system(v1: jnp.ndarray):
    """Build an orthonormal basis around unit v1 (branchless, Duff et al.).

    Returns (v2, v3) with [v2, v3, v1] right-handed.
    """
    sign = jnp.where(v1[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + v1[..., 2])
    b = v1[..., 0] * v1[..., 1] * a
    v2 = jnp.stack(
        [1.0 + sign * v1[..., 0] * v1[..., 0] * a, sign * b, -sign * v1[..., 0]],
        axis=-1,
    )
    v3 = jnp.stack(
        [b, sign + v1[..., 1] * v1[..., 1] * a, -v1[..., 1]],
        axis=-1,
    )
    return v2, v3


def spherical_direction(sin_theta, cos_theta, phi):
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def spherical_theta(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v: jnp.ndarray) -> jnp.ndarray:
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * jnp.pi, p)


# --- local shading frame helpers (z = normal), pbrt style -------------------


def cos_theta(w):
    return w[..., 2]


def cos2_theta(w):
    return w[..., 2] * w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def sin_theta(w):
    return jnp.sqrt(sin2_theta(w))


def tan_theta(w):
    return sin_theta(w) / jnp.where(jnp.abs(cos_theta(w)) < EPS, EPS, cos_theta(w))


def tan2_theta(w):
    c2 = jnp.maximum(cos2_theta(w), EPS)
    return sin2_theta(w) / c2


def cos_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.maximum(s, EPS), -1.0, 1.0))


def sin_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 0.0, jnp.clip(w[..., 1] / jnp.maximum(s, EPS), -1.0, 1.0))


def same_hemisphere(w, wp):
    return w[..., 2] * wp[..., 2] > 0.0


def make_frame(n: jnp.ndarray):
    """Orthonormal frame with z-axis = n. Returns (t, b, n)."""
    t, b = coordinate_system(n)
    return t, b, n


def to_local(t, b, n, v):
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


def to_world(t, b, n, v):
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_div(a, b, default=0.0):
    return jnp.where(b != 0.0, a / jnp.where(b == 0.0, 1.0, b), default)


def sqr(x):
    return x * x
