"""Fresnel reflectance: dielectric (scalar) and conductor (spectral).

Parity with /root/reference/src/reflection/bxdf.jl:67-112 (pbrt-v4 exact
forms). Batched over lanes; conductor works per hero wavelength (..., 4).
"""

from __future__ import annotations

import jax.numpy as jnp


def fresnel_dielectric(cos_theta_i, eta):
    """Unpolarized Fresnel for dielectrics. cos_theta_i may be negative
    (ray inside); eta is the relative IOR of the transmitted side."""
    cos_theta_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    # flip orientation when exiting
    entering = cos_theta_i > 0.0
    eta_eff = jnp.where(entering, eta, 1.0 / eta)
    ci = jnp.abs(cos_theta_i)
    sin2_t = (1.0 - ci * ci) / (eta_eff * eta_eff)
    tir = sin2_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    r_par = (eta_eff * ci - ct) / (eta_eff * ci + ct)
    r_perp = (ci - eta_eff * ct) / (ci + eta_eff * ct)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def fresnel_conductor(cos_theta_i, eta, k):
    """Exact conductor Fresnel. cos_theta_i (...,), eta/k (..., S) spectral.
    Returns (..., S)."""
    ci = jnp.clip(jnp.abs(cos_theta_i), 0.0, 1.0)[..., None]
    cos2 = ci * ci
    sin2 = 1.0 - cos2
    eta2 = eta * eta
    k2 = k * k
    t0 = eta2 - k2 - sin2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * k2, 0.0))
    t1 = a2b2 + cos2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * ci
    rs = (t1 - t2) / (t1 + t2)
    t3 = cos2 * a2b2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / (t3 + t4)
    return jnp.clip(0.5 * (rp + rs), 0.0, 1.0)
