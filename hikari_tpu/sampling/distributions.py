"""Sampling distributions and warps.

Parity with /root/reference/src/sampler/sampling.jl: concentric disk,
cosine hemisphere, uniform sphere/cone/triangle, Distribution1D/2D with
flattened CDFs for device-side importance sampling (environment maps, table
filters). All batched.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.pytree import pytree_dataclass

INV_PI = 1.0 / jnp.pi
INV_2PI = 1.0 / (2.0 * jnp.pi)
INV_4PI = 1.0 / (4.0 * jnp.pi)


def concentric_sample_disk(u: jnp.ndarray) -> jnp.ndarray:
    """Map [0,1)^2 to unit disk, low-distortion (sampling.jl:5-30)."""
    off = 2.0 * u - 1.0
    ox, oy = off[..., 0], off[..., 1]
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        (jnp.pi / 4.0) * (oy / jnp.where(ox == 0.0, 1.0, ox)),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * (ox / jnp.where(oy == 0.0, 1.0, oy)),
    )
    p = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)
    return jnp.where(zero[..., None], 0.0, p)


def cosine_sample_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere around +z. pdf = cos(theta)/pi."""
    d = concentric_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.concatenate([d, z[..., None]], -1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def uniform_sample_sphere(u: jnp.ndarray) -> jnp.ndarray:
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def uniform_sample_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def uniform_sample_cone(u: jnp.ndarray, cos_theta_max) -> jnp.ndarray:
    """Uniform direction within a cone around +z."""
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], -1
    )


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * jnp.pi * (1.0 - cos_theta_max))


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """MIS power heuristic (beta=2)."""
    f = nf * f_pdf
    g = ng * g_pdf
    denom = f * f + g * g
    return jnp.where(denom > 0.0, f * f / jnp.where(denom == 0.0, 1.0, denom), 0.0)


# --- tabulated distributions -------------------------------------------------


@pytree_dataclass
class Distribution1D:
    """Piecewise-constant 1D distribution (sampling.jl Distribution1D)."""

    func: jnp.ndarray      # (N,)
    cdf: jnp.ndarray       # (N+1,)
    func_int: jnp.ndarray  # ()

    @property
    def n(self):
        return self.func.shape[-1]


def make_distribution_1d(func: jnp.ndarray) -> Distribution1D:
    func = jnp.maximum(jnp.asarray(func, jnp.float32), 0.0)
    n = func.shape[-1]
    cdf = jnp.concatenate(
        [jnp.zeros(func.shape[:-1] + (1,)), jnp.cumsum(func, -1) / n], -1
    )
    func_int = cdf[..., -1]
    safe = jnp.where(func_int > 0.0, func_int, 1.0)
    cdf = jnp.where(
        (func_int > 0.0)[..., None],
        cdf / safe[..., None],
        jnp.linspace(0.0, 1.0, n + 1),
    )
    return Distribution1D(func, cdf, func_int)


def sample_distribution_1d(dist: Distribution1D, u: jnp.ndarray):
    """Returns (x in [0,1), pdf, index)."""
    n = dist.n
    idx = jnp.clip(jnp.searchsorted(dist.cdf, u, side="right") - 1, 0, n - 1)
    c0 = dist.cdf[idx]
    c1 = dist.cdf[idx + 1]
    du = jnp.where(c1 > c0, (u - c0) / jnp.where(c1 == c0, 1.0, c1 - c0), 0.0)
    x = (idx.astype(jnp.float32) + du) / n
    fi = jnp.where(dist.func_int > 0.0, dist.func_int, 1.0)
    pdf = dist.func[idx] / fi
    return x, pdf, idx


@pytree_dataclass
class Distribution2D:
    """Flattened 2D piecewise-constant distribution for device sampling
    (sampling.jl Distribution2D with marginal+conditional CDF matrices)."""

    func: jnp.ndarray          # (H, W)
    cond_cdf: jnp.ndarray      # (H, W+1) conditional CDFs along x per row
    cond_int: jnp.ndarray      # (H,) row integrals
    marg_cdf: jnp.ndarray      # (H+1,)
    marg_int: jnp.ndarray      # ()


def make_distribution_2d(func: jnp.ndarray) -> Distribution2D:
    func = jnp.maximum(jnp.asarray(func, jnp.float32), 0.0)
    h, w = func.shape
    cond_cdf = jnp.concatenate(
        [jnp.zeros((h, 1)), jnp.cumsum(func, 1) / w], 1
    )
    cond_int = cond_cdf[:, -1]
    safe = jnp.where(cond_int > 0.0, cond_int, 1.0)
    cond_cdf = jnp.where(
        (cond_int > 0.0)[:, None], cond_cdf / safe[:, None],
        jnp.linspace(0.0, 1.0, w + 1)[None, :],
    )
    marg_cdf = jnp.concatenate(
        [jnp.zeros((1,)), jnp.cumsum(cond_int) / h]
    )
    marg_int = marg_cdf[-1]
    msafe = jnp.where(marg_int > 0.0, marg_int, 1.0)
    marg_cdf = jnp.where(
        marg_int > 0.0, marg_cdf / msafe, jnp.linspace(0.0, 1.0, h + 1)
    )
    return Distribution2D(func, cond_cdf, cond_int, marg_cdf, marg_int)


def sample_distribution_2d(dist: Distribution2D, u: jnp.ndarray):
    """u: (..., 2). Returns (uv in [0,1)^2, pdf)."""
    h, w = dist.func.shape
    # marginal along y
    yi = jnp.clip(jnp.searchsorted(dist.marg_cdf, u[..., 1], side="right") - 1, 0, h - 1)
    c0 = dist.marg_cdf[yi]
    c1 = dist.marg_cdf[yi + 1]
    dy = jnp.where(c1 > c0, (u[..., 1] - c0) / jnp.where(c1 == c0, 1.0, c1 - c0), 0.0)
    y = (yi.astype(jnp.float32) + dy) / h

    # conditional along x: bisect the row CDF with per-step point gathers —
    # materializing whole (lanes, W+1) rows costs W/log2(W) more scalar-core
    # gather traffic than the log2(W) probes actually needed
    flat_cdf = dist.cond_cdf.reshape(-1)
    base = yi * (w + 1)
    lo = jnp.zeros_like(yi)
    hi = jnp.full_like(yi, w)
    for _ in range(max(1, int(np.ceil(np.log2(max(w, 2)))))):
        mid = (lo + hi) >> 1
        v = flat_cdf[base + mid]
        go_hi = v <= u[..., 0]
        lo = jnp.where(go_hi, mid, lo)
        hi = jnp.where(go_hi, hi, mid)
    xi = jnp.clip(lo, 0, w - 1)
    d0 = flat_cdf[base + xi]
    d1 = flat_cdf[base + xi + 1]
    dx = jnp.where(d1 > d0, (u[..., 0] - d0) / jnp.where(d1 == d0, 1.0, d1 - d0), 0.0)
    x = (xi.astype(jnp.float32) + dx) / w

    mi = jnp.where(dist.marg_int > 0.0, dist.marg_int, 1.0)
    pdf = dist.func[yi, xi] / mi
    return jnp.stack([x, y], -1), pdf


def pdf_distribution_2d(dist: Distribution2D, uv: jnp.ndarray):
    h, w = dist.func.shape
    xi = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    mi = jnp.where(dist.marg_int > 0.0, dist.marg_int, 1.0)
    return dist.func[yi, xi] / mi
