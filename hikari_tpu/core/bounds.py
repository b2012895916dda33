"""Axis-aligned bounding boxes as (lo, hi) array pairs.

Parity with Raycore's Bounds2/Bounds3 (re-exported at
/root/reference/src/Hikari.jl:22-37). Batched: (..., 3).
"""

from __future__ import annotations

import jax.numpy as jnp

from .pytree import pytree_dataclass
from .vecmath import length

INF = jnp.float32(jnp.inf)


@pytree_dataclass
class Bounds3:
    lo: jnp.ndarray  # (..., 3)
    hi: jnp.ndarray  # (..., 3)

    def union(self, other: "Bounds3") -> "Bounds3":
        return Bounds3(jnp.minimum(self.lo, other.lo), jnp.maximum(self.hi, other.hi))

    def union_point(self, p: jnp.ndarray) -> "Bounds3":
        return Bounds3(jnp.minimum(self.lo, p), jnp.maximum(self.hi, p))

    def expand(self, delta) -> "Bounds3":
        return Bounds3(self.lo - delta, self.hi + delta)

    def diagonal(self) -> jnp.ndarray:
        return self.hi - self.lo

    def centroid(self) -> jnp.ndarray:
        return 0.5 * (self.lo + self.hi)

    def surface_area(self) -> jnp.ndarray:
        d = jnp.maximum(self.diagonal(), 0.0)
        return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])

    def contains(self, p: jnp.ndarray) -> jnp.ndarray:
        return jnp.all((p >= self.lo) & (p <= self.hi), axis=-1)

    def offset(self, p: jnp.ndarray) -> jnp.ndarray:
        """Relative [0,1]^3 position of p within the bounds."""
        d = self.diagonal()
        return (p - self.lo) / jnp.where(d > 0.0, d, 1.0)

    def bounding_sphere(self):
        c = self.centroid()
        return c, length(self.hi - c)

    def intersect_p(self, o, inv_d, t_max):
        """Slab test. o/inv_d: (...,3); returns (hit_mask, t_near, t_far)."""
        t0 = (self.lo - o) * inv_d
        t1 = (self.hi - o) * inv_d
        t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        # pbrt robustness factor on t_far
        t_far = t_far * 1.0000004
        hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < t_max)
        return hit, t_near, t_far


def empty_bounds3() -> Bounds3:
    return Bounds3(jnp.full((3,), INF), jnp.full((3,), -INF))


def bounds_from_points(pts: jnp.ndarray) -> Bounds3:
    """Bounds of an (N, 3) point cloud."""
    return Bounds3(jnp.min(pts, axis=0), jnp.max(pts, axis=0))
