"""Ray batches (structure-of-arrays).

Parity with Raycore's Ray / RayDifferentials re-exported at
/root/reference/src/Hikari.jl:22-37. A `Rays` holds a whole wavefront of
rays; all fields broadcast over the batch axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from .pytree import pytree_dataclass

RAY_EPS = 1e-4  # self-intersection offset, matches Raycore usage


@pytree_dataclass
class Rays:
    o: jnp.ndarray      # (..., 3) origin
    d: jnp.ndarray      # (..., 3) direction (not necessarily unit)
    t_max: jnp.ndarray  # (...,)
    time: jnp.ndarray   # (...,)

    def at(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.o + t[..., None] * self.d


@pytree_dataclass
class RayDifferentials:
    """Auxiliary +x / +y camera-offset rays for texture filtering.

    Parity: RayDifferentials (Raycore), generate_ray_differential
    (/root/reference/src/camera/camera.jl:57-75).
    """

    rx_o: jnp.ndarray
    rx_d: jnp.ndarray
    ry_o: jnp.ndarray
    ry_d: jnp.ndarray


def make_rays(o, d, t_max=None, time=None) -> Rays:
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    batch = jnp.broadcast_shapes(o.shape[:-1], d.shape[:-1])
    if t_max is None:
        t_max = jnp.full(batch, jnp.inf, jnp.float32)
    else:
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), batch)
    if time is None:
        time = jnp.zeros(batch, jnp.float32)
    else:
        time = jnp.broadcast_to(jnp.asarray(time, jnp.float32), batch)
    return Rays(o, d, t_max, time)


def spawn_ray(p: jnp.ndarray, n: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Offset origin along the normal to avoid self intersection."""
    sign = jnp.where(jnp.sum(n * d, axis=-1) >= 0.0, 1.0, -1.0)
    return p + sign[..., None] * RAY_EPS * n
