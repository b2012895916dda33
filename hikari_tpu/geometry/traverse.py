"""Vectorized stackless BVH traversal (closest-hit / any-hit).

Replaces Raycore.jl's closest_hit/any_hit (the hot loop of the reference's
VolPath, /root/reference/src/integrators/volpath/intersection.jl:200-324).

Design: skip-link traversal over the DFS-ordered flat BVH from bvh.py. The
whole wavefront advances in lockstep inside one lax.while_loop; per-lane
state is just (node_index, best_hit), so there are no per-lane stacks and no
scatters — every step is a handful of gathers plus VPU math, which is the
TPU-idiomatic shape for divergent pointer-chasing workloads.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..core.pytree import pytree_dataclass
from .triangle import intersect_triangle

LEAF_SIZE = 4


@pytree_dataclass(static=("leaf_size",))
class DeviceBVH:
    """Flat BVH + reordered per-triangle vertices, resident on device."""

    lo: jnp.ndarray      # (N, 3)
    hi: jnp.ndarray      # (N, 3)
    first: jnp.ndarray   # (N,)
    count: jnp.ndarray   # (N,)
    skip: jnp.ndarray    # (N,)
    p0: jnp.ndarray      # (P, 3) triangle vertices in BVH-leaf order
    p1: jnp.ndarray
    p2: jnp.ndarray
    leaf_size: int = LEAF_SIZE


@pytree_dataclass
class HitRecord:
    hit: jnp.ndarray     # (...,) bool
    t: jnp.ndarray       # (...,)
    tri: jnp.ndarray     # (...,) int32 triangle id in BVH-leaf order; -1 if miss
    b1: jnp.ndarray      # (...,) barycentric of p1
    b2: jnp.ndarray      # (...,) barycentric of p2


def _slab(lo, hi, o, inv_d, t_best):
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1) * 1.0000004
    return (t_near <= t_far) & (t_far > 0.0) & (t_near < t_best)


def closest_hit(bvh: DeviceBVH, o, d, t_max) -> HitRecord:
    """Closest intersection for a wavefront of rays. o/d: (R,3), t_max: (R,)."""
    n_nodes = bvh.lo.shape[0]
    r = o.shape[0]
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)

    # carries derived from the ray inputs so that under shard_map the
    # loop state carries the same varying-axes type as the data
    z = o[..., 0] * 0.0
    idx0 = z.astype(jnp.int32)
    t0 = jnp.asarray(t_max, jnp.float32) + z
    tri0 = idx0 - 1

    def cond(state):
        idx, _, _, _, _ = state
        return jnp.any(idx < n_nodes)

    def body(state):
        idx, t_best, tri_best, b1_best, b2_best = state
        active = idx < n_nodes
        ii = jnp.minimum(idx, n_nodes - 1)
        node_lo = bvh.lo[ii]
        node_hi = bvh.hi[ii]
        box_hit = _slab(node_lo, node_hi, o, inv_d, t_best) & active

        count = bvh.count[ii]
        first = bvh.first[ii]
        is_leaf_hit = box_hit & (count > 0)

        n_prims = bvh.p0.shape[0]
        for k in range(bvh.leaf_size):
            j = jnp.minimum(first + k, n_prims - 1)
            valid = is_leaf_hit & (k < count)
            hit, t, b1, b2 = intersect_triangle(
                o, d, bvh.p0[j], bvh.p1[j], bvh.p2[j], t_best
            )
            take = valid & hit
            t_best = jnp.where(take, t, t_best)
            tri_best = jnp.where(take, j, tri_best)
            b1_best = jnp.where(take, b1, b1_best)
            b2_best = jnp.where(take, b2, b2_best)

        nxt = jnp.where(box_hit, idx + 1, bvh.skip[ii])
        nxt = jnp.where(active, nxt, idx)
        # inactive lanes stay parked at n_nodes
        nxt = jnp.where(active, nxt, n_nodes)
        return nxt, t_best, tri_best, b1_best, b2_best

    idx, t, tri, b1, b2 = lax.while_loop(cond, body, (idx0, t0, tri0, z, z))
    return HitRecord(hit=tri >= 0, t=t, tri=tri, b1=b1, b2=b2)


def any_hit(bvh: DeviceBVH, o, d, t_max) -> jnp.ndarray:
    """Occlusion test: True where any intersection exists before t_max."""
    n_nodes = bvh.lo.shape[0]
    r = o.shape[0]
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-20, d)
    t_max = jnp.asarray(t_max, jnp.float32) + o[..., 0] * 0.0

    idx0 = (o[..., 0] * 0.0).astype(jnp.int32)
    found0 = idx0 < 0

    def cond(state):
        idx, found = state
        return jnp.any((idx < n_nodes) & ~found)

    def body(state):
        idx, found = state
        active = (idx < n_nodes) & ~found
        ii = jnp.minimum(idx, n_nodes - 1)
        box_hit = _slab(bvh.lo[ii], bvh.hi[ii], o, inv_d, t_max) & active

        count = bvh.count[ii]
        first = bvh.first[ii]
        is_leaf_hit = box_hit & (count > 0)
        n_prims = bvh.p0.shape[0]
        for k in range(bvh.leaf_size):
            j = jnp.minimum(first + k, n_prims - 1)
            valid = is_leaf_hit & (k < count)
            hit, _, _, _ = intersect_triangle(
                o, d, bvh.p0[j], bvh.p1[j], bvh.p2[j], t_max
            )
            found = found | (valid & hit)

        nxt = jnp.where(box_hit, idx + 1, bvh.skip[ii])
        nxt = jnp.where(active, nxt, n_nodes)
        return nxt, found

    _, found = lax.while_loop(cond, body, (idx0, found0))
    return found


def brute_force_closest_hit(p0, p1, p2, o, d, t_max) -> HitRecord:
    """Reference O(R*P) intersector for validation and tiny scenes.

    On TPU this is actually fast for small P: it is one dense (R, P)
    elementwise sweep with no gathers.
    """
    hit, t, b1, b2 = intersect_triangle(
        o[:, None, :], d[:, None, :], p0[None], p1[None], p2[None],
        jnp.asarray(t_max, jnp.float32)[:, None],
    )
    t_masked = jnp.where(hit, t, jnp.inf)
    j = jnp.argmin(t_masked, axis=1)
    rr = jnp.arange(o.shape[0])
    any_h = hit[rr, j]
    return HitRecord(
        hit=any_h,
        t=jnp.where(any_h, t[rr, j], jnp.asarray(t_max, jnp.float32)),
        tri=jnp.where(any_h, j.astype(jnp.int32), -1),
        b1=b1[rr, j],
        b2=b2[rr, j],
    )
