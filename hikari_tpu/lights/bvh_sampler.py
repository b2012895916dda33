"""BVH light sampler: adaptive many-light sampling with bit-trail PMFs.

Parity with /root/reference/src/lights/bvh-light-sampler.jl (a pbrt-v4
BVHLightSampler port): per-light LightBounds {bounds, principal direction
w, power phi, cos(theta_o), cos(theta_e), two_sided} (light-bounds.jl:123),
a CPU-built BVH over them, stochastic top-down descent by node importance
(node_importance, :57-91), and per-light *bit trails* so the pmf of an
arbitrary light can be replayed for MIS (:103-269). Infinite lights (env /
distant / sun) are selected with a uniform split probability before the
tree descends, exactly like the reference.

Device shape: the descent is a bounded lax.while_loop (max 32 levels) of
two-child importance evaluations — gathers over small flat node arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pytree import pytree_dataclass
from .types import AREA, DISTANT, ENV, POINT, SPOT

MAX_DEPTH = 32


@pytree_dataclass(static=("n_infinite", "n_total"))
class LightBVH:
    # flat nodes, DFS order; left child = idx + 1, right child = node_right
    node_lo: jnp.ndarray      # (N, 3)
    node_hi: jnp.ndarray      # (N, 3)
    node_w: jnp.ndarray       # (N, 3) principal emission direction
    node_phi: jnp.ndarray     # (N,)
    node_cos_o: jnp.ndarray   # (N,)
    node_cos_e: jnp.ndarray   # (N,)
    node_two: jnp.ndarray     # (N,) bool
    node_right: jnp.ndarray   # (N,) int32; -1 at leaves
    node_leaf: jnp.ndarray    # (N,) int32 flat light id at leaves; -1 inner
    # per-light replay data for pmf queries
    light_trail: jnp.ndarray  # (NL,) uint32 (bit per level: 0=left)
    light_depth: jnp.ndarray  # (NL,) int32
    light_in_bvh: jnp.ndarray  # (NL,) bool (False for infinite lights)
    n_infinite: int
    n_total: int


def _light_bounds_np(banks) -> tuple[np.ndarray, ...]:
    """Host LightBounds for every flat light (light-bounds.jl per-type).
    Infinite lights get in_bvh=False."""
    lt_ = np.asarray(banks.light_type)[: banks.n_flat]
    li = np.asarray(banks.light_idx)[: banks.n_flat]
    n = len(lt_)
    lo = np.zeros((n, 3), np.float32)
    hi = np.zeros((n, 3), np.float32)
    w = np.tile(np.array([0, 0, 1.0], np.float32), (n, 1))
    phi = np.ones(n, np.float64)
    cos_o = np.full(n, -1.0, np.float32)   # emits in all directions
    cos_e = np.zeros(n, np.float32)        # theta_e = pi/2
    two = np.zeros(n, bool)
    finite = np.ones(n, bool)

    pp = np.asarray(banks.point_pos)
    pi_ = np.asarray(banks.point_i)
    sp = np.asarray(banks.spot_pos)
    sd = np.asarray(banks.spot_dir)
    si = np.asarray(banks.spot_i)
    sct = np.asarray(banks.spot_cos_total)
    a0 = np.asarray(banks.area_p0)
    a1 = np.asarray(banks.area_p1)
    a2 = np.asarray(banks.area_p2)
    ale = np.asarray(banks.area_le)
    aar = np.asarray(banks.area_area)
    atw = np.asarray(banks.area_two_sided)
    an = np.asarray(banks.area_n)

    for k in range(n):
        t, i = int(lt_[k]), int(li[k])
        if t == POINT:
            lo[k] = hi[k] = pp[i]
            phi[k] = 4 * np.pi * pi_[i].mean()
            cos_o[k] = -1.0
        elif t == SPOT:
            lo[k] = hi[k] = sp[i]
            w[k] = sd[i]
            phi[k] = 2 * np.pi * si[i].mean() * (1.0 - sct[i])
            cos_o[k] = sct[i]
        elif t == AREA:
            p = np.stack([a0[i], a1[i], a2[i]])
            lo[k] = p.min(0)
            hi[k] = p.max(0)
            w[k] = an[i]
            phi[k] = np.pi * aar[i] * ale[i].mean() * (2.0 if atw[i] else 1.0)
            cos_o[k] = 1.0  # emits about its normal
            two[k] = bool(atw[i])
        else:  # DISTANT / ENV / SUN -> infinite
            finite[k] = False
    return lo, hi, w, phi, cos_o, cos_e, two, finite


def _cone_union(w1, c1, w2, c2):
    """Union of two direction cones (DirectionCone::Union, simplified: if
    one contains the other keep it, else widen around the average)."""
    t1 = np.arccos(np.clip(c1, -1, 1))
    t2 = np.arccos(np.clip(c2, -1, 1))
    between = np.arccos(np.clip(np.dot(w1, w2), -1, 1))
    if min(between + t2, np.pi) <= t1:
        return w1, c1
    if min(between + t1, np.pi) <= t2:
        return w2, c2
    t_o = (t1 + between + t2) / 2.0
    if t_o >= np.pi:
        return w1, -1.0
    # rotate w1 toward w2 by t_o - t1
    axis = np.cross(w1, w2)
    ln = np.linalg.norm(axis)
    if ln < 1e-9:
        return w1, np.cos(t_o)
    axis /= ln
    ang = t_o - t1
    c, s = np.cos(ang), np.sin(ang)
    wr = (w1 * c + np.cross(axis, w1) * s + axis * np.dot(axis, w1) * (1 - c))
    return wr / np.linalg.norm(wr), np.cos(t_o)


def build_light_bvh(banks) -> LightBVH:
    """Host: median-split BVH over finite-light bounds; bit trails for pmf
    replay (bvh_to_gpu + light_to_bit_trail, bvh-light-sampler.jl:269+)."""
    lo, hi, w, phi, cos_o, cos_e, two, finite = _light_bounds_np(banks)
    n_flat = len(lo)
    fin_ids = np.nonzero(finite)[0]
    n_inf = int((~finite).sum())

    nodes = []  # dicts
    trail = np.zeros(n_flat, np.uint32)
    depth = np.zeros(n_flat, np.int32)

    def emit(light_ids, bits, nbits):
        idx = len(nodes)
        if len(light_ids) == 1:
            li = int(light_ids[0])
            nodes.append(dict(
                lo=lo[li], hi=hi[li], w=w[li], phi=phi[li], cos_o=cos_o[li],
                cos_e=cos_e[li], two=two[li], right=-1, leaf=li,
            ))
            trail[li] = bits
            depth[li] = nbits
            return idx
        cen = (lo[light_ids] + hi[light_ids]) / 2
        axis = int(np.argmax(cen.max(0) - cen.min(0)))
        order = np.argsort(cen[:, axis], kind="stable")
        half = len(light_ids) // 2
        left_ids = light_ids[order[:half]]
        right_ids = light_ids[order[half:]]
        # aggregate bounds
        nlo = lo[light_ids].min(0)
        nhi = hi[light_ids].max(0)
        nphi = phi[light_ids].sum()
        cw, cc = w[light_ids[0]], cos_o[light_ids[0]]
        for li in light_ids[1:]:
            cw, cc = _cone_union(cw, cc, w[li], cos_o[li])
        nodes.append(dict(
            lo=nlo, hi=nhi, w=cw, phi=nphi, cos_o=cc,
            cos_e=cos_e[light_ids].min(), two=two[light_ids].any(),
            right=-2, leaf=-1,
        ))
        me = len(nodes) - 1
        emit(left_ids, bits, nbits + 1)
        nodes[me]["right"] = emit(right_ids, bits | (1 << nbits), nbits + 1)
        return me

    if len(fin_ids):
        emit(fin_ids, 0, 0)
    else:
        nodes.append(dict(lo=np.zeros(3), hi=np.zeros(3), w=np.array([0, 0, 1.0]),
                          phi=0.0, cos_o=-1.0, cos_e=0.0, two=False, right=-1,
                          leaf=-1))

    def arr(key, dt, d=None):
        return jnp.asarray(np.asarray([nd[key] for nd in nodes], dt), dt)

    return LightBVH(
        node_lo=arr("lo", np.float32),
        node_hi=arr("hi", np.float32),
        node_w=arr("w", np.float32),
        node_phi=arr("phi", np.float32),
        node_cos_o=arr("cos_o", np.float32),
        node_cos_e=arr("cos_e", np.float32),
        node_two=arr("two", bool),
        node_right=arr("right", np.int32),
        node_leaf=arr("leaf", np.int32),
        light_trail=jnp.asarray(trail),
        light_depth=jnp.asarray(depth),
        light_in_bvh=jnp.asarray(finite),
        n_infinite=n_inf,
        n_total=n_flat,
    )


# --- device importance + descent ---------------------------------------------------


def _cos_sub_clamped(sin_a, cos_a, sin_b, cos_b):
    """cos(max(a - b, 0)) (pbrt trig-identity helper)."""
    return jnp.where(cos_a > cos_b, 1.0, cos_a * cos_b + sin_a * sin_b)


def _sin_sub_clamped(sin_a, cos_a, sin_b, cos_b):
    return jnp.where(cos_a > cos_b, 0.0, sin_a * cos_b - cos_a * sin_b)


def _node_importance(bvh: LightBVH, node, p, ns):
    """pbrt LightBounds::Importance (node_importance,
    bvh-light-sampler.jl:57-91). node (...,) int32; p/ns (..., 3)."""
    lo = bvh.node_lo[node]
    hi = bvh.node_hi[node]
    pc = 0.5 * (lo + hi)
    d2 = jnp.sum((p - pc) ** 2, -1)
    diag2 = jnp.sum((hi - lo) ** 2, -1)
    d2 = jnp.maximum(d2, diag2 * 0.25)

    wi = (p - pc) / jnp.sqrt(jnp.maximum(d2, 1e-12))[..., None]
    cos_t = jnp.sum(bvh.node_w[node] * wi, -1)
    cos_t = jnp.where(bvh.node_two[node], jnp.abs(cos_t), cos_t)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))

    # subtended half-angle of the cluster from p
    cos_u2 = jnp.clip(1.0 - diag2 * 0.25 / jnp.maximum(d2, 1e-12), 0.0, 1.0)
    cos_u = jnp.sqrt(cos_u2)
    sin_u = jnp.sqrt(jnp.maximum(1.0 - cos_u2, 0.0))

    cos_o = bvh.node_cos_o[node]
    sin_o = jnp.sqrt(jnp.maximum(1.0 - cos_o * cos_o, 0.0))
    # cos(theta') where theta' = max(theta - theta_o - theta_u, 0)
    cos_tp = _cos_sub_clamped(
        _sin_sub_clamped(sin_t, cos_t, sin_o, cos_o),
        _cos_sub_clamped(sin_t, cos_t, sin_o, cos_o),
        sin_u, cos_u,
    )
    sin_tp = _sin_sub_clamped(
        _sin_sub_clamped(sin_t, cos_t, sin_o, cos_o),
        _cos_sub_clamped(sin_t, cos_t, sin_o, cos_o),
        sin_u, cos_u,
    )
    imp = bvh.node_phi[node] * cos_tp / d2
    # cone cutoff: theta' >= theta_e -> no contribution
    imp = jnp.where(cos_tp <= bvh.node_cos_e[node], 0.0, imp)

    # receiver-side clamp (surface normal known)
    cos_i = jnp.abs(jnp.sum(wi * ns, -1))
    sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 0.0))
    cos_ip = _cos_sub_clamped(sin_i, cos_i, sin_u, cos_u)
    imp = imp * jnp.where(jnp.any(ns != 0.0, -1), cos_ip, 1.0)
    return jnp.maximum(imp, 0.0)


def bvh_sample_light(bvh: LightBVH, p, ns, u):
    """Stochastic descent -> (flat light id, pmf) (bvh_sample_light,
    bvh-light-sampler.jl:103-200). Lanes with no valid pick return pmf 0."""
    n = p.shape[0]
    n_inf = bvh.n_infinite
    has_tree = bool(bvh.node_leaf.shape[0] > 0) and bvh.n_total > n_inf
    p_inf = n_inf / (n_inf + (1.0 if has_tree else 0.0)) if n_inf else 0.0

    pick_inf = u < p_inf
    # infinite branch: uniform among the infinite lights (they sit at the
    # tail of the flat list in our packing)
    u_inf = jnp.where(pick_inf, u / max(p_inf, 1e-9), 0.0)
    inf_ids = jnp.nonzero(
        ~bvh.light_in_bvh, size=max(n_inf, 1), fill_value=0
    )[0]
    k = jnp.clip((u_inf * max(n_inf, 1)).astype(jnp.int32), 0, max(n_inf - 1, 0))
    inf_light = inf_ids[k]
    inf_pmf = p_inf / max(n_inf, 1)

    # tree branch
    u_t = jnp.where(pick_inf, 0.0, (u - p_inf) / max(1.0 - p_inf, 1e-9))
    state = dict(
        node=jnp.zeros((n,), jnp.int32),
        pmf=jnp.full((n,), 1.0 - p_inf, jnp.float32),
        u=u_t,
        done=jnp.zeros((n,), bool) | pick_inf | (not has_tree),
        light=jnp.zeros((n,), jnp.int32),
        ok=jnp.ones((n,), bool),
    )

    def cond(s):
        return jnp.any(~s["done"])

    def body(s):
        node = s["node"]
        leaf = bvh.node_leaf[node]
        at_leaf = ~s["done"] & (leaf >= 0)
        light = jnp.where(at_leaf, leaf, s["light"])
        done = s["done"] | at_leaf

        left = node + 1
        right = jnp.maximum(bvh.node_right[node], 0)
        i_l = _node_importance(bvh, left, p, ns)
        i_r = _node_importance(bvh, right, p, ns)
        tot = i_l + i_r
        dead = ~done & (tot <= 0.0)
        ok = s["ok"] & ~dead
        done = done | dead
        p_l = jnp.where(tot > 0.0, i_l / jnp.maximum(tot, 1e-12), 0.5)
        go_l = s["u"] < p_l
        u_new = jnp.where(
            go_l, s["u"] / jnp.maximum(p_l, 1e-9),
            (s["u"] - p_l) / jnp.maximum(1.0 - p_l, 1e-9),
        )
        u_new = jnp.clip(u_new, 0.0, 1.0 - 1e-7)
        pmf = jnp.where(~done, s["pmf"] * jnp.where(go_l, p_l, 1.0 - p_l), s["pmf"])
        node = jnp.where(~done, jnp.where(go_l, left, right), node)
        return dict(node=node, pmf=pmf, u=jnp.where(done, s["u"], u_new),
                    done=done, light=light, ok=ok)

    state = jax.lax.while_loop(cond, body, state)
    light = jnp.where(pick_inf, inf_light, state["light"])
    pmf = jnp.where(pick_inf, inf_pmf, jnp.where(state["ok"], state["pmf"], 0.0))
    return light.astype(jnp.int32), pmf


def bvh_pmf(bvh: LightBVH, p, ns, flat_light):
    """Replay pmf of a specific light via its bit trail
    (bvh_pmf / light_to_bit_trail, bvh-light-sampler.jl:202-269)."""
    n = p.shape[0]
    n_inf = bvh.n_infinite
    has_tree = bvh.n_total > n_inf
    p_inf = n_inf / (n_inf + (1.0 if has_tree else 0.0)) if n_inf else 0.0

    li = jnp.clip(flat_light, 0, bvh.light_trail.shape[0] - 1)
    in_bvh = bvh.light_in_bvh[li]
    trail = bvh.light_trail[li]
    depth = bvh.light_depth[li]

    state = dict(
        node=jnp.zeros((n,), jnp.int32),
        pmf=jnp.full((n,), 1.0 - p_inf, jnp.float32),
        lvl=jnp.zeros((n,), jnp.int32),
    )

    def cond(s):
        return jnp.any(s["lvl"] < depth)

    def body(s):
        active = s["lvl"] < depth
        node = s["node"]
        left = node + 1
        right = jnp.maximum(bvh.node_right[node], 0)
        i_l = _node_importance(bvh, left, p, ns)
        i_r = _node_importance(bvh, right, p, ns)
        tot = jnp.maximum(i_l + i_r, 1e-12)
        bit = (trail >> s["lvl"].astype(jnp.uint32)) & 1
        p_br = jnp.where(bit == 0, i_l / tot, i_r / tot)
        pmf = jnp.where(active, s["pmf"] * p_br, s["pmf"])
        node = jnp.where(active, jnp.where(bit == 0, left, right), node)
        return dict(node=node, pmf=pmf, lvl=s["lvl"] + 1)

    state = jax.lax.while_loop(cond, body, state)
    pmf_tree = state["pmf"]
    pmf_inf = p_inf / max(n_inf, 1) if n_inf else 0.0
    return jnp.where(in_bvh, pmf_tree, pmf_inf)
