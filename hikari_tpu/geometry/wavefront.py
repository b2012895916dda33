"""Wavefront packet traversal: the TPU-native ray-scene intersection engine.

Why not a per-lane BVH walk: TPUs have no per-lane gather hardware — the
skip-link traversal in traverse.py measures ~0.04 Mray/s on a v5e because
every loop step is a 65k-lane random gather, and the lockstep while_loop
runs until the slowest lane finishes. This module replaces pointer chasing
with dense tile compute, the shape the VPU is built for:

1. rays are sorted by (direction octant, origin Morton) so nearby lanes are
   coherent (classic packet tracing, Wald et al.);
2. triangles are grouped into *treelets* — contiguous runs of the BVH's
   spatially-sorted leaf order, each with an AABB;
3. a conservative interval slab test culls (ray-tile x treelet) pairs in
   one dense XLA pass — sign-uniform tiles make interval arithmetic exact;
4. a Pallas kernel sweeps the surviving pairs: each grid step intersects a
   1024-ray tile with a 128-triangle treelet entirely in VMEM
   (Moller-Trumbore over an (8, 128, TT) block), skipping masked-off steps
   with @pl.when. No gathers anywhere on the hot path.

Data layouts are chosen for the (8, 128) VPU register shape: per-ray
quantities live as (rows, 128) arrays (one tile = 8 sublane rows), triangle
components are pre-transposed to (T, 3, TT) so the kernel broadcasts them
along lanes without relayouts.

Replaces Raycore.closest_hit/any_hit for the TPU backend
(/root/reference/src/integrators/volpath/intersection.jl:200-324).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..core.pytree import pytree_dataclass
from .traverse import HitRecord

RAY_TILE = 1024    # rays per packet = 8 sublane rows x 128 lanes
LANES = 128
ROWS = RAY_TILE // LANES
TREELET = 1024      # triangles per treelet (TT)
KCHUNK = 1024       # in-kernel tri-axis chunk (VMEM sweet spot)


@pytree_dataclass
class Treelets:
    """Treelet-blocked triangle soup (device), lane-transposed."""

    lo: jnp.ndarray   # (T, 3) treelet AABB min
    hi: jnp.ndarray   # (T, 3)
    p0: jnp.ndarray   # (T, 3, TT) triangle base vertex, leaf order
    e1: jnp.ndarray   # (T, 3, TT) p1 - p0
    e2: jnp.ndarray   # (T, 3, TT) p2 - p0


def build_treelets(p0: np.ndarray, p1: np.ndarray, p2: np.ndarray) -> Treelets:
    """Host: block the BVH-leaf-ordered triangles into treelets of TREELET
    triangles; the leaf order is spatially coherent so treelet AABBs are
    tight. Padding uses far-away degenerate triangles that never hit."""
    p = len(p0)
    t = max(1, -(-p // TREELET))
    pad = t * TREELET - p

    def padded(a):
        fill = np.full((pad, 3), 3.0e37, np.float32)
        return np.concatenate([np.asarray(a, np.float32), fill])

    p0p, p1p, p2p = padded(p0), padded(p1), padded(p2)
    lo = np.minimum(np.minimum(p0p, p1p), p2p).reshape(t, TREELET, 3).min(1)
    hi = np.maximum(np.maximum(p0p, p1p), p2p).reshape(t, TREELET, 3).max(1)

    def lanes(a):  # (t*TT, 3) -> (T, 3, TT)
        return jnp.asarray(np.transpose(a.reshape(t, TREELET, 3), (0, 2, 1)))

    return Treelets(
        lo=jnp.asarray(lo), hi=jnp.asarray(hi),
        p0=lanes(p0p), e1=lanes(p1p - p0p), e2=lanes(p2p - p0p),
    )


# --- ray sorting ------------------------------------------------------------------


def _morton10(x):
    """Spread 10 bits -> 30 (uint32)."""
    x = x.astype(jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def ray_sort_keys(o, d, world_lo, world_hi):
    """uint32 sort key: direction octant (3 bits), fine direction Morton
    (15 bits: 5/axis of |d|), then origin Morton (14 bits).

    Tight direction sorting is what makes the per-tile frustum culling
    effective: without it a 1024-ray tile spans a whole octant and the
    interval slab test prunes almost nothing."""
    octant = (
        (d[..., 0] < 0).astype(jnp.uint32)
        | ((d[..., 1] < 0).astype(jnp.uint32) << 1)
        | ((d[..., 2] < 0).astype(jnp.uint32) << 2)
    )
    ad = jnp.abs(d)
    di = jnp.clip((ad * 31.0), 0.0, 31.0).astype(jnp.uint32)  # 5 bits/axis
    dm = (
        _morton10(di[..., 0]) | (_morton10(di[..., 1]) << 1)
        | (_morton10(di[..., 2]) << 2)
    ) & jnp.uint32(0x7FFF)

    ext = jnp.maximum(world_hi - world_lo, 1e-6)
    q = jnp.clip((o - world_lo) / ext, 0.0, 1.0)
    qi = (q * 31.0).astype(jnp.uint32)  # 5 bits per axis -> keep low 14
    m = (
        _morton10(qi[..., 0]) | (_morton10(qi[..., 1]) << 1)
        | (_morton10(qi[..., 2]) << 2)
    ) & jnp.uint32(0x3FFF)
    # octant-major (sign-uniform tiles keep the interval culling exact),
    # then origin locality, then fine direction: camera/shadow packets
    # (shared origin cell) end up direction-sorted, bounce rays
    # origin-sorted — both get tight bounding volumes
    return (octant << 29) | (m << 15) | (dm & jnp.uint32(0x7FFF))


# --- conservative tile x treelet culling --------------------------------------------


def tile_treelet_mask(o, d, t_max, tl: Treelets, n_tiles, sub: int = 8):
    """(n_tiles, T) bool: could any ray of tile i hit treelet t?

    Interval slab test per octant-uniform *sub-frustum* (the 1024-ray
    kernel tile is tested as the union of `sub` 128-ray frusta, which is
    strictly tighter than its hull); sub-frusta with mixed direction signs
    per axis fall back to 'cull nothing on that axis'."""
    n_tiles = n_tiles * sub
    br = RAY_TILE // sub
    ot = o.reshape(n_tiles, br, 3)
    dt = d.reshape(n_tiles, br, 3)
    tmt = t_max.reshape(n_tiles, br)

    o_lo = ot.min(1)            # (n_tiles, 3)
    o_hi = ot.max(1)
    d_lo = dt.min(1)
    d_hi = dt.max(1)
    t_hi = jnp.minimum(tmt.max(1), 3.0e37)  # (n_tiles,)

    sign_uniform = (d_lo * d_hi) > 0.0      # (n_tiles, 3)
    pos = d_lo > 0.0

    # reciprocal interval for sign-uniform axes: [1/d_hi, 1/d_lo] (pos)
    inv_a = 1.0 / jnp.where(pos, d_hi, d_lo)   # smaller magnitude bound
    inv_b = 1.0 / jnp.where(pos, d_lo, d_hi)
    lo = tl.lo[None, :, :]                     # (1, T, 3)
    hi = tl.hi[None, :, :]
    s_min = lo - o_hi[:, None, :]              # (n_tiles, T, 3)
    s_max = hi - o_lo[:, None, :]

    def imul(s1, s2, r1, r2):
        a = s1 * r1
        b = s1 * r2
        c = s2 * r1
        e = s2 * r2
        return (
            jnp.minimum(jnp.minimum(a, b), jnp.minimum(c, e)),
            jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, e)),
        )

    t_ent_min, t_ent_max = imul(
        s_min, s_max, inv_a[:, None, :], inv_b[:, None, :]
    )
    axis_enter_lo = jnp.minimum(t_ent_min, t_ent_max)
    axis_exit_hi = jnp.maximum(t_ent_min, t_ent_max)

    su = sign_uniform[:, None, :]
    axis_enter_lo = jnp.where(su, axis_enter_lo, -3.0e37)
    axis_exit_hi = jnp.where(su, axis_exit_hi, 3.0e37)

    t_near = jnp.max(axis_enter_lo, axis=-1)   # (n_subtiles, T)
    t_far = jnp.min(axis_exit_hi, axis=-1)
    m = (t_near <= t_far * 1.0001) & (t_far > 0.0) & (t_near <= t_hi[:, None])
    # union of the sub-frustum tests per kernel tile
    return m.reshape(n_tiles // sub, sub, -1).any(axis=1)


# --- the Pallas blocked-intersection kernel ------------------------------------------


def _intersect_kernel(mask_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      tmax_ref, p0_ref, e1_ref, e2_ref,
                      t_ref, tri_ref, b1_ref, b2_ref):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init():
        t_ref[:] = tmax_ref[:]
        tri_ref[:] = jnp.full_like(tri_ref, -1)
        b1_ref[:] = jnp.zeros_like(b1_ref)
        b2_ref[:] = jnp.zeros_like(b2_ref)

    # whole mask row for this tile lives in VMEM; pick this step's flag
    row = mask_ref[0]                                        # (1, T_pad)
    cols_m = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    live = jnp.sum(jnp.where(cols_m == t_idx, row, 0))

    @pl.when(live != 0)
    def _work():
        # rays: (ROWS, LANES) per component -> (ROWS, LANES, 1)
        ox = ox_ref[:][..., None]
        oy = oy_ref[:][..., None]
        oz = oz_ref[:][..., None]
        dx = dx_ref[:][..., None]
        dy = dy_ref[:][..., None]
        dz = dz_ref[:][..., None]

        # the treelet is processed in KCHUNK-wide slices: keeps live VMEM at
        # the sweet spot while the grid amortizes per-step overheads over
        # the full TREELET
        for k in range(TREELET // KCHUNK):
            s = slice(k * KCHUNK, (k + 1) * KCHUNK)
            # triangles: (1, 3, KCHUNK) -> (1, 1, KCHUNK) per component
            tp = p0_ref[:, :, s]
            te1 = e1_ref[:, :, s]
            te2 = e2_ref[:, :, s]
            p0x, p0y, p0z = tp[:, 0:1, :], tp[:, 1:2, :], tp[:, 2:3, :]
            e1x, e1y, e1z = te1[:, 0:1, :], te1[:, 1:2, :], te1[:, 2:3, :]
            e2x, e2y, e2z = te2[:, 0:1, :], te2[:, 1:2, :], te2[:, 2:3, :]

            # Moller-Trumbore over the (ROWS, LANES, KCHUNK) block
            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            det = e1x * hx + e1y * hy + e1z * hz
            inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

            sx = ox - p0x
            sy = oy - p0y
            sz = oz - p0z
            u = (sx * hx + sy * hy + sz * hz) * inv_det
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

            eps = 1e-7
            hit = (
                (jnp.abs(det) > 1e-12)
                & (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps)
                & (t > 1e-4)
            )
            t_best = t_ref[:]                                 # (ROWS, LANES)
            t_cand = jnp.where(hit, t, 3.0e38)
            t_new = jnp.min(t_cand, axis=-1)
            cols = jax.lax.broadcasted_iota(jnp.int32, t_cand.shape, 2)
            j = jnp.min(
                jnp.where(t_cand <= t_new[..., None], cols, jnp.int32(2**30)),
                axis=-1,
            )
            onehot = (cols == j[..., None]).astype(t.dtype)
            u_new = jnp.sum(u * onehot, axis=-1)
            v_new = jnp.sum(v * onehot, axis=-1)
            better = t_new < t_best
            t_ref[:] = jnp.where(better, t_new, t_best)
            base = t_idx * TREELET + k * KCHUNK
            tri_ref[:] = jnp.where(better, base + j, tri_ref[:])
            b1_ref[:] = jnp.where(better, u_new, b1_ref[:])
            b2_ref[:] = jnp.where(better, v_new, b2_ref[:])


def _pad_rays(o, d, t_max):
    n = o.shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    pad = n_pad - n
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    return o, d, t_max, n, n_pad


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit_packets(
    tl: Treelets, o, d, t_max, world_lo, world_hi, interpret: bool = False,
    active=None,
) -> HitRecord:
    """Sorted-packet closest hit. o/d (R,3), t_max (R,). Returns HitRecord
    with tri indices into the BVH leaf order (same convention as
    traverse.closest_hit).

    active: optional (R,) bool — inactive lanes are sorted into their own
    tiles with t_max 0, so the culling pass masks those tiles off entirely
    (late bounces with few live paths then cost almost nothing)."""
    t_max = jnp.where(jnp.isfinite(t_max), t_max, 3.0e37)
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)
    o, d, t_max, n, n_pad = _pad_rays(o, d, t_max)
    n_tiles = n_pad // RAY_TILE
    n_rows = n_pad // LANES
    n_treelets = tl.lo.shape[0]

    keys = ray_sort_keys(o, d, world_lo, world_hi)
    if active is not None:
        act_pad = jnp.concatenate(
            [active, jnp.zeros((n_pad - n,), bool)]
        ) if n_pad > n else active
        keys = jnp.where(act_pad, keys, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(keys)
    inv_order = jnp.argsort(order)
    os_ = o[order]
    ds = d[order]
    ts = t_max[order]

    mask = tile_treelet_mask(os_, ds, ts, tl, n_tiles).astype(jnp.int32)
    t_pad = -(-n_treelets // 128) * 128
    mask3 = jnp.zeros((n_tiles, 1, t_pad), jnp.int32).at[:, 0, :n_treelets].set(mask)

    def rows(x):  # (n_pad,) -> (n_rows, 128)
        return x.reshape(n_rows, LANES)

    ray_comps = [rows(os_[:, 0]), rows(os_[:, 1]), rows(os_[:, 2]),
                 rows(ds[:, 0]), rows(ds[:, 1]), rows(ds[:, 2]),
                 rows(ts)]

    grid = (n_tiles, n_treelets)
    out_shape = [
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),   # t
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),     # tri
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),   # b1
        jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),   # b2
    ]
    row_spec = lambda: pl.BlockSpec((ROWS, LANES), lambda i, t: (i, 0))
    tri_spec = lambda: pl.BlockSpec((1, 3, TREELET), lambda i, t: (t, 0, 0))
    t_res, tri, b1, b2 = pl.pallas_call(
        _intersect_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, t_pad), lambda i, t: (i, 0, 0)),  # mask row
            row_spec(), row_spec(), row_spec(),                    # ox oy oz
            row_spec(), row_spec(), row_spec(),                    # dx dy dz
            row_spec(),                                            # tmax
            tri_spec(), tri_spec(), tri_spec(),                    # p0 e1 e2
        ],
        out_specs=[row_spec(), row_spec(), row_spec(), row_spec()],
        out_shape=out_shape,
        interpret=interpret,
    )(mask3, *ray_comps, tl.p0, tl.e1, tl.e2)

    # unsort and strip padding
    t_res = t_res.reshape(-1)[inv_order][:n]
    tri = tri.reshape(-1)[inv_order][:n]
    b1 = b1.reshape(-1)[inv_order][:n]
    b2 = b2.reshape(-1)[inv_order][:n]
    return HitRecord(hit=tri >= 0, t=t_res, tri=tri, b1=b1, b2=b2)


def _occlusion_kernel(mask_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      tmax_ref, p0_ref, e1_ref, e2_ref, occ_ref):
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init():
        # lanes with no shadow ray (t_max <= 0) are pre-resolved
        occ_ref[:] = (tmax_ref[:] <= 0.0).astype(jnp.int32)

    row = mask_ref[0]
    cols_m = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    live = jnp.sum(jnp.where(cols_m == t_idx, row, 0))
    # early-out: once every lane in the tile is resolved, skip the rest of
    # the treelet sweep (shadow rays resolve after a few treelets)
    unresolved = jnp.sum(1 - occ_ref[:])

    @pl.when((live != 0) & (unresolved > 0))
    def _work():
        ox = ox_ref[:][..., None]
        oy = oy_ref[:][..., None]
        oz = oz_ref[:][..., None]
        dx = dx_ref[:][..., None]
        dy = dy_ref[:][..., None]
        dz = dz_ref[:][..., None]
        for k in range(TREELET // KCHUNK):
            s = slice(k * KCHUNK, (k + 1) * KCHUNK)
            tp = p0_ref[:, :, s]
            te1 = e1_ref[:, :, s]
            te2 = e2_ref[:, :, s]
            p0x, p0y, p0z = tp[:, 0:1, :], tp[:, 1:2, :], tp[:, 2:3, :]
            e1x, e1y, e1z = te1[:, 0:1, :], te1[:, 1:2, :], te1[:, 2:3, :]
            e2x, e2y, e2z = te2[:, 0:1, :], te2[:, 1:2, :], te2[:, 2:3, :]

            hx = dy * e2z - dz * e2y
            hy = dz * e2x - dx * e2z
            hz = dx * e2y - dy * e2x
            det = e1x * hx + e1y * hy + e1z * hz
            inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            sx = ox - p0x
            sy = oy - p0y
            sz = oz - p0z
            u = (sx * hx + sy * hy + sz * hz) * inv_det
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            eps = 1e-7
            hit = (
                (jnp.abs(det) > 1e-12)
                & (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps)
                & (t > 1e-4) & (t < tmax_ref[:][..., None])
            )
            occ_ref[:] = occ_ref[:] | jnp.any(hit, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def any_hit_packets(tl, o, d, t_max, world_lo, world_hi, interpret=False,
                    active=None):
    """Occlusion-only sweep with per-tile early-out once every lane has
    found a hit (shadow rays are the cheap half of the frame)."""
    t_max = jnp.where(jnp.isfinite(t_max), t_max, 3.0e37) * 0.9999
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)
    o, d, t_max, n, n_pad = _pad_rays(o, d, t_max)
    # padding lanes carry t_max=0 -> pre-resolved
    t_max = t_max.at[n:].set(0.0) if n_pad > n else t_max
    n_tiles = n_pad // RAY_TILE
    n_rows = n_pad // LANES
    n_treelets = tl.lo.shape[0]

    keys = ray_sort_keys(o, d, world_lo, world_hi)
    keys = jnp.where(t_max > 0.0, keys, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(keys)
    inv_order = jnp.argsort(order)
    os_ = o[order]
    ds = d[order]
    ts = t_max[order]

    mask = tile_treelet_mask(os_, ds, ts, tl, n_tiles).astype(jnp.int32)
    t_pad = -(-n_treelets // 128) * 128
    mask3 = jnp.zeros((n_tiles, 1, t_pad), jnp.int32).at[:, 0, :n_treelets].set(mask)

    def rows(x):
        return x.reshape(n_rows, LANES)

    ray_comps = [rows(os_[:, 0]), rows(os_[:, 1]), rows(os_[:, 2]),
                 rows(ds[:, 0]), rows(ds[:, 1]), rows(ds[:, 2]),
                 rows(ts)]
    row_spec = lambda: pl.BlockSpec((ROWS, LANES), lambda i, t: (i, 0))
    tri_spec = lambda: pl.BlockSpec((1, 3, TREELET), lambda i, t: (t, 0, 0))
    occ = pl.pallas_call(
        _occlusion_kernel,
        grid=(n_tiles, n_treelets),
        in_specs=[
            pl.BlockSpec((1, 1, t_pad), lambda i, t: (i, 0, 0)),
            row_spec(), row_spec(), row_spec(),
            row_spec(), row_spec(), row_spec(),
            row_spec(),
            tri_spec(), tri_spec(), tri_spec(),
        ],
        out_specs=[row_spec()],
        out_shape=[jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32)],
        interpret=interpret,
    )(mask3, *ray_comps, tl.p0, tl.e1, tl.e2)[0]

    occ = occ.reshape(-1)[inv_order][:n]
    # lanes pre-resolved by t_max <= 0 (inactive/padding) are not occluded
    return (occ > 0) & (t_max[:n] > 0.0)
