"""Instanced (two-level / TLAS) packet traversal.

The reference scene sits on Raycore's TLAS/Instance layer
(/root/reference/src/Hikari.jl:22-37; world-space hit reconstruction in
src/surface_interaction.jl:313-482): one BLAS per mesh, many placements,
memory proportional to unique geometry. Round 1 flattened instances at
build time; this module adds the TPU-native two-level path:

- BLAS: each unique mesh keeps ONE copy of its BVH-leaf-ordered triangles,
  blocked into object-space Baldwin-Weber treelets (shared `bw` blocks).
- "World treelets": one entry per (instance x blas-treelet) holding only a
  world-space AABB + (instance id, blas treelet id) — 32 B/entry, so a
  thousand instances of a mesh cost kilobytes, not copies of the mesh.
- The tile x treelet cull and pair compaction run unchanged over world
  treelet AABBs (wavefront.tile_treelet_mask / _build_pairs).
- The sweep kernel transforms the ray *tile* into the instance's object
  space before the BW matmuls: [o,1] @ A and [d,0] @ A with
  A = inv(world_from_object)^T. Directions stay unnormalized, so the
  object-space hit parameter t equals the world-space t — no per-hit
  reconstruction transform is needed for positions (p = o_world + t d_world).
  Only shading normals need the per-instance inverse-transpose.

Hit records return tri = world_treelet * TREELET + j; callers decode the
instance (ti_inst[wt]) and the shared object-space face (ti_obj[wt]*TT + j)
with two 1-element gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..core.pytree import pytree_dataclass
from .traverse import HitRecord
from .wavefront import (
    LANES, PAIR_CHUNK, RAY_TILE, ROWS, TILE_SHIFT, TREELET, TREELET_MASK,
    Treelets, _build_pairs, _pad_rays, _sort_wavefront, _unsort_hits,
    _world_exit_clamp, build_treelets, ray_sort_keys, tile_treelet_mask,
)


@pytree_dataclass
class InstancedTreelets:
    """Two-level treelet tables (device)."""

    lo: jnp.ndarray       # (Tw, 3) world AABB per (instance, blas treelet)
    hi: jnp.ndarray       # (Tw, 3)
    bw: jnp.ndarray       # (Tb, 24, 3*TT) shared object-space BW blocks
    ti_obj: jnp.ndarray   # (Tw,) int32 -> blas treelet id
    ti_inst: jnp.ndarray  # (Tw,) int32 -> instance id
    inst_a: jnp.ndarray   # (I, 4, 4) f32: [o,1] @ A = [o_obj, 1]


def build_instanced_treelets(
    blas_tris: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    instances: list[tuple[int, np.ndarray]],
) -> InstancedTreelets:
    """blas_tris: per BLAS, leaf-ordered (p0, p1, p2) — each PRE-PADDED to a
    multiple of TREELET with degenerate triangles so face-attribute indices
    align. instances: (blas_id, world_from_object 4x4) per instance."""
    blas_tl: list[Treelets] = []
    blas_base: list[int] = []
    base = 0
    for p0, p1, p2 in blas_tris:
        assert len(p0) % TREELET == 0, "BLAS triangles must be TT-padded"
        # the instanced kernels hardcode the 3-way in-kernel ray split
        # (_split3_block), so their bw blocks stay K=24 regardless of the
        # flat path's HIKARI_SPLIT setting
        tl = build_treelets(p0, p1, p2, split=3)
        blas_tl.append(tl)
        blas_base.append(base)
        base += tl.lo.shape[0]
    bw = jnp.concatenate([tl.bw for tl in blas_tl], axis=0)

    lo_l, hi_l, obj_l, inst_l, mats = [], [], [], [], []
    for ii, (bid, m) in enumerate(instances):
        m = np.asarray(m, np.float64).reshape(4, 4)
        tl = blas_tl[bid]
        olo = np.asarray(tl.lo)   # (T, 3) object-space treelet AABBs
        ohi = np.asarray(tl.hi)
        # transform the 8 AABB corners to world, rebound
        corners = np.stack([
            np.where(np.array(mask)[None, :], ohi, olo)
            for mask in ((0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
                         (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1))
        ], axis=1)  # (T, 8, 3)
        wc = corners @ m[:3, :3].T + m[:3, 3]
        # degenerate padding treelets keep their huge sentinel bounds
        pad = olo[:, 0] > 1.0e37
        wlo = np.where(pad[:, None], olo, wc.min(axis=1)).astype(np.float32)
        whi = np.where(pad[:, None], ohi, wc.max(axis=1)).astype(np.float32)
        nt = olo.shape[0]
        lo_l.append(wlo)
        hi_l.append(whi)
        obj_l.append(np.arange(nt, dtype=np.int32) + blas_base[bid])
        inst_l.append(np.full(nt, ii, np.int32))
        a = np.linalg.inv(m).T  # last column [0,0,0,1]^T by construction
        mats.append(a.astype(np.float32))

    n_world = sum(len(x) for x in obj_l)
    assert n_world <= TREELET_MASK, (
        f"{n_world} world treelets exceed the {TILE_SHIFT}-bit "
        "pair-metadata field; reduce instance count or raise TREELET"
    )
    return InstancedTreelets(
        lo=jnp.asarray(np.concatenate(lo_l)),
        hi=jnp.asarray(np.concatenate(hi_l)),
        bw=bw,
        ti_obj=jnp.asarray(np.concatenate(obj_l)),
        ti_inst=jnp.asarray(np.concatenate(inst_l)),
        inst_a=jnp.asarray(np.stack(mats)),
    )


def _split3_block(x):
    """(R, 4) f32 -> (R, 24) bf16 in-kernel: [x1 x1 x2 x1 x3 x2]."""
    x1 = x.astype(jnp.bfloat16)
    r = x - x1.astype(jnp.float32)
    x2 = r.astype(jnp.bfloat16)
    x3 = (r - x2.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([x1, x1, x2, x1, x3, x2], axis=1)


def _bw_block_inst(o4, d4, a44, m6):
    """Object-space transform + the BW matmuls. o4/d4 (R, 4) f32, a44
    (4, 4), m6 (24, 3TT) bf16."""
    dims = (((1,), (0,)), ((), ()))
    oo = jax.lax.dot_general(o4, a44, dims, preferred_element_type=jnp.float32)
    dd = jax.lax.dot_general(d4, a44, dims, preferred_element_type=jnp.float32)
    a6 = _split3_block(oo)
    d6 = _split3_block(dd)
    mo = jax.lax.dot_general(a6, m6, dims, preferred_element_type=jnp.float32)
    md = jax.lax.dot_general(d6, m6, dims, preferred_element_type=jnp.float32)
    num, au, av = mo[:, :TREELET], mo[:, TREELET:2 * TREELET], mo[:, 2 * TREELET:]
    den, bu, bv = md[:, :TREELET], md[:, TREELET:2 * TREELET], md[:, 2 * TREELET:]
    t = -num / jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
    u = au + t * bu
    v = av + t * bv
    return t, u, v, den


def _closest_inst_kernel(meta_ref, tobj_ref, tinst_ref, tnear_ref,
                         o4_ref, d4_ref,
                         ti_ref, tri_i_ref, b1_i_ref, b2_i_ref,
                         bw_ref, a_ref,
                         t_ref, tri_ref, b1_ref, b2_ref):
    p = pl.program_id(0)
    m = meta_ref[p]
    tile = m >> TILE_SHIFT
    treelet = m & TREELET_MASK
    prev_tile = meta_ref[jnp.maximum(p - 1, 0)] >> TILE_SHIFT

    @pl.when((p == 0) | (tile != prev_tile))
    def _init():
        t_ref[0] = ti_ref[0]
        tri_ref[0] = tri_i_ref[0]
        b1_ref[0] = b1_i_ref[0]
        b2_ref[0] = b2_i_ref[0]

    thr_bits = jnp.max(jax.lax.bitcast_convert_type(t_ref[0], jnp.int32))

    @pl.when(tnear_ref[p] < thr_bits)
    def _work():
        t, u, v, den = _bw_block_inst(
            o4_ref[:], d4_ref[:], a_ref[0], bw_ref[0])
        eps = 1e-6
        hit = (
            (jnp.abs(den) > 1e-20)
            & (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps)
            & (t > 1e-4)
        )
        t_best = t_ref[0]
        t_cand = jnp.where(hit, t, 3.0e38)
        t_new = jnp.min(t_cand, axis=-1, keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, t_cand.shape, 1)
        j = jnp.min(
            jnp.where(t_cand <= t_new, cols, jnp.int32(2**30)),
            axis=-1, keepdims=True,
        )
        onehot = (cols == j).astype(t.dtype)
        u_new = jnp.sum(u * onehot, axis=-1, keepdims=True)
        v_new = jnp.sum(v * onehot, axis=-1, keepdims=True)
        better = t_new < t_best
        t_ref[0] = jnp.where(better, t_new, t_best)
        tri_ref[0] = jnp.where(better, treelet * TREELET + j, tri_ref[0])
        b1_ref[0] = jnp.where(better, u_new, b1_ref[0])
        b2_ref[0] = jnp.where(better, v_new, b2_ref[0])


def _occlusion_inst_kernel(meta_ref, tobj_ref, tinst_ref, tnear_ref,
                           o4_ref, d4_ref, tmax_ref, occ_i_ref,
                           bw_ref, a_ref, occ_ref):
    p = pl.program_id(0)
    m = meta_ref[p]
    tile = m >> TILE_SHIFT
    prev_tile = meta_ref[jnp.maximum(p - 1, 0)] >> TILE_SHIFT

    @pl.when((p == 0) | (tile != prev_tile))
    def _init():
        occ_ref[0] = occ_i_ref[0]

    # resolved-tile early-out + beyond-all-lights distance cap
    live_reach_bits = jnp.max(jax.lax.bitcast_convert_type(
        jnp.where(occ_ref[0] == 0, tmax_ref[0], 0.0), jnp.int32))

    @pl.when(tnear_ref[p] < live_reach_bits)
    def _work():
        t, u, v, den = _bw_block_inst(
            o4_ref[:], d4_ref[:], a_ref[0], bw_ref[0])
        eps = 1e-6
        hit = (
            (jnp.abs(den) > 1e-20)
            & (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps)
            & (t > 1e-4) & (t < tmax_ref[0])
        )
        occ_ref[0] = occ_ref[0] | jnp.any(hit, axis=-1, keepdims=True).astype(jnp.int32)


def _ray_blocks(os_, ds):
    n = os_.shape[0]
    o4 = jnp.concatenate([os_, jnp.ones((n, 1), jnp.float32)], axis=1)
    d4 = jnp.concatenate([ds, jnp.zeros((n, 1), jnp.float32)], axis=1)
    return o4, d4


def _sweep_chunks_inst(kernel, meta, n_pairs, tnear_pair, tl, o4, d4,
                       carry_in, extra_inputs, n_tiles, interpret):
    """Instanced pair sweep: scalar-prefetch carries (meta, ti_obj,
    ti_inst); the bw block indexes through ti_obj and the instance matrix
    through ti_inst."""
    from jax.experimental.pallas import tpu as pltpu

    P = meta.shape[0]
    chunk = min(PAIR_CHUNK, P)
    n_chunks = -(-P // chunk)
    if n_chunks * chunk > P:
        pad = n_chunks * chunk - P
        meta = jnp.concatenate([meta, jnp.broadcast_to(meta[-1:], (pad,))])
        tnear_pair = jnp.concatenate(
            [tnear_pair, jnp.broadcast_to(tnear_pair[-1:], (pad,))])

    state_spec = lambda: pl.BlockSpec(
        (1, RAY_TILE, 1), lambda p, m, to, ti, tn: (m[p] >> TILE_SHIFT, 0, 0))
    ray_spec = lambda: pl.BlockSpec(
        (RAY_TILE, 4), lambda p, m, to, ti, tn: (m[p] >> TILE_SHIFT, 0))
    bw_spec = pl.BlockSpec(
        (1, 24, 3 * TREELET),
        lambda p, m, to, ti, tn: (to[m[p] & TREELET_MASK], 0, 0))
    a_spec = pl.BlockSpec(
        (1, 4, 4), lambda p, m, to, ti, tn: (ti[m[p] & TREELET_MASK], 0, 0))
    specs = [ray_spec(), ray_spec()]

    n_carry = len(carry_in)
    out_shape = [jax.ShapeDtypeStruct((n_tiles, RAY_TILE, 1), c.dtype)
                 for c in carry_in]
    in_specs = (
        specs
        + [state_spec() for _ in extra_inputs]
        + [state_spec() for _ in range(n_carry)]
        + [bw_spec, a_spec]
    )

    def st(x):
        return x.reshape(n_tiles, RAY_TILE, 1)

    carry = tuple(st(c) for c in carry_in)
    extra = [st(x) for x in extra_inputs]
    tnear_bits = jax.lax.bitcast_convert_type(tnear_pair, jnp.int32)
    for c in range(n_chunks):
        meta_c = jax.lax.dynamic_slice(meta, (c * chunk,), (chunk,))
        tn_c = jax.lax.dynamic_slice(tnear_bits, (c * chunk,), (chunk,))
        inputs = [o4, d4] + extra + list(carry) + [tl.bw, tl.inst_a]
        if interpret:
            g = chunk
        else:
            g = jnp.clip(n_pairs - c * chunk, 1, chunk)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(g,),
            in_specs=in_specs,
            out_specs=[state_spec() for _ in range(n_carry)],
        )
        carry = tuple(pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(meta_c, tl.ti_obj, tl.ti_inst, tn_c, *inputs))
    return carry


def _pair_tnear(meta, tnear, n_pairs):
    """Per-pair conservative entry t gathered from the (n_tiles, T) grid."""
    tile = meta >> TILE_SHIFT
    treelet = meta & TREELET_MASK
    return tnear[tile, treelet]


@functools.partial(jax.jit,
                   static_argnames=("interpret", "compact", "presorted"))
def closest_hit_instanced(
    tl: InstancedTreelets, o, d, t_max, world_lo, world_hi,
    interpret: bool = False, active=None, compact: bool | None = None,
    presorted: bool = False,
) -> HitRecord:
    """Two-level closest hit. Returns tri = world_treelet * TREELET + j.

    compact: live-lane static-prefix cascade, as in closest_hit_packets.
    presorted: skip the internal sort/unsort — the caller already ordered
    lanes tile-coherently with live lanes first (see closest_hit_packets)."""
    from .wavefront import _prefix_levels, _run_cascade

    if compact is None:
        compact = not interpret
    t_max = jnp.where(jnp.isfinite(t_max), t_max, 3.0e37)
    t_max = _world_exit_clamp(o, d, t_max, world_lo, world_hi)
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)
    o, d, t_max, n, n_pad = _pad_rays(o, d, t_max)
    assert n_pad // RAY_TILE <= (1 << (31 - TILE_SHIFT)) - 1, \
        "ray count exceeds tile field"

    if presorted:
        order, os_, ds, ts = None, o, d, t_max
    else:
        keys = ray_sort_keys(o, d, world_lo, world_hi)
        keys = jnp.minimum(keys, jnp.uint32(0xFFFFFFFE))
        keys = jnp.where(t_max > 0.0, keys, jnp.uint32(0xFFFFFFFF))
        order, os_, ds, ts = _sort_wavefront(o, d, t_max, keys)

    def run(sz):
        os_s, ds_s, ts_s = os_[:sz], ds[:sz], ts[:sz]
        n_tiles = sz // RAY_TILE
        mask, tnear = tile_treelet_mask(os_s, ds_s, ts_s, tl, n_tiles)
        meta, n_pairs, _seg = _build_pairs(mask, tnear)
        tnear_pair = _pair_tnear(meta, tnear, n_pairs)

        o4, d4 = _ray_blocks(os_s, ds_s)
        carry_in = (ts_s, jnp.full((sz,), -1, jnp.int32),
                    jnp.zeros((sz,), jnp.float32),
                    jnp.zeros((sz,), jnp.float32))

        t_res, tri, b1, b2 = _sweep_chunks_inst(
            _closest_inst_kernel, meta, n_pairs, tnear_pair, tl, o4, d4,
            carry_in, [], n_tiles, interpret)
        t_res, tri, b1, b2 = (x.reshape(-1) for x in (t_res, tri, b1, b2))
        pad = n_pad - sz
        if pad:  # beyond-prefix lanes are dead: pad with misses
            t_res = jnp.concatenate([t_res, jnp.zeros((pad,), t_res.dtype)])
            b1 = jnp.concatenate([b1, jnp.zeros((pad,), b1.dtype)])
            b2 = jnp.concatenate([b2, jnp.zeros((pad,), b2.dtype)])
            tri = jnp.concatenate([tri, jnp.full((pad,), -1, tri.dtype)])
        return t_res, tri, b1, b2

    levels = _prefix_levels(n_pad) if compact else [n_pad]
    if len(levels) > 1:
        live = jnp.sum((ts > 0.0).astype(jnp.int32))
        t_res, tri, b1, b2 = _run_cascade(live, levels, run)
    else:
        t_res, tri, b1, b2 = run(n_pad)

    if order is not None:
        t_res, b1, b2, tri = _unsort_hits(order, n_pad, t_res, b1, b2, tri)
    t_res, tri, b1, b2 = t_res[:n], tri[:n], b1[:n], b2[:n]
    return HitRecord(hit=tri >= 0, t=t_res, tri=tri, b1=b1, b2=b2)


@functools.partial(jax.jit, static_argnames=("interpret", "compact"))
def any_hit_instanced(tl, o, d, t_max, world_lo, world_hi, interpret=False,
                      active=None, group=None, compact: bool | None = None):
    from .wavefront import _prefix_levels, _run_cascade

    if compact is None:
        compact = not interpret
    t_max = jnp.where(jnp.isfinite(t_max), t_max, 3.0e37) * 0.9999
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)
    if group is not None:
        group = jnp.concatenate(
            [group, jnp.zeros((-len(group)) % RAY_TILE, group.dtype)])
    o, d, t_max, n, n_pad = _pad_rays(o, d, t_max)
    t_max = t_max.at[n:].set(0.0) if n_pad > n else t_max

    keys = ray_sort_keys(o, d, world_lo, world_hi)
    if group is not None:
        keys = ((group.astype(jnp.uint32) & jnp.uint32(63)) << 26) | (keys >> 6)
    keys = jnp.minimum(keys, jnp.uint32(0xFFFFFFFE))
    keys = jnp.where(t_max > 0.0, keys, jnp.uint32(0xFFFFFFFF))
    order, os_, ds, ts = _sort_wavefront(o, d, t_max, keys)

    def run(sz):
        os_s, ds_s, ts_s = os_[:sz], ds[:sz], ts[:sz]
        n_tiles = sz // RAY_TILE
        mask, tnear = tile_treelet_mask(os_s, ds_s, ts_s, tl, n_tiles)
        meta, n_pairs, _seg = _build_pairs(mask, tnear)
        tnear_pair = _pair_tnear(meta, tnear, n_pairs)

        o4, d4 = _ray_blocks(os_s, ds_s)
        occ0 = (ts_s <= 0.0).astype(jnp.int32)

        (occ,) = _sweep_chunks_inst(
            _occlusion_inst_kernel, meta, n_pairs, tnear_pair, tl, o4, d4,
            (occ0,), [ts_s], n_tiles, interpret)
        occ = occ.reshape(-1)
        pad = n_pad - sz
        if pad:
            occ = jnp.concatenate([occ, jnp.zeros((pad,), occ.dtype)])
        return occ

    levels = _prefix_levels(n_pad) if compact else [n_pad]
    if len(levels) > 1:
        live = jnp.sum((ts > 0.0).astype(jnp.int32))
        occ = _run_cascade(live, levels, run)
    else:
        occ = run(n_pad)

    occ = jnp.zeros((n_pad,), jnp.int32).at[order].set(occ)[:n]
    return (occ > 0) & (t_max[:n] > 0.0)
