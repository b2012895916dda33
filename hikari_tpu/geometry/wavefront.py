"""Wavefront packet traversal: the TPU-native ray-scene intersection engine.

Why not a per-lane BVH walk: TPUs have no per-lane gather hardware — the
skip-link traversal in traverse.py measures ~0.04 Mray/s on a v5e because
every loop step is a 65k-lane random gather, and the lockstep while_loop
runs until the slowest lane finishes. This module replaces pointer chasing
with dense tile/matmul compute, the shape the MXU/VPU are built for:

1. rays are sorted by (direction octant, origin Morton) so nearby lanes are
   coherent (classic packet tracing, Wald et al.);
2. triangles are grouped into *treelets* — contiguous runs of the BVH's
   spatially-sorted leaf order, each with an AABB and a precomputed
   Baldwin-Weber affine matrix (see below);
3. a conservative interval slab test culls (ray-tile x treelet) pairs in
   one dense XLA pass — sign-uniform tiles make interval arithmetic exact;
4. the surviving pairs are compacted into a tile-major pair list (packed
   int32 scalar-prefetch array; the Mosaic grid is the *dynamic* pair
   count) with treelets visited in exact per-tile front-to-back order;
5. a Pallas kernel sweeps the pair list: each grid step intersects a
   1024-ray tile with a TREELET-triangle treelet as two MXU matmuls plus
   a short VPU epilogue, early-outing once no remaining treelet can beat
   the tile's worst best-hit.

Intersection is the Baldwin-Weber affine form rather than Moller-Trumbore:
for triangle (p0, e1, e2) with unnormalized normal n = e1 x e2,

    t(o, d) = -(n.o + dw) / (n.d),   dw = -n.p0
    u(p)    = a_u.p + b_u,           a_u = (e2 x n)/|n|^2, b_u = -a_u.p0
    v(p)    = a_v.p + b_v,           a_v = (n x e1)/|n|^2, b_v = -a_v.p0

so with u(o + t d) = (a_u.o + b_u) + t (a_u.d), every per-(ray, triangle)
quantity is an affine function of the ray with per-triangle coefficients:
six numbers num/den/au/bu/av/bv, computed as TWO matmuls ([o,1] @ M and
[d,0] @ M) that ride the MXU instead of ~40 VPU ops of cross products.
f32 accuracy on the MXU comes from a 3-way bf16 error split: each f32
x = x1 + x2 + x3 (bf16 each); the six significant partial products are
laid out along the contraction axis (K = 6 splits x 4 = 24), so ONE
single-pass bf16 matmul with f32 accumulation reproduces what XLA's
HIGHEST precision does in six passes.

Data layouts: per-ray split matrices are (R, 24) bf16; per-ray state is
(n_tiles, ROWS, LANES) so a tile is one block; triangle coefficients are
pre-transposed to (T, 24, 3*TT) bf16 (column groups: plane | u | v).

Replaces Raycore.closest_hit/any_hit for the TPU backend
(/root/reference/src/integrators/volpath/intersection.jl:200-324).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.pytree import pytree_dataclass
from .traverse import HitRecord

import os as _os

# rays per packet (sublane rows x 128 lanes); overridable for perf sweeps.
# Default 1024: under the tile-resident sweep the round-4 phase-4 A/B
# (idle host, same session) measured 4.03 Mray/s at 1024 vs 3.88 at 512 —
# with the per-pair grid overhead gone, halving the tile count (fewer
# while-loop segments, fewer DMA chains) beats the tighter 512-ray
# frusta. (The old pair-grid sweep preferred 512: PERF.md phase-6
# measured 2.695 at 512 vs 2.650 at 1024.) 256 fails to compile on the
# TPU backend (Mosaic internal error).
RAY_TILE = int(_os.environ.get("HIKARI_RAY_TILE", "1024"))
LANES = 128
ROWS = RAY_TILE // LANES
# triangles per treelet (TT); overridable for perf sweeps
TREELET = int(_os.environ.get("HIKARI_TREELET", "256"))
PAIR_CHUNK = 64 * 1024  # pairs per pallas_call; meta+tnear SMEM = 512 KB
# pair metadata packs (tile << TILE_SHIFT | treelet) into one int32. The
# tile field gets 31 - TILE_SHIFT usable bits: meta is int32 (scalar-
# prefetch arrays are int32 and `meta >> TILE_SHIFT` is an ARITHMETIC
# shift), so a tile index reaching the sign bit comes back negative and
# the Mosaic block index_map reads out of bounds — the round-3 default
# shift of 20 capped dispatches at 2047 tiles and made 800^2 x
# samp_batch=2 at RAY_TILE=512 (2500 tiles) die with an opaque "TPU
# backend error (Internal)". 16/15 bits: <= 65535 treelets (16.7M tris
# at TT=256) x <= 32767 ray tiles (16.7M rays per dispatch), both
# asserted at trace time.
TILE_SHIFT = 16
TREELET_MASK = (1 << TILE_SHIFT) - 1
MAX_TILES = (1 << (31 - TILE_SHIFT)) - 1
MAX_TREELETS = (1 << TILE_SHIFT) - 1


@pytree_dataclass
class Treelets:
    """Treelet-blocked triangle data (device), Baldwin-Weber form."""

    lo: jnp.ndarray   # (T, 3) treelet AABB min
    hi: jnp.ndarray   # (T, 3)
    sup_lo: jnp.ndarray  # (S, 3) coarse cull boxes for the per-ray
    sup_hi: jnp.ndarray  # pre-pass — BVH upper-node cuts when a tree is
    #                    # available (tight SAH clusters; leaf-order
    #                    # treelet unions are poisoned by any
    #                    # room-spanning triangle), else treelet groups
    bw: jnp.ndarray   # (T, 24, 3*TT) bf16 split affine coefficients
    tri: jnp.ndarray  # (T*TT, 10) f32 rows [p0 | e1 | e2 | face] for the
    #                 # exact per-lane hit resolve after the sweep; `face`
    #                 # is the BVH-leaf-order triangle index (exact f32,
    #                 # < 2^24), -1 for padding slots — treelets need not
    #                 # be fixed TT-strides of the leaf order (see
    #                 # bvh_cut_ranges)


# winner-index bits packed into the low mantissa of the quantized-t sort
# key inside the closest kernel (see _closest_pairs_kernel)
COL_BITS = max(8, (TREELET - 1).bit_length())
COL_MASK = (1 << COL_BITS) - 1
# banded two-pass closest sweep: pass-1 reach as a fraction of the world
# diagonal (0 disables); see closest_hit_packets(band=...). Off by default
# until measured on hardware — correctness is test-pinned either way.
BAND_FRAC = float(_os.environ.get("HIKARI_BAND_FRAC", "0.0"))
# live-lane compaction cascade default (closest/anyhit `compact=None`):
# on when compiled, off in interpret mode; HIKARI_COMPACT=off disables for
# hardware A/Bs of the cascade's cond/branch overhead.
COMPACT_DEFAULT = _os.environ.get("HIKARI_COMPACT", "auto")
# segment-AABB cull (endpoints-box treelet rejection for distance-capped
# rays); HIKARI_SEGCULL=off disables for hardware A/Bs.
SEGCULL = _os.environ.get("HIKARI_SEGCULL", "on") != "off"
# sweep structure: 'tile' = one grid step per RAY TILE with an in-kernel
# double-buffered while-loop over that tile's pair segment (no per-pair
# Mosaic grid overhead; the front-to-back early-out BREAKS the loop
# instead of paying a grid step per skipped pair); 'pairs' = the round-2
# one-grid-step-per-pair sweep.
SWEEP_MODE = _os.environ.get("HIKARI_SWEEP", "tile")
# t = -num/den in the sweep kernels: 'newton' = approximate VPU
# reciprocal + one Newton-Raphson step (~2^-24 relative, epsilon-safe
# for the hit test; the winner's exact t/u/v are recomputed post-sweep
# anyway); 'div' = the plain f32 divide.
RECIP = _os.environ.get("HIKARI_RECIP", "newton")
# per-ray super-AABB pre-pass: before the sort, test each ray's segment
# against the scene's coarse cull boxes (BVH upper-node cuts with
# per-triangle boxes for room-spanning leaves — see bvh_super_boxes);
# lanes whose segment intersects NO box are guaranteed misses (closest) /
# unoccluded (any-hit) and get t_max=0, so they sort to the dead suffix,
# shrink the compaction prefix, AND stop inflating the per-tile
# front-to-back threshold (sim_sweep measured the early-out never firing
# on bounce sweeps because miss lanes pin the threshold at world-exit
# scale). ~48 fori iterations of ~20 VPU ops per lane — orders of
# magnitude under one pair sweep. Default on: the round-5 same-session
# A/B measured +30% on the 327k-tri mesh bench (1.444 -> 1.876 Mray/s,
# 33% of live bounce-1 lanes retired) and +0.6% on the default scene,
# transport tripwires passing on both.
PREPASS = _os.environ.get("HIKARI_PREPASS", "on") != "off"
SUPER = int(_os.environ.get("HIKARI_SUPER", "32"))
# bf16 split width for the BW matmuls: 3 = 3-way error split (K=24
# contraction rows, reproduces f32), 2 = 2-way (K=16: all four partial
# products of (a1+a2)(m1+m2), ~2^-16 relative — the kernel's own t
# quantization scale, and the winning triangle is re-resolved exactly
# post-sweep; 33% less MXU work and bw DMA bytes). K must be a multiple
# of 8: Mosaic rejects blocks whose second-to-minor dim misaligns with
# the (8, 128) tile, so the three-product K=12 variant cannot compile.
# The flat-scene kernels follow this; the instanced path stays 3-way
# (its in-kernel split is hardcoded).
SPLIT = int(_os.environ.get("HIKARI_SPLIT", "3"))
KSPLIT = 24 if SPLIT == 3 else 16
# origin-Morton resolution ladder for the sort key (bits per axis):
# 5 is the round-1 layout (14 origin bits / 15 direction bits); 6/7
# trade direction bits for tighter origin clustering, which shrinks
# per-tile frusta for bounce wavefronts at RAY_TILE=1024. Default 6:
# the round-5 same-session ladder measured +12.9% on the default bench
# (4.181 -> 4.720) and +31% on the 327k-tri mesh bench (1.099 -> 1.444);
# 7 is spread-level below 6 on both.
KEY_OBITS = int(_os.environ.get("HIKARI_KEY_OBITS", "6"))
# reversed NEE shadow rays: occlusion over an open segment is symmetric,
# and rays traced FROM the sampled light point toward the surface form
# shared-origin, direction-sorted packets (one octant per tile, tight
# frusta) where the surface->light direction converges from everywhere
# (mixed signs per axis void the slab bound; only SEGCULL survives).
SHADOW_REV = _os.environ.get("HIKARI_SHADOW_REV", "off") == "on"
# front-to-back early-out (per-pair conservative entry distance vs the
# tile's worst unresolved t) and the direction-independent L2 entry
# bound; =off disables for compiled-vs-interpret divergence bisection.
EARLYOUT = _os.environ.get("HIKARI_EARLYOUT", "on") != "off"
L2BOUND = _os.environ.get("HIKARI_L2BOUND", "on") != "off"


def _trunc_bf16(x):
    """f32 with the low 16 mantissa bits zeroed: the nearest-toward-zero
    bf16-representable value, via integer masking. The bitcasts pin the
    f32 representation — XLA:TPU's BFloat16Propagation pass rewrites
    `x - f32(bf16(x))` residual chains to bf16 arithmetic when every
    consumer is a bf16 convert (measured: the wavefront sweep's split
    collapsed to plain-bf16 accuracy ONLY when fused in-program, costing
    28% of closest hits on the bench scene), but it cannot rewrite
    integer ops."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _split3_cols(m: np.ndarray, split: int | None = None) -> np.ndarray:
    """(4, C) f32 -> (K, C) bf16 column-side split.

    split=3 (K=24): rows [m1 m2 m1 m3 m1 m2] pairing with ray columns
    [a1 a1 a2 a1 a3 a2] so one bf16 matmul accumulates the six >=2^-24
    partial products of (a1+a2+a3)(m1+m2+m3) in f32. split=2 (K=16):
    rows [m1 m2 m1 m2] / rays [a1 a1 a2 a2] keep all four products of
    the 2-way split (residual ~2^-16).

    Truncation splits (not round-to-nearest): m1f is a bit-prefix of m, so
    both residual subtractions are exact (Sterbenz) and the split carries
    m's top mantissa bits regardless of backend or fusion context."""
    if split is None:
        split = SPLIT
    m = jnp.asarray(m, jnp.float32)
    m1f = _trunc_bf16(m)
    r = m - m1f
    m2f = _trunc_bf16(r)
    m1 = m1f.astype(jnp.bfloat16)   # exact: already bf16-representable
    m2 = m2f.astype(jnp.bfloat16)
    if split == 2:
        return jnp.concatenate([m1, m2, m1, m2], axis=0)
    m3 = _trunc_bf16(r - m2f).astype(jnp.bfloat16)
    return jnp.concatenate([m1, m2, m1, m3, m1, m2], axis=0)


def _split3_rays(a: jnp.ndarray, split: int | None = None) -> jnp.ndarray:
    """(R, 4) f32 -> (R, K) bf16 ray-side split: [a1 a1 a2 a1 a3 a2]
    (split=3) or [a1 a1 a2 a2] (split=2). Same fusion-proof truncation
    split as _split3_cols."""
    if split is None:
        split = SPLIT
    a1f = _trunc_bf16(a)
    r = a - a1f
    a2f = _trunc_bf16(r)
    a1 = a1f.astype(jnp.bfloat16)
    a2 = a2f.astype(jnp.bfloat16)
    if split == 2:
        return jnp.concatenate([a1, a1, a2, a2], axis=1)
    a3 = _trunc_bf16(r - a2f).astype(jnp.bfloat16)
    return jnp.concatenate([a1, a1, a2, a1, a3, a2], axis=1)


def bvh_cut_ranges(fb, n_prims: int, merge: bool = True):
    """Cut the flat skip-link BVH into subtrees of <= TREELET primitives.

    Fixed TT-stride runs of the leaf order span arbitrary subtree
    boundaries, so their AABBs can be far looser than the tree's own
    nodes (measured: the 327k-tri mesh bench scene culls ~4x worse than
    the 33k default). A subtree of the DFS-ordered BVH covers a
    CONTIGUOUS leaf-order range [first, first+size), so cutting at
    subtree boundaries keeps the same contiguous-range treelet layout
    while inheriting the SAH build's tight cluster bounds.

    Returns (base, cnt) int64 arrays in leaf order. With merge=True,
    adjacent small ranges are greedily packed to <= TREELET (undersized
    SAH children would otherwise waste treelet slots); ranges are only
    merged when either side is small, so tight mid-size boxes survive."""
    first = np.asarray(fb.first, np.int64)
    skip = np.asarray(fb.skip, np.int64)
    count = np.asarray(fb.count, np.int64)
    n_nodes = len(first)

    def sub_end(i):
        s = skip[i]
        return n_prims if s >= n_nodes else first[s]

    out: list[tuple[int, int]] = []
    stack = [0]
    while stack:
        i = stack.pop()
        c = sub_end(i) - first[i]
        if c <= TREELET or count[i] > 0:
            out.append((int(first[i]), int(c)))
        else:
            stack.append(int(skip[i + 1]))  # right child
            stack.append(i + 1)             # left child (popped first)
    out.sort()
    if merge:
        merged: list[list[int]] = []
        for b, c in out:
            if merged and merged[-1][1] + c <= TREELET and (
                    merged[-1][1] <= TREELET // 4 or c <= TREELET // 4):
                merged[-1][1] += c
            else:
                merged.append([b, c])
        out = [(b, c) for b, c in merged]
    base = np.asarray([b for b, _ in out], np.int64)
    cnt = np.asarray([c for _, c in out], np.int64)
    return base, cnt


def bvh_super_boxes(fb, n_prims: int, n_target: int = 48,
                    prim_lo=None, prim_hi=None):
    """Cut the BVH into ~n_target upper-node boxes for the per-ray
    pre-pass (_ray_super_cull). SAH nodes isolate large flat geometry
    (walls, floors) into their own tight slabs, so a bounce ray that
    provably escapes the scene misses every box — whereas unions of
    leaf-order treelet runs mix a wall triangle into an otherwise-local
    cluster and the resulting room-hull box catches 100% of rays
    (measured: cleared fraction 0.000 at every SUPER granularity)."""
    first = np.asarray(fb.first, np.int64)
    skip = np.asarray(fb.skip, np.int64)
    count = np.asarray(fb.count, np.int64)
    n_nodes = len(first)
    cap = max(1, -(-n_prims // n_target))

    def sub_end(i):
        s = skip[i]
        return n_prims if s >= n_nodes else first[s]

    def area(i):
        d = np.maximum(fb.hi[i] - fb.lo[i], 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    root_area = max(area(0), 1e-12)
    lo_l, hi_l = [], []
    stack = [0]
    while stack:
        i = stack.pop()
        c = sub_end(i) - first[i]
        # descend high-count nodes AND spatially huge ones: SAH packs the
        # handful of room-spanning wall/floor triangles into one
        # low-count subtree whose hull box catches every interior ray
        # (measured: one such box made the pre-pass clear 0.000 of lanes)
        huge = area(i) > 0.08 * root_area
        if count[i] > 0:  # leaf (<= leaf_size prims)
            if huge and prim_lo is not None:
                # a huge leaf is a handful of room-spanning triangles
                # (walls/floor) whose union hull catches every interior
                # ray; their INDIVIDUAL triangle boxes are thin slabs,
                # so emit those instead (prim arrays are in leaf order,
                # the leaf covers [first, first+c))
                for j in range(int(first[i]), int(first[i] + c)):
                    lo_l.append(prim_lo[j])
                    hi_l.append(prim_hi[j])
            else:
                lo_l.append(fb.lo[i])
                hi_l.append(fb.hi[i])
        elif c <= cap and not huge:
            lo_l.append(fb.lo[i])
            hi_l.append(fb.hi[i])
        else:  # high-count or spatially huge: descend
            stack.append(int(skip[i + 1]))
            stack.append(i + 1)
    return (np.asarray(lo_l, np.float32), np.asarray(hi_l, np.float32))


def build_treelets(p0: np.ndarray, p1: np.ndarray, p2: np.ndarray,
                   ranges=None, split: int | None = None,
                   supers=None) -> Treelets:
    """Host: block the BVH-leaf-ordered triangles into treelets and
    precompute the Baldwin-Weber affine coefficients in f64.

    ranges: optional (base, cnt) arrays — treelet i holds leaf-order
    triangles [base[i], base[i]+cnt[i]) padded to TREELET slots (see
    bvh_cut_ranges). Default: fixed TREELET-stride runs of the leaf
    order (the leaf order is spatially coherent so stride AABBs are
    usable; subtree cuts are tighter).

    Pair lists are ordered per tile by the cull pass's exact conservative
    entry distances, so the sweep kernels early-out as soon as every lane's
    best hit precedes the remaining treelets."""
    p = len(p0)
    if ranges is None:
        t = max(1, -(-p // TREELET))
        base = np.arange(t, dtype=np.int64) * TREELET
        cnt = np.clip(p - base, 0, TREELET)
    else:
        base = np.asarray(ranges[0], np.int64)
        cnt = np.asarray(ranges[1], np.int64)
        t = len(base)
        assert (cnt >= 1).all() and (cnt <= TREELET).all()

    cols = np.arange(TREELET, dtype=np.int64)
    idx = base[:, None] + cols[None, :]              # (t, TT)
    valid = cols[None, :] < cnt[:, None]
    idx = np.where(valid, np.minimum(idx, max(p - 1, 0)), 0)
    vflat = valid.reshape(-1, 1)

    def padded(a):
        out = np.asarray(a, np.float32)[idx.reshape(-1)]
        return np.where(vflat, out, np.float32(3.0e37))

    p0p, p1p, p2p = padded(p0), padded(p1), padded(p2)
    v3 = valid[:, :, None]
    tri_lo = np.minimum(np.minimum(p0p, p1p), p2p).reshape(t, TREELET, 3)
    tri_hi = np.maximum(np.maximum(p0p, p1p), p2p).reshape(t, TREELET, 3)
    # masked AABBs: padding slots must not inflate hi (the old tail-pad
    # fill leaked 3e37 into the last stride treelet's hi, pairing it with
    # every ray tile)
    lo = np.where(v3, tri_lo, np.float32(3.0e37)).min(1)
    hi = np.where(v3, tri_hi, np.float32(-3.0e37)).max(1)

    # Baldwin-Weber coefficients in f64; degenerate (incl. padding)
    # triangles get all-zero rows -> den == 0 -> never hit
    q0 = p0p.astype(np.float64)
    e1 = p1p.astype(np.float64) - q0
    e2 = p2p.astype(np.float64) - q0
    n = np.cross(e1, e2)
    n2 = (n * n).sum(-1)
    ok = (n2 > 1e-30) & np.isfinite(n2)
    inv_n2 = np.where(ok, 1.0 / np.where(ok, n2, 1.0), 0.0)
    a_u = np.cross(e2, n) * inv_n2[:, None]
    a_v = np.cross(n, e1) * inv_n2[:, None]
    n = np.where(ok[:, None], n, 0.0)
    dw = -(n * q0).sum(-1)
    b_u = -(a_u * q0).sum(-1)
    b_v = -(a_v * q0).sum(-1)

    def rows4(a3, w):  # (P, 3), (P,) -> (P, 4)
        return np.concatenate([a3, w[:, None]], axis=1).astype(np.float32)

    mn = rows4(n, dw)        # plane
    mu = rows4(a_u, b_u)
    mv = rows4(a_v, b_v)
    # (T, 4, 3*TT): column groups [plane | u | v], K rows [x, y, z, w]
    def grp(m):  # (P, 4) -> (T, 4, TT)
        return np.transpose(m.reshape(t, TREELET, 4), (0, 2, 1))

    m4 = np.concatenate([grp(mn), grp(mu), grp(mv)], axis=2)  # (T, 4, 3TT)
    sp = SPLIT if split is None else split
    bw = jnp.stack([_split3_cols(m4[i], sp) for i in range(t)]) if t <= 1 \
        else jax.vmap(lambda x: _split3_cols(x, sp))(jnp.asarray(m4))

    # face index column: exact f32 for < 2^24 faces (the pair-meta field
    # caps faces at 16.7M anyway); -1 marks padding slots
    face = np.where(valid, idx, -1).reshape(-1, 1).astype(np.float64)
    tri = np.concatenate(
        [p0p, p1p.astype(np.float64) - q0, p2p.astype(np.float64) - q0, face],
        axis=1,
    ).astype(np.float32)

    if supers is None:
        # fallback: leaf-order treelet groups of SUPER (no BVH at hand);
        # usable but poisoned by room-spanning triangles — scene.build
        # passes bvh_super_boxes instead
        ns = -(-t // SUPER)
        pad2 = ns * SUPER - t
        glo = np.concatenate([lo, np.full((pad2, 3), 3.0e37, np.float32)])
        ghi = np.concatenate([hi, np.full((pad2, 3), -3.0e37, np.float32)])
        supers = (glo.reshape(ns, SUPER, 3).min(1),
                  ghi.reshape(ns, SUPER, 3).max(1))
    return Treelets(
        lo=jnp.asarray(lo), hi=jnp.asarray(hi),
        sup_lo=jnp.asarray(supers[0], jnp.float32),
        sup_hi=jnp.asarray(supers[1], jnp.float32),
        bw=jnp.asarray(bw, jnp.bfloat16),
        tri=jnp.asarray(tri),
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
    """uint32 sort key: direction octant (3 bits), origin Morton (14 bits),
    fine direction Morton (15 bits).

    Tight direction sorting is what makes the per-tile frustum culling
    effective: without it a 1024-ray tile spans a whole octant and the
    interval slab test prunes almost nothing."""
    octant = (
        (d[..., 0] < 0).astype(jnp.uint32)
        | ((d[..., 1] < 0).astype(jnp.uint32) << 1)
        | ((d[..., 2] < 0).astype(jnp.uint32) << 2)
    )
    # origin/direction bit split: 14/15 at the default KEY_OBITS=5
    # (round-1 layout); 18/11 and 21/8 at 6/7 bits per origin axis
    om_bits = 14 if KEY_OBITS == 5 else 3 * KEY_OBITS
    dm_bits = 29 - om_bits
    ad = jnp.abs(d)
    di = jnp.clip((ad * 31.0), 0.0, 31.0).astype(jnp.uint32)  # 5 bits/axis
    dm = (
        _morton10(di[..., 0]) | (_morton10(di[..., 1]) << 1)
        | (_morton10(di[..., 2]) << 2)
    ) >> jnp.uint32(15 - dm_bits)

    oscale = float((1 << KEY_OBITS) - 1)
    ext = jnp.maximum(world_hi - world_lo, 1e-6)
    q = jnp.clip((o - world_lo) / ext, 0.0, 1.0)
    qi = (q * oscale).astype(jnp.uint32)
    m = (
        _morton10(qi[..., 0]) | (_morton10(qi[..., 1]) << 1)
        | (_morton10(qi[..., 2]) << 2)
    ) & jnp.uint32((1 << om_bits) - 1)
    # octant-major (sign-uniform tiles keep the interval culling exact),
    # then origin locality, then fine direction: camera/shadow packets
    # (shared origin cell) end up direction-sorted, bounce rays
    # origin-sorted — both get tight bounding volumes
    return (octant << 29) | (m << dm_bits) | dm




def _sort_wavefront(o, d, t_max, keys):
    """Sort the wavefront by keys with ONE packed row gather.

    TPU gathers cost per ADDRESS, not per element (tools/prof_gather.py:
    three separate o/d/t gathers 12 ms vs one (n,8) row gather 3.9 ms at
    640k lanes), and lax.sort_key_val beats argsort 2.5 vs 6.4 ms."""
    n = o.shape[0]
    _, order = jax.lax.sort_key_val(keys, jnp.arange(n, dtype=jnp.int32))
    rows = jnp.concatenate(
        [o, d, t_max[:, None], jnp.zeros((n, 1), o.dtype)], axis=1)
    srt = rows[order]
    return order, srt[:, 0:3], srt[:, 3:6], srt[:, 6]


def _unsort_hits(order, n, t, b1, b2, tri):
    """Sorted-order hit results -> lane order: inverse permutation by
    scatter (4.8 ms) + ONE (n,5) row gather (~4.7 ms — gathers cost per
    address, not per element). A direct (n,4) row *scatter* measures 28 ms,
    so gather-with-inverse wins.

    The int channel CANNOT ride as a bitcast: tri = -1 bitcasts to a NaN
    payload that TPU float paths canonicalize (0xFFFFFFFF -> 0x7FC00000),
    turning every miss into a fake hit. Instead tri+1 is split into two
    16-bit halves, each exactly representable in f32, and recombined in
    integer arithmetic after the gather."""
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    utri = (tri + 1).astype(jnp.uint32)
    hi = (utri >> 16).astype(jnp.float32)
    lo = (utri & jnp.uint32(0xFFFF)).astype(jnp.float32)
    packed = jnp.stack([t, b1, b2, hi, lo], axis=-1)
    out = packed[inv]
    tri_out = (
        (out[:, 3].astype(jnp.int32) << 16) | out[:, 4].astype(jnp.int32)
    ) - 1
    return out[:, 0], out[:, 1], out[:, 2], tri_out


# --- conservative tile x treelet culling --------------------------------------------


# sub-frusta per kernel tile in the cull pass: the (n_tiles*SUB, T)
# interval test's intermediates scale with SUB x T — the dominant
# per-sweep fixed cost on high-T scenes (mesh: T=1281, depth-1 frame
# share ~3.8x the default scene's at near-zero pair density). Lower SUB
# = cheaper cull, looser frusta.
SUBFRUSTA = int(_os.environ.get("HIKARI_SUB", "8"))


def tile_treelet_mask(o, d, t_max, tl: Treelets, n_tiles, sub: int = None):
    """(n_tiles, T) bool mask + (n_tiles, T) f32 conservative entry t.

    Interval slab test per octant-uniform *sub-frustum* (the 1024-ray
    kernel tile is tested as the union of `sub` 128-ray frusta, which is
    strictly tighter than its hull); sub-frusta with mixed direction signs
    per axis fall back to 'cull nothing on that axis'."""
    if sub is None:
        sub = SUBFRUSTA
    n_tiles = n_tiles * sub
    br = RAY_TILE // sub
    ot = o.reshape(n_tiles, br, 3)
    dt = d.reshape(n_tiles, br, 3)
    tmt = t_max.reshape(n_tiles, br)

    # dead lanes (t_max == 0) carry leftover origins/directions; exclude
    # them from every bbox so mixed live/dead sub-tiles stay tight (the
    # all-dead case is culled outright by t_hi > 0 below)
    live = (tmt > 0.0)[..., None]
    o_lo = jnp.where(live, ot, 3.0e37).min(1)   # (n_tiles, 3)
    o_hi = jnp.where(live, ot, -3.0e37).max(1)
    d_lo = jnp.where(live, dt, 3.0e37).min(1)
    d_hi = jnp.where(live, dt, -3.0e37).max(1)
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
    # Direction-independent entry bound: with unit directions, a ray from
    # inside the sub-tile's origin bbox needs t >= L2(origin bbox, treelet
    # AABB) to reach the treelet. Incoherent (bounce) sub-tiles are
    # mixed-sign on every axis, which voids the slab bound entirely
    # (t_near = -inf): without this, their pair lists have no front-to-back
    # order and the sweep kernels' early-outs never fire. The 0.999 margin
    # absorbs directions that are unit only to fp round-off.
    gap = (
        jnp.maximum(lo - o_hi[:, None, :], 0.0)
        + jnp.maximum(o_lo[:, None, :] - hi, 0.0)
    )
    dist = jnp.sqrt(jnp.sum(gap * gap, axis=-1)) * 0.999
    if L2BOUND:
        t_near = jnp.maximum(t_near, dist)
    # Segment-bbox cull: every point o + s*d, s in [0, t_max], lies in
    # AABB(origins ∪ endpoints) — convexity, no unit-d assumption. For
    # distance-capped rays whose direction signs are mixed per axis
    # (shadow rays CONVERGING on a light void the slab bound entirely),
    # this is the only bound that knows the rays END somewhere: treelets
    # beyond the light cluster cull even though the direction interval
    # spans the sphere. Unbounded rays get world-scale endpoint boxes and
    # lose nothing.
    if SEGCULL:
        ep = ot + dt * tmt[..., None]
        seg_lo = jnp.minimum(o_lo, jnp.where(live, ep, 3.0e37).min(1))
        seg_hi = jnp.maximum(o_hi, jnp.where(live, ep, -3.0e37).max(1))
        pad = 1e-3 + 1e-4 * jnp.maximum(jnp.abs(seg_lo), jnp.abs(seg_hi))
        seg_ok = (
            (lo <= (seg_hi + pad)[:, None, :])
            & (hi >= (seg_lo - pad)[:, None, :])
        ).all(-1)
    else:
        seg_ok = jnp.ones(s_min.shape[:-1], bool)
    # (t_hi > 0) culls all-dead sub-tiles outright: their lanes carry
    # incoherent leftover directions, so every axis is mixed-sign, the slab
    # interval degenerates to (-inf, inf), and t_near=-inf <= t_hi=0 would
    # otherwise pair the dead tile with EVERY treelet (measured: 95k junk
    # pairs of 132k at bounce 2, ~3 us grid overhead each even when the
    # kernel's @pl.when skips the work)
    m = (
        (t_near <= t_far * 1.0001) & (t_far > 0.0)
        & (t_near <= t_hi[:, None]) & (t_hi > 0.0)[:, None]
        & seg_ok
    )
    # union of the sub-frustum tests per kernel tile; the tile's
    # conservative entry distance is the min over its live sub-frusta
    m = m.reshape(n_tiles // sub, sub, -1)
    tn = jnp.where(m, t_near.reshape(m.shape), 3.0e37)
    return m.any(axis=1), jnp.maximum(tn.min(axis=1), 0.0)


# --- compacted pair lists -------------------------------------------------------------
#
# The sweep grid is one step per *surviving* (ray-tile, treelet) pair, not
# n_tiles x n_treelets with masked skips: pair metadata is packed into one
# int32 scalar-prefetch array (tile << 16 | treelet) and the Mosaic grid
# size is the dynamic pair count. Pairs are tile-major (ray and hit-state
# blocks stay VMEM-resident across a tile's run) and, within a tile,
# front-to-back in the tile's direction octant.


def _build_pairs(mask, tnear):
    """Compact the (n_tiles, T) cull mask into a dense pair list.

    Returns (meta, n_pairs, seg): meta is (P,) int32, tile << 16 |
    treelet, tile-major with treelets in *exact* per-tile front-to-back
    order (by the cull pass's conservative entry distance) so the sweep
    kernels' early-outs fire as soon as possible; entries past n_pairs
    repeat the last real pair (sweeping a pair twice is idempotent, so
    padding steps are harmless). seg is (n_tiles + 1,) int32 — tile i's
    pairs occupy meta[seg[i]:seg[i+1]] (the tile-resident sweep loops
    each tile's segment in-kernel)."""
    n_tiles, T = mask.shape
    assert n_tiles <= MAX_TILES, (
        f"{n_tiles} ray tiles exceeds the {MAX_TILES}-tile pair-meta field "
        f"(dispatch of {n_tiles * RAY_TILE} lanes; split the wavefront)")
    assert T <= MAX_TREELETS, (
        f"{T} treelets exceeds the {MAX_TREELETS}-treelet pair-meta field")
    srt = jnp.argsort(jnp.where(mask, tnear, 3.0e37), axis=1).astype(jnp.int32)
    alive = jnp.take_along_axis(mask, srt, 1)
    tile_ids = jnp.broadcast_to(
        jnp.arange(n_tiles, dtype=jnp.int32)[:, None], (n_tiles, T))
    meta = (tile_ids << TILE_SHIFT) | srt
    counts = jnp.sum(mask.astype(jnp.int32), axis=1)
    seg = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    flat_alive = alive.reshape(-1)
    flat_meta = meta.reshape(-1)
    P = n_tiles * T
    pos = jnp.cumsum(flat_alive.astype(jnp.int32)) - 1
    n_pairs = pos[-1] + 1
    dst = jnp.where(flat_alive, pos, P)            # dead pairs -> dropped
    out = jnp.zeros((P,), jnp.int32).at[dst].set(flat_meta, mode="drop")
    last = out[jnp.maximum(n_pairs - 1, 0)]
    out = jnp.where(jnp.arange(P) < n_pairs, out, last)
    return out, n_pairs, seg


# --- the Pallas pair-sweep kernels ------------------------------------------------------


def _bw_block(a6, d6, m6):
    """The two MXU matmuls + affine evaluation shared by both kernels.

    Returns (t, u, v, den) over the (RAY_TILE, TREELET) block."""
    dims = (((1,), (0,)), ((), ()))
    mo = jax.lax.dot_general(a6, m6, dims, preferred_element_type=jnp.float32)
    md = jax.lax.dot_general(d6, m6, dims, preferred_element_type=jnp.float32)
    num, au, av = mo[:, :TREELET], mo[:, TREELET:2 * TREELET], mo[:, 2 * TREELET:]
    den, bu, bv = md[:, :TREELET], md[:, TREELET:2 * TREELET], md[:, 2 * TREELET:]
    den_safe = jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
    if RECIP == "newton":
        # approximate VPU reciprocal + one Newton step: ~2^-24 relative,
        # far below the kernel's own 2^-16 t quantization and the post-
        # sweep exact per-lane resolve; the f32 divide is the single most
        # expensive op in the VPU epilogue
        r = pl.reciprocal(den_safe, approx=True)
        r = r * (2.0 - den_safe * r)
        t = -num * r
    else:
        t = -num / den_safe
    u = au + t * bu
    v = av + t * bv
    return t, u, v, den


def _bw_block_lean(a6, d6, m6):
    """_bw_block without the den clamp: degenerate or padding triangles
    (den == 0, incl. all-zero BW rows) produce t = inf/nan, and every
    comparison in _hit_mask_lean is false on inf-out-of-range and nan —
    so they self-reject without the abs/cmp/select clamp or the
    |den| > 1e-20 test. The sweep epilogue is the VPU-bound hot loop
    (measured ~3.6 us/pair vs ~0.3 us of MXU work at TT=256); every
    dropped elementwise op on the (RAY_TILE, TREELET) block counts.

    Returns (t, u, v)."""
    dims = (((1,), (0,)), ((), ()))
    mo = jax.lax.dot_general(a6, m6, dims, preferred_element_type=jnp.float32)
    md = jax.lax.dot_general(d6, m6, dims, preferred_element_type=jnp.float32)
    num, au, av = mo[:, :TREELET], mo[:, TREELET:2 * TREELET], mo[:, 2 * TREELET:]
    den, bu, bv = md[:, :TREELET], md[:, TREELET:2 * TREELET], md[:, 2 * TREELET:]
    if RECIP == "newton":
        r = pl.reciprocal(den, approx=True)
        r = r * (2.0 - den * r)
        t = -num * r
    else:
        t = -num / den
    u = au + t * bu
    v = av + t * bv
    return t, u, v


def _hit_mask_lean(t, u, v):
    """Fused inside test: min(u, v, (1+eps)-(u+v)) >= -eps & t in range.
    nan (from den == 0) compares false everywhere."""
    eps = 1e-6
    w = (1.0 + eps) - (u + v)
    m = jnp.minimum(jnp.minimum(u, v), w)
    return (m >= -eps) & (t > 1e-4)


def _closest_pairs_kernel(meta_ref, tnear_ref, a6_ref, d6_ref,
                          key_i_ref, tr_i_ref,
                          bw_ref,
                          key_ref, tr_ref):
    """Closest-hit sweep with a bit-packed carry: the VPU issue rate is the
    kernel's bottleneck (measured: the two MXU matmuls + a min-reduce cost
    0.22 us/pair while the elementwise epilogue cost ~3.8 us), so the
    winner bookkeeping is one int32 key per lane instead of four carries
    with a one-hot u/v extraction.

    key = (bitcast(t_cand) & ~COL_MASK) | column: positive IEEE floats
    order like their int bit patterns, so min(key) picks the (quantized-t,
    column) winner in a single reduce. The low COL_BITS mantissa bits are
    sacrificed to the column index (ties within 2^-16 relative t pick an
    arbitrary but consistent winner); the exact t/u/v of the winning
    triangle are recomputed per-lane AFTER the sweep (one row gather +
    Moller-Trumbore, ~2 ms per call instead of ~1.3 us per pair)."""
    p = pl.program_id(0)
    m = meta_ref[p]
    tile = m >> TILE_SHIFT
    treelet = m & TREELET_MASK
    prev_tile = meta_ref[jnp.maximum(p - 1, 0)] >> TILE_SHIFT

    @pl.when((p == 0) | (tile != prev_tile))
    def _init():  # first pair of this tile: load carried hit state
        key_ref[0] = key_i_ref[0]
        tr_ref[0] = tr_i_ref[0]

    # conservative front-to-back early-out: skip the treelet if its entry
    # distance cannot beat the worst lane's current best. The key's low
    # index bits are forced to 1 so the threshold rounds the quantized t
    # UP (skipping must stay conservative); tnear rides the
    # scalar-prefetch SMEM as raw f32 bits compared in int space.
    thr_bits = jnp.max(key_ref[0] | COL_MASK)

    @pl.when(tnear_ref[p] < thr_bits)
    def _work():
        t, u, v, den = _bw_block(a6_ref[:], d6_ref[:], bw_ref[0])
        eps = 1e-6
        hit = (
            (jnp.abs(den) > 1e-20)
            & (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps)
            & (t > 1e-4)
        )
        t_cand = jnp.where(hit, t, 3.0e38)
        bits = jax.lax.bitcast_convert_type(t_cand, jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, t_cand.shape, 1)
        key = (bits & ~COL_MASK) | cols
        key_new = jnp.min(key, axis=-1, keepdims=True)
        better = key_new < key_ref[0]
        key_ref[0] = jnp.where(better, key_new, key_ref[0])
        tr_ref[0] = jnp.where(better, treelet, tr_ref[0])


def _occlusion_pairs_kernel(meta_ref, tnear_ref, a6_ref, d6_ref,
                            tmax_ref, occ_i_ref, bw_ref, occ_ref):
    p = pl.program_id(0)
    m = meta_ref[p]
    tile = m >> TILE_SHIFT
    treelet = m & TREELET_MASK
    prev_tile = meta_ref[jnp.maximum(p - 1, 0)] >> TILE_SHIFT

    @pl.when((p == 0) | (tile != prev_tile))
    def _init():
        occ_ref[0] = occ_i_ref[0]

    # skip once every lane is resolved, OR when this treelet lies beyond
    # every unresolved lane's light distance — unoccluded shadow rays then
    # stop sweeping at their light instead of exhausting the pair list
    live_reach_bits = jnp.max(jax.lax.bitcast_convert_type(
        jnp.where(occ_ref[0] == 0, tmax_ref[0], 0.0), jnp.int32))

    @pl.when(tnear_ref[p] < live_reach_bits)
    def _work():
        t, u, v, den = _bw_block(a6_ref[:], d6_ref[:], bw_ref[0])
        eps = 1e-6
        hit = (
            (jnp.abs(den) > 1e-20)
            & (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps)
            & (t > 1e-4) & (t < tmax_ref[0])
        )
        occ_ref[0] = occ_ref[0] | jnp.any(hit, axis=-1, keepdims=True).astype(jnp.int32)


def _resolve_hits(tl: Treelets, key, tr, os_, ds):
    """Post-sweep exact resolve (sorted order): the kernel carries only the
    (quantized-t | column) key and winning treelet id; here the winning
    triangle's exact t and barycentrics are recomputed per lane in f32
    Moller-Trumbore from one (n, 9) row gather. Miss lanes (tr < 0) fall
    back to the quantized t (callers only read t on hit lanes)."""
    col = key & COL_MASK
    slot = jnp.maximum(tr, 0) * TREELET + col
    rows = tl.tri[slot]                         # (n, 10) row gather
    p0, e1, e2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
    # leaf-order face index rides the row (column 9): treelet slots need
    # not be a fixed stride of the face arrays (bvh_cut_ranges)
    tri = jnp.where(tr >= 0, rows[:, 9].astype(jnp.int32), -1)
    pvec = jnp.cross(ds, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    tvec = os_ - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(ds * qvec, axis=-1) * inv
    t = jnp.sum(e2 * qvec, axis=-1) * inv
    # quantized fallback: the key's high bits bitcast back to ~t (within
    # 2^-16 relative), covering degenerate recompute corner cases
    t_q = jax.lax.bitcast_convert_type(key & ~COL_MASK, jnp.float32)
    ok = jnp.isfinite(t) & (t > 0.0)
    t = jnp.where(ok, t, t_q)
    u = jnp.clip(jnp.where(ok, u, 0.0), 0.0, 1.0)
    v = jnp.clip(jnp.where(ok, v, 0.0), 0.0, 1.0)
    return t, u, v, tri


def _pad_rays(o, d, t_max):
    n = o.shape[0]
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    pad = n_pad - n
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    return o, d, t_max, n, n_pad


def _ray_matrices(os_, ds):
    """Split [o,1] and [d,0] into the (R, KSPLIT) bf16 matmul operands."""
    n = os_.shape[0]
    a = jnp.concatenate([os_, jnp.ones((n, 1), jnp.float32)], axis=1)
    b = jnp.concatenate([ds, jnp.zeros((n, 1), jnp.float32)], axis=1)
    return _split3_rays(a), _split3_rays(b)


def _sweep_chunks(kernel, meta, n_pairs, tnear_pair, a6, d6, carry_in,
                  extra_inputs, tl, n_tiles, interpret):
    """Run the pair sweep in PAIR_CHUNK-sized pallas_calls, carrying the
    per-ray accumulator state between chunks. Grid size per chunk is the
    dynamic live-pair count (Mosaic dynamic grids); in interpret mode the
    full static chunk runs (padding steps are idempotent).

    tnear_pair: (P,) conservative entry distance per pair, feeding the
    kernels' front-to-back early-outs."""
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
        (1, RAY_TILE, 1), lambda p, m, tn: (m[p] >> TILE_SHIFT, 0, 0))
    ray_spec = lambda: pl.BlockSpec(
        (RAY_TILE, KSPLIT), lambda p, m, tn: (m[p] >> TILE_SHIFT, 0))
    bw_spec = pl.BlockSpec(
        (1, KSPLIT, 3 * TREELET),
        lambda p, m, tn: (m[p] & TREELET_MASK, 0, 0))
    specs = [ray_spec(), ray_spec()]

    n_carry = len(carry_in)
    out_shape = [jax.ShapeDtypeStruct((n_tiles, RAY_TILE, 1), c.dtype)
                 for c in carry_in]
    in_specs = (
        specs
        + [state_spec() for _ in extra_inputs]
        + [state_spec() for _ in range(n_carry)]
        + [bw_spec]
    )

    def st(x):  # (n_pad,) -> (n_tiles, RAY_TILE, 1)
        return x.reshape(n_tiles, RAY_TILE, 1)

    # Alias each carry input onto its output buffer: blocks of tiles with
    # ZERO pairs in a chunk are never visited by the grid, and a fresh
    # output buffer would replace their carried hit state with
    # uninitialized memory. Aliasing makes unvisited blocks pass through —
    # the kernel reuses the carry buffer in place (verified in interpret;
    # tools/check_tpu_consistency.py pins the compiled Mosaic behavior on
    # hardware). Alias indices count the scalar-prefetch operands.
    carry0 = 2 + 2 + len(extra_inputs)
    aliases = {carry0 + i: i for i in range(n_carry)}

    carry = tuple(st(c) for c in carry_in)
    extra = [st(x) for x in extra_inputs]
    tnear_bits = jax.lax.bitcast_convert_type(tnear_pair, jnp.int32)
    for c in range(n_chunks):
        meta_c = jax.lax.dynamic_slice(meta, (c * chunk,), (chunk,))
        tn_c = jax.lax.dynamic_slice(tnear_bits, (c * chunk,), (chunk,))
        inputs = [a6, d6] + extra + list(carry) + [tl.bw]
        if interpret:
            g = chunk
        else:
            g = jnp.clip(n_pairs - c * chunk, 1, chunk)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g,),
            in_specs=in_specs,
            out_specs=[state_spec() for _ in range(n_carry)],
        )
        carry = tuple(pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
            input_output_aliases=aliases,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(meta_c, tn_c, *inputs))
    return carry


# --- tile-resident sweep: one grid step per RAY TILE ---------------------------------
#
# The pair-grid sweep pays a fixed Mosaic step cost per (tile, treelet)
# pair — scalar fetches, index-map evaluation, block bookkeeping — that
# round-2 profiling put at ~3 us even for pairs the kernel skips. Here
# the grid is the TILE axis (ray block + carries stay resident in VMEM
# for the whole segment) and the kernel walks its pair segment with a
# lax.while_loop, double-buffering the (24, 3TT) treelet matrices
# HBM->VMEM with explicit DMAs. The front-to-back early-out becomes the
# loop CONDITION: the first unbeatable treelet ends the tile's sweep
# outright (the pair grid still paid a step per skipped pair).


def _closest_tiles_kernel(tre_ref, tn_ref, seg_ref, a6_ref, d6_ref,
                          key_i_ref, tr_i_ref, bw_hbm,
                          key_ref, tr_ref, bw_buf, sem, thr_ref):
    i = pl.program_id(0)
    start = seg_ref[i]
    end = seg_ref[i + 1]
    key_ref[0] = key_i_ref[0]
    tr_ref[0] = tr_i_ref[0]
    # rounded-up threshold in SMEM so the loop condition is a scalar read
    thr_ref[0] = jnp.max(key_i_ref[0] | COL_MASK)
    # loop-invariant column indices, hoisted out of the sweep body
    cols = jax.lax.broadcasted_iota(jnp.int32, (RAY_TILE, TREELET), 1)

    def dma(slot, p):
        return pltpu.make_async_copy(
            bw_hbm.at[tre_ref[p]], bw_buf.at[slot], sem.at[slot])

    @pl.when(start < end)
    def _():
        dma(0, start).start()

    def cond(p):
        return (p < end) & (tn_ref[p] < thr_ref[0])

    def body(p):
        slot = jax.lax.rem(p - start, 2)

        @pl.when(p + 1 < end)
        def _():
            dma(1 - slot, p + 1).start()

        dma(slot, p).wait()
        t, u, v = _bw_block_lean(a6_ref[:], d6_ref[:], bw_buf[slot])
        hit = _hit_mask_lean(t, u, v)
        t_cand = jnp.where(hit, t, 3.0e38)
        bits = jax.lax.bitcast_convert_type(t_cand, jnp.int32)
        key = (bits & ~COL_MASK) | cols
        key_new = jnp.min(key, axis=-1, keepdims=True)
        better = key_new < key_ref[0]
        key_ref[0] = jnp.where(better, key_new, key_ref[0])
        tr_ref[0] = jnp.where(better, tre_ref[p], tr_ref[0])
        thr_ref[0] = jnp.max(key_ref[0] | COL_MASK)
        return p + 1

    p_exit = jax.lax.while_loop(cond, body, start)

    # drain the in-flight prefetch when the threshold broke the loop
    # early (a started DMA must be awaited before the kernel returns)
    @pl.when(p_exit < end)
    def _():
        dma(jax.lax.rem(p_exit - start, 2), p_exit).wait()


def _occlusion_tiles_kernel(tre_ref, tn_ref, seg_ref, a6_ref, d6_ref,
                            tmax_ref, occ_i_ref, bw_hbm,
                            occ_ref, bw_buf, sem, thr_ref):
    i = pl.program_id(0)
    start = seg_ref[i]
    end = seg_ref[i + 1]
    occ_ref[0] = occ_i_ref[0]
    # reach of the farthest unresolved lane; once every lane is occluded
    # this becomes bits(0.0) = 0 and the loop breaks at the next pair
    thr_ref[0] = jnp.max(jax.lax.bitcast_convert_type(
        jnp.where(occ_i_ref[0] == 0, tmax_ref[0], 0.0), jnp.int32))

    def dma(slot, p):
        return pltpu.make_async_copy(
            bw_hbm.at[tre_ref[p]], bw_buf.at[slot], sem.at[slot])

    @pl.when(start < end)
    def _():
        dma(0, start).start()

    def cond(p):
        return (p < end) & (tn_ref[p] < thr_ref[0])

    def body(p):
        slot = jax.lax.rem(p - start, 2)

        @pl.when(p + 1 < end)
        def _():
            dma(1 - slot, p + 1).start()

        dma(slot, p).wait()
        t, u, v = _bw_block_lean(a6_ref[:], d6_ref[:], bw_buf[slot])
        hit = _hit_mask_lean(t, u, v) & (t < tmax_ref[0])
        occ_ref[0] = occ_ref[0] | jnp.any(
            hit, axis=-1, keepdims=True).astype(jnp.int32)
        thr_ref[0] = jnp.max(jax.lax.bitcast_convert_type(
            jnp.where(occ_ref[0] == 0, tmax_ref[0], 0.0), jnp.int32))
        return p + 1

    p_exit = jax.lax.while_loop(cond, body, start)

    @pl.when(p_exit < end)
    def _():
        dma(jax.lax.rem(p_exit - start, 2), p_exit).wait()


def _sweep_tiles(kernel, meta, seg, tnear_pair, a6, d6, carry_in,
                 extra_inputs, tl, n_tiles, interpret):
    """Run the tile-resident sweep: grid over ray tiles, chunked along the
    TILE axis so each call's scalar-prefetch pair slice stays bounded by
    PAIR_CHUNK. Tiles are disjoint across chunks (per-tile carries never
    cross calls, unlike the pair-grid chunking)."""
    from jax.experimental.pallas import tpu as pltpu

    T = tl.lo.shape[0]
    P = meta.shape[0]
    tre = meta & TREELET_MASK
    tnear_bits = jax.lax.bitcast_convert_type(tnear_pair, jnp.int32)
    # per-chunk tile count: c tiles can own at most c*T pairs
    c = max(1, min(n_tiles, PAIR_CHUNK // T))
    S = min(P, c * T)  # static pair-slice size per chunk

    n_carry = len(carry_in)

    def st(x):  # (n_pad,) -> (n_tiles, RAY_TILE, 1)
        return x.reshape(n_tiles, RAY_TILE, 1)

    carry_full = [st(x) for x in carry_in]
    extra_full = [st(x) for x in extra_inputs]
    outs = []
    for t0 in range(0, n_tiles, c):
        cj = min(c, n_tiles - t0)
        # rebase this chunk's segment table and slice its pair window
        seg_j = jax.lax.dynamic_slice(seg, (t0,), (cj + 1,))
        base = seg_j[0]
        seg_local = seg_j - base
        tre_j = jax.lax.dynamic_slice(tre, (jnp.minimum(base, P - S),), (S,))
        tn_j = jax.lax.dynamic_slice(
            tnear_bits, (jnp.minimum(base, P - S),), (S,))
        # dynamic_slice clamps its start to P - S: rebase again so
        # seg_local indexes the slice correctly even when clamped
        seg_local = seg_local + (base - jnp.minimum(base, P - S))

        state_spec = lambda: pl.BlockSpec(
            (1, RAY_TILE, 1), lambda i, tre_, tn_, seg_: (t0 + i, 0, 0))
        ray_spec = lambda: pl.BlockSpec(
            (RAY_TILE, KSPLIT), lambda i, tre_, tn_, seg_: (t0 + i, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(cj,),
            in_specs=(
                [ray_spec(), ray_spec()]
                + [state_spec() for _ in extra_inputs]
                + [state_spec() for _ in range(n_carry)]
                + [pl.BlockSpec(memory_space=pl.ANY)]
            ),
            out_specs=[
                pl.BlockSpec((1, RAY_TILE, 1),
                             lambda i, tre_, tn_, seg_: (i, 0, 0))
                for _ in range(n_carry)
            ],
            scratch_shapes=[
                pltpu.VMEM((2, KSPLIT, 3 * TREELET), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((1,), jnp.int32),
            ],
        )
        out_shape = [jax.ShapeDtypeStruct((cj, RAY_TILE, 1), x.dtype)
                     for x in carry_in]
        outs.append(pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(tre_j, tn_j, seg_local, a6, d6, *extra_full, *carry_full, tl.bw))
    if len(outs) == 1:
        return tuple(outs[0])
    return tuple(jnp.concatenate([o[k] for o in outs])
                 for k in range(n_carry))


def _ray_super_cull(tl: Treelets, o, d, t_max):
    """Per-ray conservative segment test against super-treelet AABBs
    (groups of SUPER consecutive treelets in leaf order). Returns a bool
    mask: False = the segment [o, o + t_max*d] provably intersects NO
    treelet, so the lane is a guaranteed miss (closest) / unoccluded
    (any-hit) and can be retired before the sort.

    The tile-level cull can never retire individual lanes — a single
    far-flying lane keeps its whole 1024-ray tile sweeping — so this is
    the only per-LANE cull in the pipeline. Cost: S fori steps of ~20
    VPU ops per lane (S ~ 48 BVH upper-node boxes)."""
    slo, shi = tl.sup_lo, tl.sup_hi
    ns = slo.shape[0]
    # zero components map to +-1e-20, NOT 0: a zero inverse would collapse
    # the parallel-axis slab interval to [0, 0] and reject real hits
    inv = 1.0 / jnp.where(
        jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)

    def body(i, may):
        t0 = (slo[i][None, :] - o) * inv
        t1 = (shi[i][None, :] - o) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        # tf > 1e-4, NOT > -margin: the sweep kernels themselves only
        # accept t > 1e-4, so a box whose exit lies closer than that can
        # never produce an accepted hit — and a bounce ray's 1e-3-offset
        # origin sits within any absolute margin of the very surface it
        # just left, which made a (-1e-3)-margin version of this test
        # keep 100% of lanes (measured: cleared 0.000 at every SUPER).
        ok = (
            (tn <= tf * 1.0001 + 1e-6)
            & (tf > 1e-4)
            & (tn <= t_max * 1.0001 + 1e-4)
        )
        return may | ok

    return jax.lax.fori_loop(0, ns, body,
                             jnp.zeros(o.shape[0], bool))


def _world_exit_clamp(o, d, t_max, world_lo, world_hi):
    """No triangle lies beyond the world box, so cap each ray's initial
    best-t at its box exit distance: lanes that escape the scene then stop
    inflating max(t_best) and the front-to-back early-out keeps biting in
    tiles with sky-bound rays (callers only read t on hit lanes)."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    ta = (world_lo[None, :] - o) * inv
    tb = (world_hi[None, :] - o) * inv
    t_exit = jnp.min(jnp.maximum(ta, tb), axis=-1)
    return jnp.minimum(t_max, jnp.maximum(t_exit, 0.0) * 1.0001 + 1e-3)


def _prefix_levels(n_pad: int, max_levels: int = 4) -> list[int]:
    """Descending static prefix sizes (RAY_TILE multiples) for the
    live-lane compaction cascade: n_pad, ~n_pad/2, ~n_pad/4, ~n_pad/8."""
    levels = [n_pad]
    while len(levels) < max_levels:
        s = -(-(levels[-1] // 2) // RAY_TILE) * RAY_TILE
        if s < RAY_TILE or s >= levels[-1]:
            break
        levels.append(s)
    return levels


def _run_cascade(live, levels, run):
    """Nested lax.cond over descending prefix sizes: execute run(sz) for
    the smallest sz with live <= sz (or the full size). Every branch is
    traced; only the chosen one executes on device, so the whole sort/
    cull/sweep/resolve pipeline cost tracks the live-lane count as paths
    terminate across bounces (dead lanes sort to the back)."""
    def at(idx):
        sz = levels[idx]
        if idx == len(levels) - 1:
            return run(sz)
        return jax.lax.cond(
            live <= levels[idx + 1], lambda: at(idx + 1), lambda: run(sz))
    return at(0)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "compact", "presorted"))
def closest_hit_packets(
    tl: Treelets, o, d, t_max, world_lo, world_hi, interpret: bool = False,
    active=None, band=None, compact: bool | None = None,
    presorted: bool = False,
) -> HitRecord:
    """Sorted-packet closest hit over the compacted pair list. o/d (R,3),
    t_max (R,). Returns HitRecord with tri indices into the BVH leaf order
    (same convention as traverse.closest_hit).

    active: optional (R,) bool — inactive lanes sort into their own tiles
    with t_max 0, which the culling pass drops entirely, so the sweep cost
    tracks the live-path count as paths terminate.

    band: optional f32 scalar — run the sweep as a banded two-pass (near
    hits resolved within `band` first, the remainder at full reach); see
    the inline comment. Worth it for incoherent bounce wavefronts.

    compact: run the post-sort pipeline on a lax.cond-selected static
    prefix sized to the live-lane count (defaults to on when compiled,
    off in interpret mode where the extra traced branches only slow
    tests).

    presorted: the caller guarantees lanes already arrive in a
    tile-coherent order with live lanes first (the resident bounce loop
    sorts by the same ray_sort_keys once per bounce) — skip the internal
    sort and the final unsort entirely. Correctness never depends on the
    order (tiles are just whatever 1024-lane groups arrive), only packet
    coherence does."""
    if compact is None:
        compact = (not interpret) and COMPACT_DEFAULT != "off"
    t_max = jnp.where(jnp.isfinite(t_max), t_max, 3.0e37)
    t_max = _world_exit_clamp(o, d, t_max, world_lo, world_hi)
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)
    # single-treelet scenes skip the pre-pass: the sweep is one pair per
    # tile already, and the per-ray box loop measured -7.7% on the fog
    # Cornell (T=1) while clearing nothing
    if PREPASS and tl.lo.shape[0] > 1:
        t_max = jnp.where(_ray_super_cull(tl, o, d, t_max), t_max, 0.0)
    o, d, t_max, n, n_pad = _pad_rays(o, d, t_max)
    n_treelets = tl.lo.shape[0]

    if presorted:
        order, os_, ds, ts = None, o, d, t_max
    else:
        keys = ray_sort_keys(o, d, world_lo, world_hi)
        # cap live keys below the dead-lane sentinel so the live prefix is
        # contiguous after the sort (the compaction cascade slices it off)
        keys = jnp.minimum(keys, jnp.uint32(0xFFFFFFFE))
        keys = jnp.where(t_max > 0.0, keys, jnp.uint32(0xFFFFFFFF))
        order, os_, ds, ts = _sort_wavefront(o, d, t_max, keys)

    def keyify(t):
        # quantized t bits rounded UP (low index bits set), so unbeaten
        # lanes keep a conservative early-out threshold
        return jax.lax.bitcast_convert_type(
            jnp.maximum(t, 0.0), jnp.int32) | COL_MASK

    def run(sz):
        os_s, ds_s, ts_s = os_[:sz], ds[:sz], ts[:sz]
        n_tiles = sz // RAY_TILE
        a6, d6 = _ray_matrices(os_s, ds_s)

        def sweep(meta, n_pairs, seg, tnear, carry_in):
            tnear_pair = tnear[meta >> TILE_SHIFT, meta & TREELET_MASK]
            if not EARLYOUT:  # bits(0)=0 < any threshold: never skip
                tnear_pair = jnp.zeros_like(tnear_pair)
            if SWEEP_MODE == "tile":
                key, tr = _sweep_tiles(
                    _closest_tiles_kernel, meta, seg, tnear_pair, a6, d6,
                    carry_in, [], tl, n_tiles, interpret)
            else:
                key, tr = _sweep_chunks(
                    _closest_pairs_kernel, meta, n_pairs, tnear_pair, a6, d6,
                    carry_in, [], tl, n_tiles, interpret)
            return key.reshape(-1), tr.reshape(-1)

        if band is None:
            mask, tnear = tile_treelet_mask(os_s, ds_s, ts_s, tl, n_tiles)
            meta, n_pairs, seg = _build_pairs(mask, tnear)
            carry_in = (keyify(ts_s), jnp.full((sz,), -1, jnp.int32))
            key, tr = sweep(meta, n_pairs, seg, tnear, carry_in)
        else:
            # Banded two-pass sweep: pass 1 caps every lane's reach at
            # `band`, which bounds the per-tile early-out threshold at
            # `band` from the START — with the L2 entry bound this culls
            # every beyond-band treelet even for omnidirectional (bounce)
            # tiles, where the one-pass threshold stays scene-scale until
            # the last lane resolves. Hits below the cap are final (the
            # threshold cannot drop below a lane's own capped t_max while
            # it is unresolved, so every treelet that could beat its best
            # was swept). Pass 2 re-sweeps only still-unresolved lanes at
            # full reach; sub-tiles that fully resolved in pass 1 cull
            # like dead tiles.
            band_t = jnp.asarray(band, jnp.float32)
            ts1 = jnp.minimum(ts_s, band_t)
            mask1, tnear1 = tile_treelet_mask(os_s, ds_s, ts1, tl, n_tiles)
            meta1, n_pairs1, seg1 = _build_pairs(mask1, tnear1)
            key1, tr1 = sweep(meta1, n_pairs1, seg1, tnear1,
                              (keyify(ts1), jnp.full((sz,), -1, jnp.int32)))
            # final after pass 1: found a hit, or had nothing beyond cap
            done = (tr1 >= 0) | (ts_s <= band_t)
            ts2 = jnp.where(done, 0.0, ts_s)
            mask2, tnear2 = tile_treelet_mask(os_s, ds_s, ts2, tl, n_tiles)
            meta2, n_pairs2, seg2 = _build_pairs(mask2, tnear2)
            key0_2 = jnp.where(done, key1, keyify(ts_s))
            key, tr = sweep(meta2, n_pairs2, seg2, tnear2, (key0_2, tr1))

        t_res, b1, b2, tri = _resolve_hits(tl, key, tr, os_s, ds_s)
        pad = n_pad - sz
        if pad:  # beyond-prefix lanes are dead: pad with misses
            t_res = jnp.concatenate([t_res, jnp.zeros((pad,), t_res.dtype)])
            b1 = jnp.concatenate([b1, jnp.zeros((pad,), b1.dtype)])
            b2 = jnp.concatenate([b2, jnp.zeros((pad,), b2.dtype)])
            tri = jnp.concatenate([tri, jnp.full((pad,), -1, tri.dtype)])
        return t_res, b1, b2, tri

    levels = _prefix_levels(n_pad) if compact else [n_pad]
    if len(levels) > 1:
        live = jnp.sum((ts > 0.0).astype(jnp.int32))
        t_res, b1, b2, tri = _run_cascade(live, levels, run)
    else:
        t_res, b1, b2, tri = run(n_pad)

    # unsort and strip padding
    if order is not None:
        t_res, b1, b2, tri = _unsort_hits(order, n_pad, t_res, b1, b2, tri)
    t_res, tri, b1, b2 = t_res[:n], tri[:n], b1[:n], b2[:n]
    return HitRecord(hit=tri >= 0, t=t_res, tri=tri, b1=b1, b2=b2)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "compact", "reverse"))
def any_hit_packets(tl, o, d, t_max, world_lo, world_hi, interpret=False,
                    active=None, group=None, compact: bool | None = None,
                    reverse: bool | None = None):
    """Occlusion-only pair sweep; front-to-back order plus the all-lanes-
    resolved early-out make shadow rays the cheap half of the frame.

    group: optional (R,) int32 — lanes are clustered by group before the
    spatial sort key. NEE shadow rays grouped by their sampled light id
    form single-target tiles whose frusta cull ~4x better than
    light-mixed tiles.

    compact: live-lane static-prefix cascade, as in closest_hit_packets.

    reverse: trace each segment from its FAR endpoint back toward the
    origin (occlusion is symmetric). For NEE rays whose far ends sit on
    a few sampled light points this turns converging mixed-sign packets
    into diverging shared-origin ones; see SHADOW_REV. The far end
    (formerly the light) is protected by the kernels' absolute t > 1e-4
    epsilon, the near end by the same 0.9999 reach shave as before."""
    if compact is None:
        compact = (not interpret) and COMPACT_DEFAULT != "off"
    if reverse is None:
        reverse = SHADOW_REV
    t_max = jnp.where(jnp.isfinite(t_max), t_max, 3.0e37)
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)
    if reverse:
        o = o + d * t_max[..., None]
        d = -d
    t_max = t_max * 0.9999
    if PREPASS and tl.lo.shape[0] > 1:
        t_max = jnp.where(_ray_super_cull(tl, o, d, t_max), t_max, 0.0)
    if group is not None:
        group = jnp.concatenate(
            [group, jnp.zeros((-len(group)) % RAY_TILE, group.dtype)])
    o, d, t_max, n, n_pad = _pad_rays(o, d, t_max)
    # padding lanes carry t_max=0 -> pre-resolved
    t_max = t_max.at[n:].set(0.0) if n_pad > n else t_max
    n_treelets = tl.lo.shape[0]

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
        meta, n_pairs, seg = _build_pairs(mask, tnear)
        tnear_pair = tnear[meta >> TILE_SHIFT, meta & TREELET_MASK]
        if not EARLYOUT:
            tnear_pair = jnp.zeros_like(tnear_pair)

        a6, d6 = _ray_matrices(os_s, ds_s)
        occ0 = (ts_s <= 0.0).astype(jnp.int32)

        if SWEEP_MODE == "tile":
            (occ,) = _sweep_tiles(
                _occlusion_tiles_kernel, meta, seg, tnear_pair, a6, d6,
                (occ0,), [ts_s], tl, n_tiles, interpret)
        else:
            (occ,) = _sweep_chunks(
                _occlusion_pairs_kernel, meta, n_pairs, tnear_pair, a6, d6,
                (occ0,), [ts_s], tl, n_tiles, interpret)
        occ = occ.reshape(-1)
        pad = n_pad - sz
        if pad:  # beyond-prefix lanes are dead: unoccluded
            occ = jnp.concatenate([occ, jnp.zeros((pad,), occ.dtype)])
        return occ

    levels = _prefix_levels(n_pad) if compact else [n_pad]
    if len(levels) > 1:
        live = jnp.sum((ts > 0.0).astype(jnp.int32))
        occ = _run_cascade(live, levels, run)
    else:
        occ = run(n_pad)

    # unsort by direct scatter (no inverse permutation needed for one column)
    occ = jnp.zeros((n_pad,), jnp.int32).at[order].set(occ)[:n]
    # lanes pre-resolved by t_max <= 0 (inactive/padding) are not occluded
    return (occ > 0) & (t_max[:n] > 0.0)
