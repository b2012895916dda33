#!/usr/bin/env python
"""Decompose the pair-sweep kernel cost on a bounce-1 (incoherent) pair
list: full kernel vs matmul+min-t only vs pure grid overhead (all work
skipped). Tells whether to attack the MXU, the VPU epilogue, or the
per-step overhead."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, args, n=4, name=""):
    f = jax.jit(fn)
    r = f(*args); float(np.asarray(jax.tree_util.tree_leaves(r)[0].sum()))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(n):
            r = f(*args)
            s = jax.tree_util.tree_leaves(r)[0].sum().astype(jnp.float32)
            acc = s if acc is None else acc + s
        float(np.asarray(acc))
        ts.append((time.perf_counter() - t0) / n)
    print(f"{name:44s} {sorted(ts)[1]*1e3:9.2f} ms", flush=True)


def main():
    sys.path.insert(0, ".")
    from bench import build_scene
    from hikari_tpu.camera.camera import CameraSample, make_perspective_camera
    from hikari_tpu.geometry import wavefront as wf
    from tools.prof_closest_mini import cosine_scatter

    scene = build_scene()
    res = (800, 800)
    camera = make_perspective_camera((0.0, 1.6, -2.8), (0.0, 0.9, 2.0), res,
                                     fov_deg=45.0)
    w, h = res
    n = w * h
    lanes = jnp.arange(n, dtype=jnp.uint32)
    p_film = jnp.stack([(lanes % w).astype(jnp.float32),
                        (lanes // w).astype(jnp.float32)], -1) + 0.5
    o, d = camera.generate_rays(CameraSample(
        p_film=p_film, lens=jnp.zeros((n, 2)), time=jnp.zeros(n),
        filter_weight=jnp.ones(n)))
    t_max0 = jnp.full((n,), 3.0e37)
    tl = scene.treelets

    rec = jax.jit(lambda o, d, t: wf.closest_hit_packets(
        tl, o, d, t, scene.world_lo, scene.world_hi))(o, d, t_max0)
    o1, d1 = cosine_scatter(jax.random.PRNGKey(0), o + rec.t[:, None] * d, -d)
    a1 = rec.hit

    # build the sorted pair list ONCE (outside timing)
    def prep(o, d, t_max, active):
        t = jnp.where(jnp.isfinite(t_max), t_max, 3.0e37)
        t = wf._world_exit_clamp(o, d, t, scene.world_lo, scene.world_hi)
        t = jnp.where(active, t, 0.0)
        o_, d_, t_, nn, n_pad = wf._pad_rays(o, d, t)
        keys = wf.ray_sort_keys(o_, d_, scene.world_lo, scene.world_hi)
        keys = jnp.where(t_ > 0.0, keys, jnp.uint32(0xFFFFFFFF))
        order, os_, ds, ts = wf._sort_wavefront(o_, d_, t_, keys)
        mask, tnear = wf.tile_treelet_mask(os_, ds, ts, tl,
                                           n_pad // wf.RAY_TILE)
        meta, npairs, _seg = wf._build_pairs(mask, tnear)
        tnear_pair = tnear[meta >> wf.TILE_SHIFT, meta & wf.TREELET_MASK]
        a6, d6 = wf._ray_matrices(os_, ds)
        return meta, npairs, tnear_pair, a6, d6, ts, n_pad

    meta, npairs, tnear_pair, a6, d6, ts, n_pad = jax.jit(prep)(
        o1, d1, t_max0, a1)
    n_tiles = n_pad // wf.RAY_TILE
    print(f"bounce1 pairs={int(npairs)} tiles={n_tiles}", flush=True)

    T = wf.TREELET

    def mk_carry():
        key0 = jax.lax.bitcast_convert_type(
            jnp.maximum(ts, 0.0), jnp.int32) | wf.COL_MASK
        return (key0, jnp.full((n_pad,), -1, jnp.int32))

    def mk_carry_f32():
        return (ts,)

    def run_variant(kernel, carries, extra=()):
        def f(meta, npairs, tnear_pair, a6, d6):
            out = wf._sweep_chunks(kernel, meta, npairs, tnear_pair, a6, d6,
                                   carries, list(extra), tl, n_tiles, False)
            return out[0]
        return f

    # (a) the real kernel
    timeit(run_variant(wf._closest_pairs_kernel, mk_carry()),
           (meta, npairs, tnear_pair, a6, d6), 4, "full closest kernel")

    # (b) matmul + min-t only (no u/v extraction, no hit classification)
    def k_matmul_min(meta_ref, tnear_ref, a6_ref, d6_ref,
                     ti_ref, bw_ref, t_ref):
        p = pl.program_id(0)
        m = meta_ref[p]
        tile = m >> wf.TILE_SHIFT
        prev_tile = meta_ref[jnp.maximum(p - 1, 0)] >> wf.TILE_SHIFT

        @pl.when((p == 0) | (tile != prev_tile))
        def _init():
            t_ref[0] = ti_ref[0]

        thr_bits = jnp.max(jax.lax.bitcast_convert_type(t_ref[0], jnp.int32))

        @pl.when(tnear_ref[p] < thr_bits)
        def _work():
            t, u, v, den = wf._bw_block(a6_ref[:], d6_ref[:], bw_ref[0])
            t_new = jnp.min(jnp.where(t > 1e-4, t, 3.0e38), axis=-1,
                            keepdims=True)
            t_ref[0] = jnp.minimum(t_ref[0], t_new)

    timeit(run_variant(k_matmul_min, mk_carry_f32()),
           (meta, npairs, tnear_pair, a6, d6), 4, "matmul + min-t only")

    # (c) pure overhead: all pairs skipped
    def k_skip_all(meta_ref, tnear_ref, a6_ref, d6_ref,
                   ti_ref, bw_ref, t_ref):
        p = pl.program_id(0)
        m = meta_ref[p]
        tile = m >> wf.TILE_SHIFT
        prev_tile = meta_ref[jnp.maximum(p - 1, 0)] >> wf.TILE_SHIFT

        @pl.when((p == 0) | (tile != prev_tile))
        def _init():
            t_ref[0] = ti_ref[0]

        thr_bits = jnp.max(jax.lax.bitcast_convert_type(t_ref[0], jnp.int32))

        @pl.when(tnear_ref[p] < thr_bits - 2_000_000_000)
        def _work():
            t, u, v, den = wf._bw_block(a6_ref[:], d6_ref[:], bw_ref[0])
            t_ref[0] = jnp.minimum(t_ref[0], jnp.min(t, -1, keepdims=True))

    timeit(run_variant(k_skip_all, mk_carry_f32()),
           (meta, npairs, tnear_pair, a6, d6), 4, "all pairs skipped (overhead)")

    # (d) work always (skip check cost): real kernel w/o the when-guard
    def k_always(meta_ref, tnear_ref, a6_ref, d6_ref,
                 ti_ref, bw_ref, t_ref):
        p = pl.program_id(0)
        m = meta_ref[p]
        tile = m >> wf.TILE_SHIFT
        prev_tile = meta_ref[jnp.maximum(p - 1, 0)] >> wf.TILE_SHIFT

        @pl.when((p == 0) | (tile != prev_tile))
        def _init():
            t_ref[0] = ti_ref[0]

        t, u, v, den = wf._bw_block(a6_ref[:], d6_ref[:], bw_ref[0])
        eps = 1e-6
        hit = ((jnp.abs(den) > 1e-20) & (u >= -eps) & (v >= -eps)
               & (u + v <= 1.0 + eps) & (t > 1e-4))
        t_new = jnp.min(jnp.where(hit, t, 3.0e38), axis=-1, keepdims=True)
        t_ref[0] = jnp.minimum(t_ref[0], t_new)

    timeit(run_variant(k_always, mk_carry_f32()),
           (meta, npairs, tnear_pair, a6, d6), 4, "hit-class + min, no skip")


if __name__ == "__main__":
    main()
