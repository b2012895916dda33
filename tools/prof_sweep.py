#!/usr/bin/env python
"""Decompose the packet-sweep cost: prologue (sort/reorder) vs cull vs sweep.

Uses the one-scalar sync harness (dependent dispatch chain, single
np.asarray at the end) because block_until_ready through the axon tunnel
returns at dispatch time.

Run: python tools/prof_sweep.py [n_iters]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, n=8, name=""):
    """Median wall time of n dependent dispatches, one sync at the end."""
    f = jax.jit(fn)
    r = f(*args)
    float(np.asarray(jax.tree_util.tree_leaves(r)[0].sum()))  # warm + sync
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(n):
            r = f(*args)
            leaf = jax.tree_util.tree_leaves(r)[0]
            s = leaf.sum().astype(jnp.float32)
            acc = s if acc is None else acc + s
        float(np.asarray(acc))
        ts.append((time.perf_counter() - t0) / n)
    dt = sorted(ts)[1]
    print(f"{name:42s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sys.path.insert(0, ".")
    from bench import build_scene
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.geometry import wavefront as wf

    scene = build_scene()
    res = (800, 800)
    camera = make_perspective_camera((0.0, 1.6, -2.8), (0.0, 0.9, 2.0), res, fov_deg=45.0)
    w, h = res
    lanes = jnp.arange(w * h, dtype=jnp.uint32)
    px = (lanes % w).astype(jnp.float32)
    py = (lanes // w).astype(jnp.float32)
    p_film = jnp.stack([px, py], -1) + 0.5

    from hikari_tpu.camera.camera import CameraSample

    o, d = camera.generate_rays(
        CameraSample(p_film=p_film, lens=jnp.zeros((w * h, 2)), time=jnp.zeros(w * h),
                     filter_weight=jnp.ones(w * h))
    )
    t_max = jnp.full((w * h,), 3.0e37, jnp.float32)
    tl = scene.treelets
    wlo, whi = scene.world_lo, scene.world_hi
    n = w * h

    # incoherent bounce-like set: shuffle + random directions
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    perm = jax.random.permutation(k1, n)
    o_inc = o[perm] + d[perm] * 2.0
    d_inc = jax.random.normal(k2, (n, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    print(f"scene treelets={tl.lo.shape[0]}  rays={n}")

    def full(o, d, t):
        r = wf.closest_hit_packets(tl, o, d, t, wlo, whi)
        return r.t

    def anyhit(o, d, t):
        return wf.any_hit_packets(tl, o, d, jnp.full_like(t, 4.0), wlo, whi)

    def prologue(o, d, t):
        keys = wf.ray_sort_keys(o, d, wlo, whi)
        keys = jnp.where(t > 0.0, keys, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(keys)
        inv_order = jnp.argsort(order)
        os_, ds, ts = o[order], d[order], t[order]
        # epilogue: 4 unsorts
        outs = [os_[..., 0][inv_order], ds[..., 0][inv_order],
                ts[inv_order], os_[..., 1][inv_order]]
        return sum(x.sum() for x in outs)

    def prologue_scatter_inv(o, d, t):
        keys = wf.ray_sort_keys(o, d, wlo, whi)
        keys = jnp.where(t > 0.0, keys, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(keys)
        inv_order = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        os_, ds, ts = o[order], d[order], t[order]
        outs = [os_[..., 0][inv_order], ds[..., 0][inv_order],
                ts[inv_order], os_[..., 1][inv_order]]
        return sum(x.sum() for x in outs)

    def sort_only(o, d, t):
        keys = wf.ray_sort_keys(o, d, wlo, whi)
        return jnp.argsort(keys).sum()

    def sortpair_only(o, d, t):
        keys = wf.ray_sort_keys(o, d, wlo, whi)
        _, order = jax.lax.sort_key_val(keys, jnp.arange(n, dtype=jnp.int32))
        return order.sum()

    def cull(o, d, t):
        n_tiles = n // wf.RAY_TILE
        mask, tnear = wf.tile_treelet_mask(o, d, t, tl, n_tiles)
        meta, n_pairs, _seg = wf._build_pairs(mask, tnear)
        return meta.sum() + n_pairs

    def raymats(o, d, t):
        a6, d6 = wf._ray_matrices(o, d)
        return a6.astype(jnp.float32).sum() + d6.astype(jnp.float32).sum()

    timeit(full, (o, d, t_max), n_iters, "closest full (primary)")
    timeit(full, (o_inc, d_inc, t_max), n_iters, "closest full (incoherent)")
    timeit(anyhit, (o, d, t_max), n_iters, "anyhit full (primary, tmax=4)")
    timeit(prologue, (o, d, t_max), n_iters, "prologue sort+reorder+unsort (2x argsort)")
    timeit(prologue_scatter_inv, (o, d, t_max), n_iters, "prologue w/ scatter inverse")
    timeit(sort_only, (o, d, t_max), n_iters, "argsort 640k only")
    timeit(sortpair_only, (o, d, t_max), n_iters, "sort_key_val 640k only")
    timeit(cull, (o, d, t_max), n_iters, "cull mask+pairs (primary)")
    timeit(cull, (o_inc, d_inc, t_max), n_iters, "cull mask+pairs (incoherent)")
    timeit(raymats, (o, d, t_max), n_iters, "ray split matrices")


if __name__ == "__main__":
    main()
