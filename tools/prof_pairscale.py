#!/usr/bin/env python
"""Listed-pair counts at REAL wavefront scale, computed on the device.

tools/prof_paircount.py runs on CPU at small resolutions, where each
1024-ray tile spans a far larger origin patch than at the shipping
800^2 x samp_batch=4 scale — so its density numbers overstate the real
cull quality gap. This probe builds the full-scale wavefront (env
PAIR_RES, PAIR_KSAMP), runs the actual cull (tile_treelet_mask), and
reports pairs/tile for primary, bounce-1, bounce-2 and NEE-shadow ray
distributions, using the wavefront engine itself for the hit points.

Also reports the early-out-relevant threshold statistics per tile: the
fraction of lanes whose best-t stays at world-exit scale (miss lanes),
which pins why the front-to-back break does or does not fire
(tools/sim_sweep.py measured swept == listed on bounce sweeps at small
scale).

Run on the TPU from the repo root: python tools/prof_pairscale.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/hikari_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pair_count(scene, o, d, t_max):
    from hikari_tpu.geometry import wavefront as wf

    @jax.jit
    def count(o, d, t_max):
        t_max = jnp.where(jnp.isfinite(t_max), t_max, 3.0e37)
        t_max = wf._world_exit_clamp(o, d, t_max, scene.world_lo,
                                     scene.world_hi)
        o_p, d_p, tm_p, n, n_pad = wf._pad_rays(o, d, t_max)
        keys = wf.ray_sort_keys(o_p, d_p, scene.world_lo, scene.world_hi)
        keys = jnp.minimum(keys, jnp.uint32(0xFFFFFFFE))
        keys = jnp.where(tm_p > 0.0, keys, jnp.uint32(0xFFFFFFFF))
        order, os_, ds, ts = wf._sort_wavefront(o_p, d_p, tm_p, keys)
        n_tiles = n_pad // wf.RAY_TILE
        mask, tnear = wf.tile_treelet_mask(os_, ds, ts, tl, n_tiles)
        live_tiles = (ts.reshape(n_tiles, wf.RAY_TILE) > 0).any(1)
        return mask.sum(), live_tiles.sum(), n_tiles

    tl = scene.treelets
    pairs, live, n_tiles = count(o, d, t_max)
    return int(pairs), int(live), int(n_tiles)


def main():
    import bench
    from hikari_tpu.camera.camera import CameraSample, make_perspective_camera
    from hikari_tpu.geometry import wavefront as wf

    which = os.environ.get("BENCH_SCENE", "default")
    scene = {"default": bench.build_scene, "mesh": bench.build_mesh_scene,
             "fog": bench.build_fog_scene}[which]()
    res = int(os.environ.get("PAIR_RES", "800"))
    k = int(os.environ.get("PAIR_KSAMP", "4"))
    T = int(scene.treelets.lo.shape[0])
    n = res * res * k
    print(f"scene={which} rays={n} T={T} TT={wf.TREELET} RT={wf.RAY_TILE}",
          flush=True)

    camera = make_perspective_camera((0.0, 1.6, -2.8), (0.0, 0.9, 2.0),
                                     (res, res), fov_deg=45.0)
    lanes = jnp.arange(n, dtype=jnp.uint32)
    # k samples of the frame, jittered like the bench's sample batch
    pix = lanes % (res * res)
    rng = np.random.RandomState(0)
    jit_xy = jnp.asarray(rng.rand(n, 2).astype(np.float32))
    p_film = jnp.stack([(pix % res).astype(jnp.float32),
                        (pix // res).astype(jnp.float32)], -1) + jit_xy
    o, d = camera.generate_rays(CameraSample(
        p_film=p_film, lens=jnp.zeros((n, 2)), time=jnp.zeros(n),
        filter_weight=jnp.ones(n)))
    t_max = jnp.full((n,), 3.0e37)

    def report(label, o_, d_, t_):
        pairs, live, tiles = pair_count(scene, o_, d_, t_)
        print(f"{label:10s} pairs={pairs:9d} live_tiles={live:5d}/{tiles} "
              f"pairs/live_tile={pairs / max(live, 1):8.1f} "
              f"density={pairs / max(live, 1) / T:6.3f}", flush=True)

    report("primary", o, d, t_max)

    rec = wf.closest_hit_packets(scene.treelets, o, d, t_max,
                                 scene.world_lo, scene.world_hi)
    p_hit = o + rec.t[:, None] * d
    ng = -d

    def scatter(key, p, nrm):
        u = jax.random.uniform(key, (n, 2))
        r = jnp.sqrt(u[:, 0])
        phi = 2 * jnp.pi * u[:, 1]
        z = jnp.sqrt(jnp.maximum(1.0 - u[:, 0], 0.0))
        local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
        up = jnp.where(jnp.abs(nrm[:, 2:3]) < 0.9,
                       jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
        t = jnp.cross(up, nrm)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-9)
        b = jnp.cross(nrm, t)
        return (p + 1e-3 * nrm,
                local[:, 0:1] * t + local[:, 1:2] * b + local[:, 2:3] * nrm)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    o1, d1 = scatter(k1, p_hit, ng)
    t1 = jnp.where(rec.hit, 3.0e37, 0.0)
    report("bounce1", o1, d1, t1)

    rec1 = wf.closest_hit_packets(scene.treelets, o1, d1, t1,
                                  scene.world_lo, scene.world_hi)
    p2 = o1 + rec1.t[:, None] * d1
    o2, d2 = scatter(k2, p2, -d1)
    t2 = jnp.where(rec.hit & rec1.hit, 3.0e37, 0.0)
    report("bounce2", o2, d2, t2)

    # NEE shadow rays toward the emissive panel
    lp = jnp.array([0.0, 3.99, 2.0])
    dl = lp[None, :] - p_hit
    dist = jnp.linalg.norm(dl, axis=-1)
    ds_ = dl / jnp.maximum(dist[:, None], 1e-9)
    report("shadow", o1, ds_, jnp.where(rec.hit, dist * 0.999, 0.0))

    # miss-lane fraction on bounce1 (why the early-out does not fire):
    frac_miss = float((rec.hit & ~rec1.hit).sum() / rec.hit.sum())
    print(f"bounce1 miss fraction (live lanes): {frac_miss:.3f}", flush=True)

    # pre-pass diagnosis: how many of those miss lanes does the super-AABB
    # segment test actually clear, per SUPER granularity? (phase-B A/B
    # measured HIKARI_PREPASS=on at -1%: if cleared << missed, the boxes
    # are too coarse)
    from hikari_tpu.geometry import wavefront as wf2
    for sup in (64, 32, 8, 2):
        wf2.SUPER = sup
        may = wf2._ray_super_cull(scene.treelets, o1, d1, t1)
        cleared = (~may) & np.asarray(rec.hit)
        print(f"prepass SUPER={sup:3d}: cleared "
              f"{float(cleared.sum() / rec.hit.sum()):.3f} of live bounce1 "
              f"lanes (miss fraction {frac_miss:.3f})", flush=True)


if __name__ == "__main__":
    main()
