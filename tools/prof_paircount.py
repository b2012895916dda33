#!/usr/bin/env python
"""CPU-runnable cull-quality proxy: counts surviving (tile x treelet)
pairs for primary / bounce / shadow ray distributions on the bench scene.

Pair count x ~0.22 us (measured MXU+min cost per pair, tools/
prof_kernel.py) lower-bounds sweep time, so cull/treelet changes can be
evaluated without the TPU tunnel. Run with JAX_PLATFORMS=cpu."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon plugin ignores JAX_PLATFORMS env; only jax.config works
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def pair_stats(tl, o, d, t_max, world_lo, world_hi, band=None):
    from hikari_tpu.geometry import wavefront as wf

    t_max = jnp.where(jnp.isfinite(t_max), t_max, 3.0e37)
    t_max = wf._world_exit_clamp(o, d, t_max, world_lo, world_hi)
    o, d, t_max, n, n_pad = wf._pad_rays(o, d, t_max)
    n_tiles = n_pad // wf.RAY_TILE
    keys = wf.ray_sort_keys(o, d, world_lo, world_hi)
    keys = jnp.where(t_max > 0.0, keys, jnp.uint32(0xFFFFFFFF))
    order, os_, ds, ts = wf._sort_wavefront(o, d, t_max, keys)
    if band is None:
        mask, tnear = wf.tile_treelet_mask(os_, ds, ts, tl, n_tiles)
        return int(mask.sum()), 0
    ts1 = jnp.minimum(ts, jnp.float32(band))
    mask1, _ = wf.tile_treelet_mask(os_, ds, ts1, tl, n_tiles)
    # pass-2 estimate needs pass-1 hit results; approximate "done" with
    # an exact closest-hit (interpret) only for small ray counts
    return int(mask1.sum()), None


def main():
    import bench
    from hikari_tpu.camera.camera import CameraSample, make_perspective_camera
    from hikari_tpu.geometry import wavefront as wf

    which = os.environ.get("BENCH_SCENE", "default")
    builders = {"default": bench.build_scene, "mesh": bench.build_mesh_scene,
                "fog": bench.build_fog_scene, "sphere": bench.build_sphere_scene}
    scene = builders[which]()
    res = int(os.environ.get("PAIR_RES", "400"))
    camera = make_perspective_camera((0.0, 1.6, -2.8), (0.0, 0.9, 2.0),
                                     (res, res), fov_deg=45.0)
    n = res * res
    lanes = jnp.arange(n, dtype=jnp.uint32)
    p_film = jnp.stack([(lanes % res).astype(jnp.float32),
                        (lanes // res).astype(jnp.float32)], -1) + 0.5
    o, d = camera.generate_rays(CameraSample(
        p_film=p_film, lens=jnp.zeros((n, 2)), time=jnp.zeros(n),
        filter_weight=jnp.ones(n)))
    t_max = jnp.full((n,), 3.0e37)
    tl = scene.treelets
    T = tl.lo.shape[0]
    print(f"rays={n} treelets={T} TT={wf.TREELET} tiles={-(-n // wf.RAY_TILE)}")

    diag = float(np.linalg.norm(np.asarray(scene.world_hi - scene.world_lo)))

    p_full, _ = pair_stats(tl, o, d, t_max, scene.world_lo, scene.world_hi)
    print(f"primary pairs (full reach): {p_full}")

    # exact first hits via the skip-link walk (pure XLA, CPU-fast enough;
    # interpret-mode pallas would python-loop over every pair)
    from hikari_tpu.geometry.traverse import closest_hit

    rec = jax.jit(closest_hit)(scene.bvh, o, d, t_max)
    rec.t.block_until_ready()
    print("first hits done", flush=True)
    p_hit = o + rec.t[:, None] * d
    ng = -d

    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.rand(n, 2).astype(np.float32))
    r = jnp.sqrt(u[:, 0])
    phi = 2 * jnp.pi * u[:, 1]
    z = jnp.sqrt(jnp.maximum(1.0 - u[:, 0], 0.0))
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
    up = jnp.where(jnp.abs(ng[:, 2:3]) < 0.9,
                   jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
    tt = jnp.cross(up, ng)
    tt = tt / jnp.maximum(jnp.linalg.norm(tt, axis=-1, keepdims=True), 1e-9)
    b = jnp.cross(ng, tt)
    d1 = local[:, 0:1] * tt + local[:, 1:2] * b + local[:, 2:3] * ng
    o1 = p_hit + 1e-3 * ng

    b_full, _ = pair_stats(tl, o1, d1, t_max, scene.world_lo,
                           scene.world_hi)
    b_band, _ = pair_stats(tl, o1, d1, t_max, scene.world_lo,
                           scene.world_hi, band=0.15 * diag)
    print(f"bounce1 pairs (full reach): {b_full}")
    print(f"bounce1 pairs (band pass1 @0.15 diag): {b_band}")

    # shadow rays: converge on the emissive panel center
    lp = jnp.array([0.0, 3.99, 2.0])
    dl = lp[None, :] - p_hit
    dist = jnp.linalg.norm(dl, axis=-1)
    ds_ = dl / jnp.maximum(dist[:, None], 1e-9)
    s_full, _ = pair_stats(tl, o1, ds_, dist * 0.999, scene.world_lo,
                           scene.world_hi)
    print(f"shadow pairs (t_max = light dist): {s_full}")


if __name__ == "__main__":
    main()
