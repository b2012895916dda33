#!/usr/bin/env python
"""End-to-end step decomposition: full render_lanes step vs traversal-only
cost, at bench-scene scale. One process, one-scalar syncs."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

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
    print(f"{name:40s} {sorted(ts)[1]*1e3:9.2f} ms", flush=True)

def main():
    sys.path.insert(0, ".")
    from bench import build_scene
    from hikari_tpu.camera.camera import CameraSample, make_perspective_camera
    from hikari_tpu.film.filters import make_filter
    from hikari_tpu.integrators.volpath import VolPath, render_lanes
    from hikari_tpu.geometry import wavefront as wf

    scene = build_scene()
    res = (800, 800)
    camera = make_perspective_camera((0.0, 1.6, -2.8), (0.0, 0.9, 2.0), res, fov_deg=45.0)
    filt = make_filter()
    w, h = res
    lanes = jnp.arange(w * h, dtype=jnp.uint32)
    px = lanes % w
    py = lanes // w
    vp = VolPath(max_depth=5, samples_per_pixel=256)

    def step(si):
        rgb, wgt, stats = render_lanes(vp, scene, camera, filt, si, px, py)
        return rgb.sum()
    timeit(step, (jnp.uint32(1),), 4, "full step depth5")

    vp1 = VolPath(max_depth=1, samples_per_pixel=256)
    def step1(si):
        rgb, wgt, stats = render_lanes(vp1, scene, camera, filt, si, px, py)
        return rgb.sum()
    timeit(step1, (jnp.uint32(1),), 4, "full step depth1")

    # traversal alone at primary scale
    p_film = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + 0.5
    o, d = camera.generate_rays(CameraSample(
        p_film=p_film, lens=jnp.zeros((w*h, 2)), time=jnp.zeros(w*h),
        filter_weight=jnp.ones(w*h)))
    t_max = jnp.full((w*h,), 3.0e37)
    def closest(o, d, t):
        return wf.closest_hit_packets(scene.treelets, o, d, t, scene.world_lo, scene.world_hi).t
    timeit(closest, (o, d, t_max), 6, "closest (primary)")
    def anyh(o, d, t):
        return wf.any_hit_packets(scene.treelets, o, d, jnp.full_like(t, 4.0), scene.world_lo, scene.world_hi)
    timeit(anyh, (o, d, t_max), 6, "anyhit (primary tmax=4)")

if __name__ == "__main__":
    main()
