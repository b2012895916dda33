#!/usr/bin/env python
"""Version-agnostic closest-hit timings for primary / bounce1 / bounce2
ray distributions (uses only the public closest_hit_packets signature, so
it runs in bisect worktrees)."""
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
    print(f"{name:44s} {sorted(ts)[1]*1e3:9.2f} ms", flush=True)


def cosine_scatter(key, p, ng):
    n = p.shape[0]
    u = jax.random.uniform(key, (n, 2))
    r = jnp.sqrt(u[:, 0])
    phi = 2 * jnp.pi * u[:, 1]
    z = jnp.sqrt(jnp.maximum(1.0 - u[:, 0], 0.0))
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
    up = jnp.where(jnp.abs(ng[:, 2:3]) < 0.9,
                   jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
    t = jnp.cross(up, ng); t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    b = jnp.cross(ng, t)
    wi = local[:, 0:1] * t + local[:, 1:2] * b + local[:, 2:3] * ng
    return p + 1e-3 * ng, wi


def main():
    sys.path.insert(0, ".")
    import os

    import bench
    from hikari_tpu.camera.camera import CameraSample, make_perspective_camera
    from hikari_tpu.geometry import wavefront as wf

    which = os.environ.get("BENCH_SCENE", "default")
    scene = {"default": bench.build_scene, "mesh": bench.build_mesh_scene,
             "fog": bench.build_fog_scene}[which]()
    print(f"scene={which}", flush=True)
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
    t_max = jnp.full((n,), 3.0e37)
    tl = scene.treelets

    def closest(o, d, t, a):
        return wf.closest_hit_packets(tl, o, d, t, scene.world_lo,
                                      scene.world_hi, active=a).t

    diag = float(np.linalg.norm(np.asarray(scene.world_hi)
                                - np.asarray(scene.world_lo)))

    def closest_band(o, d, t, a):
        return wf.closest_hit_packets(tl, o, d, t, scene.world_lo,
                                      scene.world_hi, active=a,
                                      band=jnp.float32(0.15 * diag)).t

    def anyh(o, d, t, a):
        return wf.any_hit_packets(tl, o, d, t, scene.world_lo,
                                  scene.world_hi, active=a)

    key = jax.random.PRNGKey(0)
    alive_all = jnp.ones((n,), bool)
    rec = jax.jit(lambda o, d, t: wf.closest_hit_packets(
        tl, o, d, t, scene.world_lo, scene.world_hi))(o, d, t_max)
    p_hit = o + rec.t[:, None] * d
    ng = -d

    timeit(closest, (o, d, t_max, alive_all), 4, "closest primary")

    timeit(closest_band, (o, d, t_max, alive_all), 4, "closest primary band")

    k1, k2 = jax.random.split(key)
    o1, d1 = cosine_scatter(k1, p_hit, ng)
    a1 = rec.hit
    timeit(closest, (o1, d1, t_max, a1), 4, "closest bounce1")
    timeit(closest_band, (o1, d1, t_max, a1), 4, "closest bounce1 band")
    timeit(anyh, (o1, d1, jnp.full((n,), 3.0), a1), 4, "anyhit bounce1 tmax=3")

    rec1 = jax.jit(lambda o, d, t, a: wf.closest_hit_packets(
        tl, o, d, t, scene.world_lo, scene.world_hi, active=a))(
        o1, d1, t_max, a1)
    p2 = o1 + rec1.t[:, None] * d1
    o2, d2 = cosine_scatter(k2, p2, -d1)
    a2 = a1 & rec1.hit
    timeit(closest, (o2, d2, t_max, a2), 4, "closest bounce2")


if __name__ == "__main__":
    main()
