#!/usr/bin/env python
"""Confirm the pair-explosion hypothesis: closest-hit cost and surviving
pair counts for primary vs bounce-1 vs bounce-2 ray distributions, and the
effect of RAY_TILE on both (set HIKARI_RAY_TILE before running)."""
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


def cosine_scatter(key, p, ng, alive):
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
    o2 = p + 1e-3 * ng
    return o2, wi, alive


def main():
    sys.path.insert(0, ".")
    from bench import build_scene
    from hikari_tpu.camera.camera import CameraSample, make_perspective_camera
    from hikari_tpu.geometry import wavefront as wf

    print(f"RAY_TILE={wf.RAY_TILE} TREELET={wf.TREELET}", flush=True)
    scene = build_scene()
    res = (800, 800)
    camera = make_perspective_camera((0.0, 1.6, -2.8), (0.0, 0.9, 2.0), res, fov_deg=45.0)
    w, h = res
    n = w * h
    lanes = jnp.arange(n, dtype=jnp.uint32)
    px = lanes % w
    py = lanes // w
    p_film = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + 0.5
    o, d = camera.generate_rays(CameraSample(
        p_film=p_film, lens=jnp.zeros((n, 2)), time=jnp.zeros(n),
        filter_weight=jnp.ones(n)))
    t_max = jnp.full((n,), 3.0e37)
    tl = scene.treelets

    def n_pairs_of(o, d, t, active):
        t = jnp.where(jnp.isfinite(t), t, 3.0e37)
        t = wf._world_exit_clamp(o, d, t, scene.world_lo, scene.world_hi)
        t = jnp.where(active, t, 0.0)
        o_, d_, t_, nn, n_pad = wf._pad_rays(o, d, t)
        keys = wf.ray_sort_keys(o_, d_, scene.world_lo, scene.world_hi)
        keys = jnp.where(t_ > 0.0, keys, jnp.uint32(0xFFFFFFFF))
        order, os_, ds, ts = wf._sort_wavefront(o_, d_, t_, keys)
        mask, tnear = wf.tile_treelet_mask(os_, ds, ts, tl, n_pad // wf.RAY_TILE)
        meta, npairs, _seg = wf._build_pairs(mask, tnear)
        return npairs

    def closest(o, d, t, a):
        return wf.closest_hit_packets(tl, o, d, t, scene.world_lo,
                                      scene.world_hi, active=a).t

    key = jax.random.PRNGKey(0)
    rec = jax.jit(lambda o, d, t: wf.closest_hit_packets(
        tl, o, d, t, scene.world_lo, scene.world_hi))(o, d, t_max)
    # reconstruct hit geometry from bench scene triangles for scattering
    hitm = rec.hit
    p_hit = o + rec.t[:, None] * d
    ng = -d  # crude stand-in normal (hemisphere around -d)

    alive_all = jnp.ones((n,), bool)
    print(f"primary  pairs={int(jax.jit(n_pairs_of)(o, d, t_max, alive_all))}",
          flush=True)
    timeit(closest, (o, d, t_max, alive_all), 4, "closest primary")

    k1, k2 = jax.random.split(key)
    o1, d1, a1 = cosine_scatter(k1, p_hit, ng, hitm)
    print(f"bounce1  pairs={int(jax.jit(n_pairs_of)(o1, d1, t_max, a1))} "
          f"alive={int(a1.sum())}", flush=True)
    timeit(closest, (o1, d1, t_max, a1), 4, "closest bounce1 (cos-scatter)")

    rec1 = jax.jit(lambda o, d, t, a: wf.closest_hit_packets(
        tl, o, d, t, scene.world_lo, scene.world_hi, active=a))(o1, d1, t_max, a1)
    p2 = o1 + rec1.t[:, None] * d1
    o2, d2, _ = cosine_scatter(k2, p2, -d1, a1)
    a2 = a1 & rec1.hit
    print(f"bounce2  pairs={int(jax.jit(n_pairs_of)(o2, d2, t_max, a2))} "
          f"alive={int(a2.sum())}", flush=True)
    timeit(closest, (o2, d2, t_max, a2), 4, "closest bounce2 (cos-scatter)")


if __name__ == "__main__":
    main()
