#!/usr/bin/env python
"""Per-bounce stage decomposition at bench-scene scale (800x800, 640k
lanes): depth sweep for marginal bounce cost, then each bounce-body stage
in isolation on realistic (primary-hit) data. One-scalar syncs."""
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


def main():
    sys.path.insert(0, ".")
    from bench import build_scene
    from hikari_tpu.camera.camera import CameraSample, make_perspective_camera
    from hikari_tpu.film.filters import make_filter
    from hikari_tpu.integrators import volpath as v
    from hikari_tpu.integrators.volpath import VolPath, render_lanes
    from hikari_tpu.sampling import sobol as sb

    scene = build_scene()
    res = (800, 800)
    camera = make_perspective_camera((0.0, 1.6, -2.8), (0.0, 0.9, 2.0), res, fov_deg=45.0)
    filt = make_filter()
    w, h = res
    n = w * h
    lanes = jnp.arange(n, dtype=jnp.uint32)
    px = lanes % w
    py = lanes // w

    # depth sweep: marginal cost per extra bounce
    for depth in (1, 2, 3, 5):
        vp = VolPath(max_depth=depth, samples_per_pixel=256)
        def step(si, vp=vp):
            rgb, wgt, stats = render_lanes(vp, scene, camera, filt, si, px, py)
            return rgb.sum()
        timeit(step, (jnp.uint32(1),), 4, f"full step depth{depth}")

    # realistic primary-hit state for stage isolation
    p_film = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + 0.5
    o, d = camera.generate_rays(CameraSample(
        p_film=p_film, lens=jnp.zeros((n, 2)), time=jnp.zeros(n),
        filter_weight=jnp.ones(n)))
    t_max = jnp.full((n,), 3.0e37)
    alive = jnp.ones((n,), bool)
    rec = jax.jit(v._closest_hit_surface)(scene, o, d, t_max, alive)
    lam = jnp.broadcast_to(jnp.linspace(450.0, 650.0, 4)[None, :], (n, 4))

    def surf(rec, o, d):
        sd = v._surface_data(scene, rec, o, d, camera)
        return sd["p"].sum() + sd["ns"].sum() + sd["tex"]["kd"].sum() if isinstance(sd["tex"], dict) else sd["p"].sum() + sd["ns"].sum()
    timeit(lambda r, o, d: v._surface_data(scene, r, o, d, camera)["p"],
           (rec, o, d), 4, "surface_data")

    sd = jax.jit(lambda r, o, d: v._surface_data(scene, r, o, d, camera))(rec, o, d)
    wo_l = jnp.stack([jnp.zeros(n), jnp.zeros(n), jnp.ones(n)], -1)
    u2 = jnp.stack([px.astype(jnp.float32) / w, py.astype(jnp.float32) / h], -1)
    uc = px.astype(jnp.float32) / w

    timeit(lambda mt_, mi, wol, l, a, b: v._sample_bsdf_dispatch(
        scene, mt_, mi, wol, l, a, b, None, sd["tex"]).f,
        (sd["mat_type"], sd["mat_idx"], wo_l, lam, u2, uc), 4,
        "sample_bsdf_dispatch")
    timeit(lambda mt_, mi, wol, l, a, b: v._eval_bsdf_dispatch(
        scene, mt_, mi, wol, wol, l, None, sd["tex"], a, b)[0],
        (sd["mat_type"], sd["mat_idx"], wo_l, lam, u2, uc), 4,
        "eval_bsdf_dispatch")

    zcfg = sb.make_zsobol(w, h, 256, seed=0)
    def draws(si):
        acc = sb.path_sample_1d(zcfg, px, py, si, 2, 0)
        a, b = sb.path_sample_2d(zcfg, px, py, si, 2, 1)
        c, e = sb.path_sample_2d(zcfg, px, py, si, 2, 7)
        f_ = sb.path_sample_1d(zcfg, px, py, si, 2, 9)
        g, h_ = sb.path_sample_2d(zcfg, px, py, si, 2, 3)
        i = sb.path_sample_1d(zcfg, px, py, si, 2, 5)
        j = sb.path_sample_1d(zcfg, px, py, si, 2, 6)
        return acc + a + b + c + e + f_ + g + h_ + i + j
    timeit(draws, (jnp.uint32(1),), 4, "sobol draws (7 calls, 10 dims)")

    # NEE block: light sample + shadow trace on primary hits
    from hikari_tpu.lights import types as lt
    ul = uc
    ul2 = u2
    li_flat, pmf_sel = jax.jit(lambda u: lt.sample_light_index(scene.lights, u))(ul)
    ltype = scene.lights.light_type[li_flat]
    lidx = scene.lights.light_idx[li_flat]
    timeit(lambda lt_, li, p, l, u: lt.sample_li(
        scene.lights, scene.rgb2spec, lt_, li, p, l, u, scene.scene_radius).li,
        (ltype, lidx, sd["p"], lam, ul2), 4, "light sample_li")
    ls = jax.jit(lambda lt_, li, p, l, u: lt.sample_li(
        scene.lights, scene.rgb2spec, lt_, li, p, l, u, scene.scene_radius))(
        ltype, lidx, sd["p"], lam, ul2)
    med_sh = jnp.full((n,), -1, jnp.int32)
    timeit(lambda o_, wi, tm, a: v._trace_shadow(
        scene, o_, wi, tm, med_sh, lam, a, light_group=li_flat)[0],
        (sd["p"], ls.wi, ls.t_max, alive), 4, "trace_shadow (full NEE occl)")


if __name__ == "__main__":
    main()
