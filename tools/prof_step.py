#!/usr/bin/env python
"""Per-depth step decomposition of the flagship VolPath render step.

Times one full render_lanes sample at max_depth = 1..5 for resident on
and off on the bench scene (800x800, 61k tris). The marginal cost of
depth k isolates how per-bounce cost tracks live-lane termination —
the number the resident bounce loop exists to shrink. One-scalar
np.asarray sync per measurement (block_until_ready lies through the
axon tunnel; see PERF.md round 2).

Run on the TPU:  python tools/prof_step.py [res]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/hikari_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")


def main():
    import os

    import bench
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.filters import make_filter
    from hikari_tpu.integrators.volpath import VolPath, render_lanes

    res_px = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    res = (res_px, res_px)
    which = os.environ.get("BENCH_SCENE", "default")
    scene = {"default": bench.build_scene, "mesh": bench.build_mesh_scene,
             "fog": bench.build_fog_scene}[which]()
    print(f"scene={which}", flush=True)
    camera = make_perspective_camera(
        (0.0, 1.6, -2.8), (0.0, 0.9, 2.0), res, fov_deg=45.0)
    filt = make_filter()
    w, h = res
    lanes = jnp.arange(w * h, dtype=jnp.uint32)
    px, py = lanes % w, lanes // w

    def timed(vp, n=3):
        @jax.jit
        def step(sample_idx):
            rgb, wgt, stats = render_lanes(
                vp, scene, camera, filt, sample_idx, px, py)
            return rgb.sum(), stats["rays_traced"]

        c, _ = step(jnp.uint32(0))
        float(np.asarray(c))  # compile + sync
        ts = []
        for rep in range(3):
            t0 = time.perf_counter()
            acc = rays = None
            for s in range(1, n + 1):
                c, r = step(jnp.uint32(rep * n + s))
                acc = c if acc is None else acc + c
                rays = r if rays is None else rays + r
            total_rays = float(np.asarray(rays))
            float(np.asarray(acc))
            ts.append((time.perf_counter() - t0) / n)
        return sorted(ts)[1], total_rays / n

    print(f"scene: bench default at {res[0]}x{res[1]}", flush=True)
    for mode in ("auto", "off"):
        prev = 0.0
        for depth in range(1, 6):
            vp = VolPath(max_depth=depth, samples_per_pixel=1, resident=mode)
            dt, rays = timed(vp)
            print(
                f"resident={mode:4s} depth={depth}: {dt * 1e3:8.1f} ms/sample"
                f"  (marginal {(dt - prev) * 1e3:7.1f} ms,"
                f" {rays / 1e6:.2f} Mray/sample)",
                flush=True,
            )
            prev = dt


if __name__ == "__main__":
    main()
