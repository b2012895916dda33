"""End-to-end resident-vs-plain check on the real chip.

tests/test_resident.py pins the resident sorted-compacted bounce loop
against the plain full-wavefront loop on the CPU backend (interpret
kernels). This script pins the same equivalence COMPILED on hardware,
where the Mosaic kernels, the lax.cond cascade, and the f32-packed
integer channels (exactness of <2^24 round trips) all take their real
code paths.

Run on the TPU:  python tools/check_resident_hw.py
Exit 0 = resident render matches plain to fp tolerance.
"""
import sys

import numpy as np

sys.path.insert(0, ".")

from hikari_tpu.camera.camera import make_perspective_camera  # noqa: E402
from hikari_tpu.film.film import framebuffer  # noqa: E402
from hikari_tpu.film.filters import make_filter  # noqa: E402
from hikari_tpu.integrators.volpath import VolPath, render  # noqa: E402

import bench  # noqa: E402  (repo-root scene builders)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/hikari_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(jax.devices())
    scene = bench.build_fog_scene()  # surfaces + medium + 2 light types
    cam = make_perspective_camera((0.0, 1.0, -2.6), (0.0, 1.0, 1.0),
                                  (128, 96), fov_deg=50.0)
    imgs = {}
    for mode in ("off", "on"):
        vp = VolPath(max_depth=4, samples_per_pixel=2, resident=mode)
        film = render(vp, scene, cam, filt=make_filter())
        imgs[mode] = np.asarray(framebuffer(film))
        print(f"resident={mode}: mean={imgs[mode].mean():.6f}", flush=True)
    a, b = imgs["off"], imgs["on"]
    if not np.all(np.isfinite(b)):
        print("FAIL: non-finite pixels in resident render")
        sys.exit(1)
    err = np.abs(a - b) / np.maximum(np.abs(a), 1e-3)
    bad = int(np.sum(err > 1e-2))
    print(f"max rel err {err.max():.3e}, lanes>1e-2: {bad}")
    if bad or not np.allclose(a, b, atol=2e-3, rtol=1e-3):
        print("FAIL: resident render diverges from plain on hardware")
        sys.exit(1)
    print("PASS")


if __name__ == "__main__":
    main()
