#!/usr/bin/env python
"""Dump the bench step's StableHLO for cross-version program diffing.

Usage (from a repo/worktree root):
    python tools/dump_step_hlo.py /tmp/hlo_head.txt [res]

Traces bench.run's step exactly as the bench would (same scene, same
VolPath config, single-sample path) but never executes it, so it is safe
to run off the measurement host rules. If two versions produce identical
programs, any wall-clock difference between them is environmental, not
code."""
import hashlib
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    out = sys.argv[1]
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 800

    from bench import build_scene
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.filters import make_filter
    from hikari_tpu.integrators.volpath import VolPath, render_lanes

    scene = build_scene()
    camera = make_perspective_camera(
        (0.0, 1.6, -2.8), (0.0, 0.9, 2.0), (res, res), fov_deg=45.0)
    filt = make_filter()
    vp = VolPath(max_depth=5, samples_per_pixel=256)
    w = h = res
    lanes = jnp.arange(w * h, dtype=jnp.uint32)
    px = lanes % w
    py = lanes // w

    def step(sample_idx):
        rgb, wgt, stats = render_lanes(vp, scene, camera, filt, sample_idx,
                                       px, py)
        return rgb.sum(), stats["rays_traced"]

    lowered = jax.jit(step).lower(jnp.uint32(0))
    txt = lowered.as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(out, len(txt), hashlib.sha256(txt.encode()).hexdigest()[:16])


if __name__ == "__main__":
    main()
