#!/usr/bin/env python
"""Generate the CPU transport reference for bench.py's on-chip tripwire.

The round-3 bf16-fusion defect (XLA BFloat16Propagation collapsing the
traversal's 3-way f32 splits) silently dropped ~28% of closest hits for
most of a round; it was caught only by manually-run tools. This writes the
phase-7-style CPU invariants (rays_traced + mean_rgb of a 64x64, depth-5,
1-spp render of the default bench scene) to tools/transport_ref.json;
bench.py re-runs the same probe ON THE CHIP before timing and fails the
bench JSON line if compiled transport diverges.

Re-run this (CPU) whenever transport changes legitimately:
    python tools/gen_transport_ref.py
"""
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/hikari_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import bench

    scenes = sys.argv[1:] or ["default", "mesh", "fog", "cloud"]
    out = os.path.join(os.path.dirname(__file__), "transport_ref.json")
    refs = {"scenes": {}}
    if os.path.exists(out):
        with open(out) as f:
            old = json.load(f)
        if "scenes" in old:
            refs = old  # partial regeneration keeps other entries
    for which in scenes:
        builder = getattr(bench, bench.SCENE_DEFS[which][0])
        pres, pdepth, pspp, rgb_tol = bench.SCENE_DEFS[which][3]
        rays, mean_rgb = bench.transport_probe(builder(), which)
        refs["scenes"][which] = {
            "res": pres,
            "depth": pdepth,
            "spp": pspp,
            "rgb_tol": rgb_tol,
            "rays_traced": rays,
            "mean_rgb": mean_rgb,
            "backend": jax.default_backend(),
        }
        print(which, json.dumps(refs["scenes"][which]), flush=True)
    with open(out, "w") as f:
        json.dump(refs, f, indent=1)


if __name__ == "__main__":
    main()
