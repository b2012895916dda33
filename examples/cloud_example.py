#!/usr/bin/env python
"""Volumetric cloud under a Hosek-Wilkie sun/sky (bomex_cloud_example.jl
analog): procedural Worley/Perlin cloud with strong forward scattering
(g ~ 0.877, the reference's Disney-cloud setting), deep multiple scatter,
NanoVDB round trip."""

import argparse

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo-root run

import numpy as np

import hikari_tpu as hk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=24)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--grid", type=int, default=96)
    ap.add_argument("--nvdb", type=str, default=None,
                    help="optional NanoVDB file to load instead of the procedural cloud")
    ap.add_argument("--out", type=str, default="cloud.png")
    args = ap.parse_args()

    if args.nvdb:
        cloud = hk.nanovdb_medium(args.nvdb, sigma_s=(10.0,) * 3,
                                  sigma_a=(0.05,) * 3, g=0.877)
        lo, hi = cloud.bounds_lo, cloud.bounds_hi
    else:
        lo, hi = (-2.0, 0.8, -2.0), (2.0, 3.2, 2.0)
        cloud = hk.CloudVolume(
            resolution=args.grid, bounds_lo=lo, bounds_hi=hi,
            sigma_s=(12.0,) * 3, sigma_a=(0.02,) * 3, g=0.877,
            scale=2.5, worley_weight=0.6, threshold=0.15,
        )
        # demonstrate the NanoVDB round trip like the reference example
        hk.save_nanovdb("/tmp/cloud.nvdb", cloud.density, origin=lo,
                        extent=tuple(np.subtract(hi, lo)))

    s = hk.Scene()
    s.add(hk.make_quad((-30, 0, -30), (30, 0, -30), (30, 0, 30), (-30, 0, 30)),
          hk.Matte(kd=(0.35, 0.4, 0.3)))
    s.add(hk.make_box(lo, hi), hk.Interface(), inside_medium=cloud)

    env, sun = hk.sunsky_environment(direction=(0.5, 0.35, 0.6), up="y",
                                     turbidity=3.0, resolution=128)
    s.add_light(env)
    s.add_light(sun)
    scene = s.build()

    cam = hk.make_perspective_camera((0, 1.6, -7.5), (0, 1.9, 0),
                                     (args.res, args.res), fov_deg=55.0)
    film = hk.render(hk.VolPath(max_depth=args.depth, samples_per_pixel=args.spp),
                     scene, cam)
    hk.write_png(args.out, np.asarray(hk.postprocess(hk.framebuffer(film), tonemap="aces")))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
