#!/usr/bin/env python
"""Participating-media example (medium_example.jl / volume_example.jl
analog): a glass sphere filled with milk, a smoke grid, and homogeneous
room fog, all via MediumInterface boundaries."""

import argparse

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo-root run

import numpy as np

import hikari_tpu as hk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--out", type=str, default="medium.png")
    args = ap.parse_args()

    s = hk.Scene()
    s.add(hk.make_quad((-3, 0, -3), (3, 0, -3), (3, 0, 3), (-3, 0, 3)),
          hk.Matte(kd=(0.55, 0.55, 0.55)))

    # milk inside a glass sphere: dielectric boundary + measured medium
    milk = hk.Milk(scale=30.0)
    s.add(hk.make_sphere((-0.8, 0.5, 0.2), 0.5, 24, 48), hk.Glass(eta=1.4),
          inside_medium=milk)

    # procedural smoke plume in an invisible box
    rng = np.random.RandomState(0)
    z, y, x = np.meshgrid(*(np.linspace(0, 1, 48),) * 3, indexing="ij")
    column = np.exp(-18.0 * ((x - 0.5) ** 2 + (y - 0.5) ** 2)) * (1.2 - z)
    smoke = hk.GridMedium(
        density=(column * 4).astype(np.float32),
        bounds_lo=(0.4, 0.0, -0.4), bounds_hi=(1.6, 1.8, 0.8),
        sigma_a=(0.05, 0.05, 0.05), sigma_s=(0.9, 0.9, 0.9), g=0.2,
    )
    s.add(hk.make_box((0.4, 0.0, -0.4), (1.6, 1.8, 0.8)), hk.Interface(),
          inside_medium=smoke)

    s.add_light(hk.PointLight(position=(0, 2.6, -1.0), intensity=(14, 14, 14)))
    s.add_light(hk.DistantLight(direction=(0.3, -1.0, 0.4), radiance=(1.5, 1.6, 1.8)))
    scene = s.build()

    cam = hk.make_perspective_camera((0, 1.3, -3.4), (0.2, 0.7, 0),
                                     (args.res, args.res), fov_deg=48.0)
    film = hk.render(hk.VolPath(max_depth=10, samples_per_pixel=args.spp), scene, cam)
    hk.write_png(args.out, np.asarray(hk.postprocess(hk.framebuffer(film), tonemap="aces")))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
