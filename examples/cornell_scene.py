#!/usr/bin/env python
"""Flagship example: spectral Cornell box with fog, textures, and metals
(the cat_scene.jl analog — the reference's cat mesh asset is not
redistributable, so a mesh-heavy procedural stand-in is used; pass an OBJ
path to drop in any model).

Usage: python examples/cornell_scene.py [--spp 64] [--res 512] [--obj cat.obj]
"""

import argparse
import time

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo-root run

import numpy as np

import hikari_tpu as hk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--obj", type=str, default=None)
    ap.add_argument("--out", type=str, default="cornell.png")
    ap.add_argument("--denoise", action="store_true")
    args = ap.parse_args()

    checker = np.zeros((16, 16, 3), np.float32)
    checker[::2, ::2] = checker[1::2, 1::2] = (0.85, 0.85, 0.85)
    checker[checker.sum(-1) == 0] = (0.2, 0.3, 0.55)

    s = hk.Scene()
    white = hk.Matte(kd=(0.73, 0.73, 0.73))
    s.add(hk.make_quad((-1, 0, 0), (1, 0, 0), (1, 0, 2), (-1, 0, 2)),
          hk.Matte(kd=hk.ImageTexture(checker)))
    s.add(hk.make_quad((-1, 2, 0), (-1, 2, 2), (1, 2, 2), (1, 2, 0)), white)
    s.add(hk.make_quad((-1, 0, 2), (1, 0, 2), (1, 2, 2), (-1, 2, 2)), white)
    s.add(hk.make_quad((-1, 0, 0), (-1, 0, 2), (-1, 2, 2), (-1, 2, 0)),
          hk.Matte(kd=(0.65, 0.05, 0.05)))
    s.add(hk.make_quad((1, 0, 0), (1, 2, 0), (1, 2, 2), (1, 0, 2)),
          hk.Matte(kd=(0.12, 0.45, 0.15)))

    if args.obj:
        s.add(hk.load_obj(args.obj), hk.Gold(roughness=0.15))
    else:
        s.add(hk.make_sphere((-0.45, 0.4, 1.3), 0.4, 24, 48), hk.Gold(roughness=0.15))
        s.add(hk.make_sphere((0.45, 0.35, 0.9), 0.35, 24, 48), hk.BK7())
        s.add(hk.make_sphere((0.0, 1.2, 1.4), 0.25, 24, 48),
              hk.Plastic(kd=(0.2, 0.3, 0.8), roughness=0.1))

    s.add(hk.make_quad((-0.3, 1.99, 0.7), (0.3, 1.99, 0.7),
                       (0.3, 1.99, 1.3), (-0.3, 1.99, 1.3)),
          hk.Emissive(le=(1.0, 0.9, 0.7), scale=18.0))
    scene = s.build()
    print(s)

    cam = hk.make_perspective_camera(
        (0.0, 1.0, -2.6), (0.0, 1.0, 1.0), (args.res, args.res), fov_deg=50.0
    )
    vp = hk.VolPath(max_depth=args.depth, samples_per_pixel=args.spp)

    meter = hk.RenderMeter().start()
    film = hk.render(vp, scene, cam)
    img = hk.framebuffer(film)
    print("render:", meter.lap(args.res * args.res * args.spp * args.depth))

    if args.denoise:
        albedo, normal, depth = hk.render_aux(scene, cam)
        img = hk.denoise(img, albedo, normal, depth)

    hk.write_png(args.out, np.asarray(hk.postprocess(img, tonemap="aces")))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
