#!/usr/bin/env python
"""Minimal quickstart (single_triangle_test.jl / sphere_normals_test.jl
analog): one sphere, one light, three integrators side by side."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo-root run

import numpy as np

import hikari_tpu as hk

s = hk.Scene()
s.add(hk.make_quad((-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4)),
      hk.Matte(kd=(0.6, 0.6, 0.6)))
s.add(hk.make_sphere((0, 0.6, 0), 0.6), hk.Plastic(kd=(0.8, 0.15, 0.1), roughness=0.15))
s.add_light(hk.PointLight(position=(2, 4, -2), intensity=(30, 30, 30)))
scene = s.build()
print(s)

cam = hk.make_perspective_camera((0, 1.4, -3.2), (0, 0.5, 0), (192, 192), fov_deg=45.0)

img = hk.framebuffer(hk.render(hk.VolPath(samples_per_pixel=16, max_depth=4), scene, cam))
hk.write_png("quickstart_volpath.png", np.asarray(hk.postprocess(img, tonemap="aces")))

img = hk.framebuffer(hk.render_preview(hk.Whitted(max_depth=3, samples_per_pixel=4), scene, cam))
hk.write_png("quickstart_whitted.png", np.asarray(hk.postprocess(img, tonemap="aces")))

img = hk.framebuffer(hk.render_preview(hk.FastWavefront(samples_per_pixel=1), scene, cam))
hk.write_png("quickstart_preview.png", np.asarray(hk.postprocess(img, tonemap="aces")))
print("wrote quickstart_{volpath,whitted,preview}.png")
