#!/usr/bin/env python
"""Gravitational lensing: rays bend around a compact mass inside a thin
medium (the reference's apply_deflection hook / SpacetimeMedium demo,
media.jl:2039)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import hikari_tpu as hk
from hikari_tpu.media.types import HomogeneousMedium

# starfield environment
rng = np.random.RandomState(7)
env = np.zeros((256, 512, 3), np.float32)
stars = rng.rand(1400, 2)
for sy, sx in stars:
    y, x = int(sy * 255), int(sx * 511)
    env[y, x] = rng.rand(3) * 8.0 + 2.0
env[100:140, :] += np.array([0.25, 0.18, 0.35])  # faint nebula band

s = hk.Scene()
s.add(hk.make_sphere((0.0, 0.0, 0.0), 0.5, 24, 48), hk.Matte(kd=(0.0, 0.0, 0.0)))
s.add_light(hk.EnvironmentLight(image=env))
space = HomogeneousMedium(
    sigma_a=(1e-5,) * 3, sigma_s=(0.0,) * 3,
    deflection=("gravity", (0.0, 0.0, 0.0), 60.0),
    majorant_scale=20000.0,  # null-event density = bending sample rate
)
s.set_camera_medium(space)
scene = s.build()

cam = hk.make_perspective_camera((0, 0.8, -7.0), (0, 0, 0), (256, 256), fov_deg=28.0)
film = hk.render(hk.VolPath(samples_per_pixel=16, max_depth=3), scene, cam)
img = np.asarray(hk.framebuffer(film))
hk.write_png("lensing.png", hk.postprocess(img, tonemap="aces", exposure=1.5))
print("wrote lensing.png  mean:", float(img.mean()))
