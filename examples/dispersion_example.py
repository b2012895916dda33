#!/usr/bin/env python
"""Dispersive glass: a diamond-glass sphere splitting a bright beam into a
spectrum (Cauchy eta(lambda) + hero-wavelength termination; the reference's
spectral-IOR glass, spectral-eval.jl:207-221)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import hikari_tpu as hk
from hikari_tpu.materials.types import Diamond

s = hk.Scene()
s.add(hk.make_quad((-6, 0, -6), (6, 0, -6), (6, 0, 6), (-6, 0, 6)),
      hk.Matte(kd=(0.75, 0.75, 0.75)))
s.add(hk.make_sphere((0.0, 0.8, 0.0), 0.8, 24, 48), Diamond())
# a narrow, bright area light far to one side: strong directional beam so
# refraction angles differ visibly per wavelength
s.add(hk.make_quad((-4.0, 3.0, -0.4), (-3.8, 3.0, -0.4), (-3.8, 3.0, 0.4), (-4.0, 3.0, 0.4)),
      hk.Emissive(le=(1.0, 1.0, 1.0), scale=400.0))
scene = s.build()

cam = hk.make_perspective_camera((0.8, 1.6, -3.6), (0, 0.6, 0), (256, 256), fov_deg=45.0)
film = hk.render(hk.VolPath(samples_per_pixel=64, max_depth=8), scene, cam)
img = np.asarray(hk.framebuffer(film))
hk.write_png("dispersion.png", hk.postprocess(img, tonemap="aces"))
print("wrote dispersion.png  mean:", float(img.mean()))
