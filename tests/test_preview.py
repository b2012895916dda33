"""FastWavefront / Whitted preview integrator tests."""

import numpy as np

from hikari_tpu.camera.camera import make_perspective_camera
from hikari_tpu.film.film import framebuffer
from hikari_tpu.integrators.preview import FastWavefront, Whitted, render_preview
from hikari_tpu.lights.types import PointLight
from hikari_tpu.materials.types import Emissive, Matte, Mirror
from hikari_tpu.scene.mesh import make_quad, make_sphere
from hikari_tpu.scene.scene import Scene


def _scene():
    s = Scene()
    s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
          Matte(kd=(0.6, 0.6, 0.6)))
    s.add(make_sphere((-0.5, 0.5, 0), 0.5, 10, 20), Matte(kd=(0.8, 0.2, 0.2)))
    s.add(make_sphere((0.7, 0.4, -0.3), 0.4, 10, 20), Mirror())
    s.add(make_quad((-0.3, 2.0, -0.3), (0.3, 2.0, -0.3), (0.3, 2.0, 0.3), (-0.3, 2.0, 0.3)),
          Emissive(le=(1, 1, 1), scale=5.0))
    s.add_light(PointLight(position=(1.5, 2.5, -1.5), intensity=(10, 10, 10)))
    return s.build()


def test_fast_wavefront_preview():
    scene = _scene()
    # frame mostly floor so direct-lighting coverage is measurable
    cam = make_perspective_camera((0, 2.2, -2.4), (0, 0.0, 0.6), (32, 32), fov_deg=55.0)
    img = np.asarray(framebuffer(render_preview(FastWavefront(samples_per_pixel=2), scene, cam)))
    assert np.isfinite(img).all()
    assert img.max() > 0.05
    lit = img.sum(-1) > 1e-3
    assert lit.mean() > 0.3, lit.mean()
    # hard shadows: big dynamic range across the floor band
    floor = img[20:, :, :].sum(-1)
    assert floor.max() > 5 * max(floor.min(), 1e-4)


def test_whitted_mirror_reflection():
    scene = _scene()
    cam = make_perspective_camera((0.7, 0.6, -2.2), (0.7, 0.35, 0), (32, 32), fov_deg=30.0)
    img_d1 = np.asarray(framebuffer(render_preview(Whitted(max_depth=1, samples_per_pixel=2), scene, cam)))
    img_d3 = np.asarray(framebuffer(render_preview(Whitted(max_depth=3, samples_per_pixel=2), scene, cam)))
    assert np.isfinite(img_d3).all()
    # depth 1 cannot see anything through the mirror; depth 3 reflects the
    # scene -> the mirror region gains energy
    gain = img_d3.sum() - img_d1.sum()
    assert gain > 0.1, gain
