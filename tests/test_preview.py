"""FastWavefront / Whitted preview integrator tests."""

import numpy as np
import pytest

from hikari_tpu.camera.camera import make_perspective_camera
from hikari_tpu.film.film import framebuffer
from hikari_tpu.integrators.preview import FastWavefront, Whitted, render_preview
from hikari_tpu.lights.types import PointLight
from hikari_tpu.materials.types import Emissive, Matte, Mirror
from hikari_tpu.scene.mesh import make_quad, make_sphere
from hikari_tpu.scene.scene import Scene

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


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


def test_whitted_glass_refraction():
    """Whitted glass now refracts (reference material.jl:22-180 Fresnel
    lobes): a glass pane in front of an emissive wall transmits the wall's
    image; a mirror pane blocks it."""
    from hikari_tpu.materials.types import Glass, Mirror

    def build(pane_mat):
        s = Scene()
        # emissive wall BEHIND the pane
        s.add(make_quad((-2, -2, 3), (2, -2, 3), (2, 2, 3), (-2, 2, 3)),
              Emissive(le=(1, 1, 1), scale=4.0))
        s.add(make_quad((-1.5, -1.5, 1), (1.5, -1.5, 1), (1.5, 1.5, 1), (-1.5, 1.5, 1)),
              pane_mat)
        s.add_light(PointLight(position=(0, 0, -2), intensity=(1, 1, 1)))
        return s.build()

    cam = make_perspective_camera((0, 0, -2.5), (0, 0, 0), (24, 24), fov_deg=35.0)
    vp = Whitted(max_depth=4, samples_per_pixel=8)
    img_glass = np.asarray(framebuffer(render_preview(vp, build(Glass(eta=1.5)), cam)))
    img_mirror = np.asarray(framebuffer(render_preview(vp, build(Mirror()), cam)))
    assert np.isfinite(img_glass).all()
    center_glass = img_glass[8:16, 8:16].mean()
    center_mirror = img_mirror[8:16, 8:16].mean()
    # glass transmits ~92% of the emissive wall; the mirror shows none of it
    assert center_glass > 0.2, center_glass
    assert center_glass > 3.0 * center_mirror, (center_glass, center_mirror)


def test_whitted_smooth_conductor_fresnel_tint():
    """Smooth gold joins the specular set: its reflection is gold-tinted
    (red >> blue) rather than albedo-gray."""
    from hikari_tpu.materials.types import Gold

    s = Scene()
    # emissive wall BEHIND the camera so the sphere's reflection sees it
    s.add(make_quad((-3, -3, -3), (3, -3, -3), (3, 3, -3), (-3, 3, -3)),
          Emissive(le=(1, 1, 1), scale=4.0))
    s.add(make_sphere((0, 0, 0), 0.6, 16, 32), Gold(roughness=0.0))
    s.add_light(PointLight(position=(0, 2, -2), intensity=(5, 5, 5)))
    scene = s.build()
    cam = make_perspective_camera((0, 0, -2.2), (0, 0, 0), (24, 24), fov_deg=30.0)
    img = np.asarray(framebuffer(render_preview(Whitted(max_depth=3, samples_per_pixel=4), scene, cam)))
    sphere = img[8:16, 8:16]
    assert sphere.sum() > 0.05
    assert sphere[..., 0].sum() > 1.3 * sphere[..., 2].sum(), "not gold-tinted"
