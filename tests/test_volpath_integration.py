"""End-to-end integration tests.

Mirrors the reference's golden-behavior test
(/root/reference/test/volpath_integration.jl): render a small Cornell box
with VolPath and assert statistical sanity (non-black, finite, sane mean).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.camera.camera import make_perspective_camera
from hikari_tpu.film.film import framebuffer, make_film
from hikari_tpu.film.filters import GAUSSIAN, make_filter
from hikari_tpu.integrators.volpath import VolPath, render
from hikari_tpu.lights.types import PointLight
from hikari_tpu.materials.types import Emissive, Glass, Gold, Matte, Mirror
from hikari_tpu.scene.mesh import make_quad, make_sphere
from hikari_tpu.scene.scene import Scene

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def cornell_box(emissive_light=True):
    s = Scene()
    white = Matte(kd=(0.73, 0.73, 0.73))
    red = Matte(kd=(0.65, 0.05, 0.05))
    green = Matte(kd=(0.12, 0.45, 0.15))

    # box: y in [0,2], x in [-1,1], z in [0,2]; camera looks +z
    s.add(make_quad((-1, 0, 0), (1, 0, 0), (1, 0, 2), (-1, 0, 2)), white)   # floor
    s.add(make_quad((-1, 2, 0), (-1, 2, 2), (1, 2, 2), (1, 2, 0)), white)   # ceiling
    s.add(make_quad((-1, 0, 2), (1, 0, 2), (1, 2, 2), (-1, 2, 2)), white)   # back
    s.add(make_quad((-1, 0, 0), (-1, 0, 2), (-1, 2, 2), (-1, 2, 0)), red)   # left
    s.add(make_quad((1, 0, 0), (1, 2, 0), (1, 2, 2), (1, 0, 2)), green)     # right

    s.add(make_sphere((-0.45, 0.4, 1.3), 0.4, 12, 24), Gold(roughness=0.1))
    s.add(make_sphere((0.45, 0.35, 0.9), 0.35, 12, 24), Glass(eta=1.5))

    if emissive_light:
        # winding chosen so the normal points down (-y) into the box
        s.add(
            make_quad((-0.3, 1.99, 0.7), (0.3, 1.99, 0.7), (0.3, 1.99, 1.3), (-0.3, 1.99, 1.3)),
            Emissive(le=(1.0, 0.9, 0.7), scale=15.0),
        )
    else:
        s.add_light(PointLight(position=(0.0, 1.8, 1.0), intensity=(4.0, 4.0, 4.0)))
    return s.build()


@pytest.fixture(scope="module")
def cornell():
    return cornell_box()


def test_cornell_render_statistics(cornell):
    res = (64, 64)
    cam = make_perspective_camera(
        (0.0, 1.0, -2.6), (0.0, 1.0, 1.0), res, fov_deg=50.0
    )
    vp = VolPath(max_depth=4, samples_per_pixel=4)
    film = render(vp, cornell, cam, filt=make_filter(GAUSSIAN))
    img = np.asarray(framebuffer(film))

    assert img.shape == (64, 64, 3)
    assert np.all(np.isfinite(img)), "NaN/Inf in render"
    assert img.max() > 0.0, "black image"
    mean = img.mean()
    assert 0.001 < mean < 10.0, f"mean {mean} out of range"
    # left wall reddish, right wall greenish
    left = img[28:36, 2:8].mean(axis=(0, 1))
    right = img[28:36, -8:-2].mean(axis=(0, 1))
    assert left[0] > left[1], f"left wall not red: {left}"
    assert right[1] > right[0], f"right wall not green: {right}"


def test_point_light_scene():
    scene = cornell_box(emissive_light=False)
    res = (32, 32)
    cam = make_perspective_camera((0.0, 1.0, -2.6), (0.0, 1.0, 1.0), res, fov_deg=50.0)
    vp = VolPath(max_depth=3, samples_per_pixel=2)
    film = render(vp, scene, cam)
    img = np.asarray(framebuffer(film))
    assert np.all(np.isfinite(img))
    assert img.max() > 0.0
    assert 0.0005 < img.mean() < 10.0


def test_single_triangle():
    """The reference's PR1 config (examples/single_triangle_test.jl)."""
    from hikari_tpu.scene.mesh import TriangleMesh

    s = Scene()
    tri = TriangleMesh(
        vertices=np.array([[-1, -0.5, 0], [1, -0.5, 0], [0, 1, 0]], np.float32),
        faces=np.array([[0, 1, 2]], np.int32),
        normals=np.array([[0, 0, 1], [0.7, 0, 0.714], [0, 0.7, 0.714]], np.float32),
        uvs=np.array([[0, 0], [1, 0], [0.5, 1]], np.float32),
    )
    s.add(tri, Matte(kd=(0.8, 0.8, 0.8)))
    s.add_light(PointLight(position=(0.0, 0.0, -3.0), intensity=(10.0, 10.0, 10.0)))
    scene = s.build()
    cam = make_perspective_camera((0, 0, -3.0), (0, 0, 0), (32, 32), fov_deg=60.0)
    film = render(VolPath(max_depth=2, samples_per_pixel=4), scene, cam)
    img = np.asarray(framebuffer(film))
    assert np.all(np.isfinite(img))
    # triangle lit in the center, background black
    assert img[16, 16].mean() > 0.01
    assert img[1, 1].mean() == 0.0


def test_deterministic():
    scene = cornell_box(emissive_light=False)
    cam = make_perspective_camera((0, 1, -2.6), (0, 1, 1), (16, 16), fov_deg=50.0)
    vp = VolPath(max_depth=2, samples_per_pixel=1)
    i1 = np.asarray(framebuffer(render(vp, scene, cam)))
    i2 = np.asarray(framebuffer(render(vp, scene, cam)))
    np.testing.assert_array_equal(i1, i2)
