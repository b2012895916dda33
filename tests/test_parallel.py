"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.camera.camera import make_perspective_camera
from hikari_tpu.film.film import framebuffer, make_film
from hikari_tpu.film.filters import make_filter
from hikari_tpu.integrators.volpath import VolPath, render
from hikari_tpu.lights.types import PointLight
from hikari_tpu.materials.types import Matte
from hikari_tpu.parallel.sharding import make_render_mesh, render_sharded
from hikari_tpu.scene.mesh import make_quad, make_sphere
from hikari_tpu.scene.scene import Scene

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def simple_scene():
    s = Scene()
    s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)), Matte(kd=(0.7, 0.7, 0.7)))
    s.add(make_sphere((0, 0.5, 0), 0.5, 8, 16), Matte(kd=(0.8, 0.2, 0.2)))
    s.add_light(PointLight(position=(1.0, 2.0, -1.0), intensity=(6.0, 6.0, 6.0)))
    return s.build()


def test_mesh_shapes():
    mesh = make_render_mesh()
    assert mesh.shape["dp"] * mesh.shape["sp"] == len(jax.devices())


def test_sharded_matches_single_device(simple_scene):
    assert len(jax.devices()) == 8, "tests expect 8 virtual devices"
    cam = make_perspective_camera((0, 1.0, -3.0), (0, 0.4, 0), (32, 32), fov_deg=45.0)
    vp = VolPath(max_depth=2, samples_per_pixel=4)
    filt = make_filter()

    img_single = np.asarray(framebuffer(render(vp, simple_scene, cam, filt=filt)))

    mesh = make_render_mesh(dp=4)  # 4 sample ranks x 2 row shards
    film = render_sharded(vp, simple_scene, cam, mesh, filt=filt)
    img_sharded = np.asarray(framebuffer(film))

    # identical sampler decisions -> identical pixels (associativity of the
    # accumulation differs in order; tolerate float addition reorder)
    np.testing.assert_allclose(img_sharded, img_single, atol=1e-5)


def test_sharded_pure_spatial(simple_scene):
    cam = make_perspective_camera((0, 1.0, -3.0), (0, 0.4, 0), (16, 16), fov_deg=45.0)
    vp = VolPath(max_depth=2, samples_per_pixel=1)
    mesh = make_render_mesh(dp=1)  # 8 row shards
    film = render_sharded(vp, simple_scene, cam, mesh)
    img = np.asarray(framebuffer(film))
    assert np.all(np.isfinite(img))
    assert img.max() > 0.0
