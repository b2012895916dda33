"""Film crop_bounds render window (film.jl:61-183).

The cropped film renders ONLY the window's pixels (proportionally fewer
lanes) and must reproduce the full render's window exactly: lane sampling
is keyed by absolute (px, py), so the crop changes which lanes exist, not
what any pixel computes.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.film.film import film_load, film_save, framebuffer, make_film
from hikari_tpu.film.filters import make_filter
from hikari_tpu.integrators.volpath import VolPath, render
from hikari_tpu.lights.types import PointLight
from hikari_tpu.materials.types import Matte
from hikari_tpu.scene.mesh import make_quad, make_sphere
from hikari_tpu.scene.scene import Scene

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def scene():
    s = Scene()
    s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
          Matte(kd=(0.7, 0.7, 0.7)))
    s.add(make_sphere((0, 0.5, 0), 0.5, 8, 16), Matte(kd=(0.6, 0.2, 0.2)))
    s.add_light(PointLight(position=(0.0, 2.0, -1.0), intensity=(6.0,) * 3))
    return s.build()


def test_crop_matches_full_window(scene):
    from hikari_tpu.camera.camera import make_perspective_camera

    res = (24, 24)
    camera = make_perspective_camera((0.0, 1.0, -2.5), (0.0, 0.4, 0.0), res,
                                     fov_deg=45.0)
    vp = VolPath(max_depth=2, samples_per_pixel=2)
    filt = make_filter()

    full = render(vp, scene, camera, make_film(*res), filt)
    crop = make_film(*res, crop_bounds=((0.25, 0.25), (0.75, 0.75)))
    assert (crop.width, crop.height) == (12, 12)
    assert (crop.crop_x0, crop.crop_y0) == (6, 6)
    cropped = render(vp, scene, camera, crop, filt)

    fb_full = np.asarray(framebuffer(full))
    fb_crop = np.asarray(framebuffer(cropped))
    window = fb_full[6:18, 6:18]
    np.testing.assert_allclose(fb_crop, window, rtol=1e-5, atol=1e-6)


def test_crop_bounds_tile_exactly():
    f_left = make_film(100, 40, crop_bounds=((0.0, 0.0), (0.5, 1.0)))
    f_right = make_film(100, 40, crop_bounds=((0.5, 0.0), (1.0, 1.0)))
    assert f_left.width + f_right.width == 100
    assert f_left.crop_x0 == 0 and f_right.crop_x0 == f_left.width


def test_crop_checkpoint_roundtrip(tmp_path):
    f = make_film(32, 32, crop_bounds=((0.5, 0.0), (1.0, 0.5)))
    f = f.replace(rgb_sum=f.rgb_sum + 1.0, iteration=jnp.int32(3))
    p = str(tmp_path / "crop.npz")
    film_save(p, f)
    g = film_load(p)
    assert (g.width, g.height) == (f.width, f.height)
    assert (g.crop_x0, g.crop_y0) == (f.crop_x0, f.crop_y0)
    assert (g.full_width, g.full_height) == (32, 32)
    np.testing.assert_array_equal(np.asarray(g.rgb_sum),
                                  np.asarray(f.rgb_sum))
    assert int(g.iteration) == 3
