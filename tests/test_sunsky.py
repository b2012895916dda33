"""Hosek-Wilkie sky model tests."""

import numpy as np
import pytest

from hikari_tpu.lights.sunsky import (
    _cook_config, _cook_radiance, _tables, sky_spectral_radiance,
    sunsky_environment,
)

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def test_sky_radiance_positive_and_sun_brightest():
    """Sky radiance is positive above the horizon and peaks toward the sun
    (forward Mie lobe) for a clear sky."""
    elev = np.deg2rad(30.0)
    theta = np.array([np.pi / 2 - elev, np.pi / 3, np.pi / 2.5])
    # gamma: angle to sun; first entry looks at the sun
    gamma = np.array([0.01, 1.0, 2.0])
    v = sky_spectral_radiance(theta, gamma, 560.0, 3.0, 0.3, elev)
    assert np.all(v > 0.0)
    assert v[0] > v[1] > 0 and v[0] > v[2]


def test_sky_zenith_bluer_than_horizon():
    elev = np.deg2rad(40.0)
    # zenith away from sun vs near-horizon away from sun
    v_blue_zen = sky_spectral_radiance(np.array([0.05]), np.array([2.0]), 460.0, 2.5, 0.3, elev)
    v_red_zen = sky_spectral_radiance(np.array([0.05]), np.array([2.0]), 640.0, 2.5, 0.3, elev)
    assert v_blue_zen[0] > v_red_zen[0], "clear-sky zenith should be blue-dominant"


def test_cook_config_continuous_in_turbidity():
    configs, radiances, _, _ = _tables()
    elev = np.deg2rad(25.0)
    c1 = _cook_config(configs[5], 3.0 - 1e-6, 0.4, elev)
    c2 = _cook_config(configs[5], 3.0 + 1e-6, 0.4, elev)
    np.testing.assert_allclose(c1, c2, rtol=1e-3)
    r1 = _cook_radiance(radiances[5], 3.0 - 1e-6, 0.4, elev)
    r2 = _cook_radiance(radiances[5], 3.0 + 1e-6, 0.4, elev)
    np.testing.assert_allclose(r1, r2, rtol=1e-3)


def test_sunsky_environment_bake():
    env, sun = sunsky_environment(
        direction=(0.3, 0.2, 0.8), turbidity=2.5, resolution=32
    )
    img = env.image
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.0
    # sky pixels (z>0 hemisphere): blue-ish average for a clear sky
    # (equal-area: z>0 is where |u-.5|+|v-.5| < .5 — check via total)
    assert img[..., 2].mean() > img[..., 0].mean() * 0.8
    # sun points opposite to the travel direction
    np.testing.assert_allclose(
        -np.asarray(sun.direction),
        np.asarray((0.3, 0.2, 0.8)) / np.linalg.norm((0.3, 0.2, 0.8)),
        atol=1e-6,
    )


def test_sunsky_render():
    """Outdoor scene lit only by the baked sky + sun renders bright and
    finite, with env importance sampling active."""
    import jax
    import jax.numpy as jnp

    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.materials.types import Matte
    from hikari_tpu.scene.mesh import make_quad, make_sphere
    from hikari_tpu.scene.scene import Scene

    env, sun = sunsky_environment(direction=(0.4, 0.3, 1.0), resolution=64)
    s = Scene()
    s.add(make_quad((-5, 0, -5), (5, 0, -5), (5, 0, 5), (-5, 0, 5)),
          Matte(kd=(0.5, 0.5, 0.5)))
    s.add(make_sphere((0, 0.6, 0), 0.6, 8, 16), Matte(kd=(0.8, 0.7, 0.6)))
    s.add_light(env)
    s.add_light(sun)
    scene = s.build()

    cam = make_perspective_camera((0, 1.2, -4), (0, 0.5, 0), (24, 24), fov_deg=45.0)
    img = np.asarray(framebuffer(render(VolPath(max_depth=3, samples_per_pixel=4), scene, cam)))
    assert np.isfinite(img).all()
    assert (img.sum(-1) > 1e-3).mean() > 0.5, "sky should light most pixels"
