"""apply_deflection hook: rays bending inside a medium
(media.jl:2039; gravitational-lensing demo)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.camera.camera import make_perspective_camera
from hikari_tpu.film.film import framebuffer
from hikari_tpu.integrators.volpath import VolPath, render
from hikari_tpu.lights.types import EnvironmentLight
from hikari_tpu.materials.types import Matte
from hikari_tpu.media.types import HomogeneousMedium
from hikari_tpu.scene.mesh import make_quad
from hikari_tpu.scene.scene import Scene

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def _render(deflection):
    s = Scene()
    # tiny distant floor so the scene has geometry; camera looks at the sky
    s.add(make_quad((-50, -20, -50), (50, -20, -50), (50, -20, 50), (-50, -20, 50)),
          Matte(kd=(0.1, 0.1, 0.1)))
    # env: bright band on one side only (theta-dependent)
    env = np.zeros((16, 32, 3), np.float32)
    env[:, :16] = 8.0
    s.add_light(EnvironmentLight(image=env))
    med = HomogeneousMedium(sigma_a=(1e-4,) * 3, sigma_s=(1e-4,) * 3,
                            deflection=deflection, majorant_scale=2000.0)
    s.set_camera_medium(med)
    cam = make_perspective_camera((0, 0, -5), (0, 0, 0), (16, 16), fov_deg=40.0)
    film = render(VolPath(max_depth=2, samples_per_pixel=4), s.build(), cam)
    return np.asarray(framebuffer(film))


def test_deflection_changes_environment_lookup():
    straight = _render(None)
    bent = _render(("gravity", (0.0, 0.0, 0.0), 50.0))
    assert np.isfinite(bent).all()
    # strong bending toward the origin must change what the rays see
    assert np.abs(bent - straight).mean() > 0.01, (
        straight.mean(), bent.mean())
