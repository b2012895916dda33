"""Quick-tier smoke gate: ONE tiny end-to-end VolPath render.

The full render-path matrix lives in the slow tier (test_volpath_integration,
test_wavefront, ...); this keeps the -m 'not slow' tier — which must stay
under 90 s warm on the single-core bench host — honest about the whole
stack still composing: scene build -> packet traversal -> spectral
transport -> film.
"""
import jax.numpy as jnp
import numpy as np

from hikari_tpu.film.film import framebuffer
from hikari_tpu.integrators.volpath import VolPath, render
from hikari_tpu.lights.types import PointLight
from hikari_tpu.materials.types import Emissive, Matte
from hikari_tpu.scene.mesh import make_quad, make_sphere
from hikari_tpu.scene.scene import Scene


def test_smoke_render():
    from hikari_tpu.camera.camera import make_perspective_camera

    s = Scene()
    s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
          Matte(kd=(0.7, 0.7, 0.7)))
    s.add(make_sphere((0, 0.45, 0), 0.45, 6, 12), Matte(kd=(0.6, 0.2, 0.2)))
    s.add(make_quad((-0.4, 1.8, -0.4), (0.4, 1.8, -0.4), (0.4, 1.8, 0.4),
                    (-0.4, 1.8, 0.4)), Emissive(le=(1.0, 0.9, 0.8), scale=10.0))
    s.add_light(PointLight(position=(0.0, 1.2, -1.2), intensity=(3.0,) * 3))
    scene = s.build()
    camera = make_perspective_camera((0.0, 0.8, -2.0), (0.0, 0.4, 0.0),
                                     (16, 16), fov_deg=45.0)
    film = render(VolPath(max_depth=2, samples_per_pixel=2), scene, camera)
    fb = np.asarray(framebuffer(film))
    assert fb.shape == (16, 16, 3)
    assert np.isfinite(fb).all()
    assert (fb > 0).mean() > 0.5        # lit scene: most pixels nonzero
    assert float(fb.mean()) > 0.01
