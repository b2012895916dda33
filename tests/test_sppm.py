"""SPPM integrator tests."""

import numpy as np

import pytest

# compile-heavy integration renders: full tier only
pytestmark = pytest.mark.slow

from hikari_tpu.camera.camera import make_perspective_camera
from hikari_tpu.integrators.sppm import SPPM, render_sppm
from hikari_tpu.lights.types import PointLight
from hikari_tpu.materials.types import Matte
from hikari_tpu.scene.mesh import make_quad
from hikari_tpu.scene.scene import Scene


def _box_scene():
    s = Scene()
    white = Matte(kd=(0.73, 0.73, 0.73))
    s.add(make_quad((-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1)), white)
    s.add(make_quad((-1, 2, -1), (-1, 2, 1), (1, 2, 1), (1, 2, -1)), white)
    s.add(make_quad((-1, 0, 1), (1, 0, 1), (1, 2, 1), (-1, 2, 1)), white)
    s.add(make_quad((-1, 0, -1), (-1, 0, 1), (-1, 2, 1), (-1, 2, -1)),
          Matte(kd=(0.65, 0.05, 0.05)))
    s.add(make_quad((1, 0, -1), (1, 2, -1), (1, 2, 1), (1, 0, 1)),
          Matte(kd=(0.12, 0.45, 0.15)))
    s.add_light(PointLight(position=(0, 1.7, 0), intensity=(6, 6, 6)))
    return s.build()


def test_sppm_renders_direct_and_indirect():
    scene = _box_scene()
    cam = make_perspective_camera((0, 1.0, -2.6), (0, 1.0, 1.0), (24, 24), fov_deg=50.0)
    integ = SPPM(iterations=3, photons_per_iteration=8192,
                 initial_radius=0.25, max_depth=3)
    img = np.asarray(render_sppm(integ, scene, cam))
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.05
    # most of the closed box should be lit
    assert (img.sum(-1) > 1e-3).mean() > 0.5
    # color bleeding/indirect: nontrivial energy everywhere on walls
    assert img.mean() > 0.01


def test_sppm_radius_shrinks():
    import jax.numpy as jnp

    from hikari_tpu.integrators.sppm import _sppm_iteration

    scene = _box_scene()
    cam = make_perspective_camera((0, 1.0, -2.6), (0, 1.0, 1.0), (16, 16), fov_deg=50.0)
    integ = SPPM(iterations=4, photons_per_iteration=8192,
                 initial_radius=0.3, max_depth=3)
    n = 16 * 16
    state = dict(
        r2=jnp.full((n,), integ.initial_radius ** 2),
        n=jnp.zeros((n,)),
        tau=jnp.zeros((n, 3)),
        direct=jnp.zeros((n, 3)),
        iters=jnp.zeros((), jnp.int32),
    )
    r2_0 = np.asarray(state["r2"]).copy()
    for it in range(3):
        state = _sppm_iteration(integ, scene, cam, state, jnp.int32(it))
    r2_3 = np.asarray(state["r2"])
    assert (r2_3 <= r2_0 + 1e-9).all()
    assert (r2_3 < r2_0).mean() > 0.3, "radii should shrink where photons land"


def test_sppm_refractive_caustic():
    """Glass-sphere caustic: photons refracting through the sphere must
    focus light under it (brighter than the open floor next to it at equal
    light distance). Mirror-only photon transport (the round-1 behavior)
    produces no such hot spot."""
    import numpy as np
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.integrators.sppm import SPPM, render_sppm
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.materials.types import Glass, Matte
    from hikari_tpu.scene.mesh import make_quad, make_sphere
    from hikari_tpu.scene.scene import Scene

    s = Scene()
    s.add(make_quad((-3, 0, -3), (3, 0, -3), (3, 0, 3), (-3, 0, 3)),
          Matte(kd=(0.7, 0.7, 0.7)))
    s.add(make_sphere((0.0, 0.7, 0.0), 0.45, 14, 28), Glass(eta=1.5))
    s.add_light(PointLight(position=(0.0, 2.6, 0.0), intensity=(30, 30, 30)))
    scene = s.build()
    cam = make_perspective_camera((0, 2.0, -2.6), (0, 0.2, 0), (48, 48),
                                  fov_deg=40.0)
    integ = SPPM(iterations=4, photons_per_iteration=32768,
                 initial_radius=0.12, max_depth=5)
    img = np.asarray(render_sppm(integ, scene, cam))
    assert np.isfinite(img).all()
    # caustic spot: floor directly under the sphere (image center-bottom
    # area) vs an off-axis floor strip at similar light distance
    h, w, _ = img.shape
    lum = img.mean(-1)
    spot = lum[int(0.62 * h):int(0.80 * h), int(0.40 * w):int(0.60 * w)].max()
    side = lum[int(0.62 * h):int(0.80 * h), int(0.05 * w):int(0.25 * w)].mean()
    assert spot > 1.5 * side, (spot, side)


def test_sppm_glossy_caustic_matches_volpath():
    """Glossy-conductor caustic: SPPM photons now bounce through the real
    microfacet sampler (sppm.jl:217,447), so the caustic a rough gold
    reflector throws on the floor must agree with VolPath's estimate of
    the same scene within noise tolerance."""
    import pytest

    pytest.importorskip("jax")
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.materials.types import Gold
    from hikari_tpu.scene.mesh import make_sphere

    s = Scene()
    s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
          Matte(kd=(0.7, 0.7, 0.7)))
    # glossy gold sphere reflecting a point light down to the floor
    s.add(make_sphere((0.0, 0.8, 0.0), 0.45, 16, 32), Gold(roughness=0.1))
    s.add_light(PointLight(position=(0.0, 2.5, -1.2), intensity=(25.0,) * 3))
    scene = s.build()
    cam = make_perspective_camera((0, 1.8, -2.8), (0, 0.3, 0), (32, 32),
                                  fov_deg=48.0)

    img_s = np.asarray(render_sppm(
        SPPM(iterations=6, photons_per_iteration=32768, initial_radius=0.18,
             max_depth=4), scene, cam))
    img_v = np.asarray(framebuffer(render(
        VolPath(max_depth=4, samples_per_pixel=96), scene, cam)))
    assert np.isfinite(img_s).all() and np.isfinite(img_v).all()
    m_s, m_v = img_s.mean(), img_v.mean()
    assert m_v > 0.01, m_v
    # two different estimators of the same transport; agree within the
    # budgets' combined noise
    assert 0.6 < m_s / m_v < 1.6, (m_s, m_v)
