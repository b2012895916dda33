"""BVH light sampler tests: pmf consistency + render unbiasedness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.lights.bvh_sampler import (
    build_light_bvh, bvh_pmf, bvh_sample_light,
)
from hikari_tpu.lights.types import PointLight, pack_lights

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def _grid_lights(k=4, bright_at=(0, 0)):
    lights = []
    for i in range(k):
        for j in range(k):
            inten = 50.0 if (i, j) == bright_at else 1.0
            lights.append(PointLight(position=(i * 2.0, 2.0, j * 2.0),
                                     intensity=(inten,) * 3))
    return lights


def test_bvh_sampler_pmf_normalizes():
    banks = pack_lights(_grid_lights(), scene_radius=10.0)
    bvh = build_light_bvh(banks)
    n = 4096
    p = jnp.tile(jnp.asarray([[1.0, 0.0, 1.0]]), (n, 1))
    ns = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    # total pmf over all lights == 1 at a fixed point
    total = 0.0
    for li in range(16):
        pmf = float(np.asarray(
            bvh_pmf(bvh, p[:1], ns[:1], jnp.asarray([li], jnp.int32))
        )[0])
        assert pmf >= 0.0
        total += pmf
    assert abs(total - 1.0) < 1e-3, total


def test_bvh_sampler_matches_replayed_pmf():
    banks = pack_lights(_grid_lights(), scene_radius=10.0)
    bvh = build_light_bvh(banks)
    n = 20000
    p = jnp.tile(jnp.asarray([[1.0, 0.0, 1.0]]), (n, 1))
    ns = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    u = jax.random.uniform(jax.random.PRNGKey(0), (n,))
    light, pmf = bvh_sample_light(bvh, p, ns, u)
    light = np.asarray(light)
    pmf = np.asarray(pmf)
    # empirical frequency matches the descent pmf AND the replayed pmf
    for li in np.unique(light):
        freq = (light == li).mean()
        pmf_replay = float(np.asarray(
            bvh_pmf(bvh, p[:1], ns[:1], jnp.asarray([li], jnp.int32))
        )[0])
        assert abs(freq - pmf_replay) < 0.02, (li, freq, pmf_replay)
        np.testing.assert_allclose(pmf[light == li], pmf_replay, rtol=1e-4)
    # the nearby bright light dominates
    bright_freq = (light == 0).mean()
    assert bright_freq > 0.3, bright_freq


def test_bvh_render_matches_power_sampler():
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.materials.types import Matte
    from hikari_tpu.scene.mesh import make_quad
    from hikari_tpu.scene.scene import Scene

    def build(mode):
        s = Scene()
        s.set_light_sampler(mode)
        s.add(make_quad((-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4)),
              Matte(kd=(0.7, 0.7, 0.7)))
        for l in _grid_lights(3):
            s.add_light(l)
        return s.build()

    cam = make_perspective_camera((2, 4.0, -4), (2, 0, 2), (24, 24), fov_deg=50.0)
    vp = VolPath(max_depth=2, samples_per_pixel=24)
    img_bvh = np.asarray(framebuffer(render(vp, build("bvh"), cam)))
    img_pow = np.asarray(framebuffer(render(vp, build("power"), cam)))
    assert np.isfinite(img_bvh).all()
    m_b, m_p = img_bvh.mean(), img_pow.mean()
    assert abs(m_b - m_p) / max(m_p, 1e-9) < 0.06, (m_b, m_p)
