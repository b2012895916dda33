"""Light sampler tests: alias table, power weighting, unbiasedness."""

import jax
import jax.numpy as jnp
import numpy as np

from hikari_tpu.lights.sampler import build_alias_table
from hikari_tpu.lights.types import (
    DistantLight, PointLight, pack_lights, sample_light_index,
)


def test_alias_table_distribution():
    rng = np.random.RandomState(1)
    w = rng.rand(7).astype(np.float64) + 0.01
    pmf, q, j = build_alias_table(w)
    np.testing.assert_allclose(pmf.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(pmf, w / w.sum(), rtol=1e-6)

    # empirical sampling frequency matches pmf
    import hikari_tpu.lights.types as lt

    banks = lt.LightBanks(
        point_pos=jnp.zeros((1, 3)), point_i=jnp.zeros((1, 3)),
        spot_pos=jnp.zeros((1, 3)), spot_dir=jnp.zeros((1, 3)),
        spot_i=jnp.zeros((1, 3)), spot_cos_total=jnp.zeros((1,)),
        spot_cos_falloff=jnp.zeros((1,)),
        dist_dir=jnp.zeros((1, 3)), dist_l=jnp.zeros((1, 3)),
        ambient_l=jnp.zeros((1, 3)),
        area_p0=jnp.zeros((1, 3)), area_p1=jnp.zeros((1, 3)),
        area_p2=jnp.zeros((1, 3)), area_le=jnp.zeros((1, 3)),
        area_two_sided=jnp.zeros((1,), bool), area_n=jnp.zeros((1, 3)),
        area_area=jnp.zeros((1,)),
        env_image=jnp.zeros((1, 1, 3)),
        env_dist=None, env_scale=jnp.float32(0.0), has_env=False,
        light_type=jnp.zeros((7,), jnp.int32),
        light_idx=jnp.zeros((7,), jnp.int32),
        point_i_c4=jnp.zeros((1, 4)), spot_i_c4=jnp.zeros((1, 4)),
        dist_l_c4=jnp.zeros((1, 4)), area_le_c4=jnp.zeros((1, 4)),
        pmf=jnp.asarray(pmf), alias_q=jnp.asarray(q), alias_j=jnp.asarray(j),
        area_flat_base=0, n_flat=7,
    )
    n = 200_000
    u = jax.random.uniform(jax.random.PRNGKey(0), (n,))
    idx, p = sample_light_index(banks, u)
    counts = np.bincount(np.asarray(idx), minlength=7) / n
    np.testing.assert_allclose(counts, pmf, atol=5e-3)
    # returned pmf is the pmf of the *chosen* light
    np.testing.assert_allclose(np.asarray(p), pmf[np.asarray(idx)], rtol=1e-6)


def test_power_weighting_prefers_bright_light():
    lights = [
        PointLight(position=(0, 1, 0), intensity=(100.0, 100.0, 100.0)),
        PointLight(position=(1, 1, 0), intensity=(1.0, 1.0, 1.0)),
    ]
    banks = pack_lights(lights, scene_radius=5.0, sampler="power")
    pmf = np.asarray(banks.pmf)
    assert pmf[0] > 0.9
    np.testing.assert_allclose(pmf.sum(), 1.0, rtol=1e-5)

    uni = pack_lights(lights, scene_radius=5.0, sampler="uniform")
    np.testing.assert_allclose(np.asarray(uni.pmf), [0.5, 0.5], rtol=1e-6)


def test_power_vs_uniform_unbiased():
    """Power-weighted NEE must estimate the same image as uniform NEE."""
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.materials.types import Matte
    from hikari_tpu.scene.mesh import make_quad
    from hikari_tpu.scene.scene import Scene

    def build(mode):
        s = Scene()
        s.set_light_sampler(mode)
        s.add(
            make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
            Matte(kd=(0.7, 0.7, 0.7)),
        )
        s.add_light(PointLight(position=(0.0, 2.0, 0.0), intensity=(30.0, 30.0, 30.0)))
        s.add_light(PointLight(position=(1.5, 1.0, 0.0), intensity=(0.3, 0.3, 0.3)))
        s.add_light(DistantLight(direction=(0.2, -1.0, 0.1), radiance=(0.5, 0.5, 0.5)))
        return s.build()

    cam = make_perspective_camera((0, 1.5, -3.2), (0, 0.0, 0), (24, 24), fov_deg=45.0)
    vp = VolPath(max_depth=2, samples_per_pixel=32)
    img_pow = np.asarray(framebuffer(render(vp, build("power"), cam)))
    img_uni = np.asarray(framebuffer(render(vp, build("uniform"), cam)))
    assert np.all(np.isfinite(img_pow))
    # same estimator target; different variance. Means agree to a few %.
    m_p, m_u = img_pow.mean(), img_uni.mean()
    assert abs(m_p - m_u) / max(m_u, 1e-9) < 0.05, (m_p, m_u)
