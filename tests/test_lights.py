"""Light sampler tests: alias table, power weighting, unbiasedness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.lights.sampler import build_alias_table
from hikari_tpu.lights.types import (
    DistantLight, PointLight, pack_lights, sample_light_index,
)

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


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


def test_equirect_to_equal_area_roundtrip():
    """Lat-long import: directions fetched from the converted equal-area map
    must return the lat-long image's value at that direction
    (environment_map.jl:230-266,379)."""
    from hikari_tpu.lights.types import (
        equal_area_sphere_to_square, equirect_to_equal_area,
    )

    h, w = 128, 256
    th = (np.arange(h) + 0.5) / h * np.pi
    ph = (np.arange(w) + 0.5) / w * 2.0 * np.pi - np.pi
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    # y-up lat-long direction per texel; encode rgb = (d + 1) / 2
    d = np.stack(
        [np.sin(tt) * np.cos(pp), np.cos(tt), np.sin(tt) * np.sin(pp)], -1
    )
    img = ((d + 1.0) * 0.5).astype(np.float32)

    ea = equirect_to_equal_area(img, resolution=256, up="y")
    assert ea.shape == (256, 256, 3)
    assert np.all(np.isfinite(ea))

    rng = np.random.RandomState(7)
    dirs = rng.randn(500, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    uv = np.asarray(equal_area_sphere_to_square(jnp.asarray(dirs)))
    xi = np.clip((uv[:, 0] * 256).astype(int), 0, 255)
    yi = np.clip((uv[:, 1] * 256).astype(int), 0, 255)
    got = ea[yi, xi]
    want = (dirs + 1.0) * 0.5
    # nearest-texel fetch of a smooth function: tolerance ~ texel size
    err = np.abs(got - want).max()
    assert err < 0.04, err


def test_equirect_mean_energy_preserved():
    """Equal-area texels have uniform solid angle, so the converted map's
    mean must match the lat-long image's sin(theta)-weighted mean."""
    from hikari_tpu.lights.types import equirect_to_equal_area

    rng = np.random.RandomState(3)
    h, w = 64, 128
    img = rng.rand(h, w, 3).astype(np.float32)
    # smooth it so bilinear resampling error stays small
    for _ in range(12):
        img = 0.5 * img + 0.25 * np.roll(img, 1, 1) + 0.25 * np.roll(img, -1, 1)
        img = 0.5 * img + 0.25 * np.concatenate([img[:1], img[:-1]], 0) \
            + 0.25 * np.concatenate([img[1:], img[-1:]], 0)
    ea = equirect_to_equal_area(img, resolution=128)
    sin_w = np.sin((np.arange(h) + 0.5) / h * np.pi)[:, None, None]
    want = (img * sin_w).sum((0, 1)) / (sin_w.sum() * w)
    got = ea.mean((0, 1))
    assert np.abs(got - want).max() < 0.01, (got, want)
