"""Extended material tests: rough glass, thin dielectric, diffuse
transmission, mix resolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.materials import bsdf as mb
from hikari_tpu.materials.types import (
    DiffuseTransmission, Glass, Matte, Mix, ThinDielectric, pack_materials,
)
from hikari_tpu.spectral.rgb2spec import srgb_table

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def _banks(mats):
    banks, tags, idxs, present = pack_materials(mats)
    return banks


def _rand_wo(key, n):
    u = jax.random.uniform(key, (n, 2))
    z = 0.1 + 0.9 * u[:, 0]
    phi = 2 * np.pi * u[:, 1]
    s = jnp.sqrt(1 - z * z)
    return jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], -1)


def test_thin_dielectric_energy_and_direction():
    banks = _banks([ThinDielectric(eta=1.5)])
    table = srgb_table()
    n = 4096
    key = jax.random.PRNGKey(0)
    wo = _rand_wo(key, n)
    lam = jnp.tile(jnp.array([[500.0, 550.0, 600.0, 650.0]]), (n, 1))
    idx = jnp.zeros((n,), jnp.int32)
    u2 = jax.random.uniform(jax.random.PRNGKey(1), (n, 2))
    uc = jax.random.uniform(jax.random.PRNGKey(2), (n,))
    s = mb.sample_thin_dielectric(banks, idx, table, wo, lam, u2, uc)
    assert bool(jnp.all(s.valid))
    # energy: E[f * cos / pdf] = R' + T' = 1 per lane
    thr = s.f * (jnp.abs(s.wi[:, 2]) / s.pdf)[:, None]
    np.testing.assert_allclose(np.asarray(thr), 1.0, atol=1e-3)
    # transmission goes straight through; reflection mirrors z
    trans = np.asarray(s.transmission) | (np.asarray(s.wi[:, 2] * wo[:, 2]) < 0)
    wi = np.asarray(s.wi)
    won = np.asarray(wo)
    straight = np.abs(wi + won).max(-1) < 1e-5
    mirrored = np.abs(wi[:, :2] + won[:, :2]).max(-1) < 1e-5
    assert np.all(np.where(trans, straight, mirrored))
    # thin slab: never a medium transition
    assert not bool(jnp.any(s.transmission))


def test_diffuse_transmission_sampling():
    banks = _banks([DiffuseTransmission(reflectance=(0.6, 0.6, 0.6),
                                        transmittance=(0.2, 0.2, 0.2))])
    table = srgb_table()
    n = 20000
    wo = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    lam = jnp.tile(jnp.array([[500.0, 550.0, 600.0, 650.0]]), (n, 1))
    idx = jnp.zeros((n,), jnp.int32)
    u2 = jax.random.uniform(jax.random.PRNGKey(1), (n, 2))
    uc = jax.random.uniform(jax.random.PRNGKey(2), (n,))
    s = mb.sample_diffuse_transmission(banks, idx, table, wo, lam, u2, uc)
    frac_trans = float(jnp.mean(s.transmission.astype(jnp.float32)))
    # p_trans = max(T)/(max(R)+max(T)) = 0.2/0.8 = 0.25 in rgb terms;
    # uplift changes this slightly - wide tolerance
    assert 0.15 < frac_trans < 0.35, frac_trans
    # transmitted rays are on the other side
    assert bool(jnp.all(jnp.where(s.transmission, s.wi[:, 2] < 0, s.wi[:, 2] > 0)))
    # sample/eval consistency
    f, pdf = mb.eval_diffuse_transmission(banks, idx, table, wo, s.wi, lam)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(s.pdf), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f), np.asarray(s.f), rtol=1e-4)


def test_rough_glass_sample_eval_consistency():
    banks = _banks([Glass(eta=1.5, u_roughness=0.2, v_roughness=0.2)])
    table = srgb_table()
    n = 8192
    key = jax.random.PRNGKey(3)
    wo = _rand_wo(key, n)
    lam = jnp.tile(jnp.array([[500.0, 550.0, 600.0, 650.0]]), (n, 1))
    idx = jnp.zeros((n,), jnp.int32)
    u2 = jax.random.uniform(jax.random.PRNGKey(4), (n, 2))
    uc = jax.random.uniform(jax.random.PRNGKey(5), (n,))
    s = mb.sample_glass(banks, idx, table, wo, lam, u2, uc)
    assert not bool(jnp.any(s.specular)), "rough glass is not a delta lobe"
    ok = np.asarray(s.valid)
    assert ok.mean() > 0.9

    f, pdf = mb.eval_glass(banks, idx, table, wo, s.wi, lam)
    f, pdf, sf, spdf = map(np.asarray, (f, pdf, s.f, s.pdf))
    sel = ok & (pdf > 1e-6)
    np.testing.assert_allclose(pdf[sel], spdf[sel], rtol=2e-3)
    np.testing.assert_allclose(f[sel], sf[sel], rtol=2e-3, atol=1e-5)

    # energy conservation: E[f cos / pdf] <= 1 (+ noise)
    thr = sf * (np.abs(np.asarray(s.wi[:, 2])) / np.maximum(spdf, 1e-9))[:, None]
    assert thr[sel].mean() < 1.05, thr[sel].mean()


def test_rough_glass_refracts_energy():
    """Most energy transmits through eta=1.5 rough glass at normal-ish
    incidence (Fresnel ~4-10%)."""
    banks = _banks([Glass(eta=1.5, u_roughness=0.1, v_roughness=0.1)])
    table = srgb_table()
    n = 8192
    wo = jnp.tile(jnp.array([[0.1, 0.0, 0.99]]), (n, 1))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    lam = jnp.tile(jnp.array([[500.0, 550.0, 600.0, 650.0]]), (n, 1))
    idx = jnp.zeros((n,), jnp.int32)
    u2 = jax.random.uniform(jax.random.PRNGKey(6), (n, 2))
    uc = jax.random.uniform(jax.random.PRNGKey(7), (n,))
    s = mb.sample_glass(banks, idx, table, wo, lam, u2, uc)
    frac_t = float(jnp.mean((s.transmission & s.valid).astype(jnp.float32)))
    assert 0.85 < frac_t < 0.99, frac_t


def test_mix_material_render():
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.scene.mesh import make_quad
    from hikari_tpu.scene.scene import Scene

    red = Matte(kd=(0.9, 0.05, 0.05))
    green = Matte(kd=(0.05, 0.9, 0.05))
    s = Scene()
    s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
          Mix(m1=red, m2=green, amount=0.5))
    s.add_light(PointLight(position=(0, 3, 0), intensity=(20, 20, 20)))
    scene = s.build()
    cam = make_perspective_camera((0, 2.5, -2.5), (0, 0, 0), (32, 32), fov_deg=50.0)
    img = np.asarray(framebuffer(render(VolPath(max_depth=2, samples_per_pixel=4), scene, cam)))
    assert np.all(np.isfinite(img))
    lit = img.sum(-1) > 1e-3
    red_frac = (img[..., 0] > 2 * img[..., 1])[lit].mean()
    green_frac = (img[..., 1] > 2 * img[..., 0])[lit].mean()
    # both children appear over the floor in roughly equal measure
    assert 0.2 < red_frac < 0.8, red_frac
    assert 0.2 < green_frac < 0.8, green_frac


def test_dispersion_rainbow():
    """A dispersive glass wedge must split white light: rendered hue varies
    where a non-dispersive glass stays neutral. Statistical check: the
    per-channel variance of refracted floor light is higher with cauchy_b."""
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.lights.types import DistantLight
    from hikari_tpu.scene.mesh import make_box, make_quad
    from hikari_tpu.scene.scene import Scene

    def build(cauchy):
        s = Scene()
        s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
              Matte(kd=(0.8, 0.8, 0.8)))
        s.add(make_box((-0.6, 0.4, -0.6), (0.6, 1.2, 0.6)),
              Glass(eta=1.7, cauchy_b=cauchy))
        s.add_light(DistantLight(direction=(0.35, -1.0, 0.1), radiance=(8, 8, 8)))
        return s.build()

    cam = make_perspective_camera((0, 2.2, -2.6), (0, 0.2, 0.2), (32, 32), fov_deg=50.0)
    vp = VolPath(max_depth=5, samples_per_pixel=16)
    img_d = np.asarray(framebuffer(render(vp, build(0.03), cam)))
    img_n = np.asarray(framebuffer(render(vp, build(0.0), cam)))
    assert np.isfinite(img_d).all() and np.isfinite(img_n).all()

    def sat(img):
        lum = img.mean(-1)
        m = lum > np.percentile(lum[lum > 0], 60) if (lum > 0).any() else lum > 0
        c = img[m]
        return float(np.abs(c - c.mean(-1, keepdims=True)).mean())

    s_d, s_n = sat(img_d), sat(img_n)
    assert s_d > 1.3 * s_n, (s_d, s_n)


def test_material_coherence_gated_matches_none():
    """VolPath(material_coherence='gated') wraps each material type in a
    runtime lax.cond (the reference :per_type empty-queue semantics,
    multi-material-eval.jl:58-445) and must render identically to the
    dense 'none' mode."""
    import numpy as np
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.materials.types import CoatedDiffuse, Glass, Gold, Matte
    from hikari_tpu.scene.mesh import make_quad, make_sphere
    from hikari_tpu.scene.scene import Scene

    s = Scene()
    s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
          Matte(kd=(0.6,) * 3))
    s.add(make_sphere((-0.6, 0.4, 0), 0.4, 8, 16), Glass(eta=1.5))
    s.add(make_sphere((0.6, 0.4, 0), 0.4, 8, 16), Gold(roughness=0.2))
    s.add(make_sphere((0.0, 0.35, -0.9), 0.35, 8, 16),
          CoatedDiffuse(reflectance=(0.7, 0.2, 0.2), roughness=0.1))
    s.add_light(PointLight(position=(1, 3, -2), intensity=(20,) * 3))
    scene = s.build()
    cam = make_perspective_camera((0, 1.2, -2.6), (0, 0.3, 0), (24, 24),
                                  fov_deg=50.0)
    a = np.asarray(framebuffer(render(
        VolPath(max_depth=3, samples_per_pixel=4,
                material_coherence="none"), scene, cam)))
    b = np.asarray(framebuffer(render(
        VolPath(max_depth=3, samples_per_pixel=4,
                material_coherence="gated"), scene, cam)))
    assert np.allclose(a, b, atol=1e-5), np.abs(a - b).max()


def test_sellmeier_eta_matches_published_lines():
    """Measured Sellmeier dispersion: n at the F/d/C spectral lines must
    match the published values for N-BK7, N-SF11, and fused silica
    (SCHOTT catalog / Malitson), and the Cauchy path must be unchanged
    for plain Glass rows."""
    import jax.numpy as jnp
    import numpy as np

    from hikari_tpu.materials.bsdf import glass_eta_hero
    from hikari_tpu.materials.types import (
        BK7, SF11, FusedSilica, Glass, Matte, pack_materials,
    )

    mats = [BK7(), SF11(), FusedSilica(), Glass(eta=1.5, cauchy_b=0.004),
            Matte()]
    banks, tags, idxs, _present = pack_materials(mats)

    # (glass bank row, wavelength nm, published n)
    cases = [
        (0, 486.13, 1.5224), (0, 587.56, 1.5168), (0, 656.27, 1.5143),
        (1, 486.13, 1.8065), (1, 587.56, 1.7847), (1, 656.27, 1.7760),
        (2, 486.13, 1.4631), (2, 587.56, 1.4585), (2, 656.27, 1.4564),
    ]
    for row, lam_nm, n_pub in cases:
        lam = jnp.full((1, 4), lam_nm, jnp.float32)
        n = float(glass_eta_hero(banks, jnp.array([row]), lam)[0])
        assert abs(n - n_pub) < 2e-3, (row, lam_nm, n, n_pub)

    # Cauchy row unaffected by the Sellmeier branch
    lam = jnp.full((1, 4), 589.0, jnp.float32)
    n = float(glass_eta_hero(banks, jnp.array([3]), lam)[0])
    assert abs(n - (1.5 + 0.004 / 0.589**2)) < 1e-5
