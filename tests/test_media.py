"""Volumetric transport tests: HG phase, delta/ratio tracking, fog render."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.media.sample import (
    delta_track, hg_eval, hg_phase, hg_sample, ratio_track_tr,
    PASSED, SCATTERED, ABSORBED,
)
from hikari_tpu.media.types import HomogeneousMedium, pack_media
from hikari_tpu.spectral.rgb2spec import srgb_table

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def test_hg_normalization():
    # integral of p over the sphere = 1 for several g
    mu = jnp.linspace(-1.0, 1.0, 20001)
    for g in [0.0, 0.3, -0.5, 0.877]:
        p = hg_phase(jnp.float32(g), mu)
        integral = float(jnp.trapezoid(p, mu)) * 2.0 * np.pi
        assert abs(integral - 1.0) < 1e-3, (g, integral)


def test_hg_sample_matches_pdf():
    g = 0.6
    n = 20000
    key = jax.random.PRNGKey(0)
    u2 = jax.random.uniform(key, (n, 2))
    wo = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))  # propagation dir -wo = -z
    wi, pdf = hg_sample(jnp.float32(g), wo, u2)
    # mean scattering cosine should equal g
    cos_s = jnp.sum(-wo * wi, axis=-1)
    assert abs(float(jnp.mean(cos_s)) - g) < 0.01
    # returned pdf equals the analytic phase value
    np.testing.assert_allclose(
        np.asarray(pdf), np.asarray(hg_eval(jnp.float32(g), wo, wi)), rtol=1e-4
    )


def _homog_banks(sigma_a, sigma_s, g=0.0):
    return pack_media([HomogeneousMedium(sigma_a=sigma_a, sigma_s=sigma_s, g=g)])


def test_delta_track_beer_lambert():
    # pure absorption: survival fraction over distance t is exp(-sigma_a t)
    banks = _homog_banks((0.5, 0.5, 0.5), (0.0, 0.0, 0.0))
    table = srgb_table()
    n = 8192
    o = jnp.zeros((n, 3)) + jnp.arange(n)[:, None] * 1e-5  # decorrelate RNG
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    t_max = jnp.full((n,), 2.0)
    lam = jnp.tile(jnp.array([[500.0, 550.0, 600.0, 650.0]]), (n, 1))
    ones = jnp.ones((n, 4))
    active = jnp.ones((n,), bool)
    res = delta_track(
        banks, table, jnp.zeros((n,), jnp.int32), o, d, t_max, lam,
        ones, ones, ones, active, jnp.zeros((n,), bool),
    )
    frac_passed = float(jnp.mean((res.status == PASSED).astype(jnp.float32)))
    expect = np.exp(-0.5 * 2.0)
    assert abs(frac_passed - expect) < 0.03, (frac_passed, expect)
    assert not bool(jnp.any(res.status == SCATTERED))


def test_delta_track_scattering_fraction():
    # pure scattering: P(scatter before t) = 1 - exp(-sigma_s t)
    banks = _homog_banks((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
    table = srgb_table()
    n = 8192
    o = jnp.zeros((n, 3)) + jnp.arange(n)[:, None] * 1e-5
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    t_max = jnp.full((n,), 1.0)
    lam = jnp.tile(jnp.array([[500.0, 550.0, 600.0, 650.0]]), (n, 1))
    ones = jnp.ones((n, 4))
    res = delta_track(
        banks, table, jnp.zeros((n,), jnp.int32), o, d, t_max, lam,
        ones, ones, ones, jnp.ones((n,), bool), jnp.zeros((n,), bool),
    )
    frac_scat = float(jnp.mean((res.status == SCATTERED).astype(jnp.float32)))
    expect = 1.0 - np.exp(-1.0)
    assert abs(frac_scat - expect) < 0.03, (frac_scat, expect)
    # scattered distances ~ exponential: mean of min(t,1) truncated; just
    # check scatter positions lie in (0, 1)
    ts = np.asarray(res.t_scatter)[np.asarray(res.status) == SCATTERED]
    assert ts.min() > 0.0 and ts.max() <= 1.0 + 1e-5


def test_ratio_tracking_transmittance():
    banks = _homog_banks((0.3, 0.3, 0.3), (0.7, 0.7, 0.7))
    table = srgb_table()
    n = 8192
    o = jnp.zeros((n, 3)) + jnp.arange(n)[:, None] * 1e-5
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    t_max = jnp.full((n,), 1.5)
    lam = jnp.tile(jnp.array([[500.0, 550.0, 600.0, 650.0]]), (n, 1))
    T, r_l, r_u = ratio_track_tr(
        banks, table, jnp.zeros((n,), jnp.int32), o, d, t_max, lam,
        jnp.ones((n,), bool),
    )
    # E[T / r_l] estimates transmittance exp(-sigma_t * t)
    est = float(jnp.mean(T[:, 0] / jnp.maximum(r_l[:, 0], 1e-12)))
    expect = np.exp(-1.0 * 1.5)
    assert abs(est - expect) < 0.05 * expect + 0.02, (est, expect)


def test_fog_cornell_render():
    """Homogeneous fog box (the reference's medium_example analog)."""
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.materials.types import Interface, Matte
    from hikari_tpu.scene.mesh import make_box, make_quad
    from hikari_tpu.scene.scene import Scene

    def build(with_fog):
        s = Scene()
        s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)), Matte(kd=(0.7, 0.7, 0.7)))
        if with_fog:
            fog = HomogeneousMedium(sigma_a=(0.4, 0.4, 0.4), sigma_s=(0.4, 0.4, 0.4), g=0.0)
            s.add(make_box((-1.5, 0.01, -1.5), (1.5, 2.0, 1.5)), Interface(), inside_medium=fog)
        s.add_light(PointLight(position=(0.0, 1.5, 0.0), intensity=(8.0, 8.0, 8.0)))
        return s.build()

    cam = make_perspective_camera((0, 1.2, -3.5), (0, 0.6, 0), (32, 32), fov_deg=45.0)
    vp = VolPath(max_depth=4, samples_per_pixel=8)
    img_fog = np.asarray(framebuffer(render(vp, build(True), cam)))
    img_clear = np.asarray(framebuffer(render(vp, build(False), cam)))

    assert np.all(np.isfinite(img_fog))
    assert img_fog.max() > 0.0
    # fog must change the image
    assert abs(img_fog.mean() - img_clear.mean()) > 1e-4
    # attenuation: pixels that are brightly lit in the clear render (the
    # floor under the light) must dim behind absorbing fog. The *view mean*
    # may legitimately rise — the light sits inside the fog and the
    # background is black, so in-scattered glow adds radiance over pixels
    # that carried none (streetlight-in-fog effect); only surface radiance
    # is a valid "loses energy" probe.
    lum_fog = img_fog.mean(axis=-1)
    lum_clear = img_clear.mean(axis=-1)
    bright = lum_clear > np.percentile(lum_clear, 90)
    assert lum_fog[bright].mean() < lum_clear[bright].mean(), "no attenuation"
    # fog glow: pixels that are dark in the clear render gain in-scatter
    dark = lum_clear < 1e-4
    assert lum_fog[dark].max() > 1e-4, "no volumetric in-scattering"


def test_pure_absorption_fog_darkens_everything():
    """With sigma_s = 0 there is no in-scatter glow: every radiance path is
    only attenuated, so the whole image must get dimmer (Beer-Lambert)."""
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.materials.types import Interface, Matte
    from hikari_tpu.scene.mesh import make_box, make_quad
    from hikari_tpu.scene.scene import Scene

    def build(with_fog):
        s = Scene()
        s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)), Matte(kd=(0.7, 0.7, 0.7)))
        if with_fog:
            fog = HomogeneousMedium(sigma_a=(0.6, 0.6, 0.6), sigma_s=(0.0, 0.0, 0.0), g=0.0)
            s.add(make_box((-1.5, 0.01, -1.5), (1.5, 2.0, 1.5)), Interface(), inside_medium=fog)
        s.add_light(PointLight(position=(0.0, 1.5, 0.0), intensity=(8.0, 8.0, 8.0)))
        return s.build()

    cam = make_perspective_camera((0, 1.2, -3.5), (0, 0.6, 0), (32, 32), fov_deg=45.0)
    vp = VolPath(max_depth=4, samples_per_pixel=8)
    img_fog = np.asarray(framebuffer(render(vp, build(True), cam)))
    img_clear = np.asarray(framebuffer(render(vp, build(False), cam)))

    assert np.all(np.isfinite(img_fog))
    assert img_fog.max() > 0.0
    assert img_fog.mean() < img_clear.mean()
    # lit pixels should attenuate noticeably (light->floor->camera crosses
    # the 2-unit-tall box twice at sigma_a=0.6)
    lum_clear = img_clear.mean(axis=-1)
    bright = lum_clear > np.percentile(lum_clear, 90)
    ratio = img_fog.mean(axis=-1)[bright].mean() / lum_clear[bright].mean()
    assert ratio < 0.6, ratio


def test_medium_presets_full_set():
    """All 40 measured presets from the reference table (media.jl:1769-1855)
    are available and build valid homogeneous media."""
    from hikari_tpu.media.types import _MEDIUM_PRESETS, medium_preset

    reference_names = [
        "Wholemilk", "Skimmilk", "LowfatMilk", "ReducedMilk", "RegularMilk",
        "Cream", "LowfatChocolateMilk", "RegularChocolateMilk",
        "LowfatSoyMilk", "RegularSoyMilk", "Espresso", "MintMochaCoffee",
        "Chardonnay", "WhiteZinfandel", "Merlot", "BudweiserBeer",
        "CoorsLightBeer", "AppleJuice", "CranberryJuice", "GrapeJuice",
        "RubyGrapefruitJuice", "Sprite", "Coke", "Pepsi", "Apple", "Potato",
        "Chicken1", "Chicken2", "Ketchup", "Skin1", "Skin2", "Marble",
        "Spectralon", "Shampoo", "HeadShouldersShampoo", "Clorox",
        "CappuccinoPowder", "SaltPowder", "SugarPowder",
        "PacificOceanSurfaceWater",
    ]
    assert len(reference_names) == 40
    for name in reference_names:
        assert name in _MEDIUM_PRESETS, name
        m = medium_preset(name)
        ss, sa = _MEDIUM_PRESETS[name]
        assert all(v >= 0 for v in ss + sa), name
