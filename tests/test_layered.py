"""LayeredBxDF tests: coated diffuse / coated conductor walks."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from hikari_tpu.materials import layered as ml
from hikari_tpu.materials.types import (
    CoatedConductor, CoatedDiffuse, pack_materials,
)
from hikari_tpu.spectral.rgb2spec import srgb_table

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def _banks(mats):
    banks, _, _, _ = pack_materials(mats)
    return banks


def _sample_batch(sample_fn, banks, n, seed=0, wo_z=0.8):
    table = srgb_table()
    wo = jnp.tile(
        jnp.asarray([[np.sqrt(1 - wo_z**2), 0.0, wo_z]], jnp.float32), (n, 1)
    )
    lam = jnp.tile(jnp.array([[480.0, 530.0, 590.0, 650.0]]), (n, 1))
    idx = jnp.zeros((n,), jnp.int32)
    k = jax.random.PRNGKey(seed)
    u2 = jax.random.uniform(jax.random.fold_in(k, 1), (n, 2))
    uc = jax.random.uniform(jax.random.fold_in(k, 2), (n,))
    return sample_fn(banks, idx, table, wo, lam, u2, uc), wo, lam, idx, table


def test_coated_diffuse_energy_conservation():
    """E[f cos/pdf] (the walk weight) must be <= 1 and > bare Fresnel-dimmed
    diffuse floor for a white base."""
    banks = _banks([CoatedDiffuse(reflectance=(1.0, 1.0, 1.0), roughness=0.0,
                                  thickness=0.0)])
    n = 16384
    s, wo, lam, idx, table = _sample_batch(ml.sample_coated_diffuse, banks, n)
    ok = np.asarray(s.valid)
    # ~7% of walks are truncated at MAX_WALK or killed by failed microfacet
    # events (pbrt's LayeredBxDF loses the same tail)
    assert ok.mean() > 0.9, ok.mean()
    thr = np.asarray(s.f) * (
        np.abs(np.asarray(s.wi[:, 2])) / np.maximum(np.asarray(s.pdf), 1e-9)
    )[:, None]
    mean_e = thr[ok].mean()
    # white base + lossless slab: total albedo should be high but <= 1
    assert 0.75 < mean_e <= 1.02, mean_e


def test_coated_diffuse_darkens_with_absorbing_slab():
    b0 = _banks([CoatedDiffuse(reflectance=(1.0,) * 3, thickness=0.0)])
    b1 = _banks([CoatedDiffuse(reflectance=(1.0,) * 3, thickness=1.0)])
    n = 8192

    def energy(banks, seed):
        s, *_ = _sample_batch(ml.sample_coated_diffuse, banks, n, seed)
        ok = np.asarray(s.valid)
        thr = np.asarray(s.f) * (
            np.abs(np.asarray(s.wi[:, 2])) / np.maximum(np.asarray(s.pdf), 1e-9)
        )[:, None]
        return thr[ok].mean()

    e0 = energy(b0, 0)
    e1 = energy(b1, 0)
    assert e1 < 0.75 * e0, (e0, e1)


def test_coated_diffuse_reflects_up_only():
    banks = _banks([CoatedDiffuse()])
    n = 4096
    s, *_ = _sample_batch(ml.sample_coated_diffuse, banks, n)
    wi_z = np.asarray(s.wi[:, 2])
    assert np.all(wi_z[np.asarray(s.valid)] > 0.0)
    assert not bool(jnp.any(s.transmission))


def test_coated_conductor_tint():
    """Gold under a clear coat keeps a gold-like spectral response: long
    wavelengths reflect more than short."""
    banks = _banks([CoatedConductor(metal="AU", interface_roughness=0.1,
                                    conductor_roughness=0.2, thickness=0.0)])
    n = 16384
    s, wo, lam, idx, table = _sample_batch(ml.sample_coated_conductor, banks, n)
    ok = np.asarray(s.valid)
    # rough coat + rough conductor: many walk lanes die on failed
    # microfacet reflections (below-horizon wi), like pbrt
    assert ok.mean() > 0.5, ok.mean()
    thr = np.asarray(s.f) * (
        np.abs(np.asarray(s.wi[:, 2])) / np.maximum(np.asarray(s.pdf), 1e-9)
    )[:, None]
    m = thr[ok].mean(0)  # per-wavelength mean: [480, 530, 590, 650] nm
    assert m[3] > 1.5 * m[0], m  # red >> blue for gold
    assert m.max() <= 1.05


def test_coated_eval_nonzero_rough_top():
    """Stochastic f() returns energy for a rough-top coated diffuse."""
    banks = _banks([CoatedDiffuse(reflectance=(0.8,) * 3, roughness=0.2)])
    table = srgb_table()
    n = 8192
    wo = jnp.tile(jnp.asarray([[0.3, 0.0, 0.954]]), (n, 1))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    wi = jnp.tile(jnp.asarray([[-0.2, 0.1, 0.975]]), (n, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    lam = jnp.tile(jnp.array([[480.0, 530.0, 590.0, 650.0]]), (n, 1))
    idx = jnp.zeros((n,), jnp.int32)
    k = jax.random.PRNGKey(9)
    u2 = jax.random.uniform(jax.random.fold_in(k, 1), (n, 2))
    uc = jax.random.uniform(jax.random.fold_in(k, 2), (n,))
    f, pdf = ml.eval_coated_diffuse(banks, idx, table, wo, wi, lam, u2, uc)
    f = np.asarray(f)
    assert np.isfinite(f).all()
    assert f.mean() > 1e-3, f.mean()
    assert float(np.asarray(pdf).mean()) > 1e-3
    # reciprocity-ish sanity: mean f roughly bounded by base reflectance / pi
    assert f.mean() < 2.0


@pytest.mark.slow
def test_coated_diffuse_render():
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.scene.mesh import make_quad, make_sphere
    from hikari_tpu.scene.scene import Scene
    from hikari_tpu.materials.types import Matte, Plastic

    s = Scene()
    s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
          Matte(kd=(0.6, 0.6, 0.6)))
    s.add(make_sphere((0, 0.5, 0), 0.5, 12, 24),
          Plastic(kd=(0.7, 0.1, 0.1), roughness=0.2))
    s.add_light(PointLight(position=(1.5, 2.5, -1.0), intensity=(15, 15, 15)))
    scene = s.build()
    cam = make_perspective_camera((0, 1.2, -2.6), (0, 0.4, 0), (32, 32), fov_deg=45.0)
    img = np.asarray(framebuffer(render(VolPath(max_depth=3, samples_per_pixel=8), scene, cam)))
    assert np.all(np.isfinite(img))
    assert img.max() > 0.05
    # sphere region should be red-dominant
    lit = img.sum(-1) > 1e-3
    center = img[10:24, 10:24]
    red_ratio = center[..., 0].sum() / max(center.sum(), 1e-6)
    assert red_ratio > 0.4, red_ratio


# --- CoatedDiffuseTransmission (coated-diffuse-transmission.jl:12) ------------


def test_cdt_zero_transmittance_matches_coated_diffuse():
    """trans=0 reduces CDT to CoatedDiffuse (same walk, opaque bottom)."""
    from hikari_tpu.materials.types import CoatedDiffuseTransmission

    b_cd = _banks([CoatedDiffuse(reflectance=(0.8,) * 3, thickness=0.0)])
    b_ct = _banks([CoatedDiffuseTransmission(
        reflectance=(0.8,) * 3, transmittance=(0.0,) * 3, thickness=0.0)])
    n = 16384

    def energy(fn, banks, seed):
        s, *_ = _sample_batch(fn, banks, n, seed)
        ok = np.asarray(s.valid)
        thr = np.asarray(s.f) * (
            np.abs(np.asarray(s.wi[:, 2])) / np.maximum(np.asarray(s.pdf), 1e-9)
        )[:, None]
        return thr[ok].mean(), np.asarray(s.wi[:, 2])[ok], np.asarray(s.transmission)[ok]

    e_cd, _, _ = energy(ml.sample_coated_diffuse, b_cd, 0)
    e_ct, wi_z, trans = energy(ml.sample_coated_diffuse_transmission, b_ct, 0)
    # same transport: energies agree within MC noise
    assert abs(e_cd - e_ct) < 0.05 * max(e_cd, 1e-6), (e_cd, e_ct)
    assert np.all(wi_z > 0.0)
    assert not trans.any()


def test_cdt_transmits_and_conserves_energy():
    from hikari_tpu.materials.types import CoatedDiffuseTransmission

    banks = _banks([CoatedDiffuseTransmission(
        reflectance=(0.5,) * 3, transmittance=(0.4,) * 3, thickness=0.0)])
    n = 32768
    s, *_ = _sample_batch(ml.sample_coated_diffuse_transmission, banks, n)
    ok = np.asarray(s.valid)
    assert ok.mean() > 0.85, ok.mean()
    wi_z = np.asarray(s.wi[:, 2])[ok]
    trans = np.asarray(s.transmission)[ok]
    # transmitted samples exist, land in the lower hemisphere, and are flagged
    assert trans.mean() > 0.15, trans.mean()
    assert np.all(wi_z[trans] < 0.0)
    assert np.all(wi_z[~trans] > 0.0)
    thr = np.asarray(s.f) * (
        np.abs(np.asarray(s.wi[:, 2])) / np.maximum(np.asarray(s.pdf), 1e-9)
    )[:, None]
    mean_e = thr[ok].mean()
    # total scattering (R+T walk estimate) bounded by refl+trans albedo
    assert mean_e <= 1.0, mean_e
    assert mean_e > 0.5, mean_e


def test_cdt_near_bare_interface_matches_diffuse_transmission_split():
    """thickness=0 + near-unity coating IOR: the lobe split tracks the bare
    DiffuseTransmission reflect/transmit ratio."""
    from hikari_tpu.materials.types import CoatedDiffuseTransmission

    banks = _banks([CoatedDiffuseTransmission(
        reflectance=(0.6,) * 3, transmittance=(0.3,) * 3,
        thickness=0.0, ior=1.01)])
    n = 32768
    s, *_ = _sample_batch(ml.sample_coated_diffuse_transmission, banks, n)
    ok = np.asarray(s.valid)
    trans = np.asarray(s.transmission)[ok]
    # expected transmit fraction ~ pt/(pr+pt) = 0.3/0.9 = 1/3 (single
    # bottom event dominates when the coat is nearly invisible)
    assert 0.25 < trans.mean() < 0.42, trans.mean()


def test_cdt_eval_both_hemispheres():
    from hikari_tpu.materials.types import CoatedDiffuseTransmission

    banks = _banks([CoatedDiffuseTransmission(
        reflectance=(0.6,) * 3, transmittance=(0.5,) * 3,
        roughness=0.2, thickness=0.0)])
    table = srgb_table()
    n = 8192
    wo = jnp.tile(jnp.asarray([[0.3, 0.0, 0.954]]), (n, 1))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    lam = jnp.tile(jnp.array([[480.0, 530.0, 590.0, 650.0]]), (n, 1))
    idx = jnp.zeros((n,), jnp.int32)
    k = jax.random.PRNGKey(5)
    u2 = jax.random.uniform(jax.random.fold_in(k, 1), (n, 2))
    uc = jax.random.uniform(jax.random.fold_in(k, 2), (n,))
    for wi_v, label in [([-0.2, 0.1, 0.975], "refl"), ([-0.2, 0.1, -0.975], "trans")]:
        wi = jnp.tile(jnp.asarray([wi_v], jnp.float32), (n, 1))
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        f, pdf = ml.eval_coated_diffuse_transmission(
            banks, idx, table, wo, wi, lam, u2, uc)
        f = np.asarray(f)
        assert np.isfinite(f).all(), label
        assert f.mean() > 1e-3, (label, f.mean())
        assert float(np.asarray(pdf).mean()) > 1e-3, label


@pytest.mark.slow
def test_cdt_backlit_render():
    """A backlit CDT panel transmits light to a camera on the dark side
    (the leaf/lampshade use case)."""
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.materials.types import CoatedDiffuseTransmission
    from hikari_tpu.scene.mesh import make_quad
    from hikari_tpu.scene.scene import Scene

    s = Scene()
    s.add(make_quad((-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0)),
          CoatedDiffuseTransmission(reflectance=(0.3, 0.5, 0.2),
                                    transmittance=(0.3, 0.6, 0.25)))
    # light BEHIND the panel (camera side is -z)
    s.add_light(PointLight(position=(0.0, 0.0, 1.5), intensity=(30, 30, 30)))
    scene = s.build()
    cam = make_perspective_camera((0, 0, -2.2), (0, 0, 0), (24, 24), fov_deg=40.0)
    img = np.asarray(framebuffer(render(
        VolPath(max_depth=3, samples_per_pixel=16), scene, cam)))
    assert np.all(np.isfinite(img))
    center = img[8:16, 8:16]
    assert center.mean() > 0.01, center.mean()
    # transmitted tint is green-dominant
    assert center[..., 1].sum() > center[..., 0].sum()


def test_layered_pdf_stochastic_normalizes():
    """The stochastic MIS pdf (pbrt LayeredBxDF::PDF) must carry roughly
    order-unit mass over the sphere: E_uniform[pdf] * 4pi in [0.35, 1.9].
    Like pbrt's, the estimate is NOT normalized (the refraction cone
    compresses exit directions, so the TRT term integrates to ~1.5-1.7 for
    eta=1.5); only MIS weights consume it. A broken term (double-counted
    TRT, missing lobe probability, hemisphere sign error) lands far
    outside the bounds."""
    from hikari_tpu.materials.types import CoatedDiffuseTransmission

    table = srgb_table()
    n = 32768
    k = jax.random.PRNGKey(9)
    z = jax.random.uniform(jax.random.fold_in(k, 0), (n,)) * 2.0 - 1.0
    phi = jax.random.uniform(jax.random.fold_in(k, 1), (n,)) * 2 * np.pi
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    wi = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
    wo = jnp.tile(jnp.asarray([[0.4, 0.0, 0.9165]], jnp.float32), (n, 1))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    lam = jnp.tile(jnp.array([[480.0, 530.0, 590.0, 650.0]]), (n, 1))
    idx = jnp.zeros((n,), jnp.int32)
    u2 = jax.random.uniform(jax.random.fold_in(k, 2), (n, 2))
    uc = jax.random.uniform(jax.random.fold_in(k, 3), (n,))

    for mk, ev, lo, hi in [
        (CoatedDiffuse(reflectance=(0.8,) * 3, roughness=0.0, thickness=0.0),
         ml.eval_coated_diffuse, 0.35, 1.9),
        (CoatedDiffuse(reflectance=(0.8,) * 3, roughness=0.25, thickness=0.0),
         ml.eval_coated_diffuse, 0.35, 1.9),
        (CoatedDiffuseTransmission(
            reflectance=(0.5,) * 3, transmittance=(0.4,) * 3,
            roughness=0.0, thickness=0.0),
         ml.eval_coated_diffuse_transmission, 0.35, 1.9),
    ]:
        banks = _banks([mk])
        _, pdf = ev(banks, idx, table, wo, wi, lam, u2, uc)
        mass = float(np.asarray(pdf).mean()) * 4.0 * np.pi
        assert lo < mass < hi, (type(mk).__name__, mass)


def test_layered_pdf_tracks_sample_distribution():
    """MIS-quality check: the stochastic pdf must track where the sampler
    actually puts directions. Bin sampled wi by cos(theta); the observed
    per-bin mass must match mean(pdf)*bin_solid_angle within a loose
    factor (the pdf is approximate by design; a heuristic unrelated to the
    true kernel fails this badly at the refraction-cone edge)."""
    banks = _banks([CoatedDiffuse(reflectance=(0.9,) * 3, roughness=0.3,
                                  thickness=0.0)])
    table = srgb_table()
    n = 65536
    s, wo1, lam1, idx1, _ = _sample_batch(
        ml.sample_coated_diffuse, banks, n, seed=3)
    ok = np.asarray(s.valid) & ~np.asarray(s.specular)
    wi_s = np.asarray(s.wi)[ok]
    cz = wi_s[:, 2]
    nb = 6
    edges = np.linspace(0.0, 1.0, nb + 1)
    obs = np.histogram(cz[cz > 0], bins=edges)[0] / max(ok.sum(), 1)

    # predicted mass per bin: mean stochastic pdf over uniform directions
    # inside the bin x bin solid angle
    k = jax.random.PRNGKey(12)
    m = 16384
    zb = jax.random.uniform(jax.random.fold_in(k, 0), (m,))
    phi = jax.random.uniform(jax.random.fold_in(k, 1), (m,)) * 2 * np.pi
    rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - zb * zb))
    wi_e = jnp.stack([rr * jnp.cos(phi), rr * jnp.sin(phi), zb], -1)
    wo_e = jnp.tile(wo1[:1], (m, 1))
    lam_e = jnp.tile(lam1[:1], (m, 1))
    idx_e = jnp.zeros((m,), jnp.int32)
    u2 = jax.random.uniform(jax.random.fold_in(k, 2), (m, 2))
    uc = jax.random.uniform(jax.random.fold_in(k, 3), (m,))
    _, pdf = ml.eval_coated_diffuse(
        banks, idx_e, table, wo_e, wi_e, lam_e, u2, uc)
    pdf = np.asarray(pdf)
    zbn = np.asarray(zb)
    pred = np.zeros(nb)
    for j in range(nb):
        in_bin = (zbn >= edges[j]) & (zbn < edges[j + 1])
        # uniform-hemisphere bin solid angle = 2pi * dz
        pred[j] = pdf[in_bin].mean() * 2 * np.pi * (edges[j + 1] - edges[j])
    pred /= max(pred.sum(), 1e-9)

    for j in range(nb):
        if obs[j] < 0.05 and pred[j] < 0.05:
            continue
        ratio = obs[j] / max(pred[j], 1e-9)
        assert 0.45 < ratio < 2.2, (j, obs[j], pred[j], list(obs), list(pred))
