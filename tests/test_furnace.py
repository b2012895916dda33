"""White-furnace / estimator-agreement tests for layered materials.

Pins the energy accounting the round-2 verdict flagged: a smooth coat
contributes zero f to NEE (pbrt-consistent, PARITY.md), so the BSDF-sampled
estimator must make up exactly the missing light. Reference behavior:
/root/reference/src/materials/spectral-eval.jl:827-1955 (LayeredBxDF walk).
"""

import jax

import pytest

# compile-heavy integration renders: full tier only
pytestmark = pytest.mark.slow
import jax.numpy as jnp
import numpy as np

from hikari_tpu.materials import layered as ml
from hikari_tpu.materials.types import CoatedDiffuse, pack_materials
from hikari_tpu.spectral.rgb2spec import srgb_table


def _banks(mats):
    banks, _, _, _ = pack_materials(mats)
    return banks


def _walk_throughput(mat, n=16384, seed=0, wo_z=0.8):
    banks = _banks([mat])
    table = srgb_table()
    wo = jnp.tile(
        jnp.asarray([[np.sqrt(1 - wo_z**2), 0.0, wo_z]], jnp.float32), (n, 1)
    )
    lam = jnp.tile(jnp.array([[480.0, 530.0, 590.0, 650.0]]), (n, 1))
    idx = jnp.zeros((n,), jnp.int32)
    k = jax.random.PRNGKey(seed)
    u2 = jax.random.uniform(jax.random.fold_in(k, 1), (n, 2))
    uc = jax.random.uniform(jax.random.fold_in(k, 2), (n,))
    s = ml.sample_coated_diffuse(banks, idx, table, wo, lam, u2, uc)
    ok = np.asarray(s.valid)
    thr = np.asarray(s.f) * (
        np.abs(np.asarray(s.wi[:, 2])) / np.maximum(np.asarray(s.pdf), 1e-9)
    )[:, None]
    return thr, ok, np.asarray(s.wi)


def test_coated_diffuse_ior1_thickness0_is_matte():
    """With a transparent coat (ior=1) and no slab, the layered walk must
    reduce exactly to the Lambertian base: throughput == reflectance and a
    cosine-distributed wi."""
    thr, ok, wi = _walk_throughput(
        CoatedDiffuse(reflectance=(1.0, 1.0, 1.0), roughness=0.0, ior=1.0,
                      thickness=0.0)
    )
    assert ok.mean() > 0.99, ok.mean()
    e = thr[ok].mean()
    # Matte(kd=1) gives f*cos/pdf = 1 exactly
    assert abs(e - 1.0) < 0.02, e
    # cosine hemisphere: E[wi_z] = 2/3
    mz = wi[ok, 2].mean()
    assert abs(mz - 2.0 / 3.0) < 0.02, mz


def test_coated_diffuse_white_furnace_bound():
    """Lossless configuration (white base, clear slab): energy must never
    exceed 1 and must stay close to it — the coat only delays light, it
    cannot create or (beyond walk truncation) destroy it."""
    thr, ok, _ = _walk_throughput(
        CoatedDiffuse(reflectance=(1.0, 1.0, 1.0), roughness=0.0, ior=1.5,
                      thickness=0.0, albedo=(1.0, 1.0, 1.0))
    )
    e_valid = thr[ok].mean()
    # truncated walks count as lost energy in the conservative bound
    e_total = (thr * ok[:, None]).mean()
    assert e_valid <= 1.03, e_valid
    assert e_total > 0.85, e_total


def test_coated_diffuse_nee_vs_bsdf_only():
    """NEE-on and BSDF-sampling-only renders of a coated-diffuse floor under
    an area light must converge to the same image (the smooth coat's zero
    NEE f is compensated by the BSDF-sampled estimator)."""
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.materials.types import Emissive
    from hikari_tpu.scene.mesh import make_quad
    from hikari_tpu.scene.scene import Scene

    def build():
        s = Scene()
        s.add(
            make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
            CoatedDiffuse(reflectance=(0.8, 0.8, 0.8), roughness=0.0,
                          thickness=0.0),
        )
        # large ceiling panel so BSDF sampling reaches it efficiently
        s.add(
            make_quad((-1.6, 2.5, -1.6), (1.6, 2.5, -1.6), (1.6, 2.5, 1.6),
                      (-1.6, 2.5, 1.6)),
            Emissive(le=(1.0, 1.0, 1.0), scale=4.0),
        )
        return s.build()

    cam = make_perspective_camera((0, 1.6, -3.4), (0, 0.2, 0), (24, 24),
                                  fov_deg=45.0)
    scene = build()
    img_nee = np.asarray(framebuffer(render(
        VolPath(max_depth=3, samples_per_pixel=48, seed=1), scene, cam)))
    img_bsdf = np.asarray(framebuffer(render(
        VolPath(max_depth=3, samples_per_pixel=48, nee=False, seed=2),
        scene, cam)))
    assert np.all(np.isfinite(img_nee)) and np.all(np.isfinite(img_bsdf))
    m_n, m_b = img_nee.mean(), img_bsdf.mean()
    assert m_n > 0.01 and m_b > 0.01, (m_n, m_b)
    assert abs(m_n - m_b) / max(m_n, 1e-9) < 0.08, (m_n, m_b)
