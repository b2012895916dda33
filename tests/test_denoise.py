"""Denoiser + aux-buffer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.film.denoise import DenoiseConfig, denoise, estimate_variance

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def test_denoise_reduces_noise_preserves_edges():
    rng = np.random.RandomState(0)
    h = w = 64
    # ground truth: two flat regions split vertically with distinct normals
    clean = np.zeros((h, w, 3), np.float32)
    clean[:, : w // 2] = (0.2, 0.4, 0.8)
    clean[:, w // 2:] = (0.9, 0.3, 0.1)
    noisy = clean + rng.randn(h, w, 3).astype(np.float32) * 0.15
    noisy = np.clip(noisy, 0, 2)

    albedo = clean.copy()
    normal = np.zeros((h, w, 3), np.float32)
    normal[:, : w // 2] = (0, 0, 1)
    normal[:, w // 2:] = (1, 0, 0)
    depth = np.ones((h, w), np.float32)
    depth[:, w // 2:] = 3.0

    out = np.asarray(
        denoise(
            jnp.asarray(noisy), jnp.asarray(albedo), jnp.asarray(normal),
            jnp.asarray(depth), DenoiseConfig(iterations=3),
        )
    )
    err_in = np.abs(noisy - clean).mean()
    err_out = np.abs(out - clean).mean()
    assert err_out < 0.5 * err_in, (err_in, err_out)
    # the edge must survive: means of the two halves stay distinct
    left = out[:, : w // 2 - 2].mean(axis=(0, 1))
    right = out[:, w // 2 + 2:].mean(axis=(0, 1))
    assert abs(left[2] - right[2]) > 0.4


def test_variance_estimate():
    rng = np.random.RandomState(1)
    flat = np.full((32, 32, 3), 0.5, np.float32)
    noisy = flat + rng.randn(32, 32, 3).astype(np.float32) * 0.2
    v_flat = float(np.asarray(estimate_variance(jnp.asarray(flat))).mean())
    v_noisy = float(np.asarray(estimate_variance(jnp.asarray(noisy))).mean())
    assert v_flat < 1e-8
    assert v_noisy > 1e-3


def test_render_aux_buffers():
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.integrators.volpath import render_aux
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.materials.types import Gold, Matte
    from hikari_tpu.scene.mesh import make_quad, make_sphere
    from hikari_tpu.scene.scene import Scene

    s = Scene()
    s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
          Matte(kd=(0.2, 0.5, 0.9)))
    s.add(make_sphere((0, 0.5, 0), 0.5, 8, 16), Gold(roughness=0.2))
    s.add_light(PointLight(position=(0, 2, 0), intensity=(5, 5, 5)))
    scene = s.build()
    cam = make_perspective_camera((0, 1.0, -3.0), (0, 0.4, 0), (32, 32), fov_deg=45.0)
    albedo, normal, depth = render_aux(scene, cam)
    albedo, normal, depth = map(np.asarray, (albedo, normal, depth))
    assert albedo.shape == (32, 32, 3) and np.isfinite(albedo).all()
    hit = depth > 0
    assert hit.mean() > 0.3
    # floor albedo should be the matte kd; gold should be red>blue
    floor = albedo[28:, :]
    assert floor[..., 2].mean() > floor[..., 0].mean()
    center = albedo[12:20, 12:20]
    assert center[..., 0].mean() > center[..., 2].mean(), "gold not red-dominant"
    # normals are unit-ish where hit
    ln = np.linalg.norm(normal[hit], axis=-1)
    assert np.all(ln > 0.9)


def test_denoise_preserves_background():
    """Miss pixels (zero normal/albedo/depth) must keep their radiance —
    the sky is not geometry but it is signal (regression: background used
    to collapse to zero weight and go black)."""
    rng = np.random.RandomState(2)
    h = w = 32
    color = np.full((h, w, 3), 0.08, np.float32)  # sky-ish everywhere
    color[16:] = 0.6                               # ground in lower half
    noisy = color + rng.randn(h, w, 3).astype(np.float32) * 0.02
    albedo = np.zeros((h, w, 3), np.float32)
    albedo[16:] = 0.5
    normal = np.zeros((h, w, 3), np.float32)
    normal[16:] = (0, 1, 0)
    depth = np.zeros((h, w), np.float32)
    depth[16:] = 2.0
    out = np.asarray(denoise(jnp.asarray(noisy), jnp.asarray(albedo),
                             jnp.asarray(normal), jnp.asarray(depth)))
    assert out[:12].mean() > 0.5 * 0.08, out[:12].mean()
    assert abs(out[20:].mean() - 0.6) < 0.05
