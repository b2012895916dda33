"""TLAS/instancing tests (reference: Raycore TLAS/Instance re-export,
Hikari.jl:22-37; world-space instanced hits, surface_interaction.jl:313-482)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.camera.camera import make_perspective_camera
from hikari_tpu.film.film import framebuffer
from hikari_tpu.integrators.volpath import VolPath, render
from hikari_tpu.lights.types import PointLight
from hikari_tpu.materials.types import Gold, Matte
from hikari_tpu.scene.mesh import TriangleMesh, make_quad, make_sphere
from hikari_tpu.scene.scene import Scene

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def _transforms_grid(n=3, spacing=1.2, scale=0.4):
    out = []
    for ix in range(n):
        for iz in range(n):
            m = np.eye(4, dtype=np.float32)
            m[0, 0] = m[1, 1] = m[2, 2] = scale
            m[:3, 3] = (-1.2 + spacing * ix, 0.4, -0.6 + spacing * iz)
            out.append(m)
    return np.stack(out)


def _base_scene():
    s = Scene()
    s.add(make_quad((-3, 0, -3), (3, 0, -3), (3, 0, 3), (-3, 0, 3)),
          Matte(kd=(0.7, 0.7, 0.7)))
    s.add_light(PointLight(position=(0.0, 4.0, -2.0), intensity=(40, 40, 40)))
    return s


def _render(scene, res=48, spp=4):
    cam = make_perspective_camera((0, 2.2, -3.4), (0, 0.3, 0), (res, res),
                                  fov_deg=50.0)
    return np.asarray(framebuffer(render(
        VolPath(max_depth=3, samples_per_pixel=spp), scene, cam)))


def test_instanced_matches_flattened():
    """A 3x3 instanced sphere grid renders pixel-equivalent to the same
    scene built flattened (the round-1 bake path)."""
    sphere = make_sphere((0, 0, 0), 1.0, 10, 20)
    tr = _transforms_grid()

    s_flat = _base_scene()
    for m in tr:
        s_flat.add(
            TriangleMesh(vertices=sphere.vertices, faces=sphere.faces,
                         normals=sphere.normals, transform=m),
            Matte(kd=(0.2, 0.4, 0.8)),
        )
    img_flat = _render(s_flat.build(traversal="packets_interp"))

    s_inst = _base_scene()
    s_inst.add_instanced(sphere, tr, Matte(kd=(0.2, 0.4, 0.8)))
    scene_i = s_inst.build()
    assert scene_i.has_instances
    img_inst = _render(scene_i)

    assert np.isfinite(img_inst).all()
    diff = np.abs(img_flat - img_inst)
    rel = diff.mean() / max(img_flat.mean(), 1e-6)
    assert rel < 0.03, rel
    # most pixels identical up to traversal tie-breaks
    frac_off = (diff.max(-1) > 0.05).mean()
    assert frac_off < 0.05, frac_off


def test_instanced_memory_scales_with_blas():
    """100 instances must share ONE BLAS's treelet blocks."""
    from hikari_tpu.geometry.wavefront import TREELET

    sphere = make_sphere((0, 0, 0), 1.0, 12, 24)  # ~528 faces
    n_blocks_one = -(-sphere.n_faces // TREELET)

    tr = []
    rng = np.random.RandomState(3)
    for _ in range(100):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = rng.uniform(-5, 5, 3)
        tr.append(m)
    s = _base_scene()
    s.add_instanced(sphere, np.stack(tr), Matte())
    scene = s.build(traversal="packets_interp")

    floor_blocks = scene.inst.bw.shape[0] - n_blocks_one
    assert 1 <= floor_blocks <= 2, scene.inst.bw.shape
    # world treelet table is per instance, bw blocks are not
    assert scene.inst.ti_obj.shape[0] >= 100 * n_blocks_one
    # per-face attribute arrays also stay BLAS-sized
    assert scene.n_faces < 3 * (sphere.n_faces + TREELET), scene.n_faces


def test_instanced_rotation_and_material_override():
    """Rotated/scaled instances shade with transformed normals, and the
    per-instance material override (Raycore Instance material slot) sticks."""
    sphere = make_sphere((0, 0, 0), 1.0, 10, 20)
    th = 0.7
    rot = np.eye(4, dtype=np.float32)
    rot[:3, :3] = np.array([
        [np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)],
    ]) * 0.5
    rot[:3, 3] = (-0.8, 0.5, 0)
    m2 = np.eye(4, dtype=np.float32)
    m2[0, 0] = m2[1, 1] = m2[2, 2] = 0.5
    m2[:3, 3] = (0.8, 0.5, 0)

    s = _base_scene()
    s.add_instanced(
        sphere, np.stack([rot, m2]), Matte(kd=(0.5, 0.5, 0.5)),
        materials=[Matte(kd=(0.8, 0.1, 0.1)), Matte(kd=(0.1, 0.1, 0.8))],
    )
    img = _render(s.build(), res=64, spp=4)
    assert np.isfinite(img).all()
    left = img[:, :32]
    right = img[:, 32:]
    # left sphere red-dominant, right sphere blue-dominant
    assert left[..., 0].sum() > 1.2 * left[..., 2].sum(), "override m1"
    assert right[..., 2].sum() > 1.2 * right[..., 0].sum(), "override m2"


def test_set_instance_transforms_rebuild():
    sphere = make_sphere((0, 0, 0), 1.0, 8, 16)
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = m[1, 1] = m[2, 2] = 0.5
    m[:3, 3] = (-1.0, 0.5, 0)
    s = _base_scene()
    h = s.add_instanced(sphere, m[None], Matte(kd=(0.2, 0.8, 0.2)))
    img_a = _render(s.build(), res=32, spp=2)
    m[:3, 3] = (1.0, 0.5, 0)
    s.set_instance_transforms(h, m[None])
    img_b = _render(s.build(), res=32, spp=2)
    # the sphere moved from the left half to the right half
    assert img_a[:, :16, 1].sum() > img_b[:, :16, 1].sum()
    assert img_b[:, 16:, 1].sum() > img_a[:, 16:, 1].sum()


def test_instanced_compaction_cascade_matches_full():
    """Instanced two-level traversal: the live-lane prefix cascade must
    match the full-size pipeline with ~15% live lanes."""
    import numpy as np
    import jax.numpy as jnp

    from hikari_tpu.geometry.instanced import (
        any_hit_instanced, closest_hit_instanced,
    )
    from hikari_tpu.geometry.wavefront import RAY_TILE

    s = _base_scene()
    s.add_instanced(make_sphere((0, 0, 0), 1.0, 10, 20), _transforms_grid(),
                    Matte(kd=(0.2, 0.4, 0.8)))
    scene = s.build()
    tl = scene.inst
    rng = np.random.RandomState(3)
    r = 6 * RAY_TILE
    o = rng.rand(r, 3).astype(np.float32) * 8 - 4
    d = rng.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.where(rng.rand(r) < 0.3, rng.rand(r) * 4 + 0.1,
                     np.inf).astype(np.float32)
    act = rng.rand(r) < 0.15

    args = (tl, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max),
            scene.world_lo, scene.world_hi)
    full = closest_hit_instanced(
        *args, interpret=True, active=jnp.asarray(act), compact=False)
    casc = closest_hit_instanced(
        *args, interpret=True, active=jnp.asarray(act), compact=True)
    hf, hc = np.asarray(full.hit), np.asarray(casc.hit)
    assert (hf[act] == hc[act]).all()
    both = hf & hc & act
    assert (np.asarray(full.tri)[both] == np.asarray(casc.tri)[both]).all()
    np.testing.assert_allclose(
        np.asarray(full.t)[both], np.asarray(casc.t)[both], rtol=1e-5)

    of = np.asarray(any_hit_instanced(
        *args, interpret=True, active=jnp.asarray(act), compact=False))
    oc = np.asarray(any_hit_instanced(
        *args, interpret=True, active=jnp.asarray(act), compact=True))
    assert (of[act] == oc[act]).all()
