"""Texture mip/LOD filtering (TextureFilterContext derivatives,
texture-ref.jl:21-33 + surface-eval.jl:32-141 camera-based dp/dxy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.textures.atlas import (
    AtlasBuilder, ImageTexture, TexCtx, atlas_lookup, textured_lookup,
)

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def _atlas_with_checker(n=64):
    b = AtlasBuilder()
    img = ((np.indices((n, n)).sum(0) % 2).astype(np.float32))
    b.add(ImageTexture(image=img))
    return b.build()


def test_mip_pyramid_levels():
    a = _atlas_with_checker(64)
    assert a.offset.shape == (1, 7)  # 64 -> 1 is 7 levels
    # top level is the image mean (0.5 for a checker)
    top = np.asarray(a.data[a.offset[0, 6]])
    np.testing.assert_allclose(top, 0.5, atol=1e-6)


def test_trilinear_lod_blends_to_mean():
    a = _atlas_with_checker(64)
    tex = jnp.zeros((8,), jnp.int32)
    uv = jnp.asarray(np.random.RandomState(0).rand(8, 2).astype(np.float32))
    # tiny footprint: sharp checker values (0 or 1)
    ctx0 = TexCtx(uv=uv, vcolor=jnp.ones((8, 3)),
                  duvdx=jnp.full((8, 2), 1e-6), duvdy=jnp.full((8, 2), 1e-6))
    v0 = np.asarray(textured_lookup(a, tex, ctx0))
    # huge footprint: everything averages to 0.5
    ctx1 = TexCtx(uv=uv, vcolor=jnp.ones((8, 3)),
                  duvdx=jnp.full((8, 2), 1.0), duvdy=jnp.full((8, 2), 1.0))
    v1 = np.asarray(textured_lookup(a, tex, ctx1))
    assert np.allclose(v1, 0.5, atol=0.05), v1[:, 0]
    assert v0.std() > 0.1  # base level keeps contrast


def test_level0_matches_plain_lookup():
    a = _atlas_with_checker(32)
    uv = jnp.asarray(np.random.RandomState(1).rand(16, 2).astype(np.float32))
    tex = jnp.zeros((16,), jnp.int32)
    plain = np.asarray(atlas_lookup(a, tex, uv))
    ctx = TexCtx(uv=uv, vcolor=jnp.ones((16, 3)),
                 duvdx=jnp.zeros((16, 2)), duvdy=jnp.zeros((16, 2)))
    tri = np.asarray(textured_lookup(a, tex, ctx))
    np.testing.assert_allclose(tri, plain, atol=1e-6)


def test_true_ray_differentials_plane_transfer():
    """_uv_diff_derivatives: transferring +x/+y aux rays to a unit-uv quad
    recovers the exact world offsets mapped through dp/duv
    (compute_differentials, surface_interaction.jl:136-174)."""
    from hikari_tpu.core.ray import RayDifferentials
    from hikari_tpu.integrators.volpath import _uv_diff_derivatives

    # quad in z=0: uv (0,0)->(-1,-1), (1,0)->(1,-1), (0,1)->(-1,1)
    p0 = jnp.asarray([[-1.0, -1.0, 0.0]])
    p1 = jnp.asarray([[1.0, -1.0, 0.0]])
    p2 = jnp.asarray([[-1.0, 1.0, 0.0]])
    uv0 = jnp.asarray([[0.0, 0.0]])
    uv1 = jnp.asarray([[1.0, 0.0]])
    uv2 = jnp.asarray([[0.0, 1.0]])

    o = jnp.asarray([[0.0, 0.0, -2.0]])
    p = jnp.asarray([[0.2, -0.3, 0.0]])
    ng = jnp.asarray([[0.0, 0.0, -1.0]])

    def toward(target):
        v = target - o
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    diff = RayDifferentials(
        rx_o=o, rx_d=toward(p + jnp.asarray([[0.1, 0.0, 0.0]])),
        ry_o=o, ry_d=toward(p + jnp.asarray([[0.0, 0.2, 0.0]])),
    )
    duvdx, duvdy = _uv_diff_derivatives(diff, p, ng, p0, p1, p2, uv0, uv1, uv2)
    # dpdu = (2, 0, 0), dpdv = (0, 2, 0): du = dx/2, dv = dy/2
    np.testing.assert_allclose(np.asarray(duvdx), [[0.05, 0.0]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(duvdy), [[0.0, 0.1]], atol=1e-5)


def test_whitted_textured_scene_runs_with_differentials():
    """Whitted on a textured quad exercises the true-differential path
    end-to-end and stays finite."""
    import jax

    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.integrators.preview import Whitted, render_preview
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.materials.types import Matte
    from hikari_tpu.scene.mesh import make_quad
    from hikari_tpu.scene.scene import Scene
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.textures.atlas import ImageTexture

    img = ((np.indices((32, 32)).sum(0) % 2).astype(np.float32))
    s = Scene()
    s.add(make_quad((-2, -2, 0), (2, -2, 0), (2, 2, 0), (-2, 2, 0)),
          Matte(kd=ImageTexture(image=np.stack([img] * 3, -1))))
    s.add_light(PointLight(position=(0.0, 0.0, -3.0), intensity=(6.0,) * 3))
    scene = s.build()
    cam = make_perspective_camera((0, 0, -3.0), (0, 0, 0.0), (32, 32),
                                  fov_deg=60.0)
    film = render_preview(Whitted(max_depth=2, samples_per_pixel=1),
                          scene, cam)
    fb = np.asarray(framebuffer(film))
    assert np.isfinite(fb).all()
    assert (fb > 0).mean() > 0.5
