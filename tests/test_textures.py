"""Texture atlas and textured-material rendering tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.textures.atlas import (
    AtlasBuilder, ImageTexture, TexCtx, VertexColorTexture, atlas_lookup,
    eval_rgb,
)

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def test_atlas_lookup_bilinear():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = (1, 0, 0)  # top-left (v=1 edge)
    img[1, 1] = (0, 0, 1)  # bottom-right (v=0 edge)
    b = AtlasBuilder()
    t = b.add(ImageTexture(img))
    atlas = b.build()

    # texel centers: uv=(0.25, 0.25) is the bottom-left texel => img[1,0] = 0
    uv = jnp.asarray([[0.25, 0.75], [0.75, 0.25]], jnp.float32)
    tex = jnp.full((2,), t, jnp.int32)
    out = np.asarray(atlas_lookup(atlas, tex, uv))
    np.testing.assert_allclose(out[0], (1, 0, 0), atol=1e-6)
    np.testing.assert_allclose(out[1], (0, 0, 1), atol=1e-6)

    # midpoint blends all four texels equally
    mid = np.asarray(
        atlas_lookup(atlas, tex[:1], jnp.asarray([[0.5, 0.5]], jnp.float32))
    )[0]
    np.testing.assert_allclose(mid, (0.25, 0, 0.25), atol=1e-6)


def test_eval_rgb_selects_source():
    b = AtlasBuilder()
    t = b.add(ImageTexture(np.full((1, 1, 3), 0.25, np.float32)))
    atlas = b.build()
    ctx = TexCtx(
        uv=jnp.zeros((3, 2)), vcolor=jnp.full((3, 3), 0.5, jnp.float32)
    )
    const = jnp.full((3, 3), 0.9, jnp.float32)
    tex = jnp.asarray([t, -1, -2], jnp.int32)
    out = np.asarray(eval_rgb(atlas, tex, const, ctx))
    np.testing.assert_allclose(out[0], [0.25] * 3, atol=1e-6)
    np.testing.assert_allclose(out[1], [0.9] * 3, atol=1e-6)
    np.testing.assert_allclose(out[2], [0.5] * 3, atol=1e-6)


def test_textured_floor_render():
    """A half-red / half-blue kd texture must produce matching halves in the
    render (validates the atlas path end-to-end plus uv orientation)."""
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.materials.types import Matte
    from hikari_tpu.scene.mesh import make_quad
    from hikari_tpu.scene.scene import Scene

    img_tex = np.zeros((8, 8, 3), np.float32)
    img_tex[:, :4, 0] = 1.0  # u < 0.5: red
    img_tex[:, 4:, 2] = 1.0  # u > 0.5: blue

    s = Scene()
    # quad corners CCW from (-x,-z): uv (0,0),(1,0),(1,1),(0,1) => u runs +x
    s.add(
        make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
        Matte(kd=ImageTexture(img_tex)),
    )
    s.add_light(PointLight(position=(0.0, 3.0, 0.0), intensity=(20.0, 20.0, 20.0)))
    scene = s.build()

    cam = make_perspective_camera((0, 2.5, -2.5), (0, 0, 0), (32, 32), fov_deg=50.0)
    vp = VolPath(max_depth=2, samples_per_pixel=8)
    img = np.asarray(framebuffer(render(vp, scene, cam)))
    assert np.all(np.isfinite(img))
    lit = img.sum(-1) > 1e-3
    left = img[:, :12][lit[:, :12]]   # x<0 rows of the image
    right = img[:, 20:][lit[:, 20:]]
    assert left[:, 0].mean() > 3.0 * left[:, 2].mean(), "left half should be red"
    assert right[:, 2].mean() > 3.0 * right[:, 0].mean(), "right half should be blue"


def test_vertex_color_render():
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.materials.types import Matte
    from hikari_tpu.scene.mesh import make_quad
    from hikari_tpu.scene.scene import Scene

    q = make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2))
    q.colors = np.array(
        [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0)], np.float32
    )
    s = Scene()
    s.add(q, Matte(kd=VertexColorTexture()))
    s.add_light(PointLight(position=(0.0, 3.0, 0.0), intensity=(20.0, 20.0, 20.0)))
    scene = s.build()

    cam = make_perspective_camera((0, 2.5, -2.5), (0, 0, 0), (24, 24), fov_deg=50.0)
    vp = VolPath(max_depth=2, samples_per_pixel=8)
    img = np.asarray(framebuffer(render(vp, scene, cam)))
    assert np.all(np.isfinite(img))
    # color variance across the quad: different corners dominate different
    # image regions
    ratio = img[..., 0] / np.maximum(img.sum(-1), 1e-6)
    lit = img.sum(-1) > 1e-3
    assert ratio[lit].max() - ratio[lit].min() > 0.3


def test_uv_mapping2d_offset_scale():
    """UVMapping2D (su, sv, du, dv) parity (mapping.jl:9-37): an offset of
    0.5 in u on a half-black/half-white texture swaps the halves."""
    import numpy as np
    from hikari_tpu.textures.atlas import (
        AtlasBuilder, ImageTexture, atlas_lookup,
    )

    img = np.zeros((4, 8, 3), np.float32)
    img[:, 4:] = 1.0  # right half white
    b = AtlasBuilder()
    t0 = b.add(ImageTexture(img))
    t1 = b.add(ImageTexture(img, uv_offset=(0.5, 0.0)))
    atlas = b.build()

    uv = jnp.asarray([[0.25, 0.5]], jnp.float32)  # left half
    c0 = np.asarray(atlas_lookup(atlas, jnp.asarray([t0]), uv))
    c1 = np.asarray(atlas_lookup(atlas, jnp.asarray([t1]), uv))
    assert c0.mean() < 0.2, c0
    assert c1.mean() > 0.8, c1


def test_transform_mapping3d():
    """TransformMapping3D maps points and derivatives linearly
    (mapping.jl:49-58)."""
    import numpy as np
    from hikari_tpu.core.transform import scale
    from hikari_tpu.textures.mapping import TransformMapping3D, eval_noise3d

    t = scale((2.0, 2.0, 2.0))
    m = TransformMapping3D(world_to_texture=t)
    p = jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32)
    dpdx = jnp.asarray([[0.1, 0.0, 0.0]], jnp.float32)
    pt, dx, _ = m.map(p, dpdx, dpdx)
    assert np.allclose(np.asarray(pt), [[2.0, 4.0, 6.0]])
    assert np.allclose(np.asarray(dx), [[0.2, 0.0, 0.0]])
    # procedural field evaluates through the mapping
    v = eval_noise3d(m, jnp.asarray(np.random.RandomState(0).rand(16, 3), np.float32), "fbm")
    assert np.isfinite(np.asarray(v)).all()
