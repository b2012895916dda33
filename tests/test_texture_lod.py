"""Texture mip/LOD filtering (TextureFilterContext derivatives,
texture-ref.jl:21-33 + surface-eval.jl:32-141 camera-based dp/dxy)."""

import jax.numpy as jnp
import numpy as np

from hikari_tpu.textures.atlas import (
    AtlasBuilder, ImageTexture, TexCtx, atlas_lookup, textured_lookup,
)


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
