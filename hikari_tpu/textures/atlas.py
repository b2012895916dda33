"""Texture atlas: device storage + evaluation for surface textures.

Parity with /root/reference/src/textures/ (basic.jl Texture{ElType} const or
image, VertexColorTexture; texture-ref.jl eval_tex + TextureRef flattening;
mapping.jl UV mapping). The reference flattens Texture fields into
TextureRef indices when materials enter the MultiTypeSet
(texture-ref.jl:206-219); here every image in the scene is packed into one
flat (T, 3) texel buffer with per-texture (offset, width, height), and a
material field stores an int32 reference:

    tex_id >= 0  -> image texture `tex_id` in the atlas (bilinear, wrap)
    tex_id == -1 -> constant (the value stored in the material bank)
    tex_id == -2 -> vertex color (barycentric-interpolated mesh colors)

Evaluation is two gathers + lerp per lane — uniform static shapes no matter
how many textures a scene holds.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core.pytree import pytree_dataclass

CONST_TEX = -1
VERTEX_TEX = -2


@dataclass
class ImageTexture:
    """Image-backed texture. image: (H, W, 3) or (H, W) float; uv wraps."""

    image: np.ndarray
    uv_scale: tuple = (1.0, 1.0)


@dataclass
class VertexColorTexture:
    """Per-vertex color interpolated by barycentrics (basic.jl
    VertexColorTexture)."""


@pytree_dataclass
class TextureAtlas:
    data: jnp.ndarray       # (T, 3) float32 texels, all images concatenated
    offset: jnp.ndarray     # (K,) int32
    width: jnp.ndarray      # (K,) int32
    height: jnp.ndarray     # (K,) int32
    uv_scale: jnp.ndarray   # (K, 2)


class AtlasBuilder:
    """Host-side accumulation of scene textures during material packing."""

    def __init__(self):
        self.images: list[np.ndarray] = []
        self.uv_scales: list[tuple] = []

    def add(self, tex: ImageTexture) -> int:
        img = np.asarray(tex.image, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        assert img.ndim == 3 and img.shape[2] == 3, img.shape
        self.images.append(img)
        self.uv_scales.append(tuple(tex.uv_scale))
        return len(self.images) - 1

    def build(self) -> TextureAtlas:
        if not self.images:
            return TextureAtlas(
                data=jnp.zeros((1, 3), jnp.float32),
                offset=jnp.zeros((1,), jnp.int32),
                width=jnp.ones((1,), jnp.int32),
                height=jnp.ones((1,), jnp.int32),
                uv_scale=jnp.ones((1, 2), jnp.float32),
            )
        offs, ws, hs = [], [], []
        cur = 0
        for img in self.images:
            h, w, _ = img.shape
            offs.append(cur)
            ws.append(w)
            hs.append(h)
            cur += h * w
        data = np.concatenate([im.reshape(-1, 3) for im in self.images])
        return TextureAtlas(
            data=jnp.asarray(data),
            offset=jnp.asarray(offs, jnp.int32),
            width=jnp.asarray(ws, jnp.int32),
            height=jnp.asarray(hs, jnp.int32),
            uv_scale=jnp.asarray(self.uv_scales, jnp.float32),
        )


@pytree_dataclass
class TexCtx:
    """Per-lane evaluation context (the reference's TextureFilterContext,
    texture-ref.jl:21-33, minus screen-space derivatives for now)."""

    uv: jnp.ndarray       # (..., 2)
    vcolor: jnp.ndarray   # (..., 3) interpolated vertex color


def atlas_lookup(atlas: TextureAtlas, tex: jnp.ndarray, uv: jnp.ndarray):
    """Bilinear wrap-mode fetch. tex (...,) int32 >= 0, uv (..., 2) -> (..., 3)."""
    t = jnp.maximum(tex, 0)
    off = atlas.offset[t]
    w = atlas.width[t]
    h = atlas.height[t]
    sc = atlas.uv_scale[t]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    u = uv[..., 0] * sc[..., 0]
    # image rows run top-down; flip v so uv=(0,0) is the bottom-left texel
    v = (1.0 - uv[..., 1]) * sc[..., 1]
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]

    def at(xi, yi):
        xm = jnp.mod(xi, w)
        ym = jnp.mod(yi, h)
        lin = off + ym * w + xm
        return atlas.data[jnp.clip(lin, 0, atlas.data.shape[0] - 1)]

    c00 = at(x0, y0)
    c10 = at(x0 + 1, y0)
    c01 = at(x0, y0 + 1)
    c11 = at(x0 + 1, y0 + 1)
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def eval_rgb(atlas: TextureAtlas, tex: jnp.ndarray, const_rgb: jnp.ndarray, ctx: TexCtx):
    """Resolve an RGB material field: image / vertex-color / constant
    (eval_tex, texture-ref.jl)."""
    img = atlas_lookup(atlas, tex, ctx.uv)
    out = jnp.where((tex >= 0)[..., None], img, const_rgb)
    return jnp.where((tex == VERTEX_TEX)[..., None], ctx.vcolor, out)


def eval_scalar(atlas: TextureAtlas, tex: jnp.ndarray, const_v: jnp.ndarray, ctx: TexCtx):
    """Resolve a scalar field (roughness etc.): channel 0 of the texture."""
    img = atlas_lookup(atlas, tex, ctx.uv)[..., 0]
    return jnp.where(tex >= 0, img, const_v)
