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
    """Image-backed texture. image: (H, W, 3) or (H, W) float; uv wraps.

    uv_scale/uv_offset are the reference's UVMapping2D (su, sv, du, dv)
    parameters (mapping.jl:9-37): st = uv * scale + offset."""

    image: np.ndarray
    uv_scale: tuple = (1.0, 1.0)
    uv_offset: tuple = (0.0, 0.0)


@dataclass
class VertexColorTexture:
    """Per-vertex color interpolated by barycentrics (basic.jl
    VertexColorTexture)."""


@pytree_dataclass
class TextureAtlas:
    """All scene images + their mip pyramids in one flat texel buffer.

    Level arrays are (K, L) with the last real level repeated out to L so
    lookups never index past a texture's pyramid (MIPMap parity: the
    reference filters via TextureFilterContext derivatives)."""

    data: jnp.ndarray       # (T, 3) float32 texels, all levels concatenated
    offset: jnp.ndarray     # (K, L) int32 per-level start
    width: jnp.ndarray      # (K, L) int32
    height: jnp.ndarray     # (K, L) int32
    uv_scale: jnp.ndarray   # (K, 2)
    uv_offset: jnp.ndarray  # (K, 2)


class AtlasBuilder:
    """Host-side accumulation of scene textures during material packing."""

    def __init__(self):
        self.images: list[np.ndarray] = []
        self.uv_scales: list[tuple] = []
        self.uv_offsets: list[tuple] = []

    def add(self, tex: ImageTexture) -> int:
        img = np.asarray(tex.image, np.float32)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        assert img.ndim == 3 and img.shape[2] == 3, img.shape
        self.images.append(img)
        self.uv_scales.append(tuple(tex.uv_scale))
        self.uv_offsets.append(tuple(getattr(tex, "uv_offset", (0.0, 0.0))))
        return len(self.images) - 1

    def build(self) -> TextureAtlas:
        if not self.images:
            return TextureAtlas(
                data=jnp.zeros((1, 3), jnp.float32),
                offset=jnp.zeros((1, 1), jnp.int32),
                width=jnp.ones((1, 1), jnp.int32),
                height=jnp.ones((1, 1), jnp.int32),
                uv_scale=jnp.ones((1, 2), jnp.float32),
                uv_offset=jnp.zeros((1, 2), jnp.float32),
            )

        def downsample(im):
            h, w, _ = im.shape
            if h > 1 and h % 2:
                im = np.concatenate([im, im[-1:]], axis=0)
            if w > 1 and w % 2:
                im = np.concatenate([im, im[:, -1:]], axis=1)
            h, w, _ = im.shape
            nh, nw = max(h // 2, 1), max(w // 2, 1)
            if h == 1:
                return 0.5 * (im[:, 0::2] + im[:, 1::2]) if w > 1 else im
            if w == 1:
                return 0.5 * (im[0::2] + im[1::2])
            return 0.25 * (im[0::2, 0::2] + im[1::2, 0::2]
                           + im[0::2, 1::2] + im[1::2, 1::2])

        pyramids = []
        for img in self.images:
            levels = [img]
            while levels[-1].shape[0] > 1 or levels[-1].shape[1] > 1:
                levels.append(downsample(levels[-1]))
            pyramids.append(levels)
        lmax = max(len(p) for p in pyramids)

        chunks, offs, ws, hs = [], [], [], []
        cur = 0
        for levels in pyramids:
            o_row, w_row, h_row = [], [], []
            for im in levels:
                h, w, _ = im.shape
                o_row.append(cur)
                w_row.append(w)
                h_row.append(h)
                chunks.append(im.reshape(-1, 3))
                cur += h * w
            while len(o_row) < lmax:  # repeat the 1x1 tail level
                o_row.append(o_row[-1])
                w_row.append(w_row[-1])
                h_row.append(h_row[-1])
            offs.append(o_row)
            ws.append(w_row)
            hs.append(h_row)
        return TextureAtlas(
            data=jnp.asarray(np.concatenate(chunks)),
            offset=jnp.asarray(offs, jnp.int32),
            width=jnp.asarray(ws, jnp.int32),
            height=jnp.asarray(hs, jnp.int32),
            uv_scale=jnp.asarray(self.uv_scales, jnp.float32),
            uv_offset=jnp.asarray(self.uv_offsets, jnp.float32),
        )


@pytree_dataclass
class TexCtx:
    """Per-lane evaluation context (the reference's TextureFilterContext,
    texture-ref.jl:21-33)."""

    uv: jnp.ndarray       # (..., 2)
    vcolor: jnp.ndarray   # (..., 3) interpolated vertex color
    duvdx: jnp.ndarray | None = None  # (..., 2) screen-space uv derivative
    duvdy: jnp.ndarray | None = None


def atlas_lookup(atlas: TextureAtlas, tex: jnp.ndarray, uv: jnp.ndarray,
                 level=None):
    """Bilinear wrap-mode fetch at one mip level. tex (...,) int32 >= 0,
    uv (..., 2) -> (..., 3)."""
    t = jnp.maximum(tex, 0)
    if level is None:
        level = jnp.zeros_like(t)
    off = atlas.offset[t, level]
    w = atlas.width[t, level]
    h = atlas.height[t, level]
    sc = atlas.uv_scale[t]
    do = atlas.uv_offset[t]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    u = uv[..., 0] * sc[..., 0] + do[..., 0]
    # image rows run top-down; flip v so uv=(0,0) is the bottom-left texel
    v = 1.0 - (uv[..., 1] * sc[..., 1] + do[..., 1])
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


def _lod(atlas: TextureAtlas, tex, ctx: TexCtx):
    """Trilinear level of detail from the uv screen derivatives:
    log2 of the pixel footprint in base-level texels."""
    t = jnp.maximum(tex, 0)
    w0 = atlas.width[t, 0].astype(jnp.float32)
    h0 = atlas.height[t, 0].astype(jnp.float32)
    sc = atlas.uv_scale[t]
    dx = ctx.duvdx * sc
    dy = ctx.duvdy * sc
    fx = jnp.sqrt((dx[..., 0] * w0) ** 2 + (dx[..., 1] * h0) ** 2)
    fy = jnp.sqrt((dy[..., 0] * w0) ** 2 + (dy[..., 1] * h0) ** 2)
    width = jnp.maximum(jnp.maximum(fx, fy), 1e-8)
    return jnp.clip(jnp.log2(width), 0.0, atlas.offset.shape[1] - 1.001)


def textured_lookup(atlas: TextureAtlas, tex, ctx: TexCtx):
    """Trilinearly filtered lookup when derivatives are available."""
    if ctx.duvdx is None or atlas.offset.shape[1] == 1:
        return atlas_lookup(atlas, tex, ctx.uv)
    lod = _lod(atlas, tex, ctx)
    l0 = jnp.floor(lod).astype(jnp.int32)
    f = (lod - l0.astype(jnp.float32))[..., None]
    c0 = atlas_lookup(atlas, tex, ctx.uv, l0)
    c1 = atlas_lookup(atlas, tex, ctx.uv,
                      jnp.minimum(l0 + 1, atlas.offset.shape[1] - 1))
    return c0 * (1.0 - f) + c1 * f


def eval_rgb(atlas: TextureAtlas, tex: jnp.ndarray, const_rgb: jnp.ndarray, ctx: TexCtx):
    """Resolve an RGB material field: image / vertex-color / constant
    (eval_tex, texture-ref.jl)."""
    img = textured_lookup(atlas, tex, ctx)
    out = jnp.where((tex >= 0)[..., None], img, const_rgb)
    return jnp.where((tex == VERTEX_TEX)[..., None], ctx.vcolor, out)


def eval_scalar(atlas: TextureAtlas, tex: jnp.ndarray, const_v: jnp.ndarray, ctx: TexCtx):
    """Resolve a scalar field (roughness etc.): channel 0 of the texture."""
    img = textured_lookup(atlas, tex, ctx)[..., 0]
    return jnp.where(tex >= 0, img, const_v)
