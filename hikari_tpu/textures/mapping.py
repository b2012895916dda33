"""Texture coordinate mappings (parity with
/root/reference/src/textures/mapping.jl:9-58).

UVMapping2D lives inside ImageTexture as uv_scale/uv_offset (su, sv, du,
dv) — applied at every atlas lookup. TransformMapping3D maps world-space
shading points through a linear transform into texture space; it feeds
*procedural 3D textures* (the noise module's perlin/worley/fBm fields),
which is the reference's intended use: a linear mapping means the texture
derivative is the same transform applied to dpdx/dpdy (mapping.jl:52-58).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..core.transform import Transform


@dataclass
class UVMapping2D:
    """su/sv scale + du/dv offset of surface uv (mapping.jl:9-14).

    Convert to ImageTexture fields with `.as_texture_kwargs()`."""

    su: float = 1.0
    sv: float = 1.0
    du: float = 0.0
    dv: float = 0.0

    def as_texture_kwargs(self) -> dict:
        return {"uv_scale": (self.su, self.sv), "uv_offset": (self.du, self.dv)}

    def map(self, uv: jnp.ndarray, duvdx=None, duvdy=None):
        """(st, dstdx, dstdy): texture coords + screen derivatives
        (mapping.jl:31-37)."""
        sc = jnp.asarray([self.su, self.sv], jnp.float32)
        st = uv * sc + jnp.asarray([self.du, self.dv], jnp.float32)
        dx = duvdx * sc if duvdx is not None else None
        dy = duvdy * sc if duvdy is not None else None
        return st, dx, dy


@dataclass
class TransformMapping3D:
    """World-space point -> texture-space point via a linear transform
    (mapping.jl:49-58); typically world_to_texture = object-space inverse."""

    world_to_texture: Transform

    def map(self, p: jnp.ndarray, dpdx=None, dpdy=None):
        """(pt, dptdx, dptdy) in texture space; derivatives transform as
        vectors because the mapping is linear (mapping.jl:52-58)."""
        t = self.world_to_texture
        pt = t.apply_point(p)
        dx = t.apply_vector(dpdx) if dpdx is not None else None
        dy = t.apply_vector(dpdy) if dpdy is not None else None
        return pt, dx, dy


def eval_noise3d(mapping: TransformMapping3D, p: jnp.ndarray, kind: str = "perlin",
                 octaves: int = 4):
    """Evaluate a procedural 3D field at world points through the mapping —
    the consumer the reference's Mapping3D was designed for (its CloudVolume
    / procedural-noise path, src/random.jl:37-206)."""
    from ..media.noise import fbm3d, perlin3d, worley3d

    pt, _, _ = mapping.map(p)
    x, y, z = pt[..., 0], pt[..., 1], pt[..., 2]
    if kind == "perlin":
        return perlin3d(x, y, z)
    if kind == "worley":
        return worley3d(x, y, z)
    if kind == "fbm":
        return fbm3d(x, y, z, octaves=octaves)
    raise ValueError(f"unknown noise kind {kind!r}")
