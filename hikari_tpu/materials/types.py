"""Material definitions (host) and packed SoA banks (device).

Parity with the reference material structs (MatteMaterial, MirrorMaterial,
GlassMaterial, ConductorMaterial, Emissive — uber-material.jl:180-526,
emissive.jl:30-62) and with its MultiTypeSet storage: materials are pushed
into per-type banks and referenced by a (type_tag, index) pair baked into
the triangle metadata — the TPU equivalent of Raycore's SetKey.

Conductor eta/k are stored as dense 1nm spectra over [360, 830] so measured
metals (pbrt data) and RGB-specified conductors share one device layout.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..core.pytree import pytree_dataclass
from ..spectral.piecewise import metal_eta_k

# material type tags (device dispatch indices)
MATTE = 0
MIRROR = 1
GLASS = 2
CONDUCTOR = 3
EMISSIVE = 4
INTERFACE = 5  # no BSDF: pure medium boundary (MediumInterface with no material)
N_MATERIAL_TYPES = 6

_LAM_GRID = np.arange(360.0, 831.0, dtype=np.float64)  # 471 samples


@dataclass
class Matte:
    """Lambertian / Oren-Nayar diffuse (uber-material.jl:180)."""

    kd: tuple = (0.5, 0.5, 0.5)
    sigma: float = 0.0


@dataclass
class Mirror:
    """Perfect specular reflector (uber-material.jl:193)."""

    kr: tuple = (1.0, 1.0, 1.0)


@dataclass
class Glass:
    """Dielectric with reflection+transmission (uber-material.jl:209)."""

    kr: tuple = (1.0, 1.0, 1.0)
    kt: tuple = (1.0, 1.0, 1.0)
    eta: float = 1.5
    u_roughness: float = 0.0
    v_roughness: float = 0.0
    remap_roughness: bool = True


@dataclass
class Conductor:
    """Microfacet conductor (uber-material.jl:378). Either a measured metal
    preset key ('AU', 'AG', 'CU', 'AL', 'CUZN') or explicit RGB eta/k."""

    metal: str | None = "AU"
    eta: tuple = (0.2, 0.92, 1.1)
    k: tuple = (3.9, 2.45, 2.14)
    roughness: float = 0.0
    v_roughness: float | None = None
    remap_roughness: bool = True


def Gold(roughness=0.0, **kw):
    return Conductor(metal="AU", roughness=roughness, **kw)


def Silver(roughness=0.0, **kw):
    return Conductor(metal="AG", roughness=roughness, **kw)


def Copper(roughness=0.0, **kw):
    return Conductor(metal="CU", roughness=roughness, **kw)


def Aluminum(roughness=0.0, **kw):
    return Conductor(metal="AL", roughness=roughness, **kw)


def Brass(roughness=0.0, **kw):
    return Conductor(metal="CUZN", roughness=roughness, **kw)


@dataclass
class Interface:
    """Invisible medium boundary: rays pass straight through, switching
    between inside/outside media (reference MediumInterface with no surface
    material, materials/medium-interface.jl:39-105)."""


@dataclass
class Emissive:
    """Area emission material (emissive.jl:30-62); faces with this material
    are registered as DiffuseAreaLights at scene build."""

    le: tuple = (1.0, 1.0, 1.0)
    scale: float = 1.0
    two_sided: bool = False


# aliases matching the reference's user-facing names (uber-material.jl:433-451)
Diffuse = Matte
Dielectric = Glass
Metal = Conductor


@pytree_dataclass
class MaterialBanks:
    """SoA parameter banks, one row per material instance of that type.

    Every bank is padded to at least one row so shapes are static; type
    presence is tracked by the scene's static `present_materials` set.
    """

    matte_kd: jnp.ndarray       # (Nm, 3)
    matte_sigma: jnp.ndarray    # (Nm,)
    mirror_kr: jnp.ndarray      # (Nr, 3)
    glass_kr: jnp.ndarray       # (Ng, 3)
    glass_kt: jnp.ndarray       # (Ng, 3)
    glass_eta: jnp.ndarray      # (Ng,)
    glass_ax: jnp.ndarray       # (Ng,)
    glass_ay: jnp.ndarray       # (Ng,)
    cond_eta: jnp.ndarray       # (Nc, 471) dense spectral eta
    cond_k: jnp.ndarray         # (Nc, 471)
    cond_ax: jnp.ndarray        # (Nc,)
    cond_ay: jnp.ndarray        # (Nc,)
    emissive_le: jnp.ndarray    # (Ne, 3)
    emissive_scale: jnp.ndarray  # (Ne,)
    emissive_two_sided: jnp.ndarray  # (Ne,) bool
    # texture references per field: >=0 atlas id, -1 const, -2 vertex color
    # (the TPU form of TextureRef flattening, texture-ref.jl:206-219)
    matte_kd_tex: jnp.ndarray    # (Nm,) int32
    mirror_kr_tex: jnp.ndarray   # (Nr,) int32
    glass_kr_tex: jnp.ndarray    # (Ng,) int32
    glass_kt_tex: jnp.ndarray    # (Ng,) int32
    glass_rough_tex: jnp.ndarray  # (Ng,) int32 (scales ax/ay)
    cond_rough_tex: jnp.ndarray  # (Nc,) int32 (scales ax/ay)
    emissive_le_tex: jnp.ndarray  # (Ne,) int32


def _remap_alpha_host(rough, remap):
    a = float(np.sqrt(rough)) if remap else float(rough)
    return a


def pack_materials(
    materials: list, atlas_builder=None
) -> tuple[MaterialBanks, np.ndarray, np.ndarray, set]:
    """Pack a list of host materials into device banks.

    atlas_builder: textures.atlas.AtlasBuilder collecting scene images; any
    material field may be a tuple/float (constant), an ImageTexture, or a
    VertexColorTexture.

    Returns (banks, type_tags (M,), bank_indices (M,), present_types).
    """
    from ..textures.atlas import (
        CONST_TEX, VERTEX_TEX, AtlasBuilder, ImageTexture, VertexColorTexture,
    )

    if atlas_builder is None:
        atlas_builder = AtlasBuilder()

    def resolve_rgb(field, default=(1.0, 1.0, 1.0)):
        """-> (const_rgb, tex_id)"""
        if isinstance(field, ImageTexture):
            return tuple(default), atlas_builder.add(field)
        if isinstance(field, VertexColorTexture):
            return tuple(default), VERTEX_TEX
        return tuple(np.broadcast_to(np.asarray(field, np.float32), (3,))), CONST_TEX

    def resolve_scalar(field, default=0.0):
        if isinstance(field, ImageTexture):
            return float(default), atlas_builder.add(field)
        if isinstance(field, VertexColorTexture):
            return float(default), VERTEX_TEX
        return float(field), CONST_TEX

    matte_kd, matte_sigma, matte_kd_tex = [], [], []
    mirror_kr, mirror_kr_tex = [], []
    glass = {k: [] for k in ("kr", "kt", "eta", "ax", "ay", "kr_tex", "kt_tex", "rough_tex")}
    cond_eta, cond_k, cond_ax, cond_ay, cond_rough_tex = [], [], [], [], []
    emis_le, emis_scale, emis_two, emis_le_tex = [], [], [], []

    tags = np.zeros(len(materials), np.int32)
    idxs = np.zeros(len(materials), np.int32)
    present: set[int] = set()

    for i, m in enumerate(materials):
        if isinstance(m, Matte):
            tags[i], idxs[i] = MATTE, len(matte_kd)
            kd, kd_tex = resolve_rgb(m.kd, (0.5, 0.5, 0.5))
            matte_kd.append(kd)
            matte_kd_tex.append(kd_tex)
            matte_sigma.append(m.sigma)
        elif isinstance(m, Mirror):
            tags[i], idxs[i] = MIRROR, len(mirror_kr)
            kr, kr_tex = resolve_rgb(m.kr)
            mirror_kr.append(kr)
            mirror_kr_tex.append(kr_tex)
        elif isinstance(m, Glass):
            tags[i], idxs[i] = GLASS, len(glass["kr"])
            kr, kr_tex = resolve_rgb(m.kr)
            kt, kt_tex = resolve_rgb(m.kt)
            ur, rough_tex = resolve_scalar(m.u_roughness)
            vr = ur if rough_tex >= 0 else float(m.v_roughness)
            glass["kr"].append(kr)
            glass["kt"].append(kt)
            glass["kr_tex"].append(kr_tex)
            glass["kt_tex"].append(kt_tex)
            glass["rough_tex"].append(rough_tex)
            glass["eta"].append(m.eta)
            glass["ax"].append(_remap_alpha_host(ur, m.remap_roughness))
            glass["ay"].append(_remap_alpha_host(vr, m.remap_roughness))
        elif isinstance(m, Conductor):
            tags[i], idxs[i] = CONDUCTOR, len(cond_eta)
            if m.metal is not None:
                eta_s, k_s = metal_eta_k(m.metal)
                lam = jnp.asarray(_LAM_GRID, jnp.float32)
                cond_eta.append(np.asarray(eta_s(lam)))
                cond_k.append(np.asarray(k_s(lam)))
            else:
                # RGB-specified eta/k: piecewise-constant over thirds of the
                # visible range (cheap stand-in; measured presets preferred)
                def rgb_to_dense(rgb):
                    lam = _LAM_GRID
                    r = np.where(lam < 490, rgb[2], np.where(lam < 580, rgb[1], rgb[0]))
                    return r.astype(np.float32)

                cond_eta.append(rgb_to_dense(np.asarray(m.eta)))
                cond_k.append(rgb_to_dense(np.asarray(m.k)))
            rough, rough_tex = resolve_scalar(m.roughness)
            vr = rough if m.v_roughness is None else m.v_roughness
            cond_ax.append(_remap_alpha_host(rough, m.remap_roughness))
            cond_ay.append(_remap_alpha_host(vr, m.remap_roughness))
            cond_rough_tex.append(rough_tex)
        elif isinstance(m, Emissive):
            tags[i], idxs[i] = EMISSIVE, len(emis_le)
            le, le_tex = resolve_rgb(m.le)
            emis_le.append(le)
            emis_le_tex.append(le_tex)
            emis_scale.append(m.scale)
            emis_two.append(m.two_sided)
        elif isinstance(m, Interface):
            tags[i], idxs[i] = INTERFACE, 0
        else:
            raise TypeError(f"unknown material {type(m)}")
        present.add(int(tags[i]))

    def pad3(rows, default=(0.0, 0.0, 0.0)):
        return jnp.asarray(rows or [default], jnp.float32)

    def pad1(rows, default=0.0, dtype=jnp.float32):
        return jnp.asarray(rows or [default], dtype)

    banks = MaterialBanks(
        matte_kd=pad3(matte_kd, (0.5, 0.5, 0.5)),
        matte_sigma=pad1(matte_sigma),
        mirror_kr=pad3(mirror_kr, (1.0, 1.0, 1.0)),
        glass_kr=pad3(glass["kr"], (1.0, 1.0, 1.0)),
        glass_kt=pad3(glass["kt"], (1.0, 1.0, 1.0)),
        glass_eta=pad1(glass["eta"], 1.5),
        glass_ax=pad1(glass["ax"]),
        glass_ay=pad1(glass["ay"]),
        cond_eta=jnp.asarray(
            np.stack(cond_eta) if cond_eta else np.zeros((1, len(_LAM_GRID))),
            jnp.float32,
        ),
        cond_k=jnp.asarray(
            np.stack(cond_k) if cond_k else np.ones((1, len(_LAM_GRID))),
            jnp.float32,
        ),
        cond_ax=pad1(cond_ax),
        cond_ay=pad1(cond_ay),
        emissive_le=pad3(emis_le, (1.0, 1.0, 1.0)),
        emissive_scale=pad1(emis_scale, 1.0),
        emissive_two_sided=pad1(emis_two, False, bool),
        matte_kd_tex=pad1(matte_kd_tex, -1, jnp.int32),
        mirror_kr_tex=pad1(mirror_kr_tex, -1, jnp.int32),
        glass_kr_tex=pad1(glass["kr_tex"], -1, jnp.int32),
        glass_kt_tex=pad1(glass["kt_tex"], -1, jnp.int32),
        glass_rough_tex=pad1(glass["rough_tex"], -1, jnp.int32),
        cond_rough_tex=pad1(cond_rough_tex, -1, jnp.int32),
        emissive_le_tex=pad1(emis_le_tex, -1, jnp.int32),
    )
    return banks, tags, idxs, present
