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
THIN_DIELECTRIC = 6
DIFFUSE_TRANSMISSION = 7
MIX = 8        # resolved to a concrete child at intersection time
COATED_DIFFUSE = 9
COATED_CONDUCTOR = 10
COATED_DIFFUSE_TRANSMISSION = 11
N_MATERIAL_TYPES = 12

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
    """Dielectric with reflection+transmission (uber-material.jl:209).

    cauchy_b > 0 enables dispersion with eta(lambda) = eta + B/lambda_um^2
    (the reference evaluates a spectral IOR the same way,
    spectral-eval.jl:207-221); refraction then terminates the secondary
    hero wavelengths like pbrt's SampledWavelengths.TerminateSecondary."""

    kr: tuple = (1.0, 1.0, 1.0)
    kt: tuple = (1.0, 1.0, 1.0)
    eta: float = 1.5
    u_roughness: float = 0.0
    v_roughness: float = 0.0
    remap_roughness: bool = True
    cauchy_b: float = 0.0  # um^2
    # measured dispersion: (B1,B2,B3,C1,C2,C3) Sellmeier coefficients
    # (lambda in um, C in um^2); overrides eta/cauchy_b when B1 > 0
    sellmeier: tuple = (0.0,) * 6


def BK7(**kw):
    """N-BK7 borosilicate crown (SCHOTT catalog Sellmeier)."""
    return Glass(eta=1.5168, sellmeier=(
        1.03961212, 0.231792344, 1.01046945,
        0.00600069867, 0.0200179144, 103.560653), **kw)


def SF11(**kw):
    """N-SF11 dense flint (SCHOTT catalog Sellmeier; strong dispersion)."""
    return Glass(eta=1.7847, sellmeier=(
        1.73759695, 0.313747346, 1.89878101,
        0.013188707, 0.0623068142, 155.23629), **kw)


def Sapphire(**kw):
    """Sapphire, ordinary ray (Malitson & Dodge Sellmeier)."""
    return Glass(eta=1.7682, sellmeier=(
        1.4313493, 0.65054713, 5.3414021,
        0.0052799261, 0.0142382647, 325.017834), **kw)


def FusedSilica(**kw):
    """Fused silica (Malitson 1965 Sellmeier)."""
    return Glass(eta=1.4585, sellmeier=(
        0.6961663, 0.4079426, 0.8974794,
        0.0046791483, 0.0135120631, 97.9340025), **kw)


def Diamond(**kw):
    """Diamond (Peter 1923 two-term Sellmeier; n_d 2.4175)."""
    return Glass(eta=2.4175, sellmeier=(
        0.3306, 4.3356, 0.0,
        0.030625, 0.011236, 1.0), **kw)


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
class ThinDielectric:
    """Thin glass pane / bubble wall: both interfaces collapsed into one
    surface (thin-dielectric.jl:45; pbrt ThinDielectricBxDF). Transmission
    passes straight through without bending and without entering a medium;
    total reflectance accounts for interreflection: R' = 2R/(1+R)."""

    kr: tuple = (1.0, 1.0, 1.0)
    kt: tuple = (1.0, 1.0, 1.0)
    eta: float = 1.5


@dataclass
class DiffuseTransmission:
    """Lambertian reflection + Lambertian transmission (leaves, lampshades;
    diffuse-transmission.jl:39; pbrt DiffuseTransmissionBxDF)."""

    reflectance: tuple = (0.25, 0.25, 0.25)
    transmittance: tuple = (0.25, 0.25, 0.25)


@dataclass
class CoatedDiffuse:
    """Dielectric coating over a diffuse base (coated-diffuse.jl:32; pbrt
    CoatedDiffuseMaterial), evaluated with the stochastic LayeredBxDF walk.
    thickness/albedo/g describe the medium between the layers in optical
    units."""

    reflectance: object = (0.5, 0.5, 0.5)
    roughness: float = 0.0       # coating interface roughness
    ior: float = 1.5
    thickness: float = 0.01
    albedo: tuple = (0.0, 0.0, 0.0)
    g: float = 0.0
    remap_roughness: bool = True


def Plastic(kd=(0.5, 0.5, 0.5), roughness=0.1, **kw):
    """Reference PlasticMaterial = CoatedDiffuse constructor
    (coated-diffuse.jl alias)."""
    return CoatedDiffuse(reflectance=kd, roughness=roughness, **kw)


@dataclass
class CoatedDiffuseTransmission:
    """Dielectric coating over a diffuse layer that both reflects and
    transmits (leaves, thin fabric, coated paper;
    coated-diffuse-transmission.jl:12 — pbrt LayeredBxDF<DielectricBxDF,
    DiffuseTransmissionBxDF, true>)."""

    reflectance: object = (0.5, 0.5, 0.5)
    transmittance: object = (0.25, 0.25, 0.25)
    roughness: float = 0.0       # coating interface roughness
    ior: float = 1.5
    thickness: float = 0.01
    albedo: tuple = (0.0, 0.0, 0.0)
    g: float = 0.0
    remap_roughness: bool = True


@dataclass
class CoatedConductor:
    """Dielectric coating over a conductor (coated-conductor.jl:48; pbrt
    CoatedConductorMaterial)."""

    interface_roughness: float = 0.0
    interface_ior: float = 1.5
    metal: str | None = "AU"
    eta: tuple = (0.2, 0.92, 1.1)
    k: tuple = (3.9, 2.45, 2.14)
    conductor_roughness: float = 0.1
    thickness: float = 0.01
    albedo: tuple = (0.0, 0.0, 0.0)
    g: float = 0.0
    remap_roughness: bool = True


@dataclass
class Mix:
    """Stochastic blend of two materials, resolved to one child per
    intersection by a deterministic hash (mix-material.jl:39-57). Children
    may not themselves be Mix."""

    m1: object = None
    m2: object = None
    amount: float = 0.5  # probability of choosing m1


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


@pytree_dataclass(static=("has_textures",))
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
    glass_cauchy: jnp.ndarray   # (Ng,) Cauchy B (um^2); > 0 = dispersive
    glass_sell: jnp.ndarray     # (Ng, 6) Sellmeier B1..3,C1..3; B1 > 0 wins
    glass_ax: jnp.ndarray       # (Ng,)
    glass_ay: jnp.ndarray       # (Ng,)
    cond_eta: jnp.ndarray       # (Nc, 471) dense spectral eta
    cond_k: jnp.ndarray         # (Nc, 471)
    cond_eta_pw: jnp.ndarray    # (Nc, 16, 4) piecewise-cubic fit (gather-free eval)
    cond_k_pw: jnp.ndarray      # (Nc, 16, 4)
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
    # thin dielectric
    thin_kr: jnp.ndarray         # (Nt, 3)
    thin_kt: jnp.ndarray         # (Nt, 3)
    thin_eta: jnp.ndarray        # (Nt,)
    # diffuse transmission
    dt_refl: jnp.ndarray         # (Nd, 3)
    dt_trans: jnp.ndarray        # (Nd, 3)
    dt_refl_tex: jnp.ndarray     # (Nd,) int32
    dt_trans_tex: jnp.ndarray    # (Nd,) int32
    # precomputed uplift coefficients [c0,c1,c2,scale] for constant
    # fields (texture-free lanes skip the trilinear rgb2spec lookup)
    matte_kd_c4: jnp.ndarray     # (Nm, 4)
    mirror_kr_c4: jnp.ndarray    # (Nr, 4)
    glass_kr_c4: jnp.ndarray     # (Ng, 4)
    glass_kt_c4: jnp.ndarray     # (Ng, 4)
    thin_kr_c4: jnp.ndarray      # (Nt, 4)
    thin_kt_c4: jnp.ndarray      # (Nt, 4)
    dt_refl_c4: jnp.ndarray      # (Nd, 4)
    dt_trans_c4: jnp.ndarray     # (Nd, 4)
    cd_refl_c4: jnp.ndarray      # (Ncd, 4)
    cd_albedo_c4: jnp.ndarray    # (Ncd, 4)
    cc_albedo_c4: jnp.ndarray    # (Ncc, 4)
    emissive_le_c4: jnp.ndarray  # (Ne, 4) unbounded (x scale/D65 at eval)
    # mix: child (type, idx) pairs + blend amount
    mix_m1_type: jnp.ndarray     # (Nx,) int32
    mix_m1_idx: jnp.ndarray      # (Nx,) int32
    mix_m2_type: jnp.ndarray     # (Nx,) int32
    mix_m2_idx: jnp.ndarray      # (Nx,) int32
    mix_amount: jnp.ndarray      # (Nx,)
    mix_amount_tex: jnp.ndarray  # (Nx,) int32 texture ref (mix-material.jl amount texture)
    # coated diffuse (LayeredBxDF)
    cd_refl: jnp.ndarray         # (Ncd, 3)
    cd_refl_tex: jnp.ndarray     # (Ncd,) int32
    cd_ax: jnp.ndarray           # (Ncd,) coating alpha
    cd_ay: jnp.ndarray
    cd_eta: jnp.ndarray          # (Ncd,)
    cd_thick: jnp.ndarray        # (Ncd,)
    cd_albedo: jnp.ndarray       # (Ncd, 3)
    cd_g: jnp.ndarray            # (Ncd,)
    # coated conductor
    cc_iax: jnp.ndarray          # (Ncc,) interface alpha
    cc_iay: jnp.ndarray
    cc_eta: jnp.ndarray          # (Ncc,) interface IOR
    cc_cond_eta: jnp.ndarray     # (Ncc, 471)
    cc_cond_k: jnp.ndarray       # (Ncc, 471)
    cc_cond_eta_pw: jnp.ndarray  # (Ncc, 16, 4)
    cc_cond_k_pw: jnp.ndarray    # (Ncc, 16, 4)
    cc_cax: jnp.ndarray          # (Ncc,) conductor alpha
    cc_cay: jnp.ndarray
    cc_thick: jnp.ndarray
    cc_albedo: jnp.ndarray       # (Ncc, 3)
    cc_g: jnp.ndarray
    # coated diffuse transmission
    cdt_refl: jnp.ndarray        # (Nct, 3)
    cdt_trans: jnp.ndarray       # (Nct, 3)
    cdt_refl_tex: jnp.ndarray    # (Nct,) int32
    cdt_trans_tex: jnp.ndarray   # (Nct,) int32
    cdt_refl_c4: jnp.ndarray     # (Nct, 4)
    cdt_trans_c4: jnp.ndarray    # (Nct, 4)
    cdt_albedo_c4: jnp.ndarray   # (Nct, 4)
    cdt_ax: jnp.ndarray          # (Nct,)
    cdt_ay: jnp.ndarray
    cdt_eta: jnp.ndarray
    cdt_thick: jnp.ndarray
    cdt_g: jnp.ndarray
    # static: any material field is image/vertex-color driven (False ->
    # shading skips the runtime-uplift path entirely)
    has_textures: bool = False


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
    glass = {k: [] for k in ("kr", "kt", "eta", "cauchy", "sell", "ax", "ay",
                             "kr_tex", "kt_tex", "rough_tex")}
    cond_eta, cond_k, cond_ax, cond_ay, cond_rough_tex = [], [], [], [], []
    emis_le, emis_scale, emis_two, emis_le_tex = [], [], [], []
    thin_kr, thin_kt, thin_eta = [], [], []
    dt_refl, dt_trans, dt_refl_tex, dt_trans_tex = [], [], [], []
    cd = {k: [] for k in ("refl", "refl_tex", "ax", "ay", "eta", "thick", "albedo", "g")}
    cdt = {k: [] for k in ("refl", "refl_tex", "trans", "trans_tex", "ax", "ay",
                           "eta", "thick", "albedo", "g")}
    cc = {k: [] for k in ("iax", "iay", "eta", "ceta", "ck", "cax", "cay",
                          "thick", "albedo", "g")}
    mix_rows: list[tuple[int, Mix]] = []  # (slot in `work`, material)
    mix_m1t, mix_m1i, mix_m2t, mix_m2i, mix_amt = [], [], [], [], []
    mix_amt_tex = []

    # Mix children are reachable only through their parent; expand them into
    # the packing list (dedup by identity) so they get bank rows
    work = list(materials)
    for m in materials:
        if isinstance(m, Mix):
            for ch in (m.m1, m.m2):
                assert ch is not None, "Mix needs two child materials"
                assert not isinstance(ch, Mix), "nested Mix is not supported"
                if not any(ch is w for w in work):
                    work.append(ch)

    tags = np.zeros(len(work), np.int32)
    idxs = np.zeros(len(work), np.int32)
    present: set[int] = set()

    for i, m in enumerate(work):
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
            glass["cauchy"].append(m.cauchy_b)
            glass["sell"].append(tuple(m.sellmeier))
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
        elif isinstance(m, ThinDielectric):
            tags[i], idxs[i] = THIN_DIELECTRIC, len(thin_kr)
            thin_kr.append(tuple(np.broadcast_to(np.asarray(m.kr, np.float32), (3,))))
            thin_kt.append(tuple(np.broadcast_to(np.asarray(m.kt, np.float32), (3,))))
            thin_eta.append(m.eta)
        elif isinstance(m, DiffuseTransmission):
            tags[i], idxs[i] = DIFFUSE_TRANSMISSION, len(dt_refl)
            r, r_tex = resolve_rgb(m.reflectance, (0.25, 0.25, 0.25))
            t, t_tex = resolve_rgb(m.transmittance, (0.25, 0.25, 0.25))
            dt_refl.append(r)
            dt_trans.append(t)
            dt_refl_tex.append(r_tex)
            dt_trans_tex.append(t_tex)
        elif isinstance(m, CoatedDiffuse):
            tags[i], idxs[i] = COATED_DIFFUSE, len(cd["refl"])
            r, r_tex = resolve_rgb(m.reflectance, (0.5, 0.5, 0.5))
            cd["refl"].append(r)
            cd["refl_tex"].append(r_tex)
            a = _remap_alpha_host(m.roughness, m.remap_roughness)
            cd["ax"].append(a)
            cd["ay"].append(a)
            cd["eta"].append(m.ior)
            cd["thick"].append(m.thickness)
            cd["albedo"].append(tuple(np.broadcast_to(np.asarray(m.albedo, np.float32), (3,))))
            cd["g"].append(m.g)
        elif isinstance(m, CoatedDiffuseTransmission):
            tags[i], idxs[i] = COATED_DIFFUSE_TRANSMISSION, len(cdt["refl"])
            r, r_tex = resolve_rgb(m.reflectance, (0.5, 0.5, 0.5))
            t, t_tex = resolve_rgb(m.transmittance, (0.25, 0.25, 0.25))
            cdt["refl"].append(r)
            cdt["refl_tex"].append(r_tex)
            cdt["trans"].append(t)
            cdt["trans_tex"].append(t_tex)
            a = _remap_alpha_host(m.roughness, m.remap_roughness)
            cdt["ax"].append(a)
            cdt["ay"].append(a)
            cdt["eta"].append(m.ior)
            cdt["thick"].append(m.thickness)
            cdt["albedo"].append(tuple(np.broadcast_to(np.asarray(m.albedo, np.float32), (3,))))
            cdt["g"].append(m.g)
        elif isinstance(m, CoatedConductor):
            tags[i], idxs[i] = COATED_CONDUCTOR, len(cc["iax"])
            ia = _remap_alpha_host(m.interface_roughness, m.remap_roughness)
            cc["iax"].append(ia)
            cc["iay"].append(ia)
            cc["eta"].append(m.interface_ior)
            if m.metal is not None:
                eta_s, k_s = metal_eta_k(m.metal)
                lamg = jnp.asarray(_LAM_GRID, jnp.float32)
                cc["ceta"].append(np.asarray(eta_s(lamg)))
                cc["ck"].append(np.asarray(k_s(lamg)))
            else:
                def rgb_to_dense(rgb):
                    lamg = _LAM_GRID
                    return np.where(
                        lamg < 490, rgb[2], np.where(lamg < 580, rgb[1], rgb[0])
                    ).astype(np.float32)

                cc["ceta"].append(rgb_to_dense(np.asarray(m.eta)))
                cc["ck"].append(rgb_to_dense(np.asarray(m.k)))
            ca = _remap_alpha_host(m.conductor_roughness, m.remap_roughness)
            cc["cax"].append(ca)
            cc["cay"].append(ca)
            cc["thick"].append(m.thickness)
            cc["albedo"].append(tuple(np.broadcast_to(np.asarray(m.albedo, np.float32), (3,))))
            cc["g"].append(m.g)
        elif isinstance(m, Mix):
            tags[i], idxs[i] = MIX, len(mix_rows)
            mix_rows.append((i, m))
        else:
            raise TypeError(f"unknown material {type(m)}")
        present.add(int(tags[i]))

    # second pass: mix children now have bank rows
    def _slot_of(child):
        for j, w in enumerate(work):
            if child is w:
                return j
        raise AssertionError("mix child not packed")

    for _, m in mix_rows:
        j1 = _slot_of(m.m1)
        j2 = _slot_of(m.m2)
        mix_m1t.append(int(tags[j1]))
        mix_m1i.append(int(idxs[j1]))
        mix_m2t.append(int(tags[j2]))
        mix_m2i.append(int(idxs[j2]))
        amt, amt_tex = resolve_scalar(m.amount, default=0.5)
        mix_amt.append(amt)
        mix_amt_tex.append(amt_tex)

    def pad3(rows, default=(0.0, 0.0, 0.0)):
        return jnp.asarray(rows or [default], jnp.float32)

    def pad1(rows, default=0.0, dtype=jnp.float32):
        return jnp.asarray(rows or [default], dtype)

    from ..spectral.rgb2spec import albedo_coeff4, srgb_table, unbounded_coeff4

    table = srgb_table()

    def a_c4(rows, default):
        return albedo_coeff4(table, jnp.clip(pad3(rows, default), 0.0, 1.0))


    from ..spectral.piecewise_poly import fit_piecewise_poly

    def pw_rows(rows, fallback):
        arr = np.stack(rows) if rows else fallback
        return jnp.asarray(
            np.stack([fit_piecewise_poly(r, 16) for r in arr]), jnp.float32
        )

    banks = MaterialBanks(
        matte_kd=pad3(matte_kd, (0.5, 0.5, 0.5)),
        matte_sigma=pad1(matte_sigma),
        mirror_kr=pad3(mirror_kr, (1.0, 1.0, 1.0)),
        glass_kr=pad3(glass["kr"], (1.0, 1.0, 1.0)),
        glass_kt=pad3(glass["kt"], (1.0, 1.0, 1.0)),
        glass_eta=pad1(glass["eta"], 1.5),
        glass_cauchy=pad1(glass["cauchy"]),
        glass_sell=jnp.asarray(
            np.asarray(glass["sell"], np.float32).reshape(-1, 6)
            if glass["sell"] else np.zeros((1, 6), np.float32)),
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
        cond_eta_pw=pw_rows(cond_eta, np.zeros((1, len(_LAM_GRID)))),
        cond_k_pw=pw_rows(cond_k, np.ones((1, len(_LAM_GRID)))),
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
        thin_kr=pad3(thin_kr, (1.0, 1.0, 1.0)),
        thin_kt=pad3(thin_kt, (1.0, 1.0, 1.0)),
        thin_eta=pad1(thin_eta, 1.5),
        dt_refl=pad3(dt_refl, (0.25, 0.25, 0.25)),
        dt_trans=pad3(dt_trans, (0.25, 0.25, 0.25)),
        dt_refl_tex=pad1(dt_refl_tex, -1, jnp.int32),
        dt_trans_tex=pad1(dt_trans_tex, -1, jnp.int32),
        mix_m1_type=pad1(mix_m1t, 0, jnp.int32),
        mix_m1_idx=pad1(mix_m1i, 0, jnp.int32),
        mix_m2_type=pad1(mix_m2t, 0, jnp.int32),
        mix_m2_idx=pad1(mix_m2i, 0, jnp.int32),
        mix_amount=pad1(mix_amt, 0.5),
        mix_amount_tex=pad1(mix_amt_tex, -1, jnp.int32),
        matte_kd_c4=a_c4(matte_kd, (0.5, 0.5, 0.5)),
        mirror_kr_c4=a_c4(mirror_kr, (1.0, 1.0, 1.0)),
        glass_kr_c4=a_c4(glass["kr"], (1.0, 1.0, 1.0)),
        glass_kt_c4=a_c4(glass["kt"], (1.0, 1.0, 1.0)),
        thin_kr_c4=a_c4(thin_kr, (1.0, 1.0, 1.0)),
        thin_kt_c4=a_c4(thin_kt, (1.0, 1.0, 1.0)),
        dt_refl_c4=a_c4(dt_refl, (0.25, 0.25, 0.25)),
        dt_trans_c4=a_c4(dt_trans, (0.25, 0.25, 0.25)),
        cd_refl_c4=a_c4(cd["refl"], (0.5, 0.5, 0.5)),
        cd_albedo_c4=a_c4(cd["albedo"], (0.0, 0.0, 0.0)),
        cc_albedo_c4=a_c4(cc["albedo"], (0.0, 0.0, 0.0)),
        emissive_le_c4=unbounded_coeff4(table, pad3(emis_le, (1.0, 1.0, 1.0))),
        cd_refl=pad3(cd["refl"], (0.5, 0.5, 0.5)),
        cd_refl_tex=pad1(cd["refl_tex"], -1, jnp.int32),
        cd_ax=pad1(cd["ax"]),
        cd_ay=pad1(cd["ay"]),
        cd_eta=pad1(cd["eta"], 1.5),
        cd_thick=pad1(cd["thick"], 0.01),
        cd_albedo=pad3(cd["albedo"]),
        cd_g=pad1(cd["g"]),
        cc_iax=pad1(cc["iax"]),
        cc_iay=pad1(cc["iay"]),
        cc_eta=pad1(cc["eta"], 1.5),
        cc_cond_eta=jnp.asarray(
            np.stack(cc["ceta"]) if cc["ceta"] else np.zeros((1, len(_LAM_GRID))),
            jnp.float32,
        ),
        cc_cond_k=jnp.asarray(
            np.stack(cc["ck"]) if cc["ck"] else np.ones((1, len(_LAM_GRID))),
            jnp.float32,
        ),
        cc_cond_eta_pw=pw_rows(cc["ceta"], np.zeros((1, len(_LAM_GRID)))),
        cc_cond_k_pw=pw_rows(cc["ck"], np.ones((1, len(_LAM_GRID)))),
        cc_cax=pad1(cc["cax"]),
        cc_cay=pad1(cc["cay"]),
        cc_thick=pad1(cc["thick"], 0.01),
        cc_albedo=pad3(cc["albedo"]),
        cc_g=pad1(cc["g"]),
        cdt_refl=pad3(cdt["refl"], (0.5, 0.5, 0.5)),
        cdt_trans=pad3(cdt["trans"], (0.25, 0.25, 0.25)),
        cdt_refl_tex=pad1(cdt["refl_tex"], -1, jnp.int32),
        cdt_trans_tex=pad1(cdt["trans_tex"], -1, jnp.int32),
        cdt_refl_c4=a_c4(cdt["refl"], (0.5, 0.5, 0.5)),
        cdt_trans_c4=a_c4(cdt["trans"], (0.25, 0.25, 0.25)),
        cdt_albedo_c4=a_c4(cdt["albedo"], (0.0, 0.0, 0.0)),
        cdt_ax=pad1(cdt["ax"]),
        cdt_ay=pad1(cdt["ay"]),
        cdt_eta=pad1(cdt["eta"], 1.5),
        cdt_thick=pad1(cdt["thick"], 0.01),
        cdt_g=pad1(cdt["g"]),
        has_textures=any(
            int(v) != -1
            for lst in (matte_kd_tex, mirror_kr_tex, glass["kr_tex"],
                        glass["kt_tex"], glass["rough_tex"], cond_rough_tex,
                        emis_le_tex, dt_refl_tex, dt_trans_tex, cd["refl_tex"],
                        cdt["refl_tex"], cdt["trans_tex"], mix_amt_tex)
            for v in lst
        ),
    )
    return banks, tags, idxs, present
