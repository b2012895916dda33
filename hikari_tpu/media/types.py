"""Participating media: host definitions, device banks, presets.

Parity with /root/reference/src/integrators/volpath/media.jl:
HomogeneousMedium, GridMedium (density grid + MajorantGrid), RGBGridMedium
(per-voxel sigma_a/sigma_s/Le RGB grids, media.jl:1002-1458), HG phase
function, measured medium presets, CloudVolume via noise.py.

Device layout: all grid media share one flat density buffer (scalar) and
one flat RGB buffer with per-medium (offset, resolution, bounds); every
spatial medium also carries a MAJORANT_RES^3 majorant cell grid
(media.jl:1123-1543) that the delta-tracking DDA walks — uniform static
shapes regardless of how many grids a scene holds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..core.pytree import pytree_dataclass

HOMOGENEOUS = 0
GRID = 1
RGBGRID = 2
BRICK = 3       # sparse brick-paged grid (NanoVDB-class volumes)
BRICK_DIM = 8   # voxels per brick edge (NanoVDB leaf size)
N_MEDIUM_TYPES = 3

MAJORANT_RES = 16  # majorant grid resolution per axis (media.jl:1123-1543)


@dataclass
class HomogeneousMedium:
    """Uniform sigma_a/sigma_s RGB, HG asymmetry g (media.jl:762-860)."""

    sigma_a: tuple = (0.01, 0.01, 0.01)
    sigma_s: tuple = (1.0, 1.0, 1.0)
    le: tuple = (0.0, 0.0, 0.0)
    g: float = 0.0
    scale: float = 1.0
    # optional ray bending at null-scatter events (apply_deflection hook,
    # media.jl:2039): ("gravity", (cx, cy, cz), strength) or None
    deflection: tuple | None = None
    # majorant inflation (>1 introduces null-scattering events in an
    # otherwise exact homogeneous majorant — required for deflection to
    # sample bending points, like the reference's SpacetimeMedium)
    majorant_scale: float = 1.0


@dataclass
class GridMedium:
    """Heterogeneous density grid medium (media.jl:873-980).

    density: (nz, ny, nx) float32 array; world-space bounds (lo, hi).
    sigma_a/sigma_s are per-unit-density coefficients.
    """

    density: np.ndarray = None
    bounds_lo: tuple = (0.0, 0.0, 0.0)
    bounds_hi: tuple = (1.0, 1.0, 1.0)
    sigma_a: tuple = (1.0, 1.0, 1.0)
    sigma_s: tuple = (1.0, 1.0, 1.0)
    le: tuple = (0.0, 0.0, 0.0)
    g: float = 0.0
    scale: float = 1.0
    deflection: tuple | None = None


@dataclass
class RGBGridMedium:
    """Per-voxel RGB absorption/scattering/emission grids
    (media.jl:1002-1458). Each grid is (nz, ny, nx, 3) or None.
    sigma_*_scale multiply the stored values."""

    sigma_a_grid: np.ndarray = None
    sigma_s_grid: np.ndarray = None
    le_grid: np.ndarray = None
    bounds_lo: tuple = (0.0, 0.0, 0.0)
    bounds_hi: tuple = (1.0, 1.0, 1.0)
    sigma_a_scale: float = 1.0
    sigma_s_scale: float = 1.0
    le_scale: float = 1.0
    g: float = 0.0
    deflection: tuple | None = None


def CloudVolume(
    resolution: int = 96,
    bounds_lo=(0.0, 0.0, 0.0),
    bounds_hi=(1.0, 1.0, 1.0),
    sigma_s=(1.0, 1.0, 1.0),
    sigma_a=(0.02, 0.02, 0.02),
    g: float = 0.877,
    scale: float = 1.0,
    **noise_kwargs,
) -> GridMedium:
    """Procedural cloud medium (materials/volume.jl CloudVolume analog):
    a GridMedium filled by the Worley/Perlin cloud recipe."""
    from .noise import generate_cloud_density

    d = generate_cloud_density(resolution, **noise_kwargs)
    return GridMedium(
        density=d, bounds_lo=bounds_lo, bounds_hi=bounds_hi,
        sigma_a=sigma_a, sigma_s=sigma_s, g=g, scale=scale,
    )


# Measured scattering media presets (sigma_s, sigma_a per mm, from the
# pbrt measured-media dataset; reference copy media.jl:1769-1855)
_MEDIUM_PRESETS = {
    # milk and dairy
    "Wholemilk": ((2.55, 3.21, 3.77), (0.0011, 0.0024, 0.014)),
    "Skimmilk": ((0.70, 1.22, 1.90), (0.0014, 0.0025, 0.0142)),
    "LowfatMilk": ((0.89, 1.51, 2.53), (0.0029, 0.0058, 0.0115)),
    "ReducedMilk": ((2.49, 3.17, 4.52), (0.0026, 0.0051, 0.0128)),
    "RegularMilk": ((4.55, 5.83, 7.14), (0.0015, 0.0046, 0.0199)),
    "Cream": ((7.38, 5.47, 3.15), (0.0002, 0.0028, 0.0163)),
    "LowfatChocolateMilk": ((0.65, 0.84, 1.11), (0.0115, 0.0368, 0.1564)),
    "RegularChocolateMilk": ((1.46, 2.13, 2.95), (0.0101, 0.0431, 0.1438)),
    "LowfatSoyMilk": ((0.31, 0.34, 0.62), (0.0014, 0.0072, 0.0359)),
    "RegularSoyMilk": ((0.59, 0.74, 1.47), (0.0019, 0.0096, 0.0652)),
    # coffee
    "Espresso": ((0.72, 0.85, 1.02), (4.80, 6.58, 8.85)),
    "MintMochaCoffee": ((0.32, 0.39, 0.48), (3.77, 5.82, 7.82)),
    # alcoholic beverages
    "Chardonnay": ((1.8e-5, 1.4e-5, 1.2e-5), (0.0108, 0.0119, 0.0240)),
    "WhiteZinfandel": ((1.8e-5, 1.9e-5, 1.3e-5), (0.0121, 0.0162, 0.0198)),
    "Merlot": ((2.1e-5, 0.0, 0.0), (0.116, 0.252, 0.294)),
    "BudweiserBeer": ((2.4e-5, 2.4e-5, 1.1e-5), (0.0115, 0.0249, 0.0578)),
    "CoorsLightBeer": ((5.1e-5, 4.3e-5, 0.0), (0.0062, 0.0140, 0.0350)),
    # fruit juices
    "AppleJuice": ((1.4e-4, 1.6e-4, 2.3e-4), (0.0130, 0.0237, 0.0522)),
    "CranberryJuice": ((1.0e-4, 1.2e-4, 7.8e-5), (0.0394, 0.0942, 0.1243)),
    "GrapeJuice": ((5.4e-5, 0.0, 0.0), (0.1040, 0.2396, 0.2933)),
    "RubyGrapefruitJuice": ((0.011, 0.011, 0.011), (0.0859, 0.1831, 0.2526)),
    # sodas
    "Sprite": ((6.0e-6, 6.4e-6, 6.6e-6), (0.00189, 0.00183, 0.00200)),
    "Coke": ((8.9e-5, 8.4e-5, 0.0), (0.1001, 0.1650, 0.2468)),
    "Pepsi": ((6.2e-5, 4.3e-5, 0.0), (0.0916, 0.1416, 0.2073)),
    # foods and organics
    "Apple": ((2.29, 2.39, 1.97), (0.0030, 0.0034, 0.046)),
    "Potato": ((0.68, 0.70, 0.55), (0.0024, 0.0090, 0.12)),
    "Chicken1": ((0.15, 0.21, 0.38), (0.015, 0.077, 0.19)),
    "Chicken2": ((0.19, 0.25, 0.32), (0.018, 0.088, 0.20)),
    "Ketchup": ((0.18, 0.07, 0.03), (0.061, 0.97, 1.45)),
    # skin
    "Skin1": ((0.74, 0.88, 1.01), (0.032, 0.17, 0.48)),
    "Skin2": ((1.09, 1.59, 1.79), (0.013, 0.070, 0.145)),
    # other materials
    "Marble": ((2.19, 2.62, 3.00), (0.0021, 0.0041, 0.0071)),
    "Spectralon": ((11.6, 20.4, 14.9), (0.0, 0.0, 0.0)),
    "Shampoo": ((0.0007, 0.0008, 0.0009), (0.0141, 0.0457, 0.0617)),
    "HeadShouldersShampoo": ((0.0238, 0.0288, 0.0343), (0.0846, 0.1569, 0.2037)),
    "Clorox": ((0.0024, 0.0031, 0.0040), (0.0034, 0.0149, 0.0263)),
    # powders
    "CappuccinoPowder": ((1.84, 2.59, 2.17), (35.84, 49.55, 61.08)),
    "SaltPowder": ((0.0273, 0.0325, 0.0320), (0.284, 0.326, 0.341)),
    "SugarPowder": ((2.2e-4, 2.6e-4, 2.7e-4), (0.0126, 0.0311, 0.0501)),
    # water
    "PacificOceanSurfaceWater": ((1.8e-4, 3.2e-4, 2.0e-4), (0.0318, 0.0313, 0.0301)),
    # non-measured convenience media (reference Fog/Smoke constructors,
    # media.jl:1940-1990)
    "Fog": ((0.01, 0.01, 0.01), (0.0001, 0.0001, 0.0001)),
    "Smoke": ((0.08, 0.08, 0.08), (0.01, 0.01, 0.01)),
}

# legacy aliases from earlier repo revisions
_MEDIUM_PRESETS["Milk"] = _MEDIUM_PRESETS["Wholemilk"]


def medium_preset(name: str, scale: float = 1.0, g: float = 0.0) -> HomogeneousMedium:
    """Measured medium constructor (Milk(), Fog(), ... in media.jl:1873-2032)."""
    sigma_s, sigma_a = _MEDIUM_PRESETS[name]
    return HomogeneousMedium(sigma_a=sigma_a, sigma_s=sigma_s, g=g, scale=scale)


def Milk(scale=1.0):
    return medium_preset("Milk", scale, g=0.9)


def Fog(scale=1.0):
    return medium_preset("Fog", scale, g=0.8)


def Smoke(scale=1.0):
    return medium_preset("Smoke", scale, g=0.0)


@dataclass
class BrickGridMedium:
    """Sparse density medium: active 8^3 bricks + a coarse int32 page
    table over the index bbox (the TPU re-architecture of the reference's
    NanoVDBMedium tree walk, nanovdb.jl:315-418 — the root/upper/lower
    descent becomes ONE aligned table gather + one brick gather per voxel).

    table: (tbz, tby, tbx) int32 -> brick id, -1 = background.
    bricks: (NB, 512) float32, voxel order ((z&7)*8+(y&7))*8+(x&7).
    bounds_lo/hi: world AABB of the index bbox (table*8 voxels).
    Memory scales with ACTIVE bricks + table, not the dense extent."""

    table: object
    bricks: object
    bounds_lo: tuple = (0.0, 0.0, 0.0)
    bounds_hi: tuple = (1.0, 1.0, 1.0)
    background: float = 0.0
    sigma_a: tuple = (0.0, 0.0, 0.0)
    sigma_s: tuple = (1.0, 1.0, 1.0)
    le: tuple = (0.0, 0.0, 0.0)
    g: float = 0.0
    scale: float = 1.0


@pytree_dataclass(static=("n_media", "has_grid", "has_brick", "has_deflection",))
class MediumBanks:
    med_type: jnp.ndarray      # (M,) HOMOGENEOUS / GRID / RGBGRID
    sigma_a: jnp.ndarray       # (M, 3) rgb, pre-scaled (per-density for grids)
    sigma_s: jnp.ndarray       # (M, 3)
    le: jnp.ndarray            # (M, 3)
    # precomputed uplift coefficients [c0,c1,c2,scale] for the hot tracking
    # loop (one polynomial eval instead of a trilinear table lookup/event)
    sigma_a_c4: jnp.ndarray    # (M, 4)
    sigma_s_c4: jnp.ndarray    # (M, 4)
    le_c4: jnp.ndarray         # (M, 4)
    g: jnp.ndarray             # (M,)
    # spatial media (zeros for homogeneous entries)
    bounds_lo: jnp.ndarray     # (M, 3)
    bounds_hi: jnp.ndarray     # (M, 3)
    grid_offset: jnp.ndarray   # (M,) into the flat buffers (voxel units)
    grid_res: jnp.ndarray      # (M, 3) (nx, ny, nz)
    density: jnp.ndarray       # (V,) flat scalar density buffer
    rgb_sa: jnp.ndarray        # (Vr, 3) flat RGBGRID sigma_a buffer
    rgb_ss: jnp.ndarray        # (Vr, 3)
    rgb_le: jnp.ndarray        # (Vr, 3)
    rgb_offset: jnp.ndarray    # (M,) into the rgb buffers
    max_density: jnp.ndarray   # (M,) global majorant scale
    # per-cell majorant grids: scale factor on (sigma_a+sigma_s) uplift
    maj: jnp.ndarray           # (M, R, R, R) float32
    defl_strength: jnp.ndarray  # (M,) 0 = straight rays
    defl_center: jnp.ndarray    # (M, 3)
    # sparse brick media (BRICK): page table + brick voxel pool
    brick_table: jnp.ndarray    # (TV,) int32, all media concatenated
    brick_vals: jnp.ndarray     # (NB * 512,) float32
    brick_tab_off: jnp.ndarray  # (M,) into brick_table
    brick_base: jnp.ndarray     # (M,) brick-id offset into the pool
    brick_bg: jnp.ndarray       # (M,) background density
    n_media: int
    has_grid: bool
    has_brick: bool = False
    has_deflection: bool = False


def _build_majorant_cells(d: np.ndarray) -> np.ndarray:
    """Max-pool a (nz, ny, nx) density grid to MAJORANT_RES^3 cells with a
    1-voxel dilation so trilinear interpolation stays bounded
    (media.jl:1123-1543)."""
    r = MAJORANT_RES
    nz, ny, nx = d.shape
    out = np.zeros((r, r, r), np.float32)
    zs = np.linspace(0, nz, r + 1).astype(int)
    ys = np.linspace(0, ny, r + 1).astype(int)
    xs = np.linspace(0, nx, r + 1).astype(int)
    for iz in range(r):
        z0, z1 = max(zs[iz] - 1, 0), min(zs[iz + 1] + 1, nz)
        for iy in range(r):
            y0, y1 = max(ys[iy] - 1, 0), min(ys[iy + 1] + 1, ny)
            for ix in range(r):
                x0, x1 = max(xs[ix] - 1, 0), min(xs[ix + 1] + 1, nx)
                blk = d[z0:z1, y0:y1, x0:x1]
                out[iz, iy, ix] = blk.max() if blk.size else 0.0
    return out


def pack_media(media: list) -> MediumBanks:
    types, sa, ss, le, g = [], [], [], [], []
    defl_s, defl_c = [], []
    blo, bhi, goff, gres, maxd = [], [], [], [], []
    roff = []
    flat = []
    rgb_sa, rgb_ss, rgb_le = [], [], []
    majs = []
    offset = 0
    rgb_offset = 0
    has_grid = False
    has_brick = False
    brick_tabs, brick_pool, brick_tab_off, brick_base, brick_bg = [], [], [], [], []
    brick_tab_cursor = 0
    brick_cursor = 0
    r = MAJORANT_RES
    for m in media:
        d_spec = getattr(m, "deflection", None)
        if d_spec is None:
            defl_s.append(0.0)
            defl_c.append((0.0, 0.0, 0.0))
        else:
            kind, center, strength = d_spec
            assert kind == "gravity", d_spec
            defl_s.append(float(strength))
            defl_c.append(tuple(float(x) for x in center))
        if isinstance(m, HomogeneousMedium):
            types.append(HOMOGENEOUS)
            sa.append(np.asarray(m.sigma_a) * m.scale)
            ss.append(np.asarray(m.sigma_s) * m.scale)
            le.append(np.asarray(m.le))
            g.append(m.g)
            blo.append((0, 0, 0))
            bhi.append((0, 0, 0))
            goff.append(0)
            roff.append(0)
            gres.append((1, 1, 1))
            maxd.append(float(getattr(m, "majorant_scale", 1.0)))
            majs.append(np.ones((r, r, r), np.float32))
            brick_tab_off.append(0)
            brick_base.append(0)
            brick_bg.append(0.0)
        elif isinstance(m, GridMedium):
            has_grid = True
            d = np.asarray(m.density, np.float32)
            assert d.ndim == 3
            nz, ny, nx = d.shape
            types.append(GRID)
            sa.append(np.asarray(m.sigma_a) * m.scale)
            ss.append(np.asarray(m.sigma_s) * m.scale)
            le.append(np.asarray(m.le))
            g.append(m.g)
            blo.append(m.bounds_lo)
            bhi.append(m.bounds_hi)
            goff.append(offset)
            roff.append(0)
            gres.append((nx, ny, nz))
            maxd.append(float(d.max()))
            majs.append(_build_majorant_cells(d))
            flat.append(d.reshape(-1))
            offset += d.size
            brick_tab_off.append(0)
            brick_base.append(0)
            brick_bg.append(0.0)
        elif isinstance(m, RGBGridMedium):
            has_grid = True
            sag = np.asarray(m.sigma_a_grid, np.float32) * m.sigma_a_scale \
                if m.sigma_a_grid is not None else None
            ssg = np.asarray(m.sigma_s_grid, np.float32) * m.sigma_s_scale \
                if m.sigma_s_grid is not None else None
            leg = np.asarray(m.le_grid, np.float32) * m.le_scale \
                if m.le_grid is not None else None
            shape = (sag if sag is not None else ssg).shape[:3]
            nz, ny, nx = shape
            zero = np.zeros(shape + (3,), np.float32)
            sag = sag if sag is not None else zero
            ssg = ssg if ssg is not None else zero
            leg = leg if leg is not None else zero
            types.append(RGBGRID)
            # per-voxel values are absolute; bank sigma carries a unit
            # scale, max-component density drives the majorant
            sa.append((1.0, 1.0, 1.0))
            ss.append((1.0, 1.0, 1.0))
            le.append((0.0, 0.0, 0.0))
            g.append(m.g)
            blo.append(m.bounds_lo)
            bhi.append(m.bounds_hi)
            goff.append(0)
            roff.append(rgb_offset)
            gres.append((nx, ny, nz))
            sig_t = (sag + ssg).max(-1)  # (nz, ny, nx) max over rgb
            maxd.append(float(sig_t.max()) if sig_t.size else 0.0)
            majs.append(_build_majorant_cells(sig_t))
            rgb_sa.append(sag.reshape(-1, 3))
            rgb_ss.append(ssg.reshape(-1, 3))
            rgb_le.append(leg.reshape(-1, 3))
            rgb_offset += nz * ny * nx
            brick_tab_off.append(0)
            brick_base.append(0)
            brick_bg.append(0.0)
        elif isinstance(m, BrickGridMedium):
            has_brick = True
            tab = np.asarray(m.table, np.int32)
            assert tab.ndim == 3
            bricks = np.asarray(m.bricks, np.float32).reshape(-1, 512)
            tbz, tby, tbx = tab.shape
            types.append(BRICK)
            sa.append(np.asarray(m.sigma_a) * m.scale)
            ss.append(np.asarray(m.sigma_s) * m.scale)
            le.append(np.asarray(m.le))
            g.append(m.g)
            blo.append(m.bounds_lo)
            bhi.append(m.bounds_hi)
            goff.append(0)
            roff.append(0)
            gres.append((tbx * BRICK_DIM, tby * BRICK_DIM, tbz * BRICK_DIM))
            brick_tab_off.append(brick_tab_cursor)
            brick_base.append(brick_cursor)
            brick_bg.append(float(m.background))
            brick_tabs.append(tab.reshape(-1))
            brick_pool.append(bricks)
            brick_tab_cursor += tab.size
            brick_cursor += len(bricks)
            # per-cell majorants from brick maxima; _build_majorant_cells'
            # 1-input-unit box dilation is a full BRICK of slack here, which
            # covers trilinear bleed across brick borders
            bmax = bricks.max(axis=1) if len(bricks) else np.zeros(1, np.float32)
            cell = np.where(tab >= 0, bmax[np.maximum(tab, 0)], m.background)
            maxd.append(float(cell.max()) if cell.size else 0.0)
            majs.append(_build_majorant_cells(cell.astype(np.float32)))
        else:
            raise TypeError(f"unknown medium {type(m)}")

    n = len(media)
    if n == 0:
        # single dummy entry keeps shapes static
        return MediumBanks(
            med_type=jnp.zeros((1,), jnp.int32),
            sigma_a=jnp.zeros((1, 3), jnp.float32),
            sigma_s=jnp.zeros((1, 3), jnp.float32),
            le=jnp.zeros((1, 3), jnp.float32),
            g=jnp.zeros((1,), jnp.float32),
            bounds_lo=jnp.zeros((1, 3), jnp.float32),
            bounds_hi=jnp.zeros((1, 3), jnp.float32),
            grid_offset=jnp.zeros((1,), jnp.int32),
            grid_res=jnp.ones((1, 3), jnp.int32),
            density=jnp.zeros((1,), jnp.float32),
            sigma_a_c4=jnp.zeros((1, 4), jnp.float32).at[:, 2].set(-1e10),
            sigma_s_c4=jnp.zeros((1, 4), jnp.float32).at[:, 2].set(-1e10),
            le_c4=jnp.zeros((1, 4), jnp.float32).at[:, 2].set(-1e10),
            rgb_sa=jnp.zeros((1, 3), jnp.float32),
            rgb_ss=jnp.zeros((1, 3), jnp.float32),
            rgb_le=jnp.zeros((1, 3), jnp.float32),
            rgb_offset=jnp.zeros((1,), jnp.int32),
            max_density=jnp.ones((1,), jnp.float32),
            maj=jnp.ones((1, r, r, r), jnp.float32),
            defl_strength=jnp.zeros((1,), jnp.float32),
            defl_center=jnp.zeros((1, 3), jnp.float32),
            brick_table=jnp.full((1,), -1, jnp.int32),
            brick_vals=jnp.zeros((1,), jnp.float32),
            brick_tab_off=jnp.zeros((1,), jnp.int32),
            brick_base=jnp.zeros((1,), jnp.int32),
            brick_bg=jnp.zeros((1,), jnp.float32),
            n_media=0,
            has_grid=False,
        )

    from ..spectral.rgb2spec import srgb_table, unbounded_coeff4

    table = srgb_table()
    sa_np = jnp.asarray(np.stack(sa), jnp.float32)
    ss_np = jnp.asarray(np.stack(ss), jnp.float32)
    le_np = jnp.asarray(np.stack(le), jnp.float32)
    return MediumBanks(
        med_type=jnp.asarray(types, jnp.int32),
        sigma_a=sa_np,
        sigma_s=ss_np,
        le=le_np,
        sigma_a_c4=unbounded_coeff4(table, sa_np),
        sigma_s_c4=unbounded_coeff4(table, ss_np),
        le_c4=unbounded_coeff4(table, le_np),
        g=jnp.asarray(g, jnp.float32),
        bounds_lo=jnp.asarray(np.asarray(blo, np.float32)),
        bounds_hi=jnp.asarray(np.asarray(bhi, np.float32)),
        grid_offset=jnp.asarray(goff, jnp.int32),
        grid_res=jnp.asarray(np.asarray(gres, np.int32)),
        density=jnp.asarray(np.concatenate(flat) if flat else np.zeros(1, np.float32)),
        rgb_sa=jnp.asarray(
            np.concatenate(rgb_sa) if rgb_sa else np.zeros((1, 3), np.float32)
        ),
        rgb_ss=jnp.asarray(
            np.concatenate(rgb_ss) if rgb_ss else np.zeros((1, 3), np.float32)
        ),
        rgb_le=jnp.asarray(
            np.concatenate(rgb_le) if rgb_le else np.zeros((1, 3), np.float32)
        ),
        rgb_offset=jnp.asarray(roff, jnp.int32),
        max_density=jnp.asarray(maxd, jnp.float32),
        maj=jnp.asarray(np.stack(majs)),
        defl_strength=jnp.asarray(defl_s, jnp.float32),
        defl_center=jnp.asarray(np.asarray(defl_c, np.float32)),
        brick_table=jnp.asarray(
            np.concatenate(brick_tabs) if brick_tabs else np.full(1, -1, np.int32)
        ),
        brick_vals=jnp.asarray(
            np.concatenate(brick_pool).reshape(-1) if brick_pool
            else np.zeros(1, np.float32)
        ),
        brick_tab_off=jnp.asarray(brick_tab_off, jnp.int32),
        brick_base=jnp.asarray(brick_base, jnp.int32),
        brick_bg=jnp.asarray(brick_bg, jnp.float32),
        n_media=n,
        has_grid=has_grid,
        has_brick=has_brick,
        has_deflection=any(s != 0.0 for s in defl_s),
    )
