"""Participating media: host definitions, device banks, presets.

Parity with /root/reference/src/integrators/volpath/media.jl:
HomogeneousMedium, GridMedium (density grid + majorant grid), HG phase
function, measured medium presets. RGBGridMedium / NanoVDB follow.

Device layout: all grid media share one flat density buffer and one flat
majorant buffer with per-medium (offset, resolution, bounds) — uniform
static shapes regardless of how many grids a scene holds, with per-lane
gathers indexed by medium id.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..core.pytree import pytree_dataclass

HOMOGENEOUS = 0
GRID = 1
N_MEDIUM_TYPES = 2

MAJORANT_RES = 16  # majorant grid resolution per axis (media.jl:1123-1543)


@dataclass
class HomogeneousMedium:
    """Uniform sigma_a/sigma_s RGB, HG asymmetry g (media.jl:762-860)."""

    sigma_a: tuple = (0.01, 0.01, 0.01)
    sigma_s: tuple = (1.0, 1.0, 1.0)
    le: tuple = (0.0, 0.0, 0.0)
    g: float = 0.0
    scale: float = 1.0


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


# Measured scattering media presets (sigma_s, sigma_a per mm, from the
# pbrt measured-media dataset; reference copy media.jl:1769-1855)
_MEDIUM_PRESETS = {
    "Milk": ((2.55, 3.21, 3.77), (0.0011, 0.0024, 0.014)),
    "Skimmilk": ((0.70, 1.22, 1.90), (0.0014, 0.0025, 0.0142)),
    "Espresso": ((0.72378, 0.84557, 1.0247), (4.7984, 6.5751, 8.8493)),
    "Coffee": ((0.2707, 0.3828, 0.5363), (0.1669, 0.2287, 0.3078)),
    "Wine_red": ((0.0053, 0.0065, 0.0076), (0.7586, 1.9222, 10.588)),
    "Wine_white": ((0.0031, 0.0047, 0.0062), (0.1241, 0.2727, 0.7527)),
    "Apple_juice": ((0.1215, 0.2101, 0.4407), (0.0141, 0.0288, 0.1238)),
    "Skin1": ((0.74, 0.88, 1.01), (0.032, 0.17, 0.48)),
    "Fog": ((0.01, 0.01, 0.01), (0.0001, 0.0001, 0.0001)),
    "Smoke": ((0.08, 0.08, 0.08), (0.01, 0.01, 0.01)),
}


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


@pytree_dataclass(static=("n_media", "has_grid"))
class MediumBanks:
    med_type: jnp.ndarray      # (M,) HOMOGENEOUS / GRID
    sigma_a: jnp.ndarray       # (M, 3) rgb, pre-scaled
    sigma_s: jnp.ndarray       # (M, 3)
    le: jnp.ndarray            # (M, 3)
    g: jnp.ndarray             # (M,)
    # grid media (zeros for homogeneous entries)
    bounds_lo: jnp.ndarray     # (M, 3)
    bounds_hi: jnp.ndarray     # (M, 3)
    grid_offset: jnp.ndarray   # (M,) into the flat density buffer
    grid_res: jnp.ndarray      # (M, 3) (nx, ny, nz)
    density: jnp.ndarray       # (sum voxels,) flat buffer
    max_density: jnp.ndarray   # (M,)
    n_media: int
    has_grid: bool


def pack_media(media: list) -> MediumBanks:
    types, sa, ss, le, g = [], [], [], [], []
    blo, bhi, goff, gres, maxd = [], [], [], [], []
    flat = []
    offset = 0
    has_grid = False
    for m in media:
        if isinstance(m, HomogeneousMedium):
            types.append(HOMOGENEOUS)
            sa.append(np.asarray(m.sigma_a) * m.scale)
            ss.append(np.asarray(m.sigma_s) * m.scale)
            le.append(np.asarray(m.le))
            g.append(m.g)
            blo.append((0, 0, 0))
            bhi.append((0, 0, 0))
            goff.append(0)
            gres.append((1, 1, 1))
            maxd.append(1.0)
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
            gres.append((nx, ny, nz))
            maxd.append(float(d.max()))
            flat.append(d.reshape(-1))
            offset += d.size
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
            max_density=jnp.ones((1,), jnp.float32),
            n_media=0,
            has_grid=False,
        )

    return MediumBanks(
        med_type=jnp.asarray(types, jnp.int32),
        sigma_a=jnp.asarray(np.stack(sa), jnp.float32),
        sigma_s=jnp.asarray(np.stack(ss), jnp.float32),
        le=jnp.asarray(np.stack(le), jnp.float32),
        g=jnp.asarray(g, jnp.float32),
        bounds_lo=jnp.asarray(np.asarray(blo, np.float32)),
        bounds_hi=jnp.asarray(np.asarray(bhi, np.float32)),
        grid_offset=jnp.asarray(goff, jnp.int32),
        grid_res=jnp.asarray(np.asarray(gres, np.int32)),
        density=jnp.asarray(np.concatenate(flat) if flat else np.zeros(1, np.float32)),
        max_density=jnp.asarray(maxd, jnp.float32),
        n_media=n,
        has_grid=has_grid,
    )
