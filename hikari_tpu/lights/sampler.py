"""Light sampling strategies: uniform and power-weighted (alias table).

Parity with /root/reference/src/lights/light-sampler.jl: Walker AliasTable
(:29-170), UniformLightSampler (:186), PowerLightSampler (:230-278). The
reference estimates powers with a GPU kernel then builds the alias table on
CPU and uploads; here powers are computed directly at scene build (host
numpy) and the table ships as three flat device arrays. Sampling is one
gather + one compare per lane; the pmf array feeds every MIS weight.

The BVH light sampler (bvh-light-sampler.jl) builds on the same flat-index
convention and lives in bvh_sampler.py.
"""

from __future__ import annotations

import numpy as np

TWO_PI = 2.0 * np.pi
FOUR_PI = 4.0 * np.pi


def build_alias_table(weights: np.ndarray):
    """Walker/Vose alias table (light-sampler.jl:29-170).

    Returns (pmf, q, alias): pmf[i] = normalized probability, sample by
    i = floor(u*n), take alias[i] when frac(u*n) >= q[i].
    """
    w = np.asarray(weights, np.float64)
    n = len(w)
    total = w.sum()
    if n == 0:
        return (np.zeros(0, np.float32),) * 3
    if total <= 0.0:
        pmf = np.full(n, 1.0 / n)
    else:
        pmf = w / total
    q = pmf * n
    alias = np.arange(n, dtype=np.int32)
    small = [i for i in range(n) if q[i] < 1.0]
    large = [i for i in range(n) if q[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        alias[s] = l
        q[l] = q[l] - (1.0 - q[s])
        (large if q[l] >= 1.0 else small).append(l)
    # leftovers are 1 up to roundoff
    for i in small + large:
        q[i] = 1.0
    return pmf.astype(np.float32), q.astype(np.float32), alias


def light_powers(
    flat_types: np.ndarray,
    flat_idx: np.ndarray,
    *,
    point_i=None,
    spot_i=None,
    spot_cos_total=None,
    spot_cos_falloff=None,
    dist_l=None,
    area_le=None,
    area_area=None,
    area_two_sided=None,
    env_mean_lum: float = 0.0,
    env_scale: float = 1.0,
    scene_radius: float = 1.0,
) -> np.ndarray:
    """Total emitted power Phi per flat light (pbrt-v4 conventions, the
    reference's estimate_powers_kernel!, physical-wavefront/lights.jl).

    Relative magnitudes are all that matters for sampling weights."""
    from .types import AREA, DISTANT, ENV, POINT, SPOT

    n = len(flat_types)
    phi = np.zeros(n, np.float64)
    r2 = float(scene_radius) ** 2
    for k in range(n):
        t, i = int(flat_types[k]), int(flat_idx[k])
        if t == POINT:
            phi[k] = FOUR_PI * float(np.mean(point_i[i]))
        elif t == SPOT:
            cf = float(spot_cos_falloff[i])
            ct = float(spot_cos_total[i])
            phi[k] = TWO_PI * float(np.mean(spot_i[i])) * (
                (1.0 - cf) + (cf - ct) * 0.5
            )
        elif t == DISTANT:
            phi[k] = np.pi * r2 * float(np.mean(dist_l[i]))
        elif t == AREA:
            two = 2.0 if bool(area_two_sided[i]) else 1.0
            phi[k] = np.pi * two * float(area_area[i]) * float(np.mean(area_le[i]))
        elif t == ENV:
            phi[k] = FOUR_PI * np.pi * r2 * env_mean_lum * env_scale
        else:
            phi[k] = 0.0
    return phi
