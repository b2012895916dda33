"""CIE colorimetry: XYZ matching functions, D65, XYZ<->sRGB.

Parity with /root/reference/src/spectral/color.jl. The CIE 1931 tables and
the D65 illuminant are published standard datasets, loaded from
hikari_tpu/data/ (extracted by tools/extract_tables.py).
"""

from __future__ import annotations

import functools
from pathlib import Path

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

_DATA = Path(__file__).resolve().parent.parent / "data"

CIE_LAMBDA_MIN = 360.0
CIE_LAMBDA_MAX = 830.0
N_CIE_SAMPLES = 471
CIE_Y_INTEGRAL = 106.856895
# photometric normalization of D65 (color.jl:16)
D65_PHOTOMETRIC = 10567.0


@functools.cache
def cie_tables() -> np.ndarray:
    """(3, 471) float32 xbar/ybar/zbar at 1nm from 360 to 830.
    Cached as numpy so first use inside a jit trace cannot leak a tracer."""
    z = np.load(_DATA / "cie_xyz.npz")
    return np.stack([z["x"], z["y"], z["z"]]).astype(np.float32)


@functools.cache
def d65_table():
    """D65 illuminant resampled to 1nm over [360, 830], normalized so that
    it integrates (against ybar) to CIE_Y_INTEGRAL — i.e. photometrically
    normalized like pbrt's ``* CIE_Y_integral / D65 photometric`` scaling.
    Returns (raw_1nm, normalized_1nm)."""
    z = np.load(_DATA / "illuminant_d65.npz")
    lam_grid = np.arange(360, 831, dtype=np.float64)
    raw = np.interp(lam_grid, z["lam"].astype(np.float64), z["val"].astype(np.float64))
    return raw.astype(np.float32)


def _sample_table(table, lam: jnp.ndarray) -> jnp.ndarray:
    """Linear interp of a 1nm [360,830] table at wavelengths lam (...,)."""
    table = jnp.asarray(table)  # tables may arrive as numpy constants
    x = jnp.clip(lam - CIE_LAMBDA_MIN, 0.0, N_CIE_SAMPLES - 1.001)
    i0 = jnp.floor(x).astype(jnp.int32)
    f = x - i0.astype(jnp.float32)
    v0 = table[i0]
    v1 = table[jnp.minimum(i0 + 1, N_CIE_SAMPLES - 1)]
    out = v0 * (1.0 - f) + v1 * f
    return jnp.where((lam >= CIE_LAMBDA_MIN) & (lam <= CIE_LAMBDA_MAX), out, 0.0)


@lru_cache(maxsize=1)
def _cie_fits():
    """Piecewise-cubic fits of xbar/ybar/zbar (32 segments, <0.35% error)
    and D65 (64 segments) — per-lane table gathers run on the TPU scalar
    core at ~1 Gelem/s, so the hot loop evaluates these fits instead.
    Cached as numpy (host constants) so no tracer ever leaks into the
    cache."""
    from .piecewise_poly import fit_piecewise_poly

    t = np.asarray(cie_tables())
    return (
        np.stack([fit_piecewise_poly(t[i], 32) for i in range(3)]),
        fit_piecewise_poly(np.asarray(d65_table()), 64),
    )


def sample_cie_xyz(lam: jnp.ndarray) -> jnp.ndarray:
    """xbar/ybar/zbar at wavelengths lam (...,4) -> (...,4,3)."""
    from .piecewise_poly import piecewise_eval

    xyz, _ = _cie_fits()
    ok = (lam >= CIE_LAMBDA_MIN) & (lam <= CIE_LAMBDA_MAX)
    out = jnp.stack([piecewise_eval(xyz[i], lam) for i in range(3)], axis=-1)
    return jnp.where(ok[..., None], out, 0.0)


def sample_d65(lam: jnp.ndarray) -> jnp.ndarray:
    """D65 values (~100 at 560nm), matching uplift.jl:463-473; piecewise
    fit of the 1nm table (the envelope is exact, the 1nm spikes smooth)."""
    from .piecewise_poly import piecewise_eval

    _, d65 = _cie_fits()
    ok = (lam >= CIE_LAMBDA_MIN) & (lam <= CIE_LAMBDA_MAX)
    return jnp.where(ok, piecewise_eval(d65, lam), 0.0)


def spectral_to_xyz(L: jnp.ndarray, lam: jnp.ndarray, pdf: jnp.ndarray) -> jnp.ndarray:
    """Monte-Carlo estimate of XYZ from hero samples (color.jl:415-439).

    Matches the reference: averages CMF*L/pdf over the 4 hero wavelengths and
    does NOT divide by CIE_Y_INTEGRAL (pbrt RGBFilm behavior).
    L, lam, pdf: (..., 4). Returns (..., 3).
    """
    cmf = sample_cie_xyz(lam)  # (...,4,3)
    w = jnp.where(pdf != 0.0, 1.0 / jnp.where(pdf == 0.0, 1.0, pdf), 0.0)
    return jnp.mean(cmf * (L * w)[..., None], axis=-2)


# Standard D65 sRGB <-> XYZ (color.jl:571-583, 634-640)
_SRGB_FROM_XYZ = jnp.array(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ],
    jnp.float32,
)

_XYZ_FROM_SRGB = jnp.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ],
    jnp.float32,
)

# sRGB_from_XYZ ∘ Bradford(E→D65): for spectral rendering with equal-energy
# wavelength weighting (color.jl:589-607); maps XYZ(1,1,1) → RGB(1,1,1).
_SRGB_FROM_XYZ_E = jnp.array(
    [
        [3.1462066, -1.666208, -0.48011315],
        [-0.99555516, 1.9558191, 0.03977213],
        [0.063599624, -0.21459788, 1.1509721],
    ],
    jnp.float32,
)


def xyz_to_linear_srgb(xyz: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("ij,...j->...i", _SRGB_FROM_XYZ, xyz)


def xyz_e_to_linear_srgb(xyz: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("ij,...j->...i", _SRGB_FROM_XYZ_E, xyz)


def linear_srgb_to_xyz(rgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("ij,...j->...i", _XYZ_FROM_SRGB, rgb)


def linear_to_srgb_gamma(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.maximum(c, 0.0)
    return jnp.where(
        c <= 0.0031308, 12.92 * c, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055
    )


def srgb_gamma_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4)
    )


# --- Bradford chromatic adaptation (color.jl:448-553) ------------------------

_LMS_FROM_XYZ = jnp.array(
    [
        [0.8951, 0.2664, -0.1614],
        [-0.7502, 1.7135, 0.0367],
        [0.0389, -0.0685, 1.0296],
    ],
    jnp.float32,
)

_XYZ_FROM_LMS = jnp.array(
    [
        [0.9869929, -0.1470543, 0.1599627],
        [0.4323053, 0.5183603, 0.0492912],
        [-0.0085287, 0.0400428, 0.9684867],
    ],
    jnp.float32,
)

D65_WHITE_XY = (0.31272, 0.32903)


def xy_to_xyz(x, y):
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    return jnp.stack([x / y, jnp.ones_like(x), (1.0 - x - y) / y], axis=-1)


def white_balance_matrix(src_white_xyz, dst_white_xyz) -> jnp.ndarray:
    """Bradford adaptation matrix mapping src white to dst white."""
    src_lms = _LMS_FROM_XYZ @ src_white_xyz
    dst_lms = _LMS_FROM_XYZ @ dst_white_xyz
    return _XYZ_FROM_LMS @ jnp.diag(dst_lms / src_lms) @ _LMS_FROM_XYZ


def planckian_xy(temp):
    """CIE xy of a blackbody radiator, 1667K-25000K (color.jl:470-520)."""
    t = jnp.asarray(temp, jnp.float32)
    t2, t3 = t * t, t * t * t
    x = jnp.where(
        t < 4000.0,
        -0.2661239e9 / t3 - 0.2343589e6 / t2 + 0.8776956e3 / t + 0.179910,
        -3.0258469e9 / t3 + 2.1070379e6 / t2 + 0.2226347e3 / t + 0.240390,
    )
    x2, x3 = x * x, x * x * x
    y = jnp.where(
        t < 2222.0,
        -1.1063814 * x3 - 1.34811020 * x2 + 2.18555832 * x - 0.20219683,
        jnp.where(
            t < 4000.0,
            -0.9549476 * x3 - 1.37418593 * x2 + 2.09137015 * x - 0.16748867,
            3.0817580 * x3 - 5.87338670 * x2 + 3.75112997 * x - 0.37001483,
        ),
    )
    return x, y


def compute_white_balance_matrix(src_temp) -> jnp.ndarray:
    """White-balance matrix from a source color temperature to D65
    (color.jl:522-553)."""
    sx, sy = planckian_xy(jnp.asarray(src_temp, jnp.float32))
    src = xy_to_xyz(sx, sy)
    dst = xy_to_xyz(*D65_WHITE_XY)
    return white_balance_matrix(src, dst)
