"""Piecewise-linear spectra and blackbody emission.

Parity with /root/reference/src/spectral/piecewise-linear.jl and the
measured-metal spectra of metal-spectra.jl (data loaded from
hikari_tpu/data/metal_spectra.npz).
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..core.pytree import pytree_dataclass

_DATA = Path(__file__).resolve().parent.parent / "data"


@pytree_dataclass
class PiecewiseLinearSpectrum:
    lam: jnp.ndarray  # (K,) knot wavelengths, ascending
    val: jnp.ndarray  # (K,) values

    def __call__(self, lam: jnp.ndarray) -> jnp.ndarray:
        return jnp.interp(lam, self.lam, self.val)


@functools.cache
def _metal_data():
    return dict(np.load(_DATA / "metal_spectra.npz"))


def metal_spectrum(name: str) -> PiecewiseLinearSpectrum:
    """Measured eta/k spectra, e.g. metal_spectrum('AU_ETA').

    Available: {AG,AL,AU,CU,CUZN} x {ETA,K}.
    """
    d = _metal_data()
    return PiecewiseLinearSpectrum(
        jnp.asarray(d[f"{name}_lam"]), jnp.asarray(d[f"{name}_val"])
    )


def metal_eta_k(metal: str):
    """(eta, k) PiecewiseLinearSpectrum pair for a metal key like 'AU'."""
    return metal_spectrum(f"{metal}_ETA"), metal_spectrum(f"{metal}_K")


def blackbody(lam_nm: jnp.ndarray, temp_k) -> jnp.ndarray:
    """Planck's law, W/(m^2 sr m), at wavelengths in nm."""
    c = 299792458.0
    h = 6.62606957e-34
    kb = 1.3806488e-23
    lam = jnp.asarray(lam_nm, jnp.float32) * 1e-9
    t = jnp.asarray(temp_k, jnp.float32)
    le = (2.0 * h * c * c) / (
        jnp.power(lam, 5.0) * (jnp.exp((h * c) / (lam * kb * t)) - 1.0)
    )
    return le


def blackbody_normalized(lam_nm: jnp.ndarray, temp_k) -> jnp.ndarray:
    """Blackbody normalized to peak 1 (Wien displacement), pbrt-style."""
    t = jnp.asarray(temp_k, jnp.float32)
    lam_max_nm = 2.8977721e-3 / t * 1e9
    return blackbody(lam_nm, t) / blackbody(lam_max_nm, t)
