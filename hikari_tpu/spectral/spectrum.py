"""Hero-wavelength sampled spectra.

A sampled spectrum is simply a ``(..., 4)`` float32 array (one value per hero
wavelength); ``SampledWavelengths`` carries the wavelengths and their PDFs.
Parity with /root/reference/src/spectral/spectral.jl (SampledSpectrum{4},
SampledWavelengths{4}, uniform / stratified / visible-importance sampling,
terminate_secondary_wavelengths).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.pytree import pytree_dataclass

N_SPECTRUM_SAMPLES = 4

# hero-sampling range used by the uniform/stratified samplers
# (/root/reference/src/spectral/spectral.jl:129-131)
LAMBDA_MIN = 400.0
LAMBDA_MAX = 780.0
LAMBDA_RANGE = LAMBDA_MAX - LAMBDA_MIN

# extended visible range for pbrt-style importance sampling (spectral.jl:181-183)
LAMBDA_MIN_VISIBLE = 360.0
LAMBDA_MAX_VISIBLE = 830.0


@pytree_dataclass
class SampledWavelengths:
    lam: jnp.ndarray  # (..., 4) wavelengths in nm
    pdf: jnp.ndarray  # (..., 4) per-wavelength sampling PDF


def sample_wavelengths_uniform(u: jnp.ndarray) -> SampledWavelengths:
    """Hero-wavelength sampling with stratified offsets; u in [0,1)."""
    u = jnp.asarray(u, jnp.float32)
    lam1 = LAMBDA_MIN + u * LAMBDA_RANGE
    offs = jnp.arange(4, dtype=jnp.float32) * (LAMBDA_RANGE / 4.0)
    lam = lam1[..., None] + offs
    lam = jnp.where(lam > LAMBDA_MAX, lam - LAMBDA_RANGE, lam)
    pdf = jnp.full_like(lam, 1.0 / LAMBDA_RANGE)
    return SampledWavelengths(lam, pdf)


def sample_wavelengths_stratified(u4: jnp.ndarray) -> SampledWavelengths:
    """4 wavelengths, one per quarter-stratum of [LAMBDA_MIN, LAMBDA_MAX]
    (spectral.jl:162-174). u4 is (..., 4) independent uniforms."""
    u4 = jnp.asarray(u4, jnp.float32)
    stratum = LAMBDA_RANGE / 4.0
    starts = LAMBDA_MIN + jnp.arange(4, dtype=jnp.float32) * stratum
    lam = starts + u4 * stratum
    pdf = jnp.full_like(lam, 1.0 / LAMBDA_RANGE)
    return SampledWavelengths(lam, pdf)


def visible_wavelengths_pdf(lam: jnp.ndarray) -> jnp.ndarray:
    """sech^2 PDF centered at 538 nm (spectral.jl:192-201)."""
    x = 0.0072 * (lam - 538.0)
    pdf = 0.0039398042 / jnp.square(jnp.cosh(x))
    in_range = (lam >= LAMBDA_MIN_VISIBLE) & (lam <= LAMBDA_MAX_VISIBLE)
    return jnp.where(in_range, pdf, 0.0)


def sample_visible_wavelength(u: jnp.ndarray) -> jnp.ndarray:
    """Inverse CDF of the sech^2 distribution (spectral.jl:210-213)."""
    return 538.0 - 138.888889 * jnp.arctanh(0.85691062 - 1.82750197 * u)


def sample_wavelengths_visible(u: jnp.ndarray) -> SampledWavelengths:
    """4 hero wavelengths by visible importance sampling (spectral.jl:221-249)."""
    u = jnp.asarray(u, jnp.float32)
    offs = jnp.arange(4, dtype=jnp.float32) * 0.25
    ui = u[..., None] + offs
    ui = jnp.where(ui >= 1.0, ui - 1.0, ui)
    lam = sample_visible_wavelength(ui)
    pdf = visible_wavelengths_pdf(lam)
    return SampledWavelengths(lam, pdf)


def terminate_secondary(wl: SampledWavelengths) -> SampledWavelengths:
    """Zero PDFs of non-hero wavelengths after a dispersive event
    (spectral.jl:258-262)."""
    mask = jnp.arange(4) == 0
    return SampledWavelengths(wl.lam, jnp.where(mask, wl.pdf, 0.0))


def secondary_terminated(wl: SampledWavelengths) -> jnp.ndarray:
    return jnp.all(wl.pdf[..., 1:] == 0.0, axis=-1)


# --- sampled-spectrum helpers (arrays of shape (..., 4)) ---------------------


def average(s: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(s, axis=-1)


def safe_div(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(b != 0.0, a / jnp.where(b == 0.0, 1.0, b), 0.0)


def clamp_zero(s: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(s, 0.0)


def max_component(s: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(s, axis=-1)


def is_black(s: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(s == 0.0, axis=-1)
