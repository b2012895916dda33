"""Edge-avoiding a-trous wavelet denoiser (SVGF-style).

Parity with /root/reference/src/denoise.jl: DenoiseConfig{iterations,
sigma_color/normal/depth, use_variance}, luminance-variance estimation, 5x5
B3-spline kernel with albedo demodulation, dilated 2^i per iteration. The
reference runs KA kernels; here each pass is one fused XLA stencil (25
static taps of pad+slice), which XLA vectorizes without any kernel code.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

_B3 = jnp.asarray([1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16])


@dataclass(frozen=True)
class DenoiseConfig:
    iterations: int = 4
    sigma_color: float = 4.0
    sigma_normal: float = 128.0
    sigma_depth: float = 1.0
    use_variance: bool = True
    demodulate_albedo: bool = True


def _shift2d(img, dy, dx):
    """Shift with edge clamp; img (H, W, C) or (H, W)."""
    h, w = img.shape[:2]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))] + [
        (0, 0)
    ] * (img.ndim - 2)
    p = jnp.pad(img, pad, mode="edge")
    return p[max(-dy, 0):max(-dy, 0) + h, max(-dx, 0):max(-dx, 0) + w]


def _luminance(rgb):
    return 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]


def estimate_variance(color):
    """Local 3x3 luminance variance (denoise.jl variance estimation)."""
    lum = _luminance(color)
    s = jnp.zeros_like(lum)
    s2 = jnp.zeros_like(lum)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            v = _shift2d(lum, dy, dx)
            s = s + v
            s2 = s2 + v * v
    mean = s / 9.0
    return jnp.maximum(s2 / 9.0 - mean * mean, 0.0)


def atrous_pass(color, variance, normal, depth, step: int, cfg: DenoiseConfig):
    """One edge-avoiding a-trous pass at dilation `step`."""
    lum_c = _luminance(color)
    acc = jnp.zeros_like(color)
    acc_v = jnp.zeros_like(lum_c)
    wsum = jnp.zeros_like(lum_c)
    sig_c2 = cfg.sigma_color ** 2
    eps = 1e-6
    var_term = jnp.sqrt(variance + eps) if cfg.use_variance else 1.0

    for iy in range(5):
        for ix in range(5):
            dy = (iy - 2) * step
            dx = (ix - 2) * step
            k = float(_B3[iy] * _B3[ix])
            c_q = _shift2d(color, dy, dx)
            v_q = _shift2d(variance, dy, dx)
            n_q = _shift2d(normal, dy, dx)
            z_q = _shift2d(depth, dy, dx)

            # color weight (variance-normalized luminance difference)
            dl = jnp.abs(_luminance(c_q) - lum_c)
            w_c = jnp.exp(-dl / (sig_c2 * var_term + eps))
            # normal weight; background pixels (no hit -> zero normal) blend
            # only with other background pixels, never vanish to zero weight
            ndot = jnp.maximum(jnp.sum(n_q * normal, -1), 0.0)
            bg_c = jnp.sum(normal * normal, -1) < 1e-6
            bg_q = jnp.sum(n_q * n_q, -1) < 1e-6
            w_n = jnp.where(
                bg_c | bg_q,
                (bg_c & bg_q).astype(ndot.dtype),
                ndot ** cfg.sigma_normal,
            )
            # depth weight
            dz = jnp.abs(z_q - depth)
            w_z = jnp.exp(-dz / (cfg.sigma_depth * (abs(dy) + abs(dx) + eps)))

            w = k * w_c * w_n * w_z
            acc = acc + c_q * w[..., None]
            acc_v = acc_v + v_q * w * w
            wsum = wsum + w

    out = acc / jnp.maximum(wsum, eps)[..., None]
    out_v = acc_v / jnp.maximum(wsum * wsum, eps)
    return out, out_v


def denoise(
    color, albedo, normal, depth, cfg: DenoiseConfig = DenoiseConfig()
):
    """Full denoise (denoise!, denoise.jl:301-384). All inputs (H, W, C) /
    (H, W) linear-RGB images; returns the filtered color."""
    eps = 1e-3
    if cfg.demodulate_albedo:
        work = color / jnp.maximum(albedo, eps)
    else:
        work = color
    var = estimate_variance(work) if cfg.use_variance else jnp.zeros(color.shape[:2])
    for i in range(cfg.iterations):
        work, var = atrous_pass(work, var, normal, depth, 1 << i, cfg)
    if cfg.demodulate_albedo:
        work = work * jnp.maximum(albedo, eps)
    return work
