"""sRGB -> spectrum table generator (vectorized JAX Gauss-Newton).

A from-scratch, TPU-friendly re-implementation of pbrt-v4's rgb2spec_opt
pipeline (the reference ports it at
/root/reference/src/spectral/rgb2spec_gen.jl; its cached binary table is a
missing blob, so we must regenerate). Instead of the reference's per-cell
scalar Gauss-Newton with threads, all 3*res^2 grid cells are optimized as one
batched lax.scan over the z (max-component-scale) axis with warm starts, with
the 3x3 Newton system built by forward-mode autodiff — thousands of
independent solves per step, fully vectorized.

Outputs hikari_tpu/data/srgb_spectrum_table.npz with
  res: (), scale: (res,), coeffs: (3, res, res, res, 3) float32
in the exact layout rgb2spec.RGBToSpectrumTable expects.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

_DATA = Path(__file__).resolve().parent.parent / "data"

CIE_LAMBDA_MIN = 360.0
CIE_LAMBDA_MAX = 830.0

XYZ_TO_SRGB = np.array(
    [
        [3.240479, -1.537150, -0.498535],
        [-0.969256, 1.875991, 0.041556],
        [0.055648, -0.204043, 1.057311],
    ]
)
SRGB_TO_XYZ = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ]
)


def _init_tables():
    """Simpson-3/8 integration weights against CMF * D65 (rgb2spec_gen.jl:171-212)."""
    cie = np.load(_DATA / "cie_xyz.npz")
    d65 = np.load(_DATA / "illuminant_d65.npz")
    n_fine = 94 * 3 + 1
    h = (CIE_LAMBDA_MAX - CIE_LAMBDA_MIN) / (n_fine - 1)
    lam = CIE_LAMBDA_MIN + np.arange(n_fine) * h

    grid = np.arange(360, 831, dtype=np.float64)
    xyz = np.stack(
        [np.interp(lam, grid, cie[k].astype(np.float64)) for k in ("x", "y", "z")]
    )  # (3, n)
    illum = np.interp(lam, d65["lam"].astype(np.float64), d65["val"].astype(np.float64))

    w = np.full(n_fine, 3.0 / 8.0 * h)
    idx = np.arange(n_fine)
    inner = (idx != 0) & (idx != n_fine - 1)
    w = np.where(inner & ((idx - 2) % 3 == 2), w * 2.0, np.where(inner, w * 3.0, w))

    rgb_weights = XYZ_TO_SRGB @ (xyz * illum * w)  # (3, n)
    xyz_whitepoint = (xyz * illum * w).sum(axis=1)  # (3,)
    # normalize so the whitepoint has unit luminance (the reference bakes this
    # into CIE_D65 via CIE_D65_NORM)
    norm = xyz_whitepoint[1]
    return lam, rgb_weights / norm, xyz_whitepoint / norm


def generate_table(res: int = 64, max_iter: int = 15, verbose: bool = True):
    import jax

    # float64 Gauss-Newton needs the CPU backend (TPUs have no f64)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    lam, rgb_weights, whitepoint = _init_tables()
    lam_norm = jnp.asarray((lam - CIE_LAMBDA_MIN) / (CIE_LAMBDA_MAX - CIE_LAMBDA_MIN))
    rgb_w = jnp.asarray(rgb_weights)  # (3, n)
    wp = jnp.asarray(whitepoint)
    srgb_to_xyz = jnp.asarray(SRGB_TO_XYZ)

    def rgb_to_lab(rgb):
        xyz = srgb_to_xyz @ rgb / wp

        def f(t):
            d = 6.0 / 29.0
            return jnp.where(t > d**3, jnp.cbrt(t), t / (3 * d * d) + 4.0 / 29.0)

        fx, fy, fz = f(xyz[0]), f(xyz[1]), f(xyz[2])
        return jnp.stack([116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)])

    def residual(coeffs, target_rgb):
        x = coeffs[0] * lam_norm**2 + coeffs[1] * lam_norm + coeffs[2]
        s = 0.5 + x / (2.0 * jnp.sqrt(1.0 + x * x))
        out_rgb = rgb_w @ s
        return rgb_to_lab(target_rgb) - rgb_to_lab(out_rgb)

    jac_fn = jax.jacfwd(residual, argnums=0)

    def gn_step(coeffs, target_rgb):
        r = residual(coeffs, target_rgb)
        J = jac_fn(coeffs, target_rgb)
        step = jnp.linalg.solve(J, r)
        new = coeffs - step
        m = jnp.max(jnp.abs(new))
        new = jnp.where(m > 200.0, new * (200.0 / m), new)
        ok = jnp.all(jnp.isfinite(new))
        return jnp.where(ok, new, coeffs)

    def gauss_newton(coeffs, target_rgb):
        def body(_, c):
            return gn_step(c, target_rgb)

        return jax.lax.fori_loop(0, max_iter, body, coeffs)

    # scale axis: double smoothstep (rgb2spec_gen.jl:336)
    def smoothstep(x):
        return x * x * (3.0 - 2.0 * x)

    k01 = np.arange(res) / (res - 1)
    scale = smoothstep(smoothstep(k01))

    # grid of (l, j, i) cells; each cell scans sequentially over z with warm
    # starts starting at start_k (rgb2spec_gen.jl:361-404)
    l_idx, j_idx, i_idx = np.meshgrid(
        np.arange(3), np.arange(res), np.arange(res), indexing="ij"
    )
    l_flat = jnp.asarray(l_idx.reshape(-1))
    x_flat = jnp.asarray((i_idx.reshape(-1)) / (res - 1))  # x in [0,1]
    y_flat = jnp.asarray((j_idx.reshape(-1)) / (res - 1))  # y in [0,1]
    scale_j = jnp.asarray(scale)

    def target_rgb(l, x, y, b):
        # rgb[l] = b; rgb[(l+1)%3] = x*b; rgb[(l+2)%3] = y*b
        vals = jnp.stack([b, x * b, y * b])
        pos = jnp.stack([l, (l + 1) % 3, (l + 2) % 3])
        return jnp.zeros(3, dtype=vals.dtype).at[pos].set(vals)

    def remap(c):
        """Normalized-lambda coefficients -> absolute-nm (rgb2spec_gen.jl:372-377)."""
        c0n = CIE_LAMBDA_MIN
        c1n = 1.0 / (CIE_LAMBDA_MAX - CIE_LAMBDA_MIN)
        A, B, C = c[0], c[1], c[2]
        return jnp.stack(
            [
                A * c1n**2,
                B * c1n - 2 * A * c0n * c1n**2,
                C - B * c0n * c1n + A * (c0n * c1n) ** 2,
            ]
        )

    def cell_scan(l, x, y):
        start_k = res // 5

        def step(coeffs, k):
            b = scale_j[k]
            new = gauss_newton(coeffs, target_rgb(l, x, y, b))
            return new, remap(new)

        # forward pass: k = start_k .. res-1
        _, out_fwd = jax.lax.scan(
            step, jnp.zeros(3), jnp.arange(start_k, res)
        )
        # backward pass: k = start_k .. 0 (overwrites k=start_k, matching ref)
        _, out_bwd = jax.lax.scan(
            step, jnp.zeros(3), jnp.arange(start_k, -1, -1)
        )
        out = jnp.zeros((res, 3))
        out = out.at[jnp.arange(start_k, res)].set(out_fwd)
        out = out.at[jnp.arange(start_k, -1, -1)].set(out_bwd)
        return out  # (res, 3) over z

    cell_scan_v = jax.jit(jax.vmap(cell_scan))

    if verbose:
        print(f"optimizing {3 * res * res} cells x {res} z-steps ...", flush=True)
    out = cell_scan_v(l_flat, x_flat, y_flat)  # (3*res*res, res, 3)
    out = np.asarray(out).reshape(3, res, res, res, 3)  # (l, j, i, z, coeff)
    coeffs = np.transpose(out, (0, 3, 1, 2, 4)).astype(np.float32)  # (l,z,j,i,c)

    np.savez(
        _DATA / "srgb_spectrum_table.npz",
        res=np.int32(res),
        scale=scale.astype(np.float32),
        coeffs=coeffs,
    )
    if verbose:
        print("saved", _DATA / "srgb_spectrum_table.npz")
    return scale, coeffs


if __name__ == "__main__":
    generate_table()
