#!/usr/bin/env python
"""Extract published scientific data tables into .npz artifacts.

The reference vendored several *published datasets* that every pbrt-style
renderer needs. These are data, not code:

- Sobol generator matrices (Joe & Kuo 2008, (c) 2012 L. Gruenschloss, MIT;
  shipped by pbrt-v4, Apache-2.0) — reference copy at
  /root/reference/src/sampler/sobol_matrices.jl
- CIE 1931 2-deg color matching functions, 360-830nm @1nm (CIE standard) —
  reference copy at /root/reference/src/spectral/color.jl
- CIE standard illuminant D65 (CIE standard) — reference copy at
  /root/reference/src/spectral/uplift.jl:393-432 and rgb2spec_gen.jl:88
- Measured metal IOR spectra (eta/k for Ag, Al, Au, Cu, CuZn, MgO, TiO2;
  pbrt-v4 util/spectrum.cpp, Apache-2.0) — reference copy at
  /root/reference/src/spectral/metal-spectra.jl

This tool parses the numeric literals out of the reference's Julia data
files and writes them as hikari_tpu/data/*.npz. Run once; artifacts are
committed so the build never needs the reference at runtime.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/src")
OUT = Path(__file__).resolve().parent.parent / "hikari_tpu" / "data"

_NUM = re.compile(r"(0x[0-9a-fA-F]+|[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?)(?:f0)?")


def _numbers(text: str):
    """All numeric literals in a blob of Julia array syntax."""
    out = []
    for tok in _NUM.findall(text):
        if tok.startswith("0x"):
            out.append(int(tok, 16))
        else:
            out.append(float(tok))
    return out


def _const_block(src: str, name: str) -> str:
    """Return the bracketed/paren literal following `const <name> =`."""
    m = re.search(rf"const {re.escape(name)}\s*=.*?[\[\(]", src, re.S)
    if not m:
        raise KeyError(name)
    start = m.end() - 1
    open_ch = src[start]
    close_ch = {"[": "]", "(": ")"}[open_ch]
    depth = 0
    for i in range(start, len(src)):
        if src[i] == open_ch:
            depth += 1
        elif src[i] == close_ch:
            depth -= 1
            if depth == 0:
                return src[start + 1 : i]
    raise ValueError(f"unterminated literal for {name}")


def extract_sobol():
    src = (REF / "sampler/sobol_matrices.jl").read_text()
    vals = _numbers(_const_block(src, "SobolMatrices32"))
    arr = np.array(vals, dtype=np.uint32)
    assert arr.size == 1024 * 52, arr.size
    arr = arr.reshape(1024, 52)
    np.save(OUT / "sobol_matrices_32.npy", arr)
    print("sobol matrices:", arr.shape, arr.dtype)


def extract_cie():
    src = (REF / "spectral/color.jl").read_text()
    x = np.array(_numbers(_const_block(src, "CIE_X")), np.float32)
    y = np.array(_numbers(_const_block(src, "CIE_Y")), np.float32)
    z = np.array(_numbers(_const_block(src, "CIE_Z")), np.float32)
    assert x.size == y.size == z.size == 471, (x.size, y.size, z.size)
    np.savez(
        OUT / "cie_xyz.npz",
        x=x, y=y, z=z,
        lambda_min=np.int32(360), lambda_max=np.int32(830),
    )
    print("CIE xyz bar:", x.size, "samples; Y integral:", np.sum(y))


def extract_d65():
    src = (REF / "spectral/uplift.jl").read_text()
    lam = np.array(_numbers(_const_block(src, "D65_ILLUMINANT_WAVELENGTHS")), np.float32)
    val = np.array(_numbers(_const_block(src, "D65_ILLUMINANT_VALUES")), np.float32)
    assert lam.size == val.size, (lam.size, val.size)
    np.savez(OUT / "illuminant_d65.npz", lam=lam, val=val)
    print("D65:", lam.size, "samples", lam.min(), "-", lam.max(), "nm")


def extract_metals():
    src = (REF / "spectral/metal-spectra.jl").read_text()
    names = re.findall(r"const (\w+)_SPECTRUM = from_interleaved", src)
    data = {}
    for name in names:
        block = _const_block(src, f"{name}_SPECTRUM")
        # block is the from_interleaved(...) argument list; the data tuple is
        # its second argument — slice from the inner open paren to skip the
        # PiecewiseLinearSpectrum{N} type-parameter token
        inner = block[block.index("(") + 1 :]
        vals = np.array(_numbers(inner), np.float32)
        assert vals.size % 2 == 0, (name, vals.size)
        pairs = vals.reshape(-1, 2)
        data[f"{name}_lam"] = pairs[:, 0]
        data[f"{name}_val"] = pairs[:, 1]
    np.savez(OUT / "metal_spectra.npz", **data)
    print("metal spectra:", sorted({n.rsplit('_', 1)[0] for n in names}))


def extract_hosek():
    """Hosek & Wilkie 2012 spectral sky model dataset (BSD 3-clause; shipped
    with pbrt-v4 as ArHosekSkyModelData_Spectral.h). 11 bands, 320-720 nm:
    configs (1080 = 9 coeffs x 6 elevation ctrl pts x 10 turbidities x 2
    albedos), radiances (120 = 6 x 10 x 2), limb darkening (6)."""
    src = (REF / "lights/hosek_wilkie_data.jl").read_text()
    bands = list(range(320, 721, 40))
    cfg = []
    rad = []
    limb = []
    for b in bands:
        c = np.array(_numbers(_const_block(src, f"_HOSEK_SPECTRAL_CONFIG_{b}")), np.float64)
        assert c.size == 1080, (b, c.size)
        cfg.append(c)
        r = np.array(_numbers(_const_block(src, f"_HOSEK_SPECTRAL_RAD_{b}")), np.float64)
        assert r.size == 120, (b, r.size)
        rad.append(r)
        l = np.array(_numbers(_const_block(src, f"_HOSEK_LIMB_DARKENING_{b}")), np.float64)
        assert l.size == 6, (b, l.size)
        limb.append(l)
    np.savez(
        OUT / "hosek_wilkie.npz",
        configs=np.stack(cfg),      # (11, 1080)
        radiances=np.stack(rad),    # (11, 120)
        limb=np.stack(limb),        # (11, 6)
        bands=np.array(bands, np.float64),
    )
    print("hosek-wilkie:", len(bands), "bands")


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    extract_sobol()
    extract_cie()
    extract_d65()
    extract_metals()
    extract_hosek()


if __name__ == "__main__":
    sys.exit(main())
