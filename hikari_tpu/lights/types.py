"""Lights: host definitions, device banks, and spectral sample_li.

Parity with /root/reference/src/lights/ (PointLight, SpotLight,
DirectionalLight, AmbientLight, DiffuseAreaLight, EnvironmentLight) and the
spectral light-evaluation layer
(/root/reference/src/integrators/physical-wavefront/lights.jl:39-500).

All sample_li functions are dense over wavefront lanes and return
(wi, Li(lambda), pdf, p_light, t_max, is_delta); the integrator selects by
light type tag — the TPU translation of `with_index` dispatch.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..core.lookup import bank_lookup as _bl
import numpy as np

from ..core.pytree import pytree_dataclass
from ..core.vecmath import dot, normalize
from ..geometry.triangle import sample_triangle, triangle_area, triangle_normal
from ..sampling.distributions import (
    Distribution2D, make_distribution_2d, pdf_distribution_2d,
    sample_distribution_2d,
)
from ..spectral.rgb2spec import RGBToSpectrumTable, rgb_illuminant_eval

POINT = 0
SPOT = 1
DISTANT = 2
AMBIENT = 3
AREA = 4
ENV = 5
N_LIGHT_TYPES = 6


@dataclass
class PointLight:
    position: tuple = (0.0, 0.0, 0.0)
    intensity: tuple = (1.0, 1.0, 1.0)  # RGB radiant intensity
    scale: float = 1.0


@dataclass
class SpotLight:
    position: tuple = (0.0, 0.0, 0.0)
    direction: tuple = (0.0, 0.0, -1.0)
    intensity: tuple = (1.0, 1.0, 1.0)
    cone_angle_deg: float = 30.0
    falloff_start_deg: float = 25.0
    scale: float = 1.0


@dataclass
class DistantLight:
    direction: tuple = (0.0, -1.0, 0.0)  # direction light travels
    radiance: tuple = (1.0, 1.0, 1.0)
    scale: float = 1.0


@dataclass
class SunLight:
    """Delta directional sun (sun.jl:7-50). angular_diameter/corona_falloff
    are carried for API parity with the reference (which also declares but
    does not consume them in its integrators); transport-wise a SunLight is
    a DistantLight."""

    direction: tuple = (0.0, -1.0, 0.0)  # direction light travels
    radiance: tuple = (1.0, 1.0, 1.0)
    scale: float = 1.0
    angular_diameter: float = 0.00933
    corona_falloff: float = 8.0


@dataclass
class AmbientLight:
    radiance: tuple = (0.1, 0.1, 0.1)
    scale: float = 1.0


@dataclass
class EnvironmentLight:
    """Equal-area octahedral environment map (environment.jl:5-35).

    image: (H, W, 3) equal-area square map (H == W), linear RGB.
    """

    image: np.ndarray = None
    scale: float = 1.0
    rotation: tuple = None  # optional 3x3 world rotation


def equirect_to_equal_area(img, resolution: int | None = None, up: str = "y"):
    """Host-side lat-long (equirectangular) -> equal-area octahedral resample.

    Real HDRI assets are almost always lat-long; the reference reads them
    and samples with direction_to_uv_equirect
    (/root/reference/src/textures/environment_map.jl:230-266, load at :379).
    Here the conversion happens once at import time: every equal-area texel
    center maps to a direction, which bilinearly samples the lat-long
    source. Feed the result to `EnvironmentLight(image=...)`.

    img: (H, W, 3) linear RGB lat-long image. Row 0 is the top pole (+up
        axis); u wraps longitude with phi = atan2 about the up axis
        (u = (phi + pi) / 2pi, matching the reference's convention).
    resolution: output square size; defaults to H (so the vertical
        resolution is preserved).
    up: world axis of the image's vertical pole: 'y' (standard HDRI) or
        'z' (matches the repo's sunsky bake).
    """
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    res = int(resolution or h)
    uu, vv = np.meshgrid(
        (np.arange(res) + 0.5) / res, (np.arange(res) + 0.5) / res
    )
    d = _equal_area_square_to_sphere_np(uu, vv)  # (res, res, 3)
    if up == "y":
        pole, az_y, az_x = d[..., 1], d[..., 2], d[..., 0]
    elif up == "z":
        pole, az_y, az_x = d[..., 2], d[..., 1], d[..., 0]
    else:
        raise ValueError(f"up must be 'y' or 'z', got {up!r}")
    theta = np.arccos(np.clip(pole, -1.0, 1.0))
    phi = np.arctan2(az_y, az_x)
    su = np.mod((phi + np.pi) / (2.0 * np.pi), 1.0) * w - 0.5
    sv = (theta / np.pi) * h - 0.5
    x0 = np.floor(su).astype(np.int64)
    y0 = np.floor(sv).astype(np.int64)
    fx = (su - x0)[..., None]
    fy = (sv - y0)[..., None]
    x1 = (x0 + 1) % w
    x0 = x0 % w                      # longitude wraps
    y1 = np.clip(y0 + 1, 0, h - 1)   # latitude clamps at the poles
    y0 = np.clip(y0, 0, h - 1)
    out = (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x1] * fx * (1 - fy)
        + img[y1, x0] * (1 - fx) * fy
        + img[y1, x1] * fx * fy
    )
    return out.astype(np.float32)


def _equal_area_square_to_sphere_np(u, v):
    """numpy twin of equal_area_square_to_sphere for host-side baking."""
    up = np.abs(2 * u - 1)
    vp = np.abs(2 * v - 1)
    sd = 1.0 - (up + vp)
    dist = np.abs(sd)
    r = 1.0 - dist
    phi = np.where(r == 0.0, 1.0, (vp - up) / np.where(r == 0.0, 1.0, r) + 1.0) * (
        np.pi / 4.0
    )
    z = np.copysign(1.0 - r * r, sd)
    cos_phi = np.copysign(np.cos(phi), 2 * u - 1)
    sin_phi = np.copysign(np.sin(phi), 2 * v - 1)
    s = r * np.sqrt(np.maximum(2.0 - r * r, 0.0))
    return np.stack([cos_phi * s, sin_phi * s, z], -1)


# --- equal-area octahedral mapping (environment_map.jl:71-210) ----------------


def equal_area_square_to_sphere(uv: jnp.ndarray) -> jnp.ndarray:
    """[0,1]^2 -> unit sphere, equal-area (pbrt-v4)."""
    u = 2.0 * uv[..., 0] - 1.0
    v = 2.0 * uv[..., 1] - 1.0
    up = jnp.abs(u)
    vp = jnp.abs(v)
    sd = 1.0 - (up + vp)
    d = jnp.abs(sd)
    r = 1.0 - d
    phi = jnp.where(r == 0.0, 1.0, (vp - up) / jnp.where(r == 0.0, 1.0, r) + 1.0) * (
        jnp.pi / 4.0
    )
    z = jnp.copysign(1.0 - r * r, sd)
    cos_phi = jnp.copysign(jnp.cos(phi), u)
    sin_phi = jnp.copysign(jnp.sin(phi), v)
    s = r * jnp.sqrt(jnp.maximum(2.0 - r * r, 0.0))
    return jnp.stack([cos_phi * s, sin_phi * s, z], -1)


def equal_area_sphere_to_square(d: jnp.ndarray) -> jnp.ndarray:
    """Unit sphere -> [0,1]^2, inverse of the above."""
    x = jnp.abs(d[..., 0])
    y = jnp.abs(d[..., 1])
    z = jnp.abs(d[..., 2])
    r = jnp.sqrt(jnp.maximum(1.0 - z, 0.0))
    a = jnp.maximum(x, y)
    b = jnp.minimum(x, y)
    b = jnp.where(a == 0.0, 0.0, b / jnp.where(a == 0.0, 1.0, a))
    phi = jnp.arctan(b) * (2.0 / jnp.pi)
    phi = jnp.where(x < y, 1.0 - phi, phi)
    v = phi * r
    u = r - v
    neg = d[..., 2] < 0.0
    u, v = jnp.where(neg, 1.0 - v, u), jnp.where(neg, 1.0 - u, v)
    u = jnp.copysign(u, d[..., 0])
    v = jnp.copysign(v, d[..., 1])
    return jnp.stack([(u + 1.0) * 0.5, (v + 1.0) * 0.5], -1)


@pytree_dataclass(static=("has_env", "area_flat_base", "n_flat"))
class LightBanks:
    # point
    point_pos: jnp.ndarray       # (Np, 3)
    point_i: jnp.ndarray         # (Np, 3)
    # spot
    spot_pos: jnp.ndarray
    spot_dir: jnp.ndarray
    spot_i: jnp.ndarray
    spot_cos_total: jnp.ndarray
    spot_cos_falloff: jnp.ndarray
    # distant
    dist_dir: jnp.ndarray
    dist_l: jnp.ndarray
    # ambient
    ambient_l: jnp.ndarray
    # area (one light per emissive triangle, diffuse-area.jl:25-60)
    area_p0: jnp.ndarray
    area_p1: jnp.ndarray
    area_p2: jnp.ndarray
    area_le: jnp.ndarray
    area_two_sided: jnp.ndarray
    area_n: jnp.ndarray
    area_area: jnp.ndarray
    # environment
    env_image: jnp.ndarray       # (H, W, 3)
    env_dist: Distribution2D
    env_scale: jnp.ndarray       # ()
    has_env: bool
    # flattened list for the light sampler
    light_type: jnp.ndarray      # (NL,)
    light_idx: jnp.ndarray       # (NL,)
    # precomputed illuminant-uplift coefficients [c0,c1,c2,scale] so
    # sample_li evaluates a polynomial per lane instead of the trilinear
    # rgb2spec lookup (includes the 1/D65_PHOTOMETRIC normalization)
    point_i_c4: jnp.ndarray      # (Np, 4)
    spot_i_c4: jnp.ndarray       # (Ns, 4)
    dist_l_c4: jnp.ndarray       # (Nd, 4)
    area_le_c4: jnp.ndarray      # (Na, 4)
    # power sampler (light-sampler.jl:230-278): per-flat-light pmf + Walker
    # alias table; sampling is one gather + compare per lane
    pmf: jnp.ndarray             # (NL,)
    alias_q: jnp.ndarray         # (NL,)
    alias_j: jnp.ndarray         # (NL,) int32
    area_flat_base: int = 0      # flat index of the first area light
    n_flat: int = 0              # true flat-light count (arrays are padded)


def pack_lights(
    lights: list,
    area_tris: tuple | None = None,
    scene_radius: float = 1.0,
    sampler: str = "power",
) -> LightBanks:
    """area_tris: optional (p0, p1, p2, le, scale, two_sided) numpy arrays of
    per-face emissive triangles collected at scene build.

    sampler: 'power' builds a power-weighted alias table
    (PowerLightSampler, light-sampler.jl:230-278); 'uniform' gives every
    light equal probability (UniformLightSampler, :186)."""
    pp, pi = [], []
    sp, sd, si, sct, scf = [], [], [], [], []
    dd, dl = [], []
    al = []
    env = None

    for l in lights:
        if isinstance(l, PointLight):
            pp.append(l.position)
            pi.append(np.asarray(l.intensity) * l.scale)
        elif isinstance(l, SpotLight):
            sp.append(l.position)
            sd.append(np.asarray(l.direction) / np.linalg.norm(l.direction))
            si.append(np.asarray(l.intensity) * l.scale)
            sct.append(np.cos(np.deg2rad(l.cone_angle_deg)))
            scf.append(np.cos(np.deg2rad(l.falloff_start_deg)))
        elif isinstance(l, (DistantLight, SunLight)):
            dd.append(np.asarray(l.direction) / np.linalg.norm(l.direction))
            dl.append(np.asarray(l.radiance) * l.scale)
        elif isinstance(l, AmbientLight):
            al.append(np.asarray(l.radiance) * l.scale)
        elif isinstance(l, EnvironmentLight):
            env = l
        else:
            raise TypeError(f"unknown light {type(l)}")

    if area_tris is not None and len(area_tris[0]):
        a_p0, a_p1, a_p2, a_le, a_two = area_tris
    else:
        a_p0 = np.zeros((0, 3), np.float32)
        a_p1 = a_p2 = a_p0
        a_le = np.zeros((0, 3), np.float32)
        a_two = np.zeros((0,), bool)

    # flattened light list (area lights after the punctual ones). Ambient
    # lights are excluded: escaped rays add their radiance in full, so
    # NEE-sampling them would double count.
    types, idxs = [], []
    for t, n in ((POINT, len(pp)), (SPOT, len(sp)), (DISTANT, len(dd))):
        types += [t] * n
        idxs += list(range(n))
    area_flat_base = len(types)
    types += [AREA] * len(a_p0)
    idxs += list(range(len(a_p0)))
    if env is not None:
        types.append(ENV)
        idxs.append(0)

    def pad3(rows, default=(0.0, 0.0, 0.0)):
        arr = np.asarray(rows, np.float32).reshape(-1, 3) if len(rows) else np.array([default], np.float32)
        return jnp.asarray(arr)

    def pad1(rows, default=0.0, dtype=np.float32):
        arr = np.asarray(rows, dtype) if len(rows) else np.array([default], dtype)
        return jnp.asarray(arr)

    env_mean_lum = 0.0
    if env is not None:
        img = np.asarray(env.image, np.float32)
        assert img.ndim == 3 and img.shape[2] == 3, "env image must be (H,W,3)"
        lum = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
        env_mean_lum = float(lum.mean())
        env_image = jnp.asarray(img)
        env_dist = make_distribution_2d(jnp.asarray(lum))
        env_scale = jnp.float32(env.scale)
    else:
        env_image = jnp.zeros((1, 1, 3), jnp.float32)
        env_dist = make_distribution_2d(jnp.ones((1, 1), jnp.float32))
        env_scale = jnp.float32(0.0)

    a_p0j = jnp.asarray(a_p0) if len(a_p0) else jnp.zeros((1, 3), jnp.float32)
    a_p1j = jnp.asarray(a_p1) if len(a_p1) else jnp.zeros((1, 3), jnp.float32).at[:, 0].set(1.0)
    a_p2j = jnp.asarray(a_p2) if len(a_p2) else jnp.zeros((1, 3), jnp.float32).at[:, 1].set(1.0)
    a_area_np = np.asarray(triangle_area(a_p0j, a_p1j, a_p2j))

    # power-weighted sampling distribution over the flat light list
    from .sampler import build_alias_table, light_powers

    flat_t = np.asarray(types, np.int32)
    flat_i = np.asarray(idxs, np.int32)
    if sampler == "power" and len(flat_t):
        phi = light_powers(
            flat_t, flat_i,
            point_i=np.asarray(pi, np.float32).reshape(-1, 3) if pp else None,
            spot_i=np.asarray(si, np.float32).reshape(-1, 3) if sp else None,
            spot_cos_total=np.asarray(sct, np.float32) if sp else None,
            spot_cos_falloff=np.asarray(scf, np.float32) if sp else None,
            dist_l=np.asarray(dl, np.float32).reshape(-1, 3) if dd else None,
            area_le=np.asarray(a_le, np.float32).reshape(-1, 3),
            area_area=a_area_np,
            area_two_sided=np.asarray(a_two, bool),
            env_mean_lum=env_mean_lum,
            env_scale=float(env.scale) if env is not None else 1.0,
            scene_radius=scene_radius,
        )
    else:
        phi = np.ones(max(len(flat_t), 0), np.float64)
    pmf_np, q_np, j_np = build_alias_table(phi)
    if len(pmf_np) == 0:  # keep shapes static with a dummy entry
        pmf_np = np.ones(1, np.float32)
        q_np = np.ones(1, np.float32)
        j_np = np.zeros(1, np.int32)

    from ..spectral.cie import D65_PHOTOMETRIC
    from ..spectral.rgb2spec import srgb_table, unbounded_coeff4

    table = srgb_table()
    inv_photo = 1.0 / D65_PHOTOMETRIC

    def illum_c4(rows3):
        c4 = unbounded_coeff4(table, rows3)
        return c4.at[..., 3].mul(inv_photo)

    return LightBanks(
        point_pos=pad3(pp), point_i=pad3(pi),
        spot_pos=pad3(sp), spot_dir=pad3(sd, (0, 0, -1)), spot_i=pad3(si),
        spot_cos_total=pad1(sct), spot_cos_falloff=pad1(scf),
        dist_dir=pad3(dd, (0, -1, 0)), dist_l=pad3(dl),
        ambient_l=pad3(al),
        area_p0=a_p0j, area_p1=a_p1j, area_p2=a_p2j,
        area_le=pad3(a_le),
        area_two_sided=pad1(a_two, False, bool),
        area_n=jnp.asarray(triangle_normal(a_p0j, a_p1j, a_p2j)),
        area_area=jnp.asarray(triangle_area(a_p0j, a_p1j, a_p2j)),
        point_i_c4=illum_c4(pad3(pi)),
        spot_i_c4=illum_c4(pad3(si)),
        dist_l_c4=illum_c4(pad3(dl)),
        area_le_c4=illum_c4(pad3(a_le)),
        env_image=env_image, env_dist=env_dist, env_scale=env_scale,
        has_env=env is not None,
        light_type=jnp.asarray(types or [POINT], jnp.int32),
        light_idx=jnp.asarray(idxs or [0], jnp.int32),
        pmf=jnp.asarray(pmf_np),
        alias_q=jnp.asarray(q_np),
        alias_j=jnp.asarray(j_np),
        area_flat_base=area_flat_base,
        n_flat=len(types),
    )


def sample_light_index(banks: LightBanks, u: jnp.ndarray):
    """Draw a flat light index ~ pmf via the alias table. Returns (idx, pmf).

    One gather + one compare per lane (AliasTable sample,
    light-sampler.jl:120-170); the fractional part of u*n is reused as the
    alias coin, the standard one-uniform trick."""
    n = banks.pmf.shape[0]
    su = u * n
    i = jnp.clip(su.astype(jnp.int32), 0, n - 1)
    f = su - i.astype(jnp.float32)
    idx = jnp.where(f < _bl(banks.alias_q, i), i, _bl(banks.alias_j, i))
    return idx, _bl(banks.pmf, idx)


@pytree_dataclass
class LightSample:
    wi: jnp.ndarray        # (..., 3) world
    li: jnp.ndarray        # (..., 4) spectral radiance
    pdf: jnp.ndarray       # (...,) solid-angle pdf (1 for deltas)
    t_max: jnp.ndarray     # (...,) shadow-ray extent
    is_delta: jnp.ndarray  # (...,) bool
    valid: jnp.ndarray     # (...,) bool


def _illum(table, rgb, lam):
    """Photometrically-normalized illuminant uplift: RGB (1,1,1) integrates
    to unit luminance (the reference's scale = 1/D65_PHOTOMETRIC,
    lights/point.jl:58,73)."""
    from ..spectral.cie import D65_PHOTOMETRIC

    return rgb_illuminant_eval(table, jnp.maximum(rgb, 0.0), lam) * (
        1.0 / D65_PHOTOMETRIC
    )


def sample_li(
    banks: LightBanks,
    table: RGBToSpectrumTable,
    ltype: jnp.ndarray,   # (N,) per-lane light type
    lidx: jnp.ndarray,    # (N,) per-lane index within type bank
    p: jnp.ndarray,       # (N, 3) shading point
    lam: jnp.ndarray,     # (N, 4)
    u2: jnp.ndarray,      # (N, 2)
    scene_radius: jnp.ndarray,
) -> LightSample:
    """Dense spectral sample_li with type selection
    (physical-wavefront/lights.jl:39-396)."""
    n = p.shape[0]
    eps = 1e-3

    # --- point
    lp = _bl(banks.point_pos, lidx % banks.point_pos.shape[0])
    to_l = lp - p
    dist2 = jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-12)
    dist = jnp.sqrt(dist2)
    wi_pt = to_l / dist[..., None]
    from ..spectral.rgb2spec import coeff4_illuminant_eval

    li_pt = coeff4_illuminant_eval(
        _bl(banks.point_i_c4, lidx % banks.point_i_c4.shape[0]), lam
    ) / dist2[..., None]

    # --- spot
    sp = _bl(banks.spot_pos, lidx % banks.spot_pos.shape[0])
    to_s = sp - p
    d2s = jnp.maximum(jnp.sum(to_s * to_s, -1), 1e-12)
    ds = jnp.sqrt(d2s)
    wi_sp = to_s / ds[..., None]
    cos_t = dot(-wi_sp, _bl(banks.spot_dir, lidx % banks.spot_dir.shape[0]))
    ct = _bl(banks.spot_cos_total, lidx % banks.spot_cos_total.shape[0])
    cf = _bl(banks.spot_cos_falloff, lidx % banks.spot_cos_falloff.shape[0])
    t = jnp.clip((cos_t - ct) / jnp.maximum(cf - ct, 1e-6), 0.0, 1.0)
    falloff = (t * t) * (t * t)  # pbrt quartic falloff between cone edges
    li_sp = coeff4_illuminant_eval(
        _bl(banks.spot_i_c4, lidx % banks.spot_i_c4.shape[0]), lam
    ) * (falloff / d2s)[..., None]

    # --- distant
    dd = _bl(banks.dist_dir, lidx % banks.dist_dir.shape[0])
    wi_di = -dd
    li_di = coeff4_illuminant_eval(_bl(banks.dist_l_c4, lidx % banks.dist_l_c4.shape[0]), lam)
    t_di = 2.0 * scene_radius

    # --- area: uniform triangle sampling (diffuse-area.jl:25-60)
    ai = lidx % banks.area_p0.shape[0]
    p_l, _, _ = sample_triangle(u2[..., 0], u2[..., 1], _bl(banks.area_p0, ai), _bl(banks.area_p1, ai), _bl(banks.area_p2, ai))
    to_a = p_l - p
    d2a = jnp.maximum(jnp.sum(to_a * to_a, -1), 1e-12)
    da = jnp.sqrt(d2a)
    wi_ar = to_a / da[..., None]
    n_l = _bl(banks.area_n, ai)
    cos_l = dot(n_l, -wi_ar)
    facing = (cos_l > 0.0) | _bl(banks.area_two_sided, ai)
    area = jnp.maximum(_bl(banks.area_area, ai), 1e-12)
    pdf_ar = d2a / jnp.maximum(jnp.abs(cos_l) * area, 1e-9)
    li_ar = jnp.where(
        facing[..., None], coeff4_illuminant_eval(_bl(banks.area_le_c4, ai), lam), 0.0
    )

    # --- environment: importance-sample the equal-area map
    uv, pdf_uv = sample_distribution_2d(banks.env_dist, u2)
    wi_env = equal_area_square_to_sphere(uv)
    h, w = banks.env_image.shape[:2]
    exi = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    eyi = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    env_rgb = banks.env_image[eyi, exi] * banks.env_scale
    li_env = _illum(table, env_rgb, lam)
    pdf_env = pdf_uv / (4.0 * jnp.pi)  # equal-area: uniform texel solid angle
    t_env = 2.0 * scene_radius

    # select by type tag
    def pick(field_list, default):
        out = default
        for t_id, v in field_list:
            m = ltype == t_id
            if v.ndim > out.ndim:
                raise ValueError
            out = jnp.where(m[..., None] if out.ndim == 2 else m, v, out)
        return out

    wi = pick(
        [(POINT, wi_pt), (SPOT, wi_sp), (DISTANT, wi_di), (AREA, wi_ar), (ENV, wi_env)],
        jnp.zeros_like(p).at[..., 2].set(1.0),
    )
    li = pick(
        [(POINT, li_pt), (SPOT, li_sp), (DISTANT, li_di), (AREA, li_ar), (ENV, li_env)],
        jnp.zeros((n, 4), jnp.float32),
    )
    pdf = pick(
        [(POINT, jnp.ones(n)), (SPOT, jnp.ones(n)), (DISTANT, jnp.ones(n)),
         (AREA, pdf_ar), (ENV, pdf_env)],
        jnp.ones(n, jnp.float32),
    )
    t_max = pick(
        [(POINT, dist - eps), (SPOT, ds - eps), (DISTANT, t_di),
         (AREA, da - eps), (ENV, t_env)],
        jnp.ones(n, jnp.float32),
    )
    is_delta = (ltype == POINT) | (ltype == SPOT) | (ltype == DISTANT)
    valid = (pdf > 0.0) & jnp.any(li > 0.0, axis=-1)
    return LightSample(wi=wi, li=li, pdf=pdf, t_max=t_max, is_delta=is_delta, valid=valid)


def env_radiance(banks: LightBanks, table, d: jnp.ndarray, lam: jnp.ndarray):
    """Le(lambda) and solid-angle pdf for escaped rays hitting the env map
    (lights.jl:408-500)."""
    uv = equal_area_sphere_to_square(d)
    h, w = banks.env_image.shape[:2]
    xi = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    rgb = banks.env_image[yi, xi] * banks.env_scale
    le = _illum(table, rgb, lam)
    pdf = pdf_distribution_2d(banks.env_dist, uv) / (4.0 * jnp.pi)
    return le, pdf


def area_light_radiance(banks: LightBanks, table, aidx, wo_dot_n, lam):
    """Le seen when a path hits an emissive face (arealight_Le)."""
    facing = (wo_dot_n > 0.0) | _bl(banks.area_two_sided, aidx)
    le = _illum(table, _bl(banks.area_le, aidx), lam)
    return jnp.where(facing[..., None], le, 0.0)


def area_light_pdf(banks: LightBanks, aidx, p_ref, p_hit, n_hit):
    """Solid-angle pdf of having sampled the hit point on area light aidx."""
    to_l = p_hit - p_ref
    d2 = jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-12)
    wi = to_l / jnp.sqrt(d2)[..., None]
    cos_l = jnp.abs(dot(n_hit, -wi))
    area = jnp.maximum(_bl(banks.area_area, aidx), 1e-12)
    return d2 / jnp.maximum(cos_l * area, 1e-9)
