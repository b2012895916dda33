"""ZSobol low-discrepancy sampler (pbrt-v4 ZSobolSampler), vectorized.

Exact port of the reference's device sampler
(/root/reference/src/sampler/sobol.jl): Morton-encoded (pixel, sample)
indices, randomized base-4 digit permutations, generator-matrix Sobol
samples with FastOwen scrambling. Batched over pixel lanes; all per-lane
64-bit state uses the uint32-pair emulation in u64.py (TPUs have no int64
datapath).

The sampler is *stateless*: every sample is a pure function of
(pixel, sample_index, dimension, seed), which is exactly what a wavefront
renderer on TPU needs — any stage can regenerate any dimension.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pytree import pytree_dataclass
from . import u64
from .hashes import fast_owen_scramble, mix_bits, zsobol_hash

_DATA = Path(__file__).resolve().parent.parent / "data"

SOBOL_MATRIX_SIZE = 52
ONE_MINUS_EPSILON = np.float32(1.0 - 2**-24)
FLOAT32_SCALE = jnp.float32(2.3283064365386963e-10)  # 2^-32

# 24 permutations of base-4 digits (sobol.jl:157-186). Each row packs its
# four 2-bit entries into one byte, four rows per uint32 word: the lookup
# permuted = TABLE[p, digit] becomes pure shift arithmetic (a per-lane
# gather here would run 56x per bounce on the TPU's ~1 Gelem/s scalar
# core)
_PERMUTATIONS_LIST = [
    [0, 1, 2, 3], [0, 1, 3, 2], [0, 2, 1, 3], [0, 2, 3, 1],
    [0, 3, 2, 1], [0, 3, 1, 2], [1, 0, 2, 3], [1, 0, 3, 2],
    [1, 2, 0, 3], [1, 2, 3, 0], [1, 3, 2, 0], [1, 3, 0, 2],
    [2, 1, 0, 3], [2, 1, 3, 0], [2, 0, 1, 3], [2, 0, 3, 1],
    [2, 3, 0, 1], [2, 3, 1, 0], [3, 1, 2, 0], [3, 1, 0, 2],
    [3, 2, 1, 0], [3, 2, 0, 1], [3, 0, 2, 1], [3, 0, 1, 2],
]
_PERM_WORDS = tuple(
    sum(
        (_PERMUTATIONS_LIST[w * 4 + r][d] << (r * 8 + d * 2))
        for r in range(4)
        for d in range(4)
    )
    for w in range(6)
)


def _perm_lookup(p, digit):
    """PERMUTATIONS[p, digit] for p (lanes,) in [0,24), digit in [0,4) —
    select one of six packed words, then shift out the 2-bit entry."""
    w = jnp.full_like(p, _PERM_WORDS[0])
    for j in range(1, 6):
        w = jnp.where((p >> 2) == j, jnp.uint32(_PERM_WORDS[j]), w)
    shift = (p & 3) * 8 + digit * 2
    return (w >> shift) & jnp.uint32(3)


@functools.cache
def sobol_matrices() -> np.ndarray:
    """(1024, 52) uint32 generator matrices (Joe-Kuo via pbrt-v4).

    Cached as numpy: caching a jnp array created inside a jit trace would
    leak a tracer; numpy constants embed safely in any trace."""
    return np.load(_DATA / "sobol_matrices_32.npy")


@pytree_dataclass(static=("log2_spp", "n_base4_digits", "width"))
class ZSobolConfig:
    """Static sampler parameters (reference SobolRNG, sobol.jl:326-392)."""

    log2_spp: int
    n_base4_digits: int
    width: int
    seed: jnp.ndarray  # () uint32


def make_zsobol(width: int, height: int, samples_per_pixel: int, seed: int = 0):
    """compute_zsobol_params (sobol.jl:313-323)."""
    log2_spp = int(np.ceil(np.log2(max(1, samples_per_pixel))))
    res_log2 = int(np.ceil(np.log2(max(width, height, 1))))
    log4_spp = (log2_spp + 1) // 2
    return ZSobolConfig(
        log2_spp=log2_spp,
        n_base4_digits=res_log2 + log4_spp,
        width=width,
        seed=jnp.uint32(seed),
    )


def _left_shift2(x):
    """Spread 32-bit lanes to 64 bits with zero interleave -> u64 pair."""

    def spread16(v):
        # 16 -> 32 bit spread
        v = jnp.asarray(v, jnp.uint32) & jnp.uint32(0xFFFF)
        v = (v ^ (v << 8)) & jnp.uint32(0x00FF00FF)
        v = (v ^ (v << 4)) & jnp.uint32(0x0F0F0F0F)
        v = (v ^ (v << 2)) & jnp.uint32(0x33333333)
        v = (v ^ (v << 1)) & jnp.uint32(0x55555555)
        return v

    x = jnp.asarray(x, jnp.uint32)
    return (spread16(x >> 16), spread16(x))


def encode_morton2(x, y):
    """Interleave x (even bits) and y (odd bits) -> u64 pair (sobol.jl:54-60)."""
    sx = _left_shift2(x)
    sy = _left_shift2(y)
    return u64.or_(u64.shl(sy, 1), sx)


def zsobol_get_sample_index(morton_index, dimension, log2_spp: int, n_base4_digits: int):
    """Randomized base-4 digit permutation of the Morton index
    (sobol.jl:219-258). log2_spp / n_base4_digits are static; dimension may
    be a Python int or a traced uint32 scalar (wavefront bounce loops trace
    the bounce index)."""
    like = morton_index[0]
    sample_index = u64.from_int(0, like=like)
    pow2 = log2_spp & 1
    last_digit = pow2

    if isinstance(dimension, int):
        dim_mix = u64.from_int((0x55555555 * dimension) & 0xFFFFFFFFFFFFFFFF, like=like)
    else:
        dim_mix = u64.mul(
            u64.from_u32(jnp.broadcast_to(jnp.asarray(dimension, jnp.uint32), like.shape)),
            u64.from_int(0x55555555, like=like),
        )

    for i in range(n_base4_digits - 1, last_digit - 1, -1):
        digit_shift = max(0, 2 * i - pow2)
        digit = u64.to_u32(u64.shr(morton_index, digit_shift)) & jnp.uint32(3)
        higher = u64.shr(morton_index, digit_shift + 2)
        hash_val = mix_bits(u64.xor(higher, dim_mix))
        p = u64.mod_small(u64.shr(hash_val, 24), 24)  # (lanes,) uint32 in [0,24)
        permuted = _perm_lookup(p, digit)
        sample_index = u64.or_(sample_index, u64.shl(u64.from_u32(permuted), digit_shift))

    if pow2:
        digit = u64.to_u32(morton_index) & jnp.uint32(1)
        xor_bit = u64.to_u32(
            mix_bits(u64.xor(u64.shr(morton_index, 1), dim_mix))
        ) & jnp.uint32(1)
        sample_index = u64.or_(sample_index, u64.from_u32(digit ^ xor_bit))

    return sample_index


def sobol_sample_u32(index, dimension, max_bits: int):
    """Generator-matrix product: XOR rows of matrix `dimension` selected by
    the bits of `index` (sobol.jl:100-129). Unscrambled uint32 result.
    `dimension` may be static or a traced scalar."""
    mats = sobol_matrices()
    if isinstance(dimension, int):
        rows = mats[dimension, :max_bits]  # (max_bits,) uint32 numpy
        rows = [jnp.uint32(int(r)) for r in rows]
    else:
        dyn = jax.lax.dynamic_slice(
            jnp.asarray(mats),
            (jnp.asarray(dimension, jnp.int32), jnp.int32(0)),
            (1, SOBOL_MATRIX_SIZE),
        )[0]
        rows = [dyn[b] for b in range(max_bits)]
    v = jnp.zeros_like(index[1])
    for b in range(max_bits):
        mask = jnp.uint32(0) - u64.bit(index, b)  # 0 or 0xffffffff
        v = v ^ (rows[b] & mask)
    return v


def _finalize(v):
    return jnp.minimum(v.astype(jnp.float32) * FLOAT32_SCALE, ONE_MINUS_EPSILON)


def morton_index(cfg: ZSobolConfig, px, py, sample_idx):
    """Shared per-(pixel, sample) Morton index (sobol.jl:274-276)."""
    m = encode_morton2(px, py)
    m = u64.shl(m, cfg.log2_spp)
    return u64.or_(m, u64.from_u32(jnp.asarray(sample_idx, jnp.uint32)))


def _scrambled(cfg: ZSobolConfig, mort, dim, sobol_dim: int, seed_hash):
    max_bits = min(2 * cfg.n_base4_digits, SOBOL_MATRIX_SIZE)
    idx = zsobol_get_sample_index(mort, dim, cfg.log2_spp, cfg.n_base4_digits)
    v = sobol_sample_u32(idx, sobol_dim, max_bits)
    return _finalize(fast_owen_scramble(v, seed_hash))


def sample_1d(cfg: ZSobolConfig, px, py, sample_idx, dim):
    """1D sample at dimension `dim` (static int or traced scalar)
    (sobol.jl:268-282)."""
    mort = morton_index(cfg, px, py, sample_idx)
    h = zsobol_hash(jnp.asarray(dim + 1, jnp.uint32), jnp.broadcast_to(cfg.seed, px.shape))
    return _scrambled(cfg, mort, dim, 0, u64.to_u32(h))


def sample_2d(cfg: ZSobolConfig, px, py, sample_idx, dim):
    """2D sample at dimension `dim` (static or traced) (sobol.jl:289-310)."""
    mort = morton_index(cfg, px, py, sample_idx)
    h = zsobol_hash(jnp.asarray(dim + 2, jnp.uint32), jnp.broadcast_to(cfg.seed, px.shape))
    u1 = _scrambled(cfg, mort, dim, 0, u64.to_u32(h))
    u2 = _scrambled(cfg, mort, dim, 1, h[0])
    return u1, u2


@pytree_dataclass
class PixelSample:
    """Camera-stage sample values (reference PixelSample, stratified.jl)."""

    jitter: jnp.ndarray      # (..., 2)
    wavelength_u: jnp.ndarray  # (...,)
    lens: jnp.ndarray        # (..., 2)
    time: jnp.ndarray        # (...,)


def compute_pixel_sample(cfg: ZSobolConfig, px, py, sample_idx) -> PixelSample:
    """Camera dims {lambda:1, jitter:3, time:4, lens:6} (sobol.jl:437-446)."""
    wavelength_u = sample_1d(cfg, px, py, sample_idx, 1)
    jx, jy = sample_2d(cfg, px, py, sample_idx, 3)
    time = sample_1d(cfg, px, py, sample_idx, 4)
    lu, lv = sample_2d(cfg, px, py, sample_idx, 6)
    return PixelSample(
        jitter=jnp.stack([jx, jy], -1),
        wavelength_u=wavelength_u,
        lens=jnp.stack([lu, lv], -1),
        time=time,
    )


def path_sample_1d(cfg: ZSobolConfig, px, py, sample_idx, depth, local_dim: int):
    """Path dims: base 6 + 11 per depth (reference: 7/bounce,
    sobol.jl:448-471; widened for layered-BSDF eval draws).

    Block-width budget: local_dim 0..10 are ALL allocated (0-1 BSDF, 2
    RR, 3-4 NEE light point, 5 light select/medium, 6-8 delta-tracking,
    9 layered walk, 10 preview light select). Adding a 12th per-depth
    draw at local_dim >= 11 would silently alias the NEXT depth's block —
    widen the stride (the 11 here and in path_sample_2d) first."""
    return sample_1d(cfg, px, py, sample_idx, 6 + depth * 11 + local_dim)


def path_sample_2d(cfg: ZSobolConfig, px, py, sample_idx, depth, local_dim: int):
    return sample_2d(cfg, px, py, sample_idx, 6 + depth * 11 + local_dim)
