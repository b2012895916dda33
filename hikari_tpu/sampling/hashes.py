"""pbrt-v4-compatible hashing and PCG32, vectorized on uint32 pairs.

Exact ports (bit-for-bit) of the reference's MurmurHash64A / MixBits / PCG32
(/root/reference/src/materials/spectral-eval.jl:560-826) so that sampling
sequences match pbrt semantics. All functions broadcast over batches.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import u64

_M = 0xC6A4A7935BD1E995
_R = 47


def mix_bits(v):
    """pbrt MixBits on a u64 pair (spectral-eval.jl:641-648)."""
    v = u64.xor(v, u64.shr(v, 31))
    v = u64.mul_const(v, 0x7FB5D329728EA185)
    v = u64.xor(v, u64.shr(v, 27))
    v = u64.mul_const(v, 0x81DADEF4BC2DD44D)
    v = u64.xor(v, u64.shr(v, 33))
    return v


def murmur_hash_64a(words, n_bytes: int, seed: int = 0):
    """MurmurHash64A over little-endian uint32 words (spectral-eval.jl:575-633).

    words: list of uint32 arrays, all same shape, len(words)*4 >= n_bytes.
    n_bytes must be a multiple of 4 (all engine call sites are).
    """
    assert n_bytes % 4 == 0 and len(words) * 4 >= n_bytes
    like = words[0]
    h = u64.xor(u64.from_int(seed, like=like), u64.mul_const(u64.from_int(n_bytes, like=like), _M))

    n_chunks = n_bytes // 8
    for i in range(n_chunks):
        k = u64.u64(words[2 * i + 1], words[2 * i])  # little-endian: lo word first
        k = u64.mul_const(k, _M)
        k = u64.xor(k, u64.shr(k, _R))
        k = u64.mul_const(k, _M)
        h = u64.xor(h, k)
        h = u64.mul_const(h, _M)

    if n_bytes % 8 == 4:
        tail = u64.from_u32(words[n_bytes // 4 - 1])
        h = u64.xor(h, tail)
        h = u64.mul_const(h, _M)

    h = u64.xor(h, u64.shr(h, _R))
    h = u64.mul_const(h, _M)
    h = u64.xor(h, u64.shr(h, _R))
    return h


def hash_u32x2(a, b, seed: int = 0):
    """Hash of two uint32 values (pbrt Hash(a, b)); returns u64 pair."""
    a = jnp.asarray(a, jnp.uint32)
    b = jnp.asarray(b, jnp.uint32)
    a, b = jnp.broadcast_arrays(a, b)
    return murmur_hash_64a([a, b], 8, seed)


def zsobol_hash(dimension, seed):
    """Hash(dimension:int32, seed:uint32) used for Sobol scrambling
    (sobol.jl:20-31)."""
    return hash_u32x2(dimension, seed)


# --- PCG32 (spectral-eval.jl:750-826) ----------------------------------------

PCG32_MULT = 0x5851F42D4C957F2D
ONE_MINUS_EPS = jnp.float32(1.0) - jnp.float32(jnp.finfo(jnp.float32).eps) / 2


def pcg32_init(seq_index, seed=None):
    """Initialize PCG32 from u64 seq_index (and optional u64 seed)."""
    if seed is None:
        seed = mix_bits(seq_index)
    inc = u64.or_(u64.shl(seq_index, 1), u64.from_int(1, like=seq_index[0]))
    state = u64.from_int(0, like=seq_index[0])
    state = u64.add(u64.mul_const(state, PCG32_MULT), inc)
    state = u64.add(state, seed)
    state = u64.add(u64.mul_const(state, PCG32_MULT), inc)
    return (state, inc)


def pcg32_u32(rng):
    """Uniform uint32 draw; returns (value, new_rng)."""
    state, inc = rng
    new_state = u64.add(u64.mul_const(state, PCG32_MULT), inc)
    xorshifted = u64.to_u32(u64.shr(u64.xor(u64.shr(state, 18), state), 27))
    rot = u64.to_u32(u64.shr(state, 59)) & jnp.uint32(31)
    value = (xorshifted >> rot) | (xorshifted << ((jnp.uint32(32) - rot) & jnp.uint32(31)))
    return value, (new_state, inc)


def pcg32_f32(rng):
    """Uniform float32 in [0,1); returns (value, new_rng)."""
    v, rng = pcg32_u32(rng)
    f = jnp.minimum(ONE_MINUS_EPS, v.astype(jnp.float32) * jnp.float32(2.3283064e-10))
    return f, rng


def sample_exponential(u, a):
    return -jnp.log(1.0 - u) / a


def reverse_bits32(v):
    v = jnp.asarray(v, jnp.uint32)
    v = ((v >> 1) & jnp.uint32(0x55555555)) | ((v & jnp.uint32(0x55555555)) << 1)
    v = ((v >> 2) & jnp.uint32(0x33333333)) | ((v & jnp.uint32(0x33333333)) << 2)
    v = ((v >> 4) & jnp.uint32(0x0F0F0F0F)) | ((v & jnp.uint32(0x0F0F0F0F)) << 4)
    v = ((v >> 8) & jnp.uint32(0x00FF00FF)) | ((v & jnp.uint32(0x00FF00FF)) << 8)
    return (v >> 16) | (v << 16)


def fast_owen_scramble(v, seed):
    """FastOwenScrambler (sobol.jl:70-83); v, seed uint32 arrays."""
    v = reverse_bits32(v)
    v ^= v * jnp.uint32(0x3D20ADEA)
    v += seed
    v *= (seed >> 16) | jnp.uint32(1)
    v ^= v * jnp.uint32(0x05526C56)
    v ^= v * jnp.uint32(0x53A22864)
    return reverse_bits32(v)
