"""64-bit unsigned integer emulation as (hi, lo) uint32 pairs.

TPUs have no native 64-bit integer datapath and JAX keeps x64 disabled, so
the 64-bit hashes / Morton codes / PCG32 state that pbrt-style sampling needs
(reference: /root/reference/src/materials/spectral-eval.jl:560-826,
src/sampler/sobol.jl) are emulated with pairs of uint32 lanes. All ops are
elementwise and broadcast over batches.

A U64 is simply a tuple (hi, lo) of uint32 arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
_MASK16 = jnp.uint32(0xFFFF)


def u64(hi, lo):
    return (jnp.asarray(hi, U32), jnp.asarray(lo, U32))


def from_u32(lo):
    lo = jnp.asarray(lo, U32)
    return (jnp.zeros_like(lo), lo)


def from_int(value: int, like=None):
    hi = jnp.uint32((value >> 32) & 0xFFFFFFFF)
    lo = jnp.uint32(value & 0xFFFFFFFF)
    if like is not None:
        hi = jnp.broadcast_to(hi, like.shape)
        lo = jnp.broadcast_to(lo, like.shape)
    return (hi, lo)


def to_u32(x):
    """Low 32 bits."""
    return x[1]


def xor(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def or_(a, b):
    return (a[0] | b[0], a[1] | b[1])


def and_(a, b):
    return (a[0] & b[0], a[1] & b[1])


def add(a, b):
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(U32)
    hi = a[0] + b[0] + carry
    return (hi, lo)


def shl(x, s: int):
    """Left shift by a static amount."""
    hi, lo = x
    if s == 0:
        return x
    if s >= 64:
        return (jnp.zeros_like(hi), jnp.zeros_like(lo))
    if s >= 32:
        return (lo << (s - 32) if s > 32 else lo, jnp.zeros_like(lo))
    return ((hi << s) | (lo >> (32 - s)), lo << s)


def shr(x, s: int):
    """Logical right shift by a static amount."""
    hi, lo = x
    if s == 0:
        return x
    if s >= 64:
        return (jnp.zeros_like(hi), jnp.zeros_like(lo))
    if s >= 32:
        return (jnp.zeros_like(hi), hi >> (s - 32) if s > 32 else hi)
    return (hi >> s, (lo >> s) | (hi << (32 - s)))


def _mul32_wide(a, b):
    """Full 64-bit product of two uint32 arrays -> (hi, lo)."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    p00 = a0 * b0                      # up to 32 bits
    p01 = a0 * b1                      # up to 32 bits, value << 16
    p10 = a1 * b0                      # up to 32 bits, value << 16
    p11 = a1 * b1                      # up to 32 bits, value << 32
    mid = (p00 >> 16) + (p01 & _MASK16) + (p10 & _MASK16)
    lo = (p00 & _MASK16) | (mid << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return (hi, lo)


def mul(a, b):
    """64x64 -> low 64 bits of product."""
    hi, lo = _mul32_wide(a[1], b[1])
    hi = hi + a[1] * b[0] + a[0] * b[1]
    return (hi, lo)


def mul_const(a, c: int):
    return mul(a, from_int(c, like=a[0]))


def eq_zero(x):
    return (x[0] == 0) & (x[1] == 0)


def bit(x, i: int):
    """Bit i (static) as uint32 0/1."""
    if i < 32:
        return (x[1] >> i) & jnp.uint32(1)
    return (x[0] >> (i - 32)) & jnp.uint32(1)


def mod_small(x, m: int):
    """x mod m for small static m (via float-free 64-bit by parts).

    (hi*2^32 + lo) mod m = ((hi mod m) * (2^32 mod m) + lo mod m) mod m.
    Safe when m^2 < 2^32 (uint32 intermediate), true for m <= 65535.
    """
    assert m * m < 2**32
    two32_mod = jnp.uint32((1 << 32) % m)
    return ((x[0] % m) * two32_mod + x[1] % m) % m
