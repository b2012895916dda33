import jax.numpy as jnp
import numpy as np

from hikari_tpu.sampling import u64
from hikari_tpu.sampling.hashes import (
    hash_u32x2, mix_bits, pcg32_f32, pcg32_init, pcg32_u32, reverse_bits32,
)
from hikari_tpu.sampling.sobol import (
    compute_pixel_sample, encode_morton2, make_zsobol, sample_1d, sample_2d,
)

M64 = (1 << 64) - 1


# --- pure-python models (independent oracle implementations) -----------------

def py_mix_bits(v):
    v ^= v >> 31
    v = (v * 0x7FB5D329728EA185) & M64
    v ^= v >> 27
    v = (v * 0x81DADEF4BC2DD44D) & M64
    v ^= v >> 33
    return v


def py_murmur64a(data: bytes, seed=0):
    m = 0xC6A4A7935BD1E995
    r = 47
    h = (seed ^ (len(data) * m)) & M64
    n = len(data) // 8
    for i in range(n):
        k = int.from_bytes(data[8 * i : 8 * i + 8], "little")
        k = (k * m) & M64
        k ^= k >> r
        k = (k * m) & M64
        h ^= k
        h = (h * m) & M64
    rem = data[8 * n :]
    if rem:
        h ^= int.from_bytes(rem, "little")
        h = (h * m) & M64
    h ^= h >> r
    h = (h * m) & M64
    h ^= h >> r
    return h


def py_pcg32_seq(seq_index, n):
    mult = 0x5851F42D4C957F2D
    seed = py_mix_bits(seq_index)
    inc = ((seq_index << 1) | 1) & M64
    state = 0
    state = (state * mult + inc) & M64
    state = (state + seed) & M64
    state = (state * mult + inc) & M64
    out = []
    for _ in range(n):
        old = state
        state = (old * mult + inc) & M64
        xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        out.append(((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & 0xFFFFFFFF)
    return out


def as_int(x):
    return (int(x[0]) << 32) | int(x[1])


# --- u64 emulation ------------------------------------------------------------

def test_u64_ops_against_python():
    rng = np.random.RandomState(0)
    a_vals = rng.randint(0, 1 << 62, size=16, dtype=np.uint64)
    b_vals = rng.randint(0, 1 << 62, size=16, dtype=np.uint64)
    a = u64.u64((a_vals >> np.uint64(32)).astype(np.uint32), a_vals.astype(np.uint32))
    b = u64.u64((b_vals >> np.uint64(32)).astype(np.uint32), b_vals.astype(np.uint32))
    add = u64.add(a, b)
    mul = u64.mul(a, b)
    for i in range(16):
        ai, bi = int(a_vals[i]), int(b_vals[i])
        assert (int(add[0][i]) << 32 | int(add[1][i])) == (ai + bi) & M64
        assert (int(mul[0][i]) << 32 | int(mul[1][i])) == (ai * bi) & M64
    for s in [0, 1, 13, 31, 32, 33, 47, 63]:
        shl = u64.shl(a, s)
        shr = u64.shr(a, s)
        for i in range(4):
            ai = int(a_vals[i])
            assert (int(shl[0][i]) << 32 | int(shl[1][i])) == (ai << s) & M64, s
            assert (int(shr[0][i]) << 32 | int(shr[1][i])) == ai >> s, s


def test_mix_bits_matches():
    vals = [0, 1, 0xDEADBEEF, 0x123456789ABCDEF0]
    for v in vals:
        got = mix_bits(u64.from_int(v, like=jnp.zeros((), jnp.uint32)))
        assert as_int((got[0], got[1])) == py_mix_bits(v)


def test_murmur_matches():
    for a, b in [(0, 0), (1, 0), (7, 0xCAFEBABE), (123456, 42)]:
        data = int(a).to_bytes(4, "little") + int(b).to_bytes(4, "little")
        expect = py_murmur64a(data)
        got = hash_u32x2(jnp.uint32(a), jnp.uint32(b))
        assert as_int(got) == expect, (a, b)


def test_pcg32_matches():
    seq = 12345
    expect = py_pcg32_seq(seq, 8)
    rng = pcg32_init(u64.from_int(seq, like=jnp.zeros((), jnp.uint32)))
    for e in expect:
        v, rng = pcg32_u32(rng)
        assert int(v) == e


def test_pcg32_float_range():
    rng = pcg32_init(u64.from_int(7, like=jnp.zeros((128,), jnp.uint32)))
    f, rng = pcg32_f32(rng)
    assert float(jnp.min(f)) >= 0.0 and float(jnp.max(f)) < 1.0
    f2, _ = pcg32_f32(rng)
    assert float(jnp.mean(jnp.abs(f - f2))) > 0.01  # sequence advances


def test_reverse_bits():
    assert int(reverse_bits32(jnp.uint32(1))) == 0x80000000
    assert int(reverse_bits32(jnp.uint32(0x80000000))) == 1
    assert int(reverse_bits32(jnp.uint32(0xFFFFFFFF))) == 0xFFFFFFFF


def test_morton():
    m = encode_morton2(jnp.uint32(0b101), jnp.uint32(0b011))
    # x bits even positions, y odd: x=5 (bits 0,2), y=3 (bits 0,1)
    expect = (1 << 0) | (1 << 4) | (1 << 1) | (1 << 3)
    assert as_int(m) == expect


# --- zsobol sampler ------------------------------------------------------------

def test_zsobol_range_and_determinism():
    cfg = make_zsobol(64, 64, 16, seed=7)
    px = jnp.arange(64, dtype=jnp.uint32)
    py = jnp.full((64,), 5, jnp.uint32)
    si = jnp.zeros((64,), jnp.uint32)
    v1 = sample_1d(cfg, px, py, si, 1)
    v2 = sample_1d(cfg, px, py, si, 1)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    assert float(jnp.min(v1)) >= 0.0 and float(jnp.max(v1)) < 1.0
    # distinct pixels decorrelated
    assert len(np.unique(np.asarray(v1))) > 32


def test_zsobol_stratification_over_spp():
    # Sobol dim pair (0,1) with Owen scrambling keeps elementary-interval
    # stratification: 16 samples of one pixel hit each 1/16 stratum once.
    spp = 16
    cfg = make_zsobol(16, 16, spp, seed=3)
    px = jnp.full((spp,), 3, jnp.uint32)
    py = jnp.full((spp,), 9, jnp.uint32)
    si = jnp.arange(spp, dtype=jnp.uint32)
    u = np.asarray(sample_1d(cfg, px, py, si, 2))
    strata = np.floor(u * spp).astype(int)
    assert sorted(strata.tolist()) == list(range(spp)), strata
    ux, uy = sample_2d(cfg, px, py, si, 3)
    ux, uy = np.asarray(ux), np.asarray(uy)
    # 2D: each quadrant of the 4x4 grid hit exactly once
    cells = sorted((int(x * 4) * 4 + int(y * 4)) for x, y in zip(ux, uy))
    assert cells == list(range(16)), cells


def test_pixel_sample_shapes():
    cfg = make_zsobol(32, 32, 4)
    px = jnp.arange(8, dtype=jnp.uint32)
    py = jnp.arange(8, dtype=jnp.uint32)
    si = jnp.zeros((8,), jnp.uint32)
    ps = compute_pixel_sample(cfg, px, py, si)
    assert ps.jitter.shape == (8, 2)
    assert ps.lens.shape == (8, 2)
    assert ps.wavelength_u.shape == (8,)
    for arr in (ps.jitter, ps.lens, ps.wavelength_u[..., None], ps.time[..., None]):
        a = np.asarray(arr)
        assert a.min() >= 0.0 and a.max() < 1.0
