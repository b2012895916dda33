"""Native C++ BVH builder vs numpy reference builder."""

import numpy as np
import pytest

from hikari_tpu.geometry.bvh import _build_bvh_native, build_bvh


def _prims(p, seed=0):
    rng = np.random.RandomState(seed)
    c = rng.rand(p, 3).astype(np.float32) * 8 - 4
    ext = rng.rand(p, 3).astype(np.float32) * 0.3
    return c - ext, c + ext


def test_native_available():
    lo, hi = _prims(100)
    fb = _build_bvh_native(lo, hi, 4)
    assert fb is not None, "native builder failed to compile/load"


def test_native_tree_is_valid_and_equivalent():
    import jax.numpy as jnp

    from hikari_tpu.geometry.traverse import (
        DeviceBVH, brute_force_closest_hit, closest_hit,
    )

    lo, hi = _prims(800, seed=2)
    # synthesize triangles inside each box so traversal is testable
    rng = np.random.RandomState(3)
    p0 = lo + rng.rand(800, 3).astype(np.float32) * (hi - lo)
    p1 = lo + rng.rand(800, 3).astype(np.float32) * (hi - lo)
    p2 = lo + rng.rand(800, 3).astype(np.float32) * (hi - lo)
    tlo = np.minimum(np.minimum(p0, p1), p2)
    thi = np.maximum(np.maximum(p0, p1), p2)

    for native in (True, False):
        fb = build_bvh(tlo, thi, native=native)
        n_nodes = fb.lo.shape[0]
        # structural invariants
        assert sorted(fb.prim_order.tolist()) == list(range(800))
        assert (fb.skip > np.arange(n_nodes)).all()
        assert (fb.skip <= n_nodes).all()
        interior = fb.count == 0
        assert interior[0] or n_nodes == 1

        order = fb.prim_order
        bvh = DeviceBVH(
            lo=jnp.asarray(fb.lo), hi=jnp.asarray(fb.hi),
            first=jnp.asarray(fb.first), count=jnp.asarray(fb.count),
            skip=jnp.asarray(fb.skip),
            p0=jnp.asarray(p0[order]), p1=jnp.asarray(p1[order]),
            p2=jnp.asarray(p2[order]),
        )
        r = 400
        o = rng.rand(r, 3).astype(np.float32) * 10 - 5
        d = rng.randn(r, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t_max = np.full(r, np.inf, np.float32)
        rec = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max))
        ref = brute_force_closest_hit(
            bvh.p0, bvh.p1, bvh.p2, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max)
        )
        assert (np.asarray(rec.hit) == np.asarray(ref.hit)).all(), f"native={native}"
        both = np.asarray(rec.hit)
        np.testing.assert_allclose(
            np.asarray(rec.t)[both], np.asarray(ref.t)[both], rtol=1e-4
        )
