import jax
import jax.numpy as jnp
import numpy as np

from hikari_tpu.geometry.bvh import build_bvh
from hikari_tpu.geometry.traverse import (
    DeviceBVH, any_hit, brute_force_closest_hit, closest_hit,
)
from hikari_tpu.geometry.triangle import (
    intersect_triangle, interpolate, sample_triangle, triangle_area,
    triangle_normal,
)


def random_triangles(n, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-1, 1, (n, 3)) * scale
    offs = rng.uniform(-0.1, 0.1, (n, 3, 3)) * scale
    tris = centers[:, None, :] + offs
    return tris.astype(np.float32)


def make_device_bvh(tris):
    p = tris
    lo = p.min(axis=1)
    hi = p.max(axis=1)
    fb = build_bvh(lo, hi)
    pr = p[fb.prim_order]
    return fb, DeviceBVH(
        lo=jnp.asarray(fb.lo), hi=jnp.asarray(fb.hi),
        first=jnp.asarray(fb.first), count=jnp.asarray(fb.count),
        skip=jnp.asarray(fb.skip),
        p0=jnp.asarray(pr[:, 0]), p1=jnp.asarray(pr[:, 1]), p2=jnp.asarray(pr[:, 2]),
    )


def test_single_triangle_intersect():
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 1.0, 0.0])
    o = jnp.array([0.2, 0.2, -1.0])
    d = jnp.array([0.0, 0.0, 1.0])
    hit, t, b1, b2 = intersect_triangle(o, d, p0, p1, p2, jnp.inf)
    assert bool(hit)
    np.testing.assert_allclose(float(t), 1.0, atol=1e-6)
    np.testing.assert_allclose([float(b1), float(b2)], [0.2, 0.2], atol=1e-6)
    # miss outside
    hit2, *_ = intersect_triangle(
        jnp.array([2.0, 2.0, -1.0]), d, p0, p1, p2, jnp.inf
    )
    assert not bool(hit2)


def test_triangle_helpers():
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([2.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 2.0, 0.0])
    np.testing.assert_allclose(float(triangle_area(p0, p1, p2)), 2.0)
    np.testing.assert_allclose(np.asarray(triangle_normal(p0, p1, p2)), [0, 0, 1])
    v = interpolate(jnp.array(0.5), jnp.array(0.5), p0, p1, p2)
    np.testing.assert_allclose(np.asarray(v), [1.0, 1.0, 0.0])
    p, b1, b2 = sample_triangle(jnp.array(0.3), jnp.array(0.7), p0, p1, p2)
    assert float(b1) >= 0 and float(b2) >= 0 and float(b1 + b2) <= 1.0


def test_bvh_structure():
    tris = random_triangles(100)
    fb = build_bvh(tris.min(axis=1), tris.max(axis=1))
    n = fb.lo.shape[0]
    # skip links in range, leaves cover all prims exactly once
    assert np.all(fb.skip > np.arange(n))
    assert np.all(fb.skip <= n)
    leaf = fb.count > 0
    total = fb.count[leaf].sum()
    assert total == 100
    assert sorted(fb.prim_order.tolist()) == list(range(100))
    # each leaf's range is within bounds
    assert np.all(fb.first[leaf] + fb.count[leaf] <= 100)
    # parent bounds contain children
    for i in range(n):
        if fb.count[i] == 0:
            l = i + 1
            r = fb.skip[l]
            for c in (l, r):
                assert np.all(fb.lo[i] <= fb.lo[c] + 1e-6)
                assert np.all(fb.hi[i] >= fb.hi[c] - 1e-6)


def test_bvh_vs_brute_force():
    tris = random_triangles(300, seed=1)
    _, dbvh = make_device_bvh(tris)
    rng = np.random.RandomState(2)
    n_rays = 256
    o = jnp.asarray(rng.uniform(-3, 3, (n_rays, 3)), jnp.float32)
    # aim at random triangle centroids so a good fraction of rays hit
    targets = tris.mean(axis=1)[rng.randint(0, tris.shape[0], n_rays)]
    d = jnp.asarray(targets, jnp.float32) - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jnp.full((n_rays,), jnp.inf, jnp.float32)

    got = jax.jit(closest_hit)(dbvh, o, d, t_max)
    ref = brute_force_closest_hit(dbvh.p0, dbvh.p1, dbvh.p2, o, d, t_max)

    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    assert h.sum() > 20  # sanity: some rays hit
    np.testing.assert_allclose(
        np.asarray(got.t)[h], np.asarray(ref.t)[h], rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got.tri)[h], np.asarray(ref.tri)[h])


def test_any_hit_matches_closest():
    tris = random_triangles(200, seed=3)
    _, dbvh = make_device_bvh(tris)
    rng = np.random.RandomState(4)
    n_rays = 128
    o = jnp.asarray(rng.uniform(-3, 3, (n_rays, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n_rays, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jnp.full((n_rays,), jnp.inf, jnp.float32)
    occluded = jax.jit(any_hit)(dbvh, o, d, t_max)
    ch = closest_hit(dbvh, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(occluded), np.asarray(ch.hit))


def test_t_max_respected():
    tris = random_triangles(50, seed=5)
    _, dbvh = make_device_bvh(tris)
    o = jnp.zeros((16, 3), jnp.float32) + jnp.array([0.0, 0.0, -5.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (16, 1))
    unocc = any_hit(dbvh, o, d, jnp.full((16,), 0.01, jnp.float32))
    assert not bool(jnp.any(unocc))  # nothing within t=0.01
