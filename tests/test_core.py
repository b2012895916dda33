import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.core import (
    Bounds3, Rays, bounds_from_points, coordinate_system, cross, dot,
    face_forward, from_matrix, identity, length, look_at, make_rays,
    normalize, perspective, reflect, refract, rotate_y, scale, to_local,
    to_world, make_frame, translate,
)


def test_normalize_batched():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
    n = normalize(v)
    np.testing.assert_allclose(n[0], [0.6, 0.0, 0.8], atol=1e-6)
    np.testing.assert_allclose(n[1], [0.0, 0.0, 0.0], atol=1e-6)


def test_coordinate_system_orthonormal():
    key = jax.random.PRNGKey(0)
    v1 = normalize(jax.random.normal(key, (64, 3)))
    v2, v3 = coordinate_system(v1)
    np.testing.assert_allclose(dot(v1, v2), 0.0, atol=1e-5)
    np.testing.assert_allclose(dot(v1, v3), 0.0, atol=1e-5)
    np.testing.assert_allclose(dot(v2, v3), 0.0, atol=1e-5)
    np.testing.assert_allclose(length(v2), 1.0, atol=1e-5)
    np.testing.assert_allclose(length(v3), 1.0, atol=1e-5)


def test_frame_roundtrip():
    key = jax.random.PRNGKey(1)
    n = normalize(jax.random.normal(key, (32, 3)))
    w = normalize(jax.random.normal(jax.random.PRNGKey(2), (32, 3)))
    t, b, nn = make_frame(n)
    local = to_local(t, b, nn, w)
    back = to_world(t, b, nn, local)
    np.testing.assert_allclose(back, w, atol=1e-5)


def test_reflect():
    wo = normalize(jnp.array([1.0, 0.0, 1.0]))
    n = jnp.array([0.0, 0.0, 1.0])
    r = reflect(wo, n)
    np.testing.assert_allclose(r, normalize(jnp.array([-1.0, 0.0, 1.0])), atol=1e-6)


def test_refract_snell():
    # normal incidence: direction unchanged (flipped through surface)
    wi = jnp.array([0.0, 0.0, 1.0])
    n = jnp.array([0.0, 0.0, 1.0])
    valid, wt = refract(wi, n, jnp.array(1.5))
    assert bool(valid)
    np.testing.assert_allclose(wt, [0.0, 0.0, -1.0], atol=1e-6)
    # total internal reflection
    wi2 = normalize(jnp.array([0.99, 0.0, 0.14]))
    valid2, _ = refract(wi2, n, jnp.array(1.0 / 1.5))
    assert not bool(valid2)


def test_transform_compose_inverse():
    t = translate([1.0, 2.0, 3.0]).compose(scale(2.0)).compose(rotate_y(0.3))
    p = jnp.array([0.5, -1.0, 2.0])
    q = t.apply_point(p)
    back = t.inverse().apply_point(q)
    np.testing.assert_allclose(back, p, atol=1e-5)


def test_look_at_points_camera_forward():
    t = look_at([0.0, 0.0, -5.0], [0.0, 0.0, 10.0], [0.0, 1.0, 0.0])
    # camera-space +z maps to world direction toward target
    d = t.apply_vector(jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(normalize(d), [0.0, 0.0, 1.0], atol=1e-5)
    o = t.apply_point(jnp.array([0.0, 0.0, 0.0]))
    np.testing.assert_allclose(o, [0.0, 0.0, -5.0], atol=1e-5)


def test_normal_transform():
    t = scale(jnp.array([2.0, 1.0, 1.0]))
    # normal of plane x+z=const under anisotropic scale must use inv transpose
    n = normalize(jnp.array([1.0, 0.0, 1.0]))
    nt = normalize(t.apply_normal(n))
    v = normalize(t.apply_vector(jnp.array([-1.0, 0.0, 1.0])))  # tangent vector
    np.testing.assert_allclose(jnp.sum(nt * v), 0.0, atol=1e-6)


def test_bounds_slab():
    b = Bounds3(jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]))
    o = jnp.array([[0.0, 0.0, -5.0], [0.0, 5.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    hit, t_near, _ = b.intersect_p(o, 1.0 / d, jnp.array([jnp.inf, jnp.inf]))
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(t_near[0], 4.0, atol=1e-5)


def test_bounds_from_points_and_sphere():
    pts = jnp.array([[0.0, 0.0, 0.0], [2.0, 4.0, 6.0], [1.0, 1.0, 1.0]])
    b = bounds_from_points(pts)
    np.testing.assert_allclose(b.lo, [0.0, 0.0, 0.0])
    np.testing.assert_allclose(b.hi, [2.0, 4.0, 6.0])
    c, r = b.bounding_sphere()
    np.testing.assert_allclose(c, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(r, jnp.sqrt(14.0), atol=1e-5)


def test_rays_pytree_through_jit():
    r = make_rays(jnp.zeros((4, 3)), jnp.ones((4, 3)))

    @jax.jit
    def f(rays: Rays):
        return rays.at(jnp.full_like(rays.t_max, 2.0))

    out = f(r)
    np.testing.assert_allclose(out, 2.0 * jnp.ones((4, 3)))


def test_profiling_stage_timings():
    """utils.profiling measures per-stage wall clock on a tiny scene."""
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.integrators.volpath import VolPath
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.materials.types import Matte
    from hikari_tpu.scene.mesh import make_quad
    from hikari_tpu.scene.scene import Scene
    from hikari_tpu.utils import profiling

    s = Scene()
    s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)), Matte())
    s.add_light(PointLight(position=(0, 2, 0), intensity=(5,) * 3))
    cam = make_perspective_camera((0, 1, -2), (0, 0, 0), (16, 16), fov_deg=45)
    t = profiling.stage_timings(s.build(), cam,
                                vp=VolPath(max_depth=2, samples_per_pixel=4))
    assert set(t) == {"step", "closest_primary", "anyhit_primary"}
    assert all(v > 0 for v in t.values())
