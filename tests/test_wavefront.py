"""Packet-traversal engine tests (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.geometry.bvh import build_bvh
from hikari_tpu.geometry.traverse import brute_force_closest_hit
from hikari_tpu.geometry.wavefront import (
    build_treelets, closest_hit_packets, ray_sort_keys, tile_treelet_mask,
)

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def _random_tris(p, seed=0):
    rng = np.random.RandomState(seed)
    c = rng.rand(p, 3).astype(np.float32) * 4 - 2
    p0 = c + rng.rand(p, 3).astype(np.float32) * 0.5
    p1 = c + rng.rand(p, 3).astype(np.float32) * 0.5
    p2 = c + rng.rand(p, 3).astype(np.float32) * 0.5
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    fb = build_bvh(lo, hi)
    return p0[fb.prim_order], p1[fb.prim_order], p2[fb.prim_order]


def test_packets_match_brute_force():
    p0, p1, p2 = _random_tris(400)
    tl = build_treelets(p0, p1, p2)
    rng = np.random.RandomState(1)
    r = 500
    o = rng.rand(r, 3).astype(np.float32) * 6 - 3
    d = rng.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.full(r, np.inf, np.float32)
    wl = jnp.asarray(p0.min(0))
    wh = jnp.asarray(p0.max(0))

    rec = closest_hit_packets(
        tl, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max), wl, wh,
        interpret=True,
    )
    ref = brute_force_closest_hit(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max),
    )
    hit_w = np.asarray(rec.hit)
    hit_r = np.asarray(ref.hit)
    assert (hit_w == hit_r).all()
    both = hit_w & hit_r
    np.testing.assert_allclose(
        np.asarray(rec.t)[both], np.asarray(ref.t)[both], rtol=1e-4
    )
    assert (np.asarray(rec.tri)[both] == np.asarray(ref.tri)[both]).all()


def test_tile_mask_is_conservative():
    """Every actual hit must come from a treelet the tile mask kept."""
    p0, p1, p2 = _random_tris(300, seed=3)
    tl = build_treelets(p0, p1, p2)
    from hikari_tpu.geometry.wavefront import RAY_TILE, TREELET

    rng = np.random.RandomState(4)
    r = RAY_TILE
    o = rng.rand(r, 3).astype(np.float32) * 6 - 3
    d = rng.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jnp.full((r,), 3.0e37)
    wl = jnp.asarray(p0.min(0))
    wh = jnp.asarray(p0.max(0))
    keys = ray_sort_keys(jnp.asarray(o), jnp.asarray(d), wl, wh)
    order = jnp.argsort(keys)
    os_ = jnp.asarray(o)[order]
    ds = jnp.asarray(d)[order]

    mask, _ = tile_treelet_mask(os_, ds, t_max, tl, 1)
    mask = np.asarray(mask)[0]
    ref = brute_force_closest_hit(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2), os_, ds, t_max
    )
    tri = np.asarray(ref.tri)
    for t in tri[np.asarray(ref.hit)]:
        assert mask[t // TREELET], f"hit tri {t} in culled treelet {t // TREELET}"


def test_volpath_render_matches_across_engines():
    """A full render must be identical between the skip-link walk and the
    packet engine (same sampler, same physics, different intersector)."""
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.materials.types import Emissive, Matte
    from hikari_tpu.scene.mesh import make_quad, make_sphere
    from hikari_tpu.scene.scene import Scene

    def build(traversal):
        s = Scene()
        s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
              Matte(kd=(0.7, 0.7, 0.7)))
        s.add(make_sphere((0, 0.5, 0), 0.5, 8, 16), Matte(kd=(0.8, 0.2, 0.2)))
        s.add(make_quad((-0.4, 2.0, -0.4), (0.4, 2.0, -0.4), (0.4, 2.0, 0.4), (-0.4, 2.0, 0.4)),
              Emissive(le=(1.0, 1.0, 1.0), scale=10.0))
        s.add_light(PointLight(position=(1.0, 2.0, -1.0), intensity=(6.0, 6.0, 6.0)))
        return s.build(traversal=traversal)

    cam = make_perspective_camera((0, 1.0, -3.0), (0, 0.4, 0), (16, 16), fov_deg=45.0)
    vp = VolPath(max_depth=3, samples_per_pixel=2)
    img_sl = np.asarray(framebuffer(render(vp, build("skiplink"), cam)))
    img_pk = np.asarray(framebuffer(render(vp, build("packets_interp"), cam)))
    np.testing.assert_allclose(img_pk, img_sl, atol=2e-5)


def test_any_hit_kernel_matches_brute_force():
    p0, p1, p2 = _random_tris(350, seed=5)
    tl = build_treelets(p0, p1, p2)
    from hikari_tpu.geometry.wavefront import any_hit_packets

    rng = np.random.RandomState(6)
    r = 700
    o = rng.rand(r, 3).astype(np.float32) * 6 - 3
    d = rng.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = rng.rand(r).astype(np.float32) * 5 + 0.2
    act = rng.rand(r) > 0.3
    wl = jnp.asarray(p0.min(0))
    wh = jnp.asarray(p0.max(0))
    occ = np.asarray(any_hit_packets(
        tl, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max), wl, wh,
        interpret=True, active=jnp.asarray(act),
    ))
    ref = brute_force_closest_hit(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max * 0.9999),
    )
    assert (occ == (np.asarray(ref.hit) & act)).all()


def test_banded_two_pass_matches_single_pass():
    """The banded two-pass sweep must return identical hits to the one-pass
    sweep — including lanes resolved in pass 1 whose tiles then have ZERO
    pairs in pass 2 (their carry must pass through the unvisited pallas
    output blocks), inactive lanes, and finite t_max lanes."""
    p0, p1, p2 = _random_tris(400, seed=7)
    tl = build_treelets(p0, p1, p2)
    rng = np.random.RandomState(8)
    r = 1500
    o = rng.rand(r, 3).astype(np.float32) * 6 - 3
    d = rng.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.where(rng.rand(r) < 0.3, rng.rand(r) * 4 + 0.1,
                     np.inf).astype(np.float32)
    act = rng.rand(r) > 0.2
    wl = jnp.asarray(p0.min(0))
    wh = jnp.asarray(p0.max(0))

    args = (tl, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max), wl, wh)
    one = closest_hit_packets(*args, interpret=True, active=jnp.asarray(act))
    for band in (0.5, 2.0, 100.0):
        two = closest_hit_packets(
            *args, interpret=True, active=jnp.asarray(act),
            band=jnp.float32(band),
        )
        hit1, hit2 = np.asarray(one.hit), np.asarray(two.hit)
        assert (hit1[act] == hit2[act]).all(), f"band={band}"
        both = hit1 & hit2 & act
        assert (np.asarray(one.tri)[both] == np.asarray(two.tri)[both]).all()
        np.testing.assert_allclose(
            np.asarray(one.t)[both], np.asarray(two.t)[both], rtol=1e-4)


def test_compaction_cascade_matches_full_sweep():
    """With most lanes dead, the live-lane static-prefix cascade (compact)
    must pick a smaller branch and return results identical to the
    full-size pipeline on every live lane; 6 tiles of rays with ~15% live
    exercise the half/quarter branches."""
    from hikari_tpu.geometry.wavefront import RAY_TILE, any_hit_packets

    p0, p1, p2 = _random_tris(400, seed=9)
    tl = build_treelets(p0, p1, p2)
    rng = np.random.RandomState(10)
    r = 6 * RAY_TILE
    o = rng.rand(r, 3).astype(np.float32) * 6 - 3
    d = rng.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.where(rng.rand(r) < 0.3, rng.rand(r) * 4 + 0.1,
                     np.inf).astype(np.float32)
    act = rng.rand(r) < 0.15
    wl = jnp.asarray(p0.min(0))
    wh = jnp.asarray(p0.max(0))

    args = (tl, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max), wl, wh)
    full = closest_hit_packets(
        *args, interpret=True, active=jnp.asarray(act), compact=False)
    casc = closest_hit_packets(
        *args, interpret=True, active=jnp.asarray(act), compact=True)
    hf, hc = np.asarray(full.hit), np.asarray(casc.hit)
    assert (hf[act] == hc[act]).all()
    both = hf & hc & act
    assert (np.asarray(full.tri)[both] == np.asarray(casc.tri)[both]).all()
    np.testing.assert_allclose(
        np.asarray(full.t)[both], np.asarray(casc.t)[both], rtol=1e-4)

    of = np.asarray(any_hit_packets(
        *args, interpret=True, active=jnp.asarray(act), compact=False))
    oc = np.asarray(any_hit_packets(
        *args, interpret=True, active=jnp.asarray(act), compact=True))
    assert (of[act] == oc[act]).all()
    assert not oc[~act].any()
