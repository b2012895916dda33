"""Stochastic alpha testing + textured Mix amount
(reference: intersection.jl:223-252 alpha loop; mix-material.jl amount)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.camera.camera import make_perspective_camera
from hikari_tpu.film.film import framebuffer
from hikari_tpu.integrators.volpath import VolPath, render
from hikari_tpu.lights.types import PointLight
from hikari_tpu.materials.types import Matte, Mix
from hikari_tpu.scene.mesh import make_quad
from hikari_tpu.scene.scene import Scene
from hikari_tpu.textures.atlas import ImageTexture

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def _two_plane_scene(alpha):
    """Camera looks at a red occluder plane in front of a white wall."""
    s = Scene()
    s.add(make_quad((-2, -2, 2), (2, -2, 2), (2, 2, 2), (-2, 2, 2)),
          Matte(kd=(0.9, 0.9, 0.9)))  # back wall
    s.add(make_quad((-2, -2, 1), (2, -2, 1), (2, 2, 1), (-2, 2, 1)),
          Matte(kd=(0.9, 0.1, 0.1)), alpha=alpha)  # occluder
    s.add_light(PointLight(position=(0.0, 0.0, -2.0), intensity=(30.0, 30.0, 30.0)))
    return s.build()


def _mean_rg(scene, spp=24):
    cam = make_perspective_camera((0, 0, -3.0), (0, 0, 0), (24, 24), fov_deg=30.0)
    img = np.asarray(framebuffer(render(VolPath(max_depth=2, samples_per_pixel=spp), scene, cam)))
    return img[..., 0].mean(), img[..., 1].mean()


def test_alpha_zero_is_fully_transparent():
    r0, g0 = _mean_rg(_two_plane_scene(alpha=0.0))
    r1, g1 = _mean_rg(_two_plane_scene(alpha=None))
    # alpha=0: see the white wall (g ~ r); opaque: red occluder (g << r)
    assert g0 > 0.5 * r0, (r0, g0)
    assert g1 < 0.5 * r1, (r1, g1)


def test_alpha_half_blends():
    r, g = _mean_rg(_two_plane_scene(alpha=0.5), spp=48)
    rt, gt = _mean_rg(_two_plane_scene(alpha=None), spp=8)
    r0, g0 = _mean_rg(_two_plane_scene(alpha=0.0), spp=8)
    # halfway between opaque and transparent (loose statistical bound)
    assert g0 * 0.2 < g < g0 * 0.9, (g, g0, gt)


def test_mix_texture_amount():
    """A Mix with a step-texture amount: left half m1 (red), right m2 (blue)."""
    img = np.zeros((8, 8), np.float32)
    img[:, 4:] = 1.0  # amount=1 on right half -> picks m1 there
    mix = Mix(m1=Matte(kd=(0.9, 0.05, 0.05)), m2=Matte(kd=(0.05, 0.05, 0.9)),
              amount=ImageTexture(image=img))
    s = Scene()
    s.add(make_quad((-2, -2, 1), (2, -2, 1), (2, 2, 1), (-2, 2, 1)), mix)
    s.add_light(PointLight(position=(0.0, 0.0, -2.0), intensity=(30.0, 30.0, 30.0)))
    cam = make_perspective_camera((0, 0, -2.5), (0, 0, 0), (32, 32), fov_deg=45.0)
    img_out = np.asarray(framebuffer(render(
        VolPath(max_depth=1, samples_per_pixel=8), s.build(), cam)))
    left = img_out[:, :12]
    right = img_out[:, 20:]
    # uv origin may put amount=1 on either side; just require a red side and
    # a blue side
    sides = sorted([(left[..., 0].mean(), left[..., 2].mean()),
                    (right[..., 0].mean(), right[..., 2].mean())])
    blue_side, red_side = sides[0], sides[1]
    assert red_side[0] > 2.0 * red_side[1], sides
    assert blue_side[1] > 2.0 * blue_side[0], sides


def test_alpha_stack_transmission_stress():
    """Dense alpha 'foliage': 8 stacked alpha=0.3 quads. Each alpha round
    clears one rejected hit, so a cap below the stack depth renders the
    stack opaque; with the reference's 16 rounds (intersection.jl:223) the
    escape fraction must track alpha-compositing: P(escape)=0.7^8~5.8%."""
    import numpy as np
    from hikari_tpu.integrators.volpath import _closest_hit_surface
    from hikari_tpu.materials.types import Matte
    from hikari_tpu.scene.mesh import make_quad
    from hikari_tpu.scene.scene import Scene

    s = Scene()
    alpha = 0.3
    n_layers = 8
    for i in range(n_layers):
        z = 1.0 + 0.1 * i
        s.add(make_quad((-5, -5, z), (5, -5, z), (5, 5, z), (-5, 5, z)),
              Matte(), alpha=alpha)
    scene = s.build()

    n = 8192
    rng = np.random.RandomState(0)
    o = np.zeros((n, 3), np.float32)
    o[:, :2] = rng.uniform(-3, 3, (n, 2))
    o = jnp.asarray(o)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    t_max = jnp.full((n,), jnp.inf)
    rec = _closest_hit_surface(scene, o, d, t_max,
                             active=jnp.ones((n,), bool))
    escape = 1.0 - float(np.asarray(rec.hit).mean())
    expect = (1.0 - alpha) ** n_layers  # ~0.0576
    assert abs(escape - expect) < 0.35 * expect + 0.01, (escape, expect)


def test_shadow_through_nine_interfaces_finds_blocker():
    """9 pure-interface boundaries followed by an opaque pane: the shadow
    chain (cap 10, intersection.jl:302-563) must still find the blocker —
    a shorter cap would leak light."""
    import numpy as np
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.materials.types import Interface, Matte
    from hikari_tpu.media.types import HomogeneousMedium
    from hikari_tpu.scene.mesh import make_quad
    from hikari_tpu.scene.scene import Scene

    def build(with_blocker):
        s = Scene()
        # floor receiving the light
        s.add(make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
              Matte(kd=(0.8, 0.8, 0.8)))
        # a wisp of medium so the interface shadow path is exercised
        wisp = HomogeneousMedium(sigma_a=(1e-6,) * 3, sigma_s=(1e-6,) * 3)
        for i in range(9):
            y = 0.5 + 0.12 * i
            s.add(make_quad((-2, y, -2), (2, y, -2), (2, y, 2), (-2, y, 2)),
                  Interface(), inside_medium=wisp)
        if with_blocker:
            y = 1.7
            s.add(make_quad((-2, y, -2), (2, y, -2), (2, y, 2), (-2, y, 2)),
                  Matte(kd=(0.1, 0.1, 0.1)))
        s.add_light(PointLight(position=(0.0, 2.5, 0.0), intensity=(20, 20, 20)))
        return s.build()

    cam = make_perspective_camera((0, 1.2, -3.0), (0, 0.2, 0), (24, 24), fov_deg=40.0)
    vp = VolPath(max_depth=2, samples_per_pixel=8)
    img_open = np.asarray(framebuffer(render(vp, build(False), cam)))
    img_blocked = np.asarray(framebuffer(render(vp, build(True), cam)))
    floor_open = img_open[12:22].mean()
    floor_blocked = img_blocked[12:22].mean()
    assert floor_open > 0.02, floor_open
    # the blocker sits between the light and the floor behind 9 interfaces;
    # direct light on the floor must collapse (only the blocker's own
    # bounce light remains)
    assert floor_blocked < 0.35 * floor_open, (floor_open, floor_blocked)
