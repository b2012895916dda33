"""Stochastic alpha testing + textured Mix amount
(reference: intersection.jl:223-252 alpha loop; mix-material.jl amount)."""

import jax.numpy as jnp
import numpy as np

from hikari_tpu.camera.camera import make_perspective_camera
from hikari_tpu.film.film import framebuffer
from hikari_tpu.integrators.volpath import VolPath, render
from hikari_tpu.lights.types import PointLight
from hikari_tpu.materials.types import Matte, Mix
from hikari_tpu.scene.mesh import make_quad
from hikari_tpu.scene.scene import Scene
from hikari_tpu.textures.atlas import ImageTexture


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
