"""Resident sorted-compacted bounce loop (VolPath.resident).

The resident driver permutes the wavefront once per bounce (live lanes
first, spatially sorted) and runs the whole bounce body on a
lax.cond-selected static prefix, restoring lane order only at the film
write. Per-lane transport is permutation-invariant (samplers key on pixel
ids, tracking RNG on ray geometry), so these tests pin the resident path
against the plain full-wavefront loop to fp tolerance — including the
cascade's untouched-suffix carry and the non-tile-multiple padding path.
"""

import numpy as np

import pytest

# compile-heavy integration renders: full tier only
pytestmark = pytest.mark.slow
import pytest

from hikari_tpu.camera.camera import make_perspective_camera
from hikari_tpu.film.film import framebuffer
from hikari_tpu.film.filters import GAUSSIAN, make_filter
from hikari_tpu.integrators.volpath import VolPath, render
from hikari_tpu.materials.types import Emissive, Glass, Gold, Matte
from hikari_tpu.scene.mesh import make_quad, make_sphere
from hikari_tpu.scene.scene import Scene


def _box():
    s = Scene()
    white = Matte(kd=(0.73, 0.73, 0.73))
    s.add(make_quad((-1, 0, 0), (1, 0, 0), (1, 0, 2), (-1, 0, 2)), white)
    s.add(make_quad((-1, 2, 0), (-1, 2, 2), (1, 2, 2), (1, 2, 0)), white)
    s.add(make_quad((-1, 0, 2), (1, 0, 2), (1, 2, 2), (-1, 2, 2)), white)
    s.add(make_sphere((-0.45, 0.4, 1.3), 0.4, 8, 16), Gold(roughness=0.2))
    s.add(make_sphere((0.45, 0.35, 0.9), 0.35, 8, 16), Glass(eta=1.5))
    s.add(
        make_quad((-0.3, 1.99, 0.7), (0.3, 1.99, 0.7), (0.3, 1.99, 1.3),
                  (-0.3, 1.99, 1.3)),
        Emissive(le=(1.0, 0.9, 0.7), scale=15.0),
    )
    return s.build()


def _render(scene, res, resident, levels=0):
    cam = make_perspective_camera(
        (0.0, 1.0, -2.6), (0.0, 1.0, 1.0), res, fov_deg=50.0)
    vp = VolPath(max_depth=3, samples_per_pixel=1,
                 resident=resident, resident_levels=levels)
    film = render(vp, scene, cam, filt=make_filter(GAUSSIAN))
    return np.asarray(framebuffer(film))


@pytest.fixture(scope="module")
def box():
    return _box()


def test_resident_cascade_matches_plain(box):
    """64x32 = 2048 lanes: two cascade levels (2048, 1024), so by bounce 2
    the live set fits the half prefix and the suffix-carry path runs."""
    a = _render(box, (64, 32), resident="off")
    b = _render(box, (64, 32), resident="on", levels=2)
    assert np.all(np.isfinite(b))
    assert b.max() > 0.0
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


def test_resident_nonmultiple_padding(box):
    """24x18 = 432 lanes pads to one RAY_TILE; pad lanes must neither
    contribute nor corrupt the final inverse permutation."""
    a = _render(box, (24, 18), resident="off")
    b = _render(box, (24, 18), resident="on", levels=1)
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)
