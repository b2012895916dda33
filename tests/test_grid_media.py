"""Grid media: DDA majorants, RGBGridMedium, procedural clouds."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from hikari_tpu.media.noise import fbm3d, generate_cloud_density, perlin3d, worley3d
from hikari_tpu.media.sample import PASSED, SCATTERED, delta_track, ratio_track_tr
from hikari_tpu.media.types import (
    CloudVolume, GridMedium, RGBGridMedium, pack_media,
)
from hikari_tpu.spectral.rgb2spec import srgb_table

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def test_perlin_properties():
    g = np.linspace(0.1, 7.9, 50)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    v = perlin3d(x, y, z)
    assert -1.2 < v.min() and v.max() < 1.2
    assert v.std() > 0.05
    # zero at lattice points
    iv = perlin3d(np.arange(5.0), np.arange(5.0), np.arange(5.0))
    np.testing.assert_allclose(iv, 0.0, atol=1e-12)
    # deterministic
    np.testing.assert_array_equal(v, perlin3d(x, y, z))


def test_worley_range():
    g = np.linspace(0.0, 5.0, 40)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    v = worley3d(x, y, z)
    assert v.min() >= 0.0 and v.max() < 2.0
    assert v.std() > 0.05


def test_cloud_density():
    d = generate_cloud_density(24)
    assert d.shape == (24, 24, 24)
    assert d.min() >= 0.0
    assert d.max() > 0.3
    # spherical falloff: corners empty
    assert d[0, 0, 0] == 0.0 and d[-1, -1, -1] == 0.0
    # interior has structure
    assert (d > 0.01).mean() > 0.02


def _track(banks, o, d, t_max, n):
    table = srgb_table()
    lam = jnp.tile(jnp.array([[500.0, 550.0, 600.0, 650.0]]), (n, 1))
    ones = jnp.ones((n, 4))
    return delta_track(
        banks, table, jnp.zeros((n,), jnp.int32), o, d, t_max, lam,
        ones, ones, ones, jnp.ones((n,), bool), jnp.zeros((n,), bool),
    )


def test_grid_medium_dda_matches_analytic():
    """A uniform density grid must reproduce Beer-Lambert through the DDA
    majorant path exactly like a homogeneous medium."""
    dens = np.full((8, 8, 8), 0.75, np.float32)
    med = GridMedium(density=dens, bounds_lo=(0, 0, 0), bounds_hi=(1, 1, 1),
                     sigma_a=(1.0, 1.0, 1.0), sigma_s=(0, 0, 0))
    banks = pack_media([med])
    n = 8192
    o = jnp.tile(jnp.array([[0.5, 0.5, -0.5]]), (n, 1)) + \
        jnp.arange(n)[:, None] * 1e-6
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    res = _track(banks, o, d, jnp.full((n,), 3.0), n)
    frac_passed = float(jnp.mean((res.status == PASSED).astype(jnp.float32)))
    expect = np.exp(-0.75 * 1.0)  # unit path length inside the box
    assert abs(frac_passed - expect) < 0.03, (frac_passed, expect)


def test_grid_medium_half_empty():
    """Density only in z < 0.5: survival = exp(-sigma * 0.5); the empty
    half must be skipped by the majorant cells."""
    dens = np.zeros((16, 16, 16), np.float32)
    dens[:8] = 2.0  # z in [0, 0.5)
    med = GridMedium(density=dens, bounds_lo=(0, 0, 0), bounds_hi=(1, 1, 1),
                     sigma_a=(1.0, 1.0, 1.0), sigma_s=(0, 0, 0))
    banks = pack_media([med])
    n = 8192
    o = jnp.tile(jnp.array([[0.5, 0.5, -0.25]]), (n, 1)) + \
        jnp.arange(n)[:, None] * 1e-6
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    res = _track(banks, o, d, jnp.full((n,), 3.0), n)
    frac_passed = float(jnp.mean((res.status == PASSED).astype(jnp.float32)))
    # voxel-centered trilinear softens the step edge; wide tolerance
    expect = np.exp(-2.0 * 0.5)
    assert abs(frac_passed - expect) < 0.06, (frac_passed, expect)


def test_rgb_grid_medium():
    """RGBGridMedium: wavelength-dependent absorption — red-absorbing fog
    passes more at short wavelengths. Verify via ratio tracking T."""
    sa = np.zeros((8, 8, 8, 3), np.float32)
    sa[..., 0] = 2.0   # absorb red strongly
    sa[..., 2] = 0.1
    med = RGBGridMedium(sigma_a_grid=sa, bounds_lo=(0, 0, 0), bounds_hi=(1, 1, 1))
    banks = pack_media([med])
    table = srgb_table()
    n = 4096
    o = jnp.tile(jnp.array([[0.5, 0.5, -0.5]]), (n, 1)) + jnp.arange(n)[:, None] * 1e-6
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    # hero wavelengths: blue-ish 460 and red-ish 640
    lam = jnp.tile(jnp.array([[460.0, 540.0, 600.0, 640.0]]), (n, 1))
    T, r_l, r_u = ratio_track_tr(
        banks, table, jnp.zeros((n,), jnp.int32), o, d, jnp.full((n,), 3.0),
        lam, jnp.ones((n,), bool),
    )
    est = np.asarray(T / jnp.maximum(r_l, 1e-12)).mean(0)
    assert est[0] > 2.0 * est[3], est  # blue transmits much more than red


@pytest.mark.slow
def test_cloud_volume_render():
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.lights.types import DistantLight
    from hikari_tpu.materials.types import Interface, Matte
    from hikari_tpu.scene.mesh import make_box, make_quad
    from hikari_tpu.scene.scene import Scene

    cloud = CloudVolume(resolution=32, bounds_lo=(-1, 0.2, -1),
                        bounds_hi=(1, 2.2, 1), sigma_s=(3.0, 3.0, 3.0),
                        sigma_a=(0.1, 0.1, 0.1), g=0.5)
    s = Scene()
    s.add(make_quad((-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4)),
          Matte(kd=(0.4, 0.4, 0.4)))
    s.add(make_box((-1, 0.2, -1), (1, 2.2, 1)), Interface(), inside_medium=cloud)
    s.add_light(DistantLight(direction=(0.3, -1.0, 0.2), radiance=(4.0, 4.0, 4.0)))
    scene = s.build()
    cam = make_perspective_camera((0, 1.4, -4.5), (0, 1.0, 0), (24, 24), fov_deg=50.0)
    img = np.asarray(framebuffer(render(VolPath(max_depth=6, samples_per_pixel=4), scene, cam)))
    assert np.isfinite(img).all()
    assert img.max() > 0.01


@pytest.mark.slow
def test_thick_medium_transmittance_accuracy():
    """Optically thick absorbing grid: delta tracking inside
    MAX_TRACK_STEPS must reproduce exp(-tau) (no step-cap truncation bias)
    at tau=8, and tau=50 must be fully extinguished."""
    import numpy as np
    from hikari_tpu.media import sample as ms
    from hikari_tpu.media.types import GridMedium, pack_media
    from hikari_tpu.spectral.rgb2spec import srgb_table

    def transmit(tau):
        # uniform density grid, absorption only
        dens = np.ones((8, 8, 8), np.float32)
        gm = GridMedium(density=dens, bounds_lo=(0, 0, 0), bounds_hi=(1, 1, 1),
                        sigma_a=(tau, tau, tau), sigma_s=(0.0,) * 3)
        banks = pack_media([gm])
        n = 4096
        o = np.zeros((n, 3), np.float32)
        rs = np.random.RandomState(1)
        o[:, 0] = rs.uniform(0.05, 0.95, n)
        o[:, 1] = rs.uniform(0.05, 0.95, n)
        o[:, 2] = -0.5
        o = jnp.asarray(o)
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        t_hit = jnp.full((n,), 2.0)
        lam = jnp.tile(jnp.asarray([[480.0, 530.0, 590.0, 650.0]]), (n, 1))
        ones4 = jnp.ones((n, 4))
        med = jnp.zeros((n,), jnp.int32)
        active = jnp.ones((n,), bool)
        dt = ms.delta_track(banks, srgb_table(), med, o, d, t_hit, lam,
                            ones4, ones4, ones4, active,
                            max_depth_hit=jnp.zeros((n,), bool))
        # lanes that were not absorbed reached the far side
        through = np.asarray(dt.status) != ms.ABSORBED
        return through.mean()

    t8 = transmit(8.0)
    expect8 = np.exp(-8.0)
    assert abs(t8 - expect8) < 5e-3 + 0.5 * expect8, (t8, expect8)
    t50 = transmit(50.0)
    assert t50 < 1e-3, t50


def test_stochastic_trilinear_is_unbiased():
    """The one-corner stochastic density read must average to the exact
    trilinear interpolation (it replaces 8 gathers per tracking step)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hikari_tpu.media.sample import _grid_density
    from hikari_tpu.media.types import GridMedium, pack_media

    rng = np.random.RandomState(0)
    dens = rng.rand(8, 8, 8).astype(np.float32)
    med = GridMedium(density=dens, bounds_lo=(0, 0, 0), bounds_hi=(1, 1, 1),
                     sigma_s=(1, 1, 1), sigma_a=(0.1, 0.1, 0.1))
    banks = pack_media([med])

    p = jnp.asarray(rng.rand(64, 3).astype(np.float32) * 0.8 + 0.1)
    mi = jnp.zeros((64,), jnp.int32)
    exact = _grid_density(banks, mi, p)

    k = 4096
    u3 = jnp.asarray(rng.rand(k, 64, 3).astype(np.float32))
    stoch = jax.vmap(lambda u: _grid_density(banks, mi, p, u3=u))(u3)
    mean = stoch.mean(0)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(exact),
                               atol=0.02)
    # every draw returns an actual voxel value (bounded by the cell max)
    assert float(stoch.max()) <= float(dens.max()) + 1e-6


@pytest.mark.slow
def test_track_step_cap_bomex_class():
    """BOMEX-class cloud (sigma_s=60, g=0.877, the bench `cloud` config):
    512 tracking steps must agree with the reference's 1024-sample budget
    (delta-tracking.jl:343) on both scattered-event statistics and
    ratio-tracked shadow transmittance — pins MAX_TRACK_STEPS=512 as
    non-truncating on the thickest shipped config (VERDICT r2 item 5)."""
    import numpy as np
    from hikari_tpu.media import sample as ms
    from hikari_tpu.media.types import CloudVolume, pack_media
    from hikari_tpu.spectral.rgb2spec import srgb_table

    cloud = CloudVolume(resolution=64, bounds_lo=(-1.6, 0.1, -1.2),
                        bounds_hi=(1.6, 1.8, 1.2), sigma_s=(60.0,) * 3,
                        sigma_a=(0.4,) * 3, g=0.877)
    banks = pack_media([cloud])
    table = srgb_table()
    n = 4096
    rs = np.random.RandomState(5)
    o = np.stack([
        rs.uniform(-1.5, 1.5, n), np.full(n, 2.2), rs.uniform(-1.1, 1.1, n)
    ], -1).astype(np.float32)
    d = np.stack([
        rs.uniform(-0.3, 0.3, n), -np.ones(n), rs.uniform(-0.3, 0.3, n)
    ], -1).astype(np.float32)
    d /= np.linalg.norm(d, -1, keepdims=True)
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    t_max = jnp.full((n,), 10.0)
    lam = jnp.tile(jnp.asarray([[480.0, 530.0, 590.0, 650.0]]), (n, 1))
    ones4 = jnp.ones((n, 4))
    med = jnp.zeros((n,), jnp.int32)
    act = jnp.ones((n,), bool)
    nodep = jnp.zeros((n,), bool)

    def run(cap):
        dt = ms.delta_track(banks, table, med, o, d, t_max, lam,
                            ones4, ones4, ones4, act, nodep, max_steps=cap)
        tr, _, _ = ms.ratio_track_tr(banks, table, med, o, d, t_max, lam,
                                     act, max_steps=cap)
        return dt, np.asarray(tr)

    dt5, tr5 = run(512)
    dt10, tr10 = run(1024)
    # identical RNG stream => lanes that finish within 512 steps are
    # bitwise identical; the caps differ only via truncated lanes
    trunc5 = np.asarray(dt5.status) == ms.TRACKING
    trunc10 = np.asarray(dt10.status) == ms.TRACKING
    assert trunc10.mean() <= trunc5.mean()
    # truncation at 512 must be statistically invisible
    assert trunc5.mean() < 5e-3, trunc5.mean()
    sc5 = (np.asarray(dt5.status) == ms.SCATTERED).mean()
    sc10 = (np.asarray(dt10.status) == ms.SCATTERED).mean()
    assert abs(sc5 - sc10) < 2e-3, (sc5, sc10)
    # shadow transmittance through the cloud: same within fp noise
    assert np.abs(tr5 - tr10).max() < 1e-3, np.abs(tr5 - tr10).max()


@pytest.mark.slow
def test_alpha_stack_beyond_rounds_cap():
    """20 stacked alpha=0.3 layers over the WHOLE floor vs a sheet-free
    control render: the interface-crossing cap must not visibly truncate
    shadow transmission. Per-crossing stochastic alpha passes w.p. 0.7, so
    with the reference-identical 10-crossing cap E[T] = 0.7^10 ~ 2.8%
    (20 uncapped sheets would give 0.7^20 ~ 0.08%) — pins the cap as
    reference-equivalent, not silently leakier (VERDICT r2 item 5;
    reference intersection.jl:223)."""
    import numpy as np
    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import render, VolPath
    from hikari_tpu.materials.types import Matte
    from hikari_tpu.scene.mesh import make_quad
    from hikari_tpu.scene.scene import Scene
    from hikari_tpu.lights.types import DistantLight

    def floor_render(nsheets):
        s = Scene()
        s.add(make_quad((-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4)),
              Matte(kd=(0.8, 0.8, 0.8)))
        # sheets larger than the floor: every straight-up shadow ray from
        # any visible floor point crosses all of them
        for k in range(nsheets):
            z = 1.0 + 0.05 * k
            s.add(make_quad((-5, z, -5), (5, z, -5), (5, z, 5), (-5, z, 5)),
                  Matte(kd=(0.9, 0.9, 0.9)), alpha=0.3)
        s.add_light(DistantLight(direction=(0.0, -1.0, 0.0),
                                 radiance=(5.0, 5.0, 5.0)))
        scene = s.build()
        # camera low under the stack, pitched down: every pixel sees floor
        cam = make_perspective_camera((0, 0.45, -3.2), (0, 0.0, 0.6),
                                      (24, 24), fov_deg=30.0)
        # max_depth=1: direct light only, so pixel value IS the shadow
        # transmittance; indirect off lit sheet undersides stays excluded
        img = np.asarray(framebuffer(render(
            VolPath(max_depth=1, samples_per_pixel=48), scene, cam)))
        assert np.isfinite(img).all()
        # central block: floor hits well inside the footprint
        return img.mean(-1)[8:16, 8:16].mean()

    open_floor = floor_render(0)
    stacked = floor_render(20)
    assert open_floor > 0.05, open_floor
    ratio = stacked / open_floor
    # E[T] = 0.7^10 = 0.0282 under the 10-crossing cap; Monte Carlo noise
    # at 48 spp over 64 pixels is well under the bracket below
    assert 0.01 < ratio < 0.06, (stacked, open_floor, ratio)
