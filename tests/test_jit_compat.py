"""Jit-compilability by abstract evaluation — the TPU analog of the
reference's JET.jl GPUAnalyzer (test/gpu_compat.jl:15-52), which proves
kernels compile without a GPU. jax.eval_shape traces the FULL program
(shape checks, dtype promotion, control-flow structure) without compiling
or executing, so every material/light/medium combination stays cheap to
cover."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.camera.camera import make_perspective_camera
from hikari_tpu.film.filters import make_filter
from hikari_tpu.integrators.volpath import VolPath, render_lanes
from hikari_tpu.lights.types import (
    AmbientLight, DistantLight, PointLight, SpotLight, SunLight,
)
from hikari_tpu.materials.types import (
    CoatedConductor, CoatedDiffuse, CoatedDiffuseTransmission,
    DiffuseTransmission, Emissive, Glass, Gold, Interface, Matte, Mirror,
    Mix, ThinDielectric,
)
from hikari_tpu.media.types import (
    BrickGridMedium, GridMedium, HomogeneousMedium, RGBGridMedium,
)
from hikari_tpu.scene.mesh import make_box, make_quad, make_sphere
from hikari_tpu.scene.scene import Scene

# render-path integration tests: the quick tier (-m 'not slow') must stay
# under 90 s warm on the single-core bench host; everything that compiles a
# real render runs in the full tier
pytestmark = pytest.mark.slow


def _abstract_render(scene, res=(16, 16), depth=3, coherence="none"):
    camera = make_perspective_camera((0, 1, -3), (0, 0.5, 0), res, fov_deg=45)
    filt = make_filter()
    vp = VolPath(max_depth=depth, samples_per_pixel=4,
                 material_coherence=coherence)
    n = res[0] * res[1]
    lanes = jnp.arange(n, dtype=jnp.uint32)
    px = lanes % res[0]
    py = lanes // res[0]

    out = jax.eval_shape(
        lambda si: render_lanes(vp, scene, camera, filt, si, px, py),
        jax.ShapeDtypeStruct((), jnp.uint32),
    )
    rgb, w, stats = out
    assert rgb.shape == (n, 3) and rgb.dtype == jnp.float32
    assert w.shape == (n,)
    assert "rays_traced" in stats and "nonfinite_lanes" in stats


ALL_MATERIALS = [
    Matte(), Mirror(), Glass(eta=1.5), Gold(roughness=0.2),
    ThinDielectric(), DiffuseTransmission(), CoatedDiffuse(),
    CoatedConductor(), CoatedDiffuseTransmission(),
    Mix(m1=Matte(), m2=Mirror(), amount=0.5), Emissive(le=(1, 1, 1)),
]


@pytest.mark.parametrize("coherence", ["none", "gated", "sorted"])
def test_all_material_types_trace(coherence):
    s = Scene()
    s.add(make_quad((-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4)), Matte())
    for i, m in enumerate(ALL_MATERIALS):
        x = -2.5 + 0.5 * i
        s.add(make_sphere((x, 0.3, 0), 0.2, 4, 8), m)
    s.add_light(PointLight(position=(0, 3, -1), intensity=(10,) * 3))
    _abstract_render(s.build(), coherence=coherence)


def test_all_light_types_trace():
    s = Scene()
    s.add(make_quad((-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4)), Matte())
    s.add_light(PointLight(position=(0, 3, -1), intensity=(5,) * 3))
    s.add_light(SpotLight(position=(1, 3, 0), direction=(0, -1, 0),
                          intensity=(5,) * 3))
    s.add_light(DistantLight(direction=(0.3, -1, 0.2), radiance=(1,) * 3))
    s.add_light(SunLight(direction=(0.4, 0.8, 0.3)))
    s.add_light(AmbientLight(radiance=(0.05,) * 3))
    _abstract_render(s.build())


def test_all_media_types_trace():
    s = Scene()
    s.add(make_quad((-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4)), Matte())
    hm = HomogeneousMedium(sigma_s=(0.4,) * 3)
    gm = GridMedium(density=np.ones((4, 4, 4), np.float32),
                    bounds_lo=(-2, 0, -2), bounds_hi=(-1, 1, -1))
    rg = RGBGridMedium(sigma_s_grid=np.ones((4, 4, 4, 3), np.float32),
                       bounds_lo=(0, 0, 0), bounds_hi=(1, 1, 1))
    tab = np.full((2, 2, 2), -1, np.int32)
    tab[0, 0, 0] = 0
    bg = BrickGridMedium(table=tab, bricks=np.ones((1, 512), np.float32),
                         bounds_lo=(1, 0, 1), bounds_hi=(2, 1, 2))
    for i, med in enumerate((hm, gm, rg, bg)):
        x = -2 + i
        s.add(make_box((x, 0.1, 2), (x + 0.8, 0.9, 2.8)), Interface(),
              inside_medium=med)
    s.add_light(PointLight(position=(0, 3, -1), intensity=(10,) * 3))
    _abstract_render(s.build(), depth=4)


def test_instanced_scene_traces():
    s = Scene()
    s.add(make_quad((-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4)), Matte())
    tr = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    tr[:, 0, 3] = np.linspace(-2, 2, 5)
    tr[:, 1, 3] = 0.4
    s.add_instanced(make_sphere((0, 0, 0), 0.3, 6, 12), tr, Gold())
    s.add_light(PointLight(position=(0, 3, -1), intensity=(10,) * 3))
    _abstract_render(s.build(traversal="packets_interp"))


def test_bvh_light_sampler_traces():
    s = Scene()
    s.add(make_quad((-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4)), Matte())
    for i in range(6):
        x = -2 + 0.8 * i
        s.add(make_quad((x, 2, -0.2), (x + 0.4, 2, -0.2), (x + 0.4, 2, 0.2),
                        (x, 2, 0.2)), Emissive(le=(1, 1, 1), scale=5))
    s.set_light_sampler("bvh")
    _abstract_render(s.build())


def test_sorted_coherence_matches_dense():
    """'sorted' is a pure re-ordering of the same per-lane math: the
    rendered image must match 'none' to fp tolerance on a scene wide
    enough to occupy several sort windows (multi-material-eval.jl:450-574
    equivalence between :none and :sorted queues)."""
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import render

    s = Scene()
    s.add(make_quad((-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4)),
          Matte(kd=(0.6, 0.6, 0.65)))
    mats = [Matte(kd=(0.8, 0.2, 0.2)), Mirror(), Glass(eta=1.5),
            Gold(roughness=0.15), CoatedDiffuse(), DiffuseTransmission()]
    for i, m in enumerate(mats):
        x = -1.8 + 0.7 * i
        s.add(make_sphere((x, 0.35, 0), 0.3, 6, 12), m)
    s.add_light(PointLight(position=(0, 3, -2), intensity=(12,) * 3))
    s.add_light(DistantLight(direction=(0.3, -1, 0.2), radiance=(2,) * 3))
    scene = s.build()
    cam = make_perspective_camera((0, 1.2, -3.4), (0, 0.3, 0), (32, 32),
                                  fov_deg=50.0)

    imgs = {}
    for coh in ("none", "sorted"):
        vp = VolPath(max_depth=4, samples_per_pixel=8,
                     material_coherence=coh)
        imgs[coh] = np.asarray(framebuffer(render(vp, scene, cam)))
    assert np.isfinite(imgs["sorted"]).all()
    np.testing.assert_allclose(imgs["sorted"], imgs["none"],
                               rtol=2e-4, atol=2e-4)


def test_sample_batch_matches_sequential():
    """sample_batch=K traces the SAME sample indices as K sequential
    dispatches — images must agree to accumulation-order tolerance,
    including a non-dividing K (trailing partial batch)."""
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import render

    s = Scene()
    s.add(make_quad((-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4)),
          Matte(kd=(0.6, 0.6, 0.65)))
    s.add(make_sphere((0, 0.4, 0), 0.35, 6, 12), Glass(eta=1.5))
    s.add(make_sphere((-0.9, 0.35, 0.2), 0.3, 6, 12), Matte(kd=(0.7, 0.3, 0.2)))
    s.add_light(PointLight(position=(0, 3, -2), intensity=(12,) * 3))
    scene = s.build()
    cam = make_perspective_camera((0, 1.2, -3.0), (0, 0.3, 0), (24, 24),
                                  fov_deg=45.0)

    imgs = {}
    for k in (1, 2, 3):  # spp=8: k=3 exercises the partial trailing batch
        vp = VolPath(max_depth=3, samples_per_pixel=8, sample_batch=k)
        imgs[k] = np.asarray(framebuffer(render(vp, scene, cam)))
    assert np.isfinite(imgs[1]).all()
    np.testing.assert_allclose(imgs[2], imgs[1], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(imgs[3], imgs[1], rtol=2e-5, atol=2e-5)
