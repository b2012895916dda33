"""Public API surface + checkpoint/resume + image IO tests."""

import numpy as np


def test_public_api_imports():
    import hikari_tpu as hk

    for name in [
        "Scene", "make_sphere", "make_quad", "load_obj",
        "Matte", "Mirror", "Glass", "Conductor", "Gold", "Plastic",
        "CoatedDiffuse", "CoatedConductor", "ThinDielectric", "Mix",
        "DiffuseTransmission", "Emissive", "Interface",
        "ImageTexture", "VertexColorTexture",
        "PointLight", "SpotLight", "DistantLight", "SunLight",
        "EnvironmentLight", "sunsky_environment",
        "HomogeneousMedium", "GridMedium", "RGBGridMedium", "CloudVolume",
        "Fog", "Milk", "nanovdb_medium", "save_nanovdb",
        "make_perspective_camera", "make_matrix_camera",
        "VolPath", "render", "render_aux", "FastWavefront", "Whitted",
        "render_preview", "framebuffer", "film_save", "film_load",
        "postprocess", "write_png", "denoise", "DenoiseConfig",
        "load_image", "make_render_mesh", "render_sharded", "RenderMeter",
    ]:
        assert hasattr(hk, name), f"missing public API: {name}"


def test_film_checkpoint_resume(tmp_path):
    """Saving mid-render and resuming must equal an uninterrupted render."""
    import hikari_tpu as hk
    from hikari_tpu.film.filters import make_filter
    from hikari_tpu.integrators.volpath import render_sample_jit

    import jax.numpy as jnp

    s = hk.Scene()
    s.add(hk.make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)),
          hk.Matte(kd=(0.7, 0.7, 0.7)))
    s.add_light(hk.PointLight(position=(0, 2, 0), intensity=(5, 5, 5)))
    scene = s.build()
    cam = hk.make_perspective_camera((0, 1, -2.5), (0, 0, 0), (16, 16))
    vp = hk.VolPath(max_depth=2, samples_per_pixel=4)
    filt = make_filter()

    film = hk.make_film(16, 16)
    for i in range(2):
        film = render_sample_jit(vp, scene, cam, film, filt, jnp.uint32(i))
    p = str(tmp_path / "ckpt.npz")
    hk.film_save(p, film)
    resumed = hk.film_load(p)
    for i in range(2, 4):
        resumed = render_sample_jit(vp, scene, cam, resumed, filt, jnp.uint32(i))

    film2 = hk.make_film(16, 16)
    for i in range(4):
        film2 = render_sample_jit(vp, scene, cam, film2, filt, jnp.uint32(i))

    np.testing.assert_allclose(
        np.asarray(hk.framebuffer(resumed)), np.asarray(hk.framebuffer(film2)),
        atol=1e-6,
    )
    assert int(resumed.iteration) == 4


def test_png_roundtrip(tmp_path):
    import hikari_tpu as hk

    rng = np.random.RandomState(0)
    img = rng.rand(17, 23, 3).astype(np.float32)
    p = str(tmp_path / "t.png")
    hk.write_png(p, img)
    back = hk.read_png(p)
    assert back.shape == (17, 23, 3)
    np.testing.assert_allclose(back, img, atol=1.0 / 255 + 1e-6)


def test_pfm_roundtrip(tmp_path):
    import hikari_tpu as hk

    rng = np.random.RandomState(1)
    img = (rng.rand(9, 13, 3) * 1000).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    hk.write_pfm(p, img)
    back = hk.read_pfm(p)
    np.testing.assert_allclose(back, img, rtol=1e-6)


def test_render_meter():
    import hikari_tpu as hk

    m = hk.RenderMeter().start()
    lap = m.lap(1_000_000)
    assert lap["sample"] == 1
    assert m.summary()["total_rays"] == 1_000_000
