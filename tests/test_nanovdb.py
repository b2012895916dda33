"""NanoVDB round-trip tests."""

import numpy as np

from hikari_tpu.media.nanovdb import (
    build_nanovdb, load_nanovdb, nanovdb_medium, save_nanovdb, to_dense,
)


def test_roundtrip_dense(tmp_path):
    rng = np.random.RandomState(0)
    d = np.zeros((24, 20, 16), np.float32)
    # sparse blobs
    d[2:10, 3:9, 4:12] = rng.rand(8, 6, 8).astype(np.float32)
    d[16:22, 12:18, 2:8] = rng.rand(6, 6, 6).astype(np.float32) * 2.0

    p = str(tmp_path / "vol.nvdb")
    save_nanovdb(p, d, origin=(-1, 0, 2), extent=(2, 2.5, 3))
    dense, wlo, whi = load_nanovdb(p)

    np.testing.assert_allclose(wlo, (-1, 0, 2), atol=1e-6)
    np.testing.assert_allclose(whi, (1, 2.5, 5), atol=1e-6)
    # the loader materializes over the leaf-aligned index box
    assert dense.shape[0] >= 24 and dense.shape[1] >= 20 and dense.shape[2] >= 16
    np.testing.assert_allclose(dense[:24, :20, :16], d, atol=1e-7)
    # padding (if any) is background
    assert dense[24:].max(initial=0.0) == 0.0


def test_sparse_storage_skips_empty_leaves():
    d = np.zeros((64, 64, 64), np.float32)
    d[0:8, 0:8, 0:8] = 1.0  # exactly one leaf
    buf, md = build_nanovdb(d)
    assert md["leaf_count"] == 1
    assert md["lower_count"] == 1
    assert md["upper_count"] == 1
    dense, imin, imax, _ = to_dense(buf, md)
    assert dense.shape == (8, 8, 8)
    np.testing.assert_allclose(dense, 1.0)


def test_nanovdb_medium_render(tmp_path):
    import jax.numpy as jnp

    from hikari_tpu.camera.camera import make_perspective_camera
    from hikari_tpu.film.film import framebuffer
    from hikari_tpu.integrators.volpath import VolPath, render
    from hikari_tpu.lights.types import PointLight
    from hikari_tpu.materials.types import Interface, Matte
    from hikari_tpu.scene.mesh import make_box, make_quad
    from hikari_tpu.scene.scene import Scene

    d = np.zeros((16, 16, 16), np.float32)
    d[4:12, 4:12, 4:12] = 2.0
    p = str(tmp_path / "cube.nvdb")
    save_nanovdb(p, d, origin=(-0.5, 0.0, -0.5), extent=(1.0, 1.0, 1.0))
    med = nanovdb_medium(p, sigma_s=(2.0, 2.0, 2.0), sigma_a=(0.1, 0.1, 0.1))

    s = Scene()
    s.add(make_quad((-3, 0, -3), (3, 0, -3), (3, 0, 3), (-3, 0, 3)),
          Matte(kd=(0.5, 0.5, 0.5)))
    s.add(make_box((-0.5, 0.0, -0.5), (0.5, 1.0, 0.5)), Interface(),
          inside_medium=med)
    s.add_light(PointLight(position=(2, 3, -2), intensity=(20, 20, 20)))
    scene = s.build()
    cam = make_perspective_camera((0, 1.0, -3), (0, 0.5, 0), (16, 16), fov_deg=45.0)
    img = np.asarray(framebuffer(render(VolPath(max_depth=4, samples_per_pixel=4), scene, cam)))
    assert np.isfinite(img).all()
    assert img.max() > 0.01


def test_constant_lower_tile_materializes():
    """Third-party NanoVDB files may contain active constant tiles (value,
    no child); to_dense must fill them (nanovdb.jl tile branches :341-375)."""
    import numpy as np

    from hikari_tpu.media.nanovdb import (
        LOWER_TABLE_OFF, LOWER_VALUEMASK_OFF, build_nanovdb, extract_metadata,
        to_dense,
    )

    dense = np.random.RandomState(0).rand(16, 16, 16).astype(np.float32)
    buf, md = build_nanovdb(dense)
    buf = bytearray(buf)

    root_off = md["root_offset"]
    lower_off = md["lower_offset"]
    # mark leaf-region (24, 0, 0) as an active constant tile of value 5:
    # lower offset = (x>>3 & 15) << 8 = 768
    m = (24 >> 3) << 8
    buf[lower_off + LOWER_VALUEMASK_OFF + m // 8] |= 1 << (m % 8)
    tbl = lower_off + LOWER_TABLE_OFF + m * 8
    buf[tbl:tbl + 4] = np.float32(5.0).tobytes()
    # widen the root index bbox to cover x in [0, 32)
    buf[root_off:root_off + 24] = np.asarray(
        [0, 0, 0, 31, 15, 15], np.int32).tobytes()

    out, imin, imax, _ = to_dense(bytes(buf), dict(md))
    assert imax[0] - imin[0] == 32, (imin, imax)
    # original leaf data intact
    np.testing.assert_allclose(out[:16, :16, :16], dense, atol=1e-6)
    # the constant tile region reads 5.0
    assert np.allclose(out[0:8, 0:8, 24 - imin[0]:32 - imin[0]], 5.0)
