"""Sparse NanoVDB-class cloud: save a procedural cloud as a .nvdb file,
reload it through the device-sparse brick path, and render with sun+sky
(the bomex_cloud_example.jl workflow; g = 0.877, deep scattering).

Run: python examples/sparse_cloud_example.py [out.png]
"""

import sys
import tempfile

import numpy as np

import hikari_tpu as hk


def main(out="sparse_cloud.png"):
    # procedural Worley/Perlin cloud baked to a NanoVDB file
    dens = hk.generate_cloud_density(96)
    path = tempfile.mktemp(suffix=".nvdb")
    hk.save_nanovdb(path, dens, origin=(-1.6, 0.2, -1.2), extent=(3.2, 1.8, 2.4))

    # sparse=True keeps the grid brick-paged on device (active 8^3 bricks +
    # an int32 page table); sparse=None auto-selects by index-bbox size
    cloud = hk.nanovdb_medium(
        path, sigma_s=(55.0,) * 3, sigma_a=(0.3,) * 3, g=0.877, sparse=True,
    )
    print(f"sparse cloud: {cloud.bricks.shape[0]} bricks over a "
          f"{tuple(np.asarray(cloud.table).shape)} page table")

    scene = hk.Scene()
    scene.add(
        hk.make_quad((-12, 0, -12), (12, 0, -12), (12, 0, 12), (-12, 0, 12)),
        hk.Matte(kd=(0.3, 0.34, 0.4)),
    )
    scene.add(hk.make_box((-1.6, 0.2, -1.2), (1.6, 2.0, 1.2)), hk.Interface(),
              inside_medium=cloud)
    env, sun = hk.sunsky_environment(direction=(0.55, 0.4, 0.35))
    scene.add_light(env)
    scene.add_light(sun)

    cam = hk.make_perspective_camera((0, 1.1, -4.2), (0, 1.0, 0), (384, 256),
                                     fov_deg=50.0)
    film = hk.render(hk.VolPath(samples_per_pixel=24, max_depth=24),
                     scene.build(), cam)
    hk.write_png(out, hk.postprocess(hk.framebuffer(film), tonemap="aces"))
    print("wrote", out)


if __name__ == "__main__":
    main(*sys.argv[1:])
