"""Instanced forest: 400 placements of ONE tree-ish mesh through the
TLAS/instancing layer — memory stays proportional to the unique mesh.

Run: python examples/instancing_example.py [out.png]
"""

import sys

import numpy as np

import hikari_tpu as hk


def tree_mesh():
    """A cheap 'tree': cone canopy on a box trunk, one TriangleMesh."""
    canopy = hk.make_sphere((0.0, 1.2, 0.0), 0.55, 10, 20)
    trunk = hk.make_box((-0.08, 0.0, -0.08), (0.08, 0.8, 0.08))
    v = np.concatenate([canopy.vertices, trunk.vertices])
    f = np.concatenate([canopy.faces, trunk.faces + len(canopy.vertices)])
    return hk.TriangleMesh(vertices=v, faces=f)


def main(out="instancing.png"):
    scene = hk.Scene()
    scene.add(
        hk.make_quad((-20, 0, -20), (20, 0, -20), (20, 0, 20), (-20, 0, 20)),
        hk.Matte(kd=(0.35, 0.4, 0.25)),
    )

    rng = np.random.RandomState(7)
    n = 400
    tr = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    scale = rng.uniform(0.6, 1.4, n).astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    tr[:, 0, 0] = np.cos(theta) * scale
    tr[:, 0, 2] = np.sin(theta) * scale
    tr[:, 2, 0] = -np.sin(theta) * scale
    tr[:, 2, 2] = np.cos(theta) * scale
    tr[:, 1, 1] = scale
    tr[:, 0, 3] = rng.uniform(-15, 15, n)
    tr[:, 2, 3] = rng.uniform(-2, 30, n)
    scene.add_instanced(tree_mesh(), tr, hk.Matte(kd=(0.15, 0.45, 0.12)))

    env, sun = hk.sunsky_environment(direction=(0.5, 0.4, 0.4))
    scene.add_light(env)
    scene.add_light(sun)

    sd = scene.build()
    print(f"instanced scene: {sd.n_faces} unique faces, "
          f"{sd.inst.ti_inst.shape[0]} world treelets, "
          f"bw blocks {sd.inst.bw.shape[0]}")
    cam = hk.make_perspective_camera((0, 3.0, -8), (0, 1.0, 8), (384, 256),
                                     fov_deg=55.0)
    film = hk.render(hk.VolPath(samples_per_pixel=16, max_depth=4), sd, cam)
    hk.write_png(out, hk.postprocess(hk.framebuffer(film), tonemap="aces"))
    print("wrote", out)


if __name__ == "__main__":
    main(*sys.argv[1:])
