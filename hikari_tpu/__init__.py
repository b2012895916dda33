"""hikari_tpu — a TPU-native, physically-based spectral path tracer.

Built from scratch in JAX/XLA/Pallas with the capabilities of Hikari.jl
(surveyed at /root/reference; see SURVEY.md). The KernelAbstractions
megakernel + atomic work-queue design of the reference is replaced by a
wavefront architecture idiomatic to TPUs: dense SoA path-state arrays with
masked lanes, material-typed dense dispatch, sorted-packet Pallas ray
traversal, and scatter-free film accumulation.

Quickstart (mirrors the reference's README flow):

    import hikari_tpu as hk

    scene = hk.Scene()
    scene.add(hk.make_sphere((0, 0.5, 0), 0.5), hk.Plastic(kd=(0.8, 0.1, 0.1)))
    scene.add(hk.make_quad((-5, 0, -5), (5, 0, -5), (5, 0, 5), (-5, 0, 5)),
              hk.Matte(kd=(0.6, 0.6, 0.6)))
    env, sun = hk.sunsky_environment(direction=(0.4, 0.3, 1.0))
    scene.add_light(env); scene.add_light(sun)

    cam = hk.make_perspective_camera((0, 1, -4), (0, 0.5, 0), (512, 512))
    film = hk.render(hk.VolPath(samples_per_pixel=64), scene.build(), cam)
    hk.write_png("out.png", hk.postprocess(hk.framebuffer(film)))
"""

__version__ = "0.2.0"

# scene & geometry
from .scene.scene import Scene, SceneData
from .core.transform import (
    Transform, from_matrix, identity, look_at, perspective, rotate,
    rotate_x, rotate_y, rotate_z, scale, translate,
)
from .scene.mesh import (
    TriangleMesh, compute_vertex_normals, load_obj, make_box, make_quad,
    make_sphere,
)

# materials (reference aliases included: Diffuse/Dielectric/Metal/Plastic)
from .materials.types import (
    BK7, SF11, Aluminum, Brass, CoatedConductor, CoatedDiffuse,
    CoatedDiffuseTransmission, Conductor,
    Copper, Diamond, Dielectric, Diffuse, DiffuseTransmission, Emissive,
    FusedSilica, Glass, Gold, Interface, Matte, Metal, Mirror, Mix, Plastic,
    Sapphire, Silver, ThinDielectric,
)
from .textures.atlas import ImageTexture, VertexColorTexture

# lights
from .lights.types import (
    AmbientLight, DistantLight, EnvironmentLight, PointLight, SpotLight,
    SunLight, equirect_to_equal_area,
)
from .lights.sunsky import sunsky_environment

# media
from .media.types import (
    BrickGridMedium, CloudVolume, Fog, GridMedium, HomogeneousMedium, Milk,
    RGBGridMedium, Smoke, medium_preset,
)
from .media.nanovdb import (
    load_nanovdb, load_nanovdb_sparse, nanovdb_medium, save_nanovdb,
)
from .media.noise import fbm3d, generate_cloud_density, perlin3d, worley3d

# cameras
from .camera.camera import (
    PerspectiveCamera, make_matrix_camera, make_perspective_camera,
)

# ray queries (Raycore closest_hit/any_hit re-export parity, Hikari.jl:22-37)
from .integrators.volpath import scene_any_hit, scene_closest_hit

# integrators
from .integrators.volpath import VolPath, render, render_aux
from .integrators.preview import FastWavefront, Whitted, render_preview
from .integrators.sppm import SPPM, render_sppm

# film / imaging
from .film.film import (
    Film, aux_buffers, film_load, film_save, framebuffer, make_film,
)
from .film.filters import (
    BOX, GAUSSIAN, LANCZOS, MITCHELL, TRIANGLE, make_filter,
)
from .film.postprocess import FilmSensor, postprocess, write_png
from .film.denoise import DenoiseConfig, denoise
from .film.imageio import load_image, read_pfm, read_png, write_pfm

# multi-chip
from .parallel.sharding import make_render_mesh, render_sharded

# observability
from .utils.metrics import RenderMeter

__all__ = [k for k in dict(vars()) if not k.startswith("_")]
