"""Cameras: perspective (thin lens) and matrix-driven.

Parity with /root/reference/src/camera/ (CameraCore, ProjectiveCamera,
PerspectiveCamera with DoF and precomputed pixel-shift differentials,
MatrixCamera from view/projection matrices). Batched: generate_rays maps a
whole wavefront of film samples to rays in one fused computation.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.pytree import pytree_dataclass
from ..core.transform import Transform, from_matrix, look_at, perspective
from ..core.vecmath import normalize
from ..sampling.distributions import concentric_sample_disk


@pytree_dataclass
class CameraSample:
    """Film-plane sample for one ray (camera.jl:3-34)."""

    p_film: jnp.ndarray  # (..., 2) raster position in pixels
    lens: jnp.ndarray    # (..., 2) in [0,1)^2
    time: jnp.ndarray    # (...,)
    filter_weight: jnp.ndarray  # (...,)


@pytree_dataclass(static=("resolution",))
class PerspectiveCamera:
    """pbrt-style projective camera; camera space looks down +z."""

    camera_to_world: Transform
    raster_to_camera: Transform
    dx_camera: jnp.ndarray  # (3,)
    dy_camera: jnp.ndarray  # (3,)
    lens_radius: jnp.ndarray  # ()
    focal_distance: jnp.ndarray  # ()
    shutter: jnp.ndarray  # (2,) open/close
    area: jnp.ndarray  # () screen-window area at z=1 (perspective.jl:70-74)
    resolution: tuple[int, int]  # (W, H)

    def generate_rays(self, sample: CameraSample):
        """Rays for a batch of camera samples (perspective.jl:95-128).

        Returns (o, d) world-space arrays (..., 3); weight is 1.
        """
        p_raster = jnp.concatenate(
            [sample.p_film, jnp.zeros_like(sample.p_film[..., :1])], axis=-1
        )
        p_cam = self.raster_to_camera.apply_point(p_raster)
        d = normalize(p_cam)
        o = jnp.zeros_like(d)

        def with_dof(o, d):
            p_lens = self.lens_radius * concentric_sample_disk(sample.lens)
            t = self.focal_distance / d[..., 2]
            p_focus = d * t[..., None]
            o2 = jnp.concatenate([p_lens, jnp.zeros_like(p_lens[..., :1])], -1)
            d2 = normalize(p_focus - o2)
            return o2, d2

        use_dof = self.lens_radius > 0.0
        o_dof, d_dof = with_dof(o, d)
        o = jnp.where(use_dof, o_dof, o)
        d = jnp.where(use_dof, d_dof, d)

        o_w = self.camera_to_world.apply_point(o)
        d_w = normalize(self.camera_to_world.apply_vector(d))
        return o_w, d_w


def make_perspective_camera(
    eye,
    target,
    resolution: tuple[int, int],
    up=(0.0, 1.0, 0.0),
    fov_deg: float = 55.0,
    lens_radius: float = 0.0,
    focal_distance: float = 1e6,
    shutter=(0.0, 1.0),
) -> PerspectiveCamera:
    """Convenience constructor matching the reference's
    PerspectiveCamera(eyepos, lookat, film; up, fov) (perspective.jl:82-91)."""
    w, h = resolution
    cam_to_world = look_at(eye, target, up)
    cam_from_screen = perspective(jnp.deg2rad(fov_deg)).inverse()

    # screen window: [-1,1] on the short axis, aspect-scaled on the long one
    aspect = w / h
    if aspect > 1.0:
        sx0, sx1, sy0, sy1 = -aspect, aspect, -1.0, 1.0
    else:
        sx0, sx1, sy0, sy1 = -1.0, 1.0, -1.0 / aspect, 1.0 / aspect

    # raster -> NDC -> screen (y flipped)
    m = jnp.array(
        [
            [(sx1 - sx0) / w, 0.0, 0.0, sx0],
            [0.0, -(sy1 - sy0) / h, 0.0, sy1],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    screen_from_raster = from_matrix(m)
    raster_to_camera = cam_from_screen.compose(screen_from_raster)

    p000 = raster_to_camera.apply_point(jnp.zeros(3))
    dx = raster_to_camera.apply_point(jnp.array([1.0, 0.0, 0.0])) - p000
    dy = raster_to_camera.apply_point(jnp.array([0.0, 1.0, 0.0])) - p000

    p_max = raster_to_camera.apply_point(jnp.array([float(w), float(h), 0.0]))
    p0 = p000[:2] / p000[2]
    p1 = p_max[:2] / p_max[2]
    area = jnp.abs((p0[0] - p1[0]) * (p0[1] - p1[1]))

    return PerspectiveCamera(
        camera_to_world=cam_to_world,
        raster_to_camera=raster_to_camera,
        dx_camera=dx,
        dy_camera=dy,
        lens_radius=jnp.float32(lens_radius),
        focal_distance=jnp.float32(focal_distance),
        shutter=jnp.asarray(shutter, jnp.float32),
        area=area,
        resolution=(w, h),
    )


def make_matrix_camera(
    view: jnp.ndarray, projection: jnp.ndarray, resolution: tuple[int, int]
) -> PerspectiveCamera:
    """Camera from explicit view/projection matrices (matrix.jl:13-115),
    e.g. handed over from a Makie-style interactive viewer."""
    w, h = resolution
    view = jnp.asarray(view, jnp.float32)
    projection = jnp.asarray(projection, jnp.float32)
    cam_to_world = from_matrix(jnp.linalg.inv(view))
    screen_from_ndc = jnp.array(
        [
            [2.0 / w, 0.0, 0.0, -1.0],
            [0.0, -2.0 / h, 0.0, 1.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    raster_to_camera = from_matrix(jnp.linalg.inv(projection) @ screen_from_ndc)
    p000 = raster_to_camera.apply_point(jnp.zeros(3))
    dx = raster_to_camera.apply_point(jnp.array([1.0, 0.0, 0.0])) - p000
    dy = raster_to_camera.apply_point(jnp.array([0.0, 1.0, 0.0])) - p000
    return PerspectiveCamera(
        camera_to_world=cam_to_world,
        raster_to_camera=raster_to_camera,
        dx_camera=dx,
        dy_camera=dy,
        lens_radius=jnp.float32(0.0),
        focal_distance=jnp.float32(1e6),
        shutter=jnp.asarray((0.0, 1.0), jnp.float32),
        area=jnp.float32(1.0),
        resolution=(w, h),
    )
