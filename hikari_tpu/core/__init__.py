from .pytree import pytree_dataclass
from .vecmath import (
    dot, cross, normalize, length, length_squared, distance, lerp,
    face_forward, reflect, refract, coordinate_system, make_frame,
    to_local, to_world, safe_sqrt, safe_div, sqr,
)
from .transform import (
    Transform, identity, from_matrix, translate, scale, rotate,
    rotate_x, rotate_y, rotate_z, look_at, perspective,
)
from .bounds import Bounds3, empty_bounds3, bounds_from_points
from .ray import Rays, RayDifferentials, make_rays, spawn_ray
