"""Affine transformations as paired 4x4 matrices (m, m_inv).

Parity with Raycore's Transformation API re-exported by Hikari
(/root/reference/src/Hikari.jl:22-37): translate / scale / rotate_* /
look_at / perspective, point/vector/normal application. Stored as explicit
float32 matrices so batches of transforms are just leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from .pytree import pytree_dataclass
from .vecmath import normalize, cross


@pytree_dataclass
class Transform:
    m: jnp.ndarray      # (..., 4, 4)
    m_inv: jnp.ndarray  # (..., 4, 4)

    def inverse(self) -> "Transform":
        return Transform(self.m_inv, self.m)

    def compose(self, other: "Transform") -> "Transform":
        """self ∘ other (apply other first)."""
        return Transform(self.m @ other.m, other.m_inv @ self.m_inv)

    def __matmul__(self, other: "Transform") -> "Transform":
        """`a @ b` composes like the reference's `a * b` (apply b first)."""
        return self.compose(other)

    def apply_point(self, p: jnp.ndarray) -> jnp.ndarray:
        r = jnp.einsum("...ij,...j->...i", self.m[..., :3, :3], p) + self.m[..., :3, 3]
        w = jnp.einsum("...j,...j->...", self.m[..., 3, :3], p) + self.m[..., 3, 3]
        return r / w[..., None]

    def apply_vector(self, v: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("...ij,...j->...i", self.m[..., :3, :3], v)

    def apply_normal(self, n: jnp.ndarray) -> jnp.ndarray:
        # normals transform by the inverse transpose
        return jnp.einsum("...ji,...j->...i", self.m_inv[..., :3, :3], n)


def identity() -> Transform:
    e = jnp.eye(4, dtype=jnp.float32)
    return Transform(e, e)


def from_matrix(m: jnp.ndarray) -> Transform:
    m = jnp.asarray(m, jnp.float32)
    return Transform(m, jnp.linalg.inv(m))


def translate(delta) -> Transform:
    delta = jnp.asarray(delta, jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(delta)
    mi = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(-delta)
    return Transform(m, mi)


def scale(s) -> Transform:
    s = jnp.broadcast_to(jnp.asarray(s, jnp.float32), (3,))
    m = jnp.diag(jnp.concatenate([s, jnp.ones((1,), jnp.float32)]))
    mi = jnp.diag(jnp.concatenate([1.0 / s, jnp.ones((1,), jnp.float32)]))
    return Transform(m, mi)


def _rotation(axis: jnp.ndarray, theta) -> Transform:
    a = normalize(jnp.asarray(axis, jnp.float32))
    s, c = jnp.sin(theta), jnp.cos(theta)
    x, y, z = a[0], a[1], a[2]
    r = jnp.array(
        [
            [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
            [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
            [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
        ],
        dtype=jnp.float32,
    )
    m = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(r)
    return Transform(m, m.T)


def rotate(theta, axis) -> Transform:
    """Rotation of `theta` radians about `axis`."""
    return _rotation(jnp.asarray(axis, jnp.float32), jnp.asarray(theta, jnp.float32))


def rotate_x(theta) -> Transform:
    return rotate(theta, jnp.array([1.0, 0.0, 0.0]))


def rotate_y(theta) -> Transform:
    return rotate(theta, jnp.array([0.0, 1.0, 0.0]))


def rotate_z(theta) -> Transform:
    return rotate(theta, jnp.array([0.0, 0.0, 1.0]))


def look_at(eye, target, up) -> Transform:
    """Camera-to-world transform (pbrt convention: camera looks down +z)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    d = normalize(target - eye)
    right = normalize(cross(normalize(up), d))
    new_up = cross(d, right)
    m = jnp.stack(
        [
            jnp.concatenate([right, jnp.zeros(1)]),
            jnp.concatenate([new_up, jnp.zeros(1)]),
            jnp.concatenate([d, jnp.zeros(1)]),
            jnp.concatenate([eye, jnp.ones(1)]),
        ],
        axis=1,
    ).astype(jnp.float32)
    return Transform(m, jnp.linalg.inv(m))


def perspective(fov_rad, near: float = 1e-2, far: float = 1000.0) -> Transform:
    """Perspective projection, pbrt style (z mapped to [0,1])."""
    inv_tan = 1.0 / jnp.tan(jnp.asarray(fov_rad, jnp.float32) / 2.0)
    persp = jnp.array(
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, far / (far - near), -far * near / (far - near)],
            [0.0, 0.0, 1.0, 0.0],
        ],
        dtype=jnp.float32,
    )
    s = scale(jnp.array([inv_tan, inv_tan, 1.0]))
    return s.compose(from_matrix(persp))
