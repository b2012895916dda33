"""Scene container and build (the reference's Scene / push! / sync!).

Parity with /root/reference/src/scene.jl: a host-side builder collects
meshes+materials+lights (materials deduplicated, emissive faces registered
as per-face DiffuseAreaLights exactly like build_face_meta,
scene-mesh.jl:53+), then `build()` is the sync! equivalent — it bakes
transforms, constructs the BVH, reorders per-face metadata into BVH leaf
order (the TriangleMeta analog, scene.jl:11-15), and packs everything into
one device pytree.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.pytree import pytree_dataclass
from ..geometry.bvh import build_bvh
from ..geometry.traverse import DeviceBVH
from ..lights.types import LightBanks, pack_lights
from ..materials.types import EMISSIVE, MaterialBanks, pack_materials
from ..spectral.rgb2spec import RGBToSpectrumTable, srgb_table
from .mesh import TriangleMesh, compute_vertex_normals


@pytree_dataclass(static=("present_materials", "n_lights", "n_faces"))
class SceneData:
    """Device-resident scene: BVH + per-face metadata + typed banks."""

    bvh: DeviceBVH
    # per-face shading attributes, in BVH leaf order
    n0: jnp.ndarray  # (F, 3) vertex shading normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray  # (F, 2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    mat_type: jnp.ndarray       # (F,) int32 material type tag
    mat_idx: jnp.ndarray        # (F,) int32 index into that type's bank
    arealight_idx: jnp.ndarray  # (F,) int32 area light id; -1 if none
    materials: MaterialBanks
    lights: LightBanks
    rgb2spec: RGBToSpectrumTable
    world_lo: jnp.ndarray   # (3,)
    world_hi: jnp.ndarray   # (3,)
    scene_radius: jnp.ndarray  # ()
    present_materials: tuple
    n_lights: int
    n_faces: int


class Scene:
    """Host-side scene builder. Mirrors: Scene() -> push! -> sync!."""

    def __init__(self):
        self._meshes: list[TriangleMesh] = []
        self._mesh_mat: list[int] = []
        self._materials: list = []
        self._lights: list = []

    def add(self, mesh: TriangleMesh, material) -> int:
        """push!(scene, mesh, material) (scene-mesh.jl:9-17). Returns mesh id."""
        try:
            mat_id = self._materials.index(material)
        except ValueError:
            mat_id = len(self._materials)
            self._materials.append(material)
        self._meshes.append(mesh)
        self._mesh_mat.append(mat_id)
        return len(self._meshes) - 1

    def add_light(self, light) -> None:
        """push!(scene, light) (scene.jl:76-78)."""
        self._lights.append(light)

    def build(self) -> SceneData:
        """sync!(scene): bake, BVH, pack (scene.jl:144-149)."""
        assert self._meshes, "scene has no geometry"
        p0s, p1s, p2s = [], [], []
        n0s, n1s, n2s = [], [], []
        uv0s, uv1s, uv2s = [], [], []
        mat_of_face = []

        for mesh, mat_id in zip(self._meshes, self._mesh_mat):
            v = mesh.vertices
            if mesh.transform is not None:
                m = np.asarray(mesh.transform, np.float32)
                v = v @ m[:3, :3].T + m[:3, 3]
            f = mesh.faces
            p0s.append(v[f[:, 0]])
            p1s.append(v[f[:, 1]])
            p2s.append(v[f[:, 2]])
            n = mesh.normals
            if n is None:
                n = compute_vertex_normals(v, f)
            elif mesh.transform is not None:
                inv_t = np.linalg.inv(m[:3, :3]).T
                n = n @ inv_t.T
                n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
            n0s.append(n[f[:, 0]])
            n1s.append(n[f[:, 1]])
            n2s.append(n[f[:, 2]])
            uv = mesh.uvs if mesh.uvs is not None else np.zeros((len(v), 2), np.float32)
            uv0s.append(uv[f[:, 0]])
            uv1s.append(uv[f[:, 1]])
            uv2s.append(uv[f[:, 2]])
            mat_of_face.append(np.full(len(f), mat_id, np.int32))

        p0 = np.concatenate(p0s).astype(np.float32)
        p1 = np.concatenate(p1s).astype(np.float32)
        p2 = np.concatenate(p2s).astype(np.float32)
        n0 = np.concatenate(n0s).astype(np.float32)
        n1 = np.concatenate(n1s).astype(np.float32)
        n2 = np.concatenate(n2s).astype(np.float32)
        uv0 = np.concatenate(uv0s).astype(np.float32)
        uv1 = np.concatenate(uv1s).astype(np.float32)
        uv2 = np.concatenate(uv2s).astype(np.float32)
        mat_of_face = np.concatenate(mat_of_face)

        banks, tags, idxs, present = pack_materials(self._materials)
        face_type = tags[mat_of_face]
        face_idx = idxs[mat_of_face]

        # emissive faces -> per-face DiffuseAreaLights (build_face_meta)
        emissive_mask = face_type == EMISSIVE
        arealight_idx = np.full(len(p0), -1, np.int32)
        area_tris = None
        if emissive_mask.any():
            which = np.nonzero(emissive_mask)[0]
            arealight_idx[which] = np.arange(len(which), dtype=np.int32)
            a_le = np.stack(
                [
                    np.asarray(self._materials[mat_of_face[i]].le, np.float32)
                    * self._materials[mat_of_face[i]].scale
                    for i in which
                ]
            )
            a_two = np.array(
                [self._materials[mat_of_face[i]].two_sided for i in which], bool
            )
            area_tris = (p0[which], p1[which], p2[which], a_le, a_two)

        # BVH over face bounds; reorder all per-face arrays into leaf order
        tri_lo = np.minimum(np.minimum(p0, p1), p2)
        tri_hi = np.maximum(np.maximum(p0, p1), p2)
        fb = build_bvh(tri_lo, tri_hi)
        order = fb.prim_order

        bvh = DeviceBVH(
            lo=jnp.asarray(fb.lo), hi=jnp.asarray(fb.hi),
            first=jnp.asarray(fb.first), count=jnp.asarray(fb.count),
            skip=jnp.asarray(fb.skip),
            p0=jnp.asarray(p0[order]), p1=jnp.asarray(p1[order]),
            p2=jnp.asarray(p2[order]),
        )

        lights = pack_lights(self._lights, area_tris)
        world_lo = tri_lo.min(axis=0)
        world_hi = tri_hi.max(axis=0)
        radius = 0.5 * float(np.linalg.norm(world_hi - world_lo))

        n_lights = int(lights.light_type.shape[0]) if (self._lights or area_tris) else 0

        return SceneData(
            bvh=bvh,
            n0=jnp.asarray(n0[order]), n1=jnp.asarray(n1[order]),
            n2=jnp.asarray(n2[order]),
            uv0=jnp.asarray(uv0[order]), uv1=jnp.asarray(uv1[order]),
            uv2=jnp.asarray(uv2[order]),
            mat_type=jnp.asarray(face_type[order]),
            mat_idx=jnp.asarray(face_idx[order]),
            arealight_idx=jnp.asarray(arealight_idx[order]),
            materials=banks,
            lights=lights,
            rgb2spec=srgb_table(),
            world_lo=jnp.asarray(world_lo),
            world_hi=jnp.asarray(world_hi),
            scene_radius=jnp.float32(max(radius, 1e-3)),
            present_materials=tuple(sorted(present)),
            n_lights=n_lights,
            n_faces=int(len(p0)),
        )
