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
from ..geometry.wavefront import (
    KSPLIT, Treelets, build_treelets, bvh_super_boxes,
)
from ..lights.types import LightBanks, pack_lights
from ..materials.types import EMISSIVE, MaterialBanks, pack_materials
from ..media.types import MediumBanks, pack_media
from ..spectral.rgb2spec import RGBToSpectrumTable, srgb_table
from ..textures.atlas import AtlasBuilder, TextureAtlas
from .mesh import TriangleMesh, compute_vertex_normals


def _face_normals(p0, p1, p2):
    n = np.cross(p1 - p0, p2 - p0)
    ln = np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return (n / ln).astype(np.float32)


def _pack_tex_rows(uv0, uv1, uv2, c0, c1, c2, alpha_const, alpha_tex):
    """(F, 17) f32 rows [uv0 uv1 uv2 | c0 c1 c2 | alpha | alpha_tex+1]
    for the textured/alpha fetch paths (one gather instead of 4-6)."""
    cols = [uv0, uv1, uv2, c0, c1, c2,
            np.asarray(alpha_const)[:, None],
            (np.asarray(alpha_tex).astype(np.int64) + 1)[:, None]]
    return np.concatenate(
        [np.asarray(c, np.float32) for c in cols], axis=1)


def _pack_face_rows(ng_raw, n0, n1, n2, mat_packed, med_packed,
                    arealight_idx):
    """(F, 17) f32 rows [ng_raw | n0 | n1 | n2 | mat hi/lo | arealight+1 |
    med hi/lo]. Int fields ride as exact-in-f32 16-bit halves, never
    bitcast (TPU float paths canonicalize NaN payloads)."""
    mp = mat_packed.astype(np.int64)
    med = med_packed.astype(np.int64)
    cols = [
        ng_raw, n0, n1, n2,
        (mp >> 16)[:, None], (mp & 0xFFFF)[:, None],
        (arealight_idx.astype(np.int64) + 1)[:, None],
        (med >> 16)[:, None], (med & 0xFFFF)[:, None],
    ]
    return np.concatenate(
        [np.asarray(c, np.float32) for c in cols], axis=1)


@pytree_dataclass(
    static=(
        "present_materials", "n_lights", "n_faces", "has_media", "has_alpha",
        "has_instances", "traversal", "light_sampler",
    )
)
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
    c0: jnp.ndarray             # (F, 3) per-corner vertex colors
    c1: jnp.ndarray
    c2: jnp.ndarray
    mat_type: jnp.ndarray       # (F,) int32 material type tag
    mat_idx: jnp.ndarray        # (F,) int32 index into that type's bank
    mat_packed: jnp.ndarray     # (F,) int32 (type << 24 | idx): one gather
    med_packed: jnp.ndarray     # (F,) int32 ((inside+1) << 16 | (outside+1))
    ng_raw: jnp.ndarray         # (F, 3) unit winding face normal
    arealight_idx: jnp.ndarray  # (F,) int32 area light id; -1 if none
    # (F, 17) packed attribute rows [ng_raw | n0 | n1 | n2 | mat hi/lo |
    # arealight+1 | med hi/lo]: TPU gathers cost per ADDRESS, so the hot
    # shading path fetches every per-face attribute with ONE row gather
    # (volpath._surface_data) instead of six
    face_rows: jnp.ndarray
    # (F, 17) [uv0 uv1 uv2 | c0 c1 c2 | alpha | alpha_tex+1] for the
    # textured / stochastic-alpha fetch paths
    tex_rows: jnp.ndarray
    inside_medium: jnp.ndarray  # (F,) int32 medium id behind the face; -1 vacuum
    outside_medium: jnp.ndarray  # (F,) int32 medium id in front; -1 vacuum
    alpha_const: jnp.ndarray    # (F,) surface alpha (1 = opaque)
    alpha_tex: jnp.ndarray      # (F,) int32 alpha texture ref; -1 const
    treelets: "Treelets"        # packet-traversal triangle blocks
    # two-level instancing (geometry/instanced.py); dummy 1-instance tables
    # for flat scenes (has_instances=False picks the flat path statically)
    inst: "InstancedTreelets"
    inst_nrm: jnp.ndarray       # (I, 3, 3) object->world normal transform
    inst_l2w: jnp.ndarray       # (I, 3, 4) object->world [linear | translation]
    inst_mat_packed: jnp.ndarray  # (I,) int32 material override; -1 = per-face
    materials: MaterialBanks
    atlas: "TextureAtlas"       # scene texture atlas (textures/atlas.py)
    media: MediumBanks
    camera_medium: jnp.ndarray  # () int32; -1 vacuum
    lights: LightBanks
    light_bvh: "LightBVH"
    rgb2spec: RGBToSpectrumTable
    world_lo: jnp.ndarray   # (3,)
    world_hi: jnp.ndarray   # (3,)
    scene_radius: jnp.ndarray  # ()
    present_materials: tuple
    n_lights: int
    n_faces: int
    has_media: bool
    has_alpha: bool = False
    has_instances: bool = False
    # 'packets' = sorted-packet Pallas engine (TPU); 'skiplink' = per-lane
    # BVH walk (CPU); 'packets_interp' = packet engine in interpreter mode
    traversal: str = "skiplink"
    # 'power' (alias table) | 'uniform' | 'bvh' (adaptive light BVH)
    light_sampler: str = "power"


class Scene:
    """Host-side scene builder. Mirrors: Scene() -> push! -> sync!."""

    def __init__(self):
        self._meshes: list[TriangleMesh] = []
        self._mesh_mat: list[int] = []
        self._mesh_media: list[tuple[int, int]] = []
        self._mesh_alpha: list = []
        self._materials: list = []
        self._media: list = []
        self._lights: list = []
        self._camera_medium: int = -1
        self._light_sampler: str = "power"
        # instanced entries: (mesh, transforms (I,4,4), mat_id,
        #                     (in_med, out_med), alpha, per-inst mat ids|None)
        self._instanced: list = []

    def set_light_sampler(self, mode: str) -> None:
        """'power' (default), 'uniform', or 'bvh' (adaptive BVH sampler,
        bvh-light-sampler.jl)."""
        assert mode in ("power", "uniform", "bvh"), mode
        self._light_sampler = mode

    def _medium_id(self, medium) -> int:
        if medium is None:
            return -1
        for i, m in enumerate(self._media):
            if m is medium or m == medium:
                return i
        self._media.append(medium)
        return len(self._media) - 1

    def add(self, mesh: TriangleMesh, material, inside_medium=None, outside_medium=None,
            alpha=None) -> int:
        """push!(scene, mesh, material) (scene-mesh.jl:9-17), optionally with
        a MediumInterface (inside/outside media, scene.jl:91-102).

        alpha: surface opacity in [0, 1] or an ImageTexture; hits are kept
        stochastically with probability alpha (stochastic alpha testing,
        intersection.jl:223-252)."""
        try:
            mat_id = self._materials.index(material)
        except ValueError:
            mat_id = len(self._materials)
            self._materials.append(material)
        self._meshes.append(mesh)
        self._mesh_mat.append(mat_id)
        self._mesh_media.append(
            (self._medium_id(inside_medium), self._medium_id(outside_medium))
        )
        self._mesh_alpha.append(alpha)
        return len(self._meshes) - 1

    def _material_id(self, material) -> int:
        try:
            return self._materials.index(material)
        except ValueError:
            self._materials.append(material)
            return len(self._materials) - 1

    def add_instanced(self, mesh: TriangleMesh, transforms, material,
                      inside_medium=None, outside_medium=None, alpha=None,
                      materials=None) -> int:
        """Add MANY placements of one mesh sharing a single BLAS (the
        reference's Raycore TLAS/Instance layer, Hikari.jl:22-37): memory
        scales with the unique mesh, not the instance count.

        transforms: (I, 4, 4) world-from-object matrices.
        materials: optional per-instance material list overriding
        `material` (the Instance material-override slot)."""
        tr = np.asarray(transforms, np.float32)
        assert tr.ndim == 3 and tr.shape[1:] == (4, 4), tr.shape
        mat_id = self._material_id(material)
        per_inst = None
        if materials is not None:
            assert len(materials) == len(tr)
            per_inst = [self._material_id(m) for m in materials]
        self._instanced.append((
            mesh, tr, mat_id,
            (self._medium_id(inside_medium), self._medium_id(outside_medium)),
            alpha, per_inst,
        ))
        return len(self._instanced) - 1

    def set_instance_transforms(self, handle: int, transforms) -> None:
        """Re-place a previously added instance group (the reference's
        sync!-refit path for moving objects); takes effect at the next
        build(), which reuses everything except the instance tables."""
        mesh, _, mat_id, media, alpha, per_inst = self._instanced[handle]
        tr = np.asarray(transforms, np.float32)
        assert tr.ndim == 3 and tr.shape[1:] == (4, 4), tr.shape
        self._instanced[handle] = (mesh, tr, mat_id, media, alpha, per_inst)

    def set_camera_medium(self, medium) -> None:
        """Medium the camera sits inside (reference detect_camera_medium,
        volpath/intersection.jl:690-760)."""
        self._camera_medium = self._medium_id(medium)

    def add_light(self, light) -> None:
        """push!(scene, light) (scene.jl:76-78)."""
        self._lights.append(light)

    def update_material(self, mesh_id: int, material) -> None:
        """Swap the material of a previously added mesh
        (update_material!, scene.jl:104-112). Takes effect at the next
        build()."""
        assert 0 <= mesh_id < len(self._meshes), mesh_id
        try:
            mat_id = self._materials.index(material)
        except ValueError:
            mat_id = len(self._materials)
            self._materials.append(material)
        self._mesh_mat[mesh_id] = mat_id

    def __repr__(self) -> str:
        """Pretty summary (Base.show for Scene, scene.jl:180-216)."""
        n_faces = sum(m.n_faces for m in self._meshes)
        mats = {}
        for m in self._materials:
            mats[type(m).__name__] = mats.get(type(m).__name__, 0) + 1
        lights = {}
        for l in self._lights:
            lights[type(l).__name__] = lights.get(type(l).__name__, 0) + 1
        parts = [
            f"Scene({len(self._meshes)} meshes, {n_faces} faces",
            f"materials: {mats}" if mats else "",
            f"lights: {lights}" if lights else "",
            f"media: {len(self._media)}" if self._media else "",
        ]
        return ", ".join(p for p in parts if p) + ")"

    def build(self, traversal: str = "auto") -> SceneData:
        """sync!(scene): bake, BVH, pack (scene.jl:144-149).

        traversal: 'auto' picks the packet engine on TPU and the skip-link
        walk on CPU; or force 'packets' / 'skiplink' / 'packets_interp'."""
        import jax

        if traversal == "auto":
            traversal = (
                "packets" if jax.default_backend() not in ("cpu",) else "skiplink"
            )
        assert traversal in ("packets", "skiplink", "packets_interp"), traversal
        if self._instanced:
            if traversal == "skiplink":  # no skip-link walk for instanced
                traversal = "packets_interp"
            return self._build_instanced(traversal)
        assert self._meshes, "scene has no geometry"
        p0s, p1s, p2s = [], [], []
        n0s, n1s, n2s = [], [], []
        uv0s, uv1s, uv2s = [], [], []
        c0s, c1s, c2s = [], [], []
        mat_of_face = []
        inside_of_face = []
        outside_of_face = []

        for mesh, mat_id, (in_med, out_med) in zip(
            self._meshes, self._mesh_mat, self._mesh_media
        ):
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
            c = mesh.colors if mesh.colors is not None else np.ones((len(v), 3), np.float32)
            c0s.append(c[f[:, 0]])
            c1s.append(c[f[:, 1]])
            c2s.append(c[f[:, 2]])
            mat_of_face.append(np.full(len(f), mat_id, np.int32))
            inside_of_face.append(np.full(len(f), in_med, np.int32))
            outside_of_face.append(np.full(len(f), out_med, np.int32))

        p0 = np.concatenate(p0s).astype(np.float32)
        p1 = np.concatenate(p1s).astype(np.float32)
        p2 = np.concatenate(p2s).astype(np.float32)
        n0 = np.concatenate(n0s).astype(np.float32)
        n1 = np.concatenate(n1s).astype(np.float32)
        n2 = np.concatenate(n2s).astype(np.float32)
        uv0 = np.concatenate(uv0s).astype(np.float32)
        uv1 = np.concatenate(uv1s).astype(np.float32)
        uv2 = np.concatenate(uv2s).astype(np.float32)
        c0 = np.concatenate(c0s).astype(np.float32)
        c1 = np.concatenate(c1s).astype(np.float32)
        c2 = np.concatenate(c2s).astype(np.float32)
        mat_of_face = np.concatenate(mat_of_face)
        inside_of_face = np.concatenate(inside_of_face)
        outside_of_face = np.concatenate(outside_of_face)

        atlas_builder = AtlasBuilder()
        banks, tags, idxs, present = pack_materials(self._materials, atlas_builder)

        # per-face surface alpha (stochastic alpha testing)
        from ..textures.atlas import ImageTexture

        alpha_const_l, alpha_tex_l = [], []
        for mesh, a in zip(self._meshes, self._mesh_alpha):
            nf = len(mesh.faces)
            if isinstance(a, ImageTexture):
                alpha_const_l.append(np.ones(nf, np.float32))
                alpha_tex_l.append(np.full(nf, atlas_builder.add(a), np.int32))
            else:
                alpha_const_l.append(
                    np.full(nf, 1.0 if a is None else float(a), np.float32))
                alpha_tex_l.append(np.full(nf, -1, np.int32))
        alpha_const = np.concatenate(alpha_const_l)
        alpha_tex = np.concatenate(alpha_tex_l)
        has_alpha = bool((alpha_tex >= 0).any() or (alpha_const < 1.0).any())
        face_type = tags[mat_of_face]
        face_idx = idxs[mat_of_face]

        # emissive faces -> per-face DiffuseAreaLights (build_face_meta)
        emissive_mask = face_type == EMISSIVE
        arealight_idx = np.full(len(p0), -1, np.int32)
        area_tris = None
        if emissive_mask.any():
            from ..textures.atlas import ImageTexture

            def baked_le(mat):
                # textured emission is baked to its mean color for NEE;
                # direct hits still see the full texture
                le = mat.le
                if isinstance(le, ImageTexture):
                    le = np.asarray(le.image, np.float32).reshape(-1, 3).mean(0)
                return np.asarray(le, np.float32) * mat.scale

            which = np.nonzero(emissive_mask)[0]
            arealight_idx[which] = np.arange(len(which), dtype=np.int32)
            a_le = np.stack(
                [baked_le(self._materials[mat_of_face[i]]) for i in which]
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

        world_lo = tri_lo.min(axis=0)
        world_hi = tri_hi.max(axis=0)
        radius = 0.5 * float(np.linalg.norm(world_hi - world_lo))

        lights = pack_lights(
            self._lights, area_tris, scene_radius=max(radius, 1e-3),
            sampler="power" if self._light_sampler == "bvh" else self._light_sampler,
        )
        n_lights = lights.n_flat

        from ..lights.bvh_sampler import build_light_bvh

        light_bvh = build_light_bvh(lights)

        return SceneData(
            bvh=bvh,
            n0=jnp.asarray(n0[order]), n1=jnp.asarray(n1[order]),
            n2=jnp.asarray(n2[order]),
            uv0=jnp.asarray(uv0[order]), uv1=jnp.asarray(uv1[order]),
            uv2=jnp.asarray(uv2[order]),
            c0=jnp.asarray(c0[order]), c1=jnp.asarray(c1[order]),
            c2=jnp.asarray(c2[order]),
            mat_type=jnp.asarray(face_type[order]),
            mat_idx=jnp.asarray(face_idx[order]),
            mat_packed=jnp.asarray(
                (face_type[order].astype(np.int32) << 24)
                | face_idx[order].astype(np.int32)
            ),
            med_packed=jnp.asarray(
                ((inside_of_face[order].astype(np.int32) + 1) << 16)
                | (outside_of_face[order].astype(np.int32) + 1)
            ),
            ng_raw=jnp.asarray(_face_normals(p0[order], p1[order], p2[order])),
            arealight_idx=jnp.asarray(arealight_idx[order]),
            face_rows=jnp.asarray(_pack_face_rows(
                _face_normals(p0[order], p1[order], p2[order]),
                n0[order], n1[order], n2[order],
                (face_type[order].astype(np.int32) << 24)
                | face_idx[order].astype(np.int32),
                ((inside_of_face[order].astype(np.int32) + 1) << 16)
                | (outside_of_face[order].astype(np.int32) + 1),
                arealight_idx[order],
            )),
            tex_rows=jnp.asarray(_pack_tex_rows(
                uv0[order], uv1[order], uv2[order],
                c0[order], c1[order], c2[order],
                alpha_const[order], alpha_tex[order],
            )),
            inside_medium=jnp.asarray(inside_of_face[order]),
            outside_medium=jnp.asarray(outside_of_face[order]),
            alpha_const=jnp.asarray(alpha_const[order]),
            alpha_tex=jnp.asarray(alpha_tex[order]),
            treelets=build_treelets(p0[order], p1[order], p2[order],
                                    ranges=_treelet_ranges(fb, len(p0)),
                                    supers=bvh_super_boxes(
                                        fb, len(p0),
                                        prim_lo=tri_lo[order],
                                        prim_hi=tri_hi[order])),
            inst=_dummy_instanced(),
            inst_nrm=jnp.eye(3, dtype=jnp.float32)[None],
            inst_l2w=jnp.eye(4, dtype=jnp.float32)[:3][None],
            inst_mat_packed=jnp.full((1,), -1, jnp.int32),
            materials=banks,
            atlas=atlas_builder.build(),
            media=pack_media(self._media),
            camera_medium=jnp.int32(self._camera_medium),
            lights=lights,
            light_bvh=light_bvh,
            rgb2spec=srgb_table(),
            world_lo=jnp.asarray(world_lo),
            world_hi=jnp.asarray(world_hi),
            scene_radius=jnp.float32(max(radius, 1e-3)),
            present_materials=tuple(sorted(present)),
            n_lights=n_lights,
            n_faces=int(len(p0)),
            has_media=len(self._media) > 0,
            has_alpha=has_alpha,
            traversal=traversal,
            light_sampler=self._light_sampler,
        )


def _treelet_ranges(fb, n_prims: int):
    """Treelet formation policy: HIKARI_TREELET_MODE=stride (default)
    blocks fixed TT-runs of the leaf order; =cut blocks at BVH subtree
    boundaries (tight node AABBs, wavefront.bvh_cut_ranges — measured
    MORE total pairs on the mesh bench: ~46% more treelets at 68% fill
    outweigh the tighter boxes, because incoherent bounce tiles pair
    with most treelets regardless of box tightness)."""
    import os

    from ..geometry.wavefront import bvh_cut_ranges

    if os.environ.get("HIKARI_TREELET_MODE", "stride") == "cut":
        return bvh_cut_ranges(fb, n_prims)
    return None


def _dummy_instanced():
    """1-entry InstancedTreelets placeholder for flat scenes (never hit)."""
    from ..geometry.instanced import InstancedTreelets
    from ..geometry.wavefront import TREELET

    return InstancedTreelets(
        lo=jnp.full((1, 3), 3.0e37, jnp.float32),
        hi=jnp.full((1, 3), 3.0e37, jnp.float32),
        bw=jnp.zeros((1, 24, 3 * TREELET), jnp.bfloat16),
        ti_obj=jnp.zeros((1,), jnp.int32),
        ti_inst=jnp.zeros((1,), jnp.int32),
        inst_a=jnp.eye(4, dtype=jnp.float32)[None],
    )


def _mesh_face_arrays(mesh: TriangleMesh):
    """Object-space per-face corner arrays (transform baked if present)."""
    v = mesh.vertices
    if mesh.transform is not None:
        m = np.asarray(mesh.transform, np.float32)
        v = v @ m[:3, :3].T + m[:3, 3]
    f = mesh.faces
    n = mesh.normals
    if n is None:
        n = compute_vertex_normals(v, f)
    elif mesh.transform is not None:
        inv_t = np.linalg.inv(m[:3, :3]).T
        n = n @ inv_t.T
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    uv = mesh.uvs if mesh.uvs is not None else np.zeros((len(v), 2), np.float32)
    c = mesh.colors if mesh.colors is not None else np.ones((len(v), 3), np.float32)
    return dict(
        p0=v[f[:, 0]].astype(np.float32), p1=v[f[:, 1]].astype(np.float32),
        p2=v[f[:, 2]].astype(np.float32),
        n0=n[f[:, 0]].astype(np.float32), n1=n[f[:, 1]].astype(np.float32),
        n2=n[f[:, 2]].astype(np.float32),
        uv0=uv[f[:, 0]].astype(np.float32), uv1=uv[f[:, 1]].astype(np.float32),
        uv2=uv[f[:, 2]].astype(np.float32),
        c0=c[f[:, 0]].astype(np.float32), c1=c[f[:, 1]].astype(np.float32),
        c2=c[f[:, 2]].astype(np.float32),
    )


def _pad_blas(arrs: dict, extras: dict, tt: int):
    """Pad a BLAS's leaf-ordered face arrays to a TREELET multiple.
    Geometry pads with far-away degenerate corners (never hit); attribute
    pads are zeros / -1."""
    n = len(arrs["p0"])
    pad = (-n) % tt
    if pad == 0:
        return arrs, extras
    out = {}
    for k, a in arrs.items():
        if k in ("p0", "p1", "p2"):
            fill = np.full((pad, 3), 3.0e37, np.float32)
        else:
            fill = np.zeros((pad,) + a.shape[1:], a.dtype)
        out[k] = np.concatenate([a, fill])
    ex = {}
    for k, a in extras.items():
        fill_val = -1 if a.dtype == np.int32 else 0
        ex[k] = np.concatenate([a, np.full((pad,) + a.shape[1:], fill_val, a.dtype)])
    return out, ex


def _build_instanced_scene(self, traversal: str) -> SceneData:
    """Two-level build: one BLAS per unique mesh + instance tables
    (Raycore TLAS analog; geometry/instanced.py)."""
    from ..geometry.instanced import build_instanced_treelets
    from ..geometry.wavefront import TREELET
    from ..textures.atlas import ImageTexture

    assert traversal != "skiplink", (
        "instanced scenes use the packet engine; pass traversal='packets' "
        "or 'packets_interp'"
    )

    atlas_builder = AtlasBuilder()
    banks, tags, idxs, present = pack_materials(self._materials, atlas_builder)
    packed_of = (tags.astype(np.int32) << 24) | idxs.astype(np.int32)

    for mesh, tr, mat_id, media, alpha, per_inst in self._instanced:
        bad = [mat_id] + (per_inst or [])
        for mid in bad:
            assert tags[mid] != EMISSIVE, (
                "emissive materials on instanced meshes are not supported "
                "(the reference registers one DiffuseAreaLight per emissive "
                "face; instance that mesh flattened instead)"
            )

    blas_tris = []       # list of (p0, p1, p2) leaf-ordered, TT-padded
    attr_chunks = []     # per-BLAS dict of padded attribute arrays
    instances = []       # (blas_id, world_from_object)
    inst_mat = []        # per-instance material override packed word; -1
    inst_alpha = []      # kept per-face below; placeholder

    def finish_blas(arrs, extras):
        tri_lo = np.minimum(np.minimum(arrs["p0"], arrs["p1"]), arrs["p2"])
        tri_hi = np.maximum(np.maximum(arrs["p0"], arrs["p1"]), arrs["p2"])
        fb = build_bvh(tri_lo, tri_hi)
        o = fb.prim_order
        arrs = {k: a[o] for k, a in arrs.items()}
        extras = {k: a[o] for k, a in extras.items()}
        arrs, extras = _pad_blas(arrs, extras, TREELET)
        blas_tris.append((arrs["p0"], arrs["p1"], arrs["p2"]))
        attr_chunks.append((arrs, extras))
        return len(blas_tris) - 1

    # BLAS 0: all non-instanced meshes, flattened (identity instance)
    arealight_faces = None
    if self._meshes:
        parts = []
        ex_parts = []
        for mesh, mat_id, (in_med, out_med), alpha in zip(
            self._meshes, self._mesh_mat, self._mesh_media, self._mesh_alpha
        ):
            a = _mesh_face_arrays(mesh)
            nf = len(a["p0"])
            if isinstance(alpha, ImageTexture):
                al_c = np.ones(nf, np.float32)
                al_t = np.full(nf, atlas_builder.add(alpha), np.int32)
            else:
                al_c = np.full(nf, 1.0 if alpha is None else float(alpha), np.float32)
                al_t = np.full(nf, -1, np.int32)
            ex = dict(
                mat_packed=np.full(nf, packed_of[mat_id], np.int32),
                med_packed=np.full(
                    nf, ((in_med + 1) << 16) | (out_med + 1), np.int32),
                alpha_const=al_c, alpha_tex=al_t,
                mat_slot=np.full(nf, mat_id, np.int32),
            )
            parts.append(a)
            ex_parts.append(ex)
        arrs = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
        extras = {k: np.concatenate([e[k] for e in ex_parts]) for k in ex_parts[0]}
        bid = finish_blas(arrs, extras)
        instances.append((bid, np.eye(4, dtype=np.float32)))
        inst_mat.append(-1)

    for mesh, tr, mat_id, (in_med, out_med), alpha, per_inst in self._instanced:
        a = _mesh_face_arrays(mesh)
        nf = len(a["p0"])
        if isinstance(alpha, ImageTexture):
            al_c = np.ones(nf, np.float32)
            al_t = np.full(nf, atlas_builder.add(alpha), np.int32)
        else:
            al_c = np.full(nf, 1.0 if alpha is None else float(alpha), np.float32)
            al_t = np.full(nf, -1, np.int32)
        ex = dict(
            mat_packed=np.full(nf, packed_of[mat_id], np.int32),
            med_packed=np.full(nf, ((in_med + 1) << 16) | (out_med + 1), np.int32),
            alpha_const=al_c, alpha_tex=al_t,
            mat_slot=np.full(nf, mat_id, np.int32),
        )
        bid = finish_blas(a, ex)
        for k, m in enumerate(tr):
            instances.append((bid, m))
            inst_mat.append(
                int(packed_of[per_inst[k]]) if per_inst is not None else -1)

    inst_tl = build_instanced_treelets(blas_tris, instances)

    # concatenated padded attribute arrays (object space, BLAS order)
    def cat(key, which=0):
        return np.concatenate([c[which][key] for c in attr_chunks])

    p0 = cat("p0"); p1 = cat("p1"); p2 = cat("p2")
    face_packed = cat("mat_packed", 1)
    face_type = face_packed >> 24
    face_idx = face_packed & 0xFFFFFF
    med_packed = cat("med_packed", 1)
    alpha_const = cat("alpha_const", 1)
    alpha_tex = cat("alpha_tex", 1)
    has_alpha = bool((alpha_tex >= 0).any() or (alpha_const < 1.0).any())
    for t in np.unique(face_type):
        present.add(int(t))

    # area lights: only BLAS-0 (identity) emissive faces
    arealight_idx = np.full(len(p0), -1, np.int32)
    area_tris = None
    emissive_mask = (face_type == EMISSIVE) & (p0[:, 0] < 1.0e37)
    if emissive_mask.any():
        which = np.nonzero(emissive_mask)[0]
        mat_slot = cat("mat_slot", 1)
        arealight_idx[which] = np.arange(len(which), dtype=np.int32)

        def baked_le(mat):
            le = mat.le
            if isinstance(le, ImageTexture):
                le = np.asarray(le.image, np.float32).reshape(-1, 3).mean(0)
            return np.asarray(le, np.float32) * mat.scale

        a_le = np.stack([baked_le(self._materials[mat_slot[i]]) for i in which])
        a_two = np.array(
            [self._materials[mat_slot[i]].two_sided for i in which], bool)
        area_tris = (p0[which], p1[which], p2[which], a_le, a_two)

    finite = np.asarray(inst_tl.lo)[:, 0] < 1.0e37
    world_lo = np.asarray(inst_tl.lo)[finite].min(axis=0)
    world_hi = np.asarray(inst_tl.hi)[finite].max(axis=0)
    radius = 0.5 * float(np.linalg.norm(world_hi - world_lo))

    lights = pack_lights(
        self._lights, area_tris, scene_radius=max(radius, 1e-3),
        sampler="power" if self._light_sampler == "bvh" else self._light_sampler,
    )
    from ..lights.bvh_sampler import build_light_bvh

    light_bvh = build_light_bvh(lights)

    # skip-link stub: the instanced path never walks it, but the pytree
    # field carries the object-space corner arrays for texture derivatives
    bvh = DeviceBVH(
        lo=jnp.asarray(world_lo[None]), hi=jnp.asarray(world_hi[None]),
        first=jnp.zeros((1,), jnp.int32), count=jnp.zeros((1,), jnp.int32),
        skip=jnp.ones((1,), jnp.int32),
        p0=jnp.asarray(p0), p1=jnp.asarray(p1), p2=jnp.asarray(p2),
    )

    # per-instance transforms for shading
    mats44 = np.stack([m for _, m in instances]).astype(np.float64)
    inv_lin = np.stack([np.linalg.inv(m[:3, :3]) for m in mats44])
    inst_nrm = np.transpose(inv_lin, (0, 2, 1)).astype(np.float32)  # inv^T
    inst_l2w = mats44[:, :3, :4].astype(np.float32)

    ng_raw = _face_normals(p0, p1, p2)

    return SceneData(
        bvh=bvh,
        n0=jnp.asarray(cat("n0")), n1=jnp.asarray(cat("n1")),
        n2=jnp.asarray(cat("n2")),
        uv0=jnp.asarray(cat("uv0")), uv1=jnp.asarray(cat("uv1")),
        uv2=jnp.asarray(cat("uv2")),
        c0=jnp.asarray(cat("c0")), c1=jnp.asarray(cat("c1")),
        c2=jnp.asarray(cat("c2")),
        mat_type=jnp.asarray(face_type),
        mat_idx=jnp.asarray(face_idx),
        mat_packed=jnp.asarray(face_packed),
        med_packed=jnp.asarray(med_packed),
        ng_raw=jnp.asarray(ng_raw),
        arealight_idx=jnp.asarray(arealight_idx),
        face_rows=jnp.asarray(_pack_face_rows(
            ng_raw, cat("n0"), cat("n1"), cat("n2"),
            face_packed, med_packed, arealight_idx)),
        tex_rows=jnp.asarray(_pack_tex_rows(
            cat("uv0"), cat("uv1"), cat("uv2"),
            cat("c0"), cat("c1"), cat("c2"),
            alpha_const, alpha_tex)),
        inside_medium=jnp.asarray((med_packed >> 16) - 1),
        outside_medium=jnp.asarray((med_packed & 0xFFFF) - 1),
        alpha_const=jnp.asarray(alpha_const),
        alpha_tex=jnp.asarray(alpha_tex),
        treelets=Treelets(
            lo=jnp.full((1, 3), 3.0e37), hi=jnp.full((1, 3), 3.0e37),
            sup_lo=jnp.full((1, 3), 3.0e37),
            sup_hi=jnp.full((1, 3), -3.0e37),
            bw=jnp.zeros((1, KSPLIT, 3 * TREELET), jnp.bfloat16),
            tri=jnp.zeros((TREELET, 10), jnp.float32),
        ),
        inst=inst_tl,
        inst_nrm=jnp.asarray(inst_nrm),
        inst_l2w=jnp.asarray(inst_l2w),
        inst_mat_packed=jnp.asarray(np.asarray(inst_mat, np.int32)),
        materials=banks,
        atlas=atlas_builder.build(),
        media=pack_media(self._media),
        camera_medium=jnp.int32(self._camera_medium),
        lights=lights,
        light_bvh=light_bvh,
        rgb2spec=srgb_table(),
        world_lo=jnp.asarray(world_lo.astype(np.float32)),
        world_hi=jnp.asarray(world_hi.astype(np.float32)),
        scene_radius=jnp.float32(max(radius, 1e-3)),
        present_materials=tuple(sorted(present)),
        n_lights=lights.n_flat,
        n_faces=int(len(p0)),
        has_media=len(self._media) > 0,
        has_alpha=has_alpha,
        has_instances=True,
        traversal=traversal if traversal != "auto" else "packets",
        light_sampler=self._light_sampler,
    )


Scene._build_instanced = _build_instanced_scene
