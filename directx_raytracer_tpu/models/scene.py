"""Scene model + conversion to device-resident SoA buffers.

Host side mirrors ``CRTScene`` (reference: CRTScene.{h,cpp}): settings
(background color + image size, CRTScene.h:9-14), a camera, meshes, lights,
materials and textures, with ``get_texture_by_name`` the same linear scan as
CRTScene.cpp:52-63.

Device side is where the design diverges deliberately from the reference:
instead of per-mesh GPU vertex/index buffers + driver-built BLAS/TLAS
(DXRTRenderer.cpp:302-453, 548-806), the whole scene is flattened at load
time into a single triangle-major SoA pytree (`DeviceScene`) of padded f32 /
i32 arrays.  All per-vertex attributes (normals, UVs) are pre-gathered to
per-triangle-corner arrays so the render loop never chases indices, and each
triangle additionally carries a precomputed **Woop unit-triangle transform**
(a 3x4 affine map into the triangle's barycentric frame) so that batched
ray-triangle intersection becomes two dense matmuls on the MXU — see
``ops.intersect``.

Padding note: triangle arrays are padded to a multiple of ``TRI_PAD`` with
sentinel triangles whose Woop translation is -1e30 and linear part 0, which
makes every padded intersection test produce t = +inf (a guaranteed miss)
without branching.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import numpy as np

from .camera import Camera
from .light import Light
from .material import Material, MaterialType
from .mesh import Mesh, face_normals
from .texture import Texture, TextureType

TRI_PAD = 128  # pad triangle count to TPU lane multiples


# ---------------------------------------------------------------------------
# Host-side scene
# ---------------------------------------------------------------------------


@dataclass
class SceneSettings:
    background_color: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    image_width: int = 1920
    image_height: int = 1080


@dataclass
class Scene:
    settings: SceneSettings = field(default_factory=SceneSettings)
    camera: Camera = field(default_factory=Camera)
    meshes: list[Mesh] = field(default_factory=list)
    lights: list[Light] = field(default_factory=list)
    materials: list[Material] = field(default_factory=list)
    textures: list[Texture] = field(default_factory=list)

    def get_texture_by_name(self, name: str) -> Texture | None:
        for tex in self.textures:
            if tex.name == name:
                return tex
        return None

    @property
    def num_triangles(self) -> int:
        return sum(m.num_triangles for m in self.meshes)


# ---------------------------------------------------------------------------
# Device-side pytrees
# ---------------------------------------------------------------------------


def _register(cls, meta=()):
    fields = [f.name for f in dataclasses.fields(cls)]
    data = [f for f in fields if f not in meta]
    jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=list(meta))
    return cls


@dataclass
class Geometry:
    """Triangle-major SoA geometry, padded to a multiple of TRI_PAD."""

    v0: jax.Array  # (T, 3) f32 — first vertex
    e1: jax.Array  # (T, 3) f32 — v1 - v0
    e2: jax.Array  # (T, 3) f32 — v2 - v0
    woop: jax.Array  # (T, 3, 4) f32 — affine map into the unit-triangle frame
    face_normal: jax.Array  # (T, 3) f32 — unit geometric normal
    n0: jax.Array  # (T, 3) f32 — per-corner vertex normals (smooth shading)
    n1: jax.Array
    n2: jax.Array
    uv0: jax.Array  # (T, 3) f32 — per-corner UVs (reference stores 3-comp UVs)
    uv1: jax.Array
    uv2: jax.Array
    mat_id: jax.Array  # (T,) i32 — material index; -1 for padding
    mesh_id: jax.Array  # (T,) i32 — InstanceID analog (mesh index)
    local_id: jax.Array  # (T,) i32 — PrimitiveIndex analog (tri index in mesh)
    # Wide packed per-triangle records: TPU gathers cost per ROW, not per
    # byte (a (2M,3) gather runs at <1 GB/s), so everything the shading path
    # needs per hit is packed into two wide rows fetched by ONE gather each.
    # ONE fused record row per triangle: gathers are row-count-bound on TPU
    # (measured ~76 Mrows/s at ANY width 1..32), so everything the shading
    # path needs per hit — geometry, vertex attributes, AND the material —
    # lives in a single (T, 40) row fetched by ONE gather per bounce.
    # Layout: v0(3) e1(3) e2(3) local mesh mat | n0(3) n1(3) n2(3) fn(3)
    # uv0.xy uv1.xy uv2.xy | mtype malbedo(3) ior smooth tex_id specular
    # shininess | pad; ids bitcast i32.
    packed: jax.Array  # (T, 40) f32
    scene_lo: jax.Array  # (3,) f32 — scene AABB (coherence sort of bounced rays)
    scene_hi: jax.Array  # (3,) f32
    n_tris: int  # DEVICE triangle slots (treelet leaves x CLUSTER_K, incl.
    #              interleaved guaranteed-miss padding; BVH slot == id)
    n_real_tris: int  # true parsed triangle count (stats / tests)
    morton_sorted: bool  # triangles stored in BVH cluster order (slot == id)
    # Optional acceleration structure (bvh.BVH pytree) BOUND to the
    # geometry: riding the pytree makes the BVH a jit ARGUMENT of render
    # functions instead of a closure constant — closed-over arrays embed in
    # the HLO as literals, and a 1M-triangle planar Woop operand (~200 MB)
    # overflows the remote compiler's request limit (the reference binds
    # its TLAS as a root-signature resource for the same reason,
    # DXRTRenderer.cpp:809-863).  Set by renderers: geometry.accel = bvh.
    accel: object = None


_register(Geometry, meta=("n_tris", "n_real_tris", "morton_sorted"))


def _np_spread_bits_10(x):
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _np_morton_order(v0, e1, e2):
    """Z-curve order of triangle centroids (numpy, scene-build time).

    Sorting the scene's triangle storage itself means the BVH's Morton sort
    is the identity, so intersection results index geometry directly — no
    (2M,) order-remap gather per frame."""
    p0, p1, p2 = v0, v0 + e1, v0 + e2
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    c = (lo + hi) * 0.5
    smin = lo.min(axis=0)
    ext = np.maximum(hi.max(axis=0) - smin, 1e-12)
    q = np.clip((c - smin) / ext * 1024.0, 0.0, 1023.0).astype(np.int32)
    code = (
        (_np_spread_bits_10(q[:, 0]) << 2)
        | (_np_spread_bits_10(q[:, 1]) << 1)
        | _np_spread_bits_10(q[:, 2])
    )
    return np.argsort(code, kind="stable").astype(np.int32)


@dataclass
class MaterialTable:
    mtype: jax.Array  # (M,) i32 — MaterialType
    albedo: jax.Array  # (M, 3) f32
    ior: jax.Array  # (M,) f32
    smooth: jax.Array  # (M,) bool
    tex_id: jax.Array  # (M,) i32 — index into TextureTable, -1 = constant albedo
    packed: jax.Array  # (M, 12) f32 — type albedo(3) ior smooth tex_id specular shininess pad(3)


_register(MaterialTable)


@dataclass
class TextureTable:
    ttype: jax.Array  # (K,) i32 — TextureType
    color_a: jax.Array  # (K, 3) f32
    color_b: jax.Array  # (K, 3) f32
    scalar: jax.Array  # (K,) f32 — square_size / edge_width
    bitmap_id: jax.Array  # (K,) i32 — index into atlas, -1 = procedural
    atlas: jax.Array  # (B, Hmax, Wmax, 3) f32 — normalized bitmap pixels
    atlas_size: jax.Array  # (B, 2) i32 — (height, width) per bitmap
    packed: jax.Array  # (K, 12) f32 — type ca(3) cb(3) scalar bid h w pad


_register(TextureTable)


@dataclass
class LightTable:
    position: jax.Array  # (L, 3) f32
    intensity: jax.Array  # (L,) f32
    n_lights: int


_register(LightTable, meta=("n_lights",))


@dataclass
class DeviceScene:
    geometry: Geometry
    materials: MaterialTable
    textures: TextureTable
    lights: LightTable
    background_color: jax.Array  # (3,) f32
    # Static: any material carries a Blinn-Phong specular term.  Lets the
    # Whitted shader skip the per-(light, ray) pow() entirely for reference
    # scenes (whose 4-type material model has no specular).
    has_specular: bool = False
    # Static: the scene declares textures.  Texture-free scenes skip the
    # per-ray texture-table gather + atlas sample entirely (row gathers are
    # the costliest op class on TPU).
    has_textures: bool = False
    # Static: any REFRACTIVE material exists.  Without one, rays never
    # split, so the Whitted bounce queue can default to capacity n_pix
    # (queue_factor 1) instead of 2x — bounce passes at static full
    # capacity are ~25% of the frame.
    has_refractive: bool = False


_register(DeviceScene,
          meta=("has_specular", "has_textures", "has_refractive"))


# ---------------------------------------------------------------------------
# Flattening
# ---------------------------------------------------------------------------


def _woop_transforms(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> np.ndarray:
    """Per-triangle 3x4 affine maps W = [A^-1 | -A^-1 v0] with A = [e1 e2 n]
    (columns), n = cross(e1, e2).  A ray (o, d) maps to o' = W @ (o, 1),
    d' = W[:, :3] @ d, and intersects at t = -o'_z / d'_z with barycentrics
    u = o'_x + t d'_x, v = o'_y + t d'_y."""
    n = np.cross(e1, e2)
    a = np.stack([e1, e2, n], axis=-1)  # (T, 3, 3) columns
    det = np.linalg.det(a)
    ok = np.abs(det) > 1e-30
    a_safe = np.where(ok[:, None, None], a, np.eye(3, dtype=np.float32))
    inv = np.linalg.inv(a_safe).astype(np.float32)
    trans = -np.einsum("tij,tj->ti", inv, v0).astype(np.float32)
    woop = np.concatenate([inv, trans[:, :, None]], axis=-1)  # (T, 3, 4)
    # Degenerate sentinel: zero linear part, -1e30 translation => t = +inf.
    bad = np.zeros((3, 4), dtype=np.float32)
    bad[:, 3] = -1e30
    woop = np.where(ok[:, None, None], woop, bad)
    return woop


CLUSTER_K = 128  # treelet leaf capacity == BVH cluster width (bvh/clustered.py)


def _np_treelet_leaves(v0, e1, e2, k=CLUSTER_K):
    """Recursive binned-SAH split of triangle centroids into leaves of
    <= k triangles.  Returns a list of index arrays.

    Why not fixed k-runs of the Morton curve (round 1): a run can straddle
    a large spatial jump — the bench scene's 2-triangle ground plane fuses
    into a sphere's cluster, giving that cluster an AABB covering half the
    scene, which every tile's frustum then overlaps.  Spatially-split
    leaves are tight at the same dense-matmul width; the unfilled slots
    carry degenerate sentinel rows (e1 = e2 = 0 => guaranteed-miss Woop,
    anchor v0 inside the leaf box so cluster AABBs stay tight).

    Two refinements over round 2's longest-axis median split, both aimed
    at tested-pairs/ray (the kernel's dominant cost):
    * split COUNTS round to multiples of k: pure halving leaves leaves
      ~76% full on average and sentinel padding is tested like real
      triangles — full leaves cover the same geometry with ~25% fewer
      tested pairs;
    * the split plane minimizes a binned SAH-style cost (sum of child
      AABB half-areas weighted by child counts, 16 bins over each axis)
      instead of blindly halving at the longest-axis median — measured
      ~10% fewer scheduled pairs on the 100k bench scene.
    """
    p1, p2 = v0 + e1, v0 + e2
    lo = np.minimum(np.minimum(v0, p1), p2)
    hi = np.maximum(np.maximum(v0, p1), p2)
    cent = (lo + hi) * 0.5
    nbins = 16
    leaves = []
    stack = [np.arange(len(v0), dtype=np.int64)]
    while stack:
        s = stack.pop()
        n = len(s)
        if n <= k:
            leaves.append(s)
            continue
        c = cent[s]
        c_lo, c_hi = c.min(axis=0), c.max(axis=0)
        ext = c_hi - c_lo
        best = None  # (cost, axis, m)
        for ax in range(3):
            if ext[ax] <= 0:
                continue
            order = np.argsort(c[:, ax], kind="stable")
            slo, shi = lo[s][order], hi[s][order]
            # prefix/suffix AABB half-areas in triangle-count order
            pre_lo = np.minimum.accumulate(slo, axis=0)
            pre_hi = np.maximum.accumulate(shi, axis=0)
            suf_lo = np.minimum.accumulate(slo[::-1], axis=0)[::-1]
            suf_hi = np.maximum.accumulate(shi[::-1], axis=0)[::-1]

            def area(alo, ahi):
                d = np.maximum(ahi - alo, 0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

            # candidate left counts: multiples of k (full left leaves)
            ms = np.arange(k, n, k)
            if len(ms) == 0:
                ms = np.array([n // 2])
            a_l = area(pre_lo[ms - 1], pre_hi[ms - 1])
            a_r = area(suf_lo[ms], suf_hi[ms])
            # SAH-ish: children cost ~ area x ceil(count/k) cluster visits
            cost = a_l * np.ceil(ms / k) + a_r * np.ceil((n - ms) / k)
            i = int(np.argmin(cost))
            if best is None or cost[i] < best[0]:
                best = (cost[i], ax, int(ms[i]), order)
        if best is None:  # all centroids identical: arbitrary full split
            m = min(k, n - 1)
            leaves.append(s[:m])
            stack.append(s[m:])
            continue
        _, ax, m, order = best
        stack.append(s[order[m:]])
        stack.append(s[order[:m]])
    return leaves


def _pad(arr: np.ndarray, total: int, fill=0) -> np.ndarray:
    pad = total - arr.shape[0]
    if pad <= 0:
        return arr
    width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, width, constant_values=fill)


def build_geometry(meshes: list[Mesh], tri_pad: int = TRI_PAD,
                   mat_rows=None) -> Geometry:
    v0s, e1s, e2s, fns = [], [], [], []
    n0s, n1s, n2s = [], [], []
    uv0s, uv1s, uv2s = [], [], []
    mat_ids, mesh_ids, local_ids = [], [], []

    for mesh_idx, mesh in enumerate(meshes):
        if mesh.num_triangles == 0:
            continue
        if mesh.normals is None:
            mesh.calculate_vertex_normals()
        tri = np.asarray(mesh.indices, np.int64).reshape(-1, 3)
        verts = np.asarray(mesh.vertices, np.float32)
        a, b, c = verts[tri[:, 0]], verts[tri[:, 1]], verts[tri[:, 2]]
        v0s.append(a)
        e1s.append(b - a)
        e2s.append(c - a)
        fns.append(face_normals(verts, mesh.indices))
        nrm = mesh.normals
        n0s.append(nrm[tri[:, 0]])
        n1s.append(nrm[tri[:, 1]])
        n2s.append(nrm[tri[:, 2]])
        if len(mesh.uvs):
            uvs = np.asarray(mesh.uvs, np.float32)
            uv0s.append(uvs[tri[:, 0]])
            uv1s.append(uvs[tri[:, 1]])
            uv2s.append(uvs[tri[:, 2]])
        else:
            z = np.zeros((len(tri), 3), np.float32)
            uv0s.append(z)
            uv1s.append(z)
            uv2s.append(z)
        mat_ids.append(np.full(len(tri), mesh.material_index, np.int32))
        mesh_ids.append(np.full(len(tri), mesh_idx, np.int32))
        local_ids.append(np.arange(len(tri), dtype=np.int32))

    if not v0s:  # empty scene: one sentinel triangle
        v0s = [np.zeros((1, 3), np.float32)]
        e1s = [np.zeros((1, 3), np.float32)]
        e2s = [np.zeros((1, 3), np.float32)]
        fns = [np.zeros((1, 3), np.float32)]
        n0s = n1s = n2s = [np.zeros((1, 3), np.float32)]
        uv0s = uv1s = uv2s = [np.zeros((1, 3), np.float32)]
        mat_ids = [np.full(1, -1, np.int32)]
        mesh_ids = [np.zeros(1, np.int32)]
        local_ids = [np.zeros(1, np.int32)]
        n_true = 0
    else:
        n_true = sum(len(x) for x in v0s)

    cat = lambda xs: np.concatenate(xs, axis=0)
    v0, e1, e2 = cat(v0s), cat(e1s), cat(e2s)
    fn_arr, n0_arr, n1_arr, n2_arr = cat(fns), cat(n0s), cat(n1s), cat(n2s)
    uv0_arr, uv1_arr, uv2_arr = cat(uv0s), cat(uv1s), cat(uv2s)
    mat_arr, mesh_arr, local_arr = cat(mat_ids), cat(mesh_ids), cat(local_ids)

    if n_true > 0:
        # Store triangles in treelet order: spatially tight leaves of
        # <= CLUSTER_K, each padded IN PLACE to exactly CLUSTER_K slots so
        # the BVH's fixed-width clusters align with leaf boundaries and
        # slot == device triangle id holds (no per-frame remap gather).
        leaves = _np_treelet_leaves(v0, e1, e2)
        n_slots = len(leaves) * CLUSTER_K
        slot_src = np.full(n_slots, -1, np.int64)
        anchor = np.zeros(n_slots, np.int64)
        out = 0
        for leaf in leaves:
            slot_src[out : out + len(leaf)] = leaf
            anchor[out : out + CLUSTER_K] = leaf[0]
            out += CLUSTER_K
        pad_mask = slot_src < 0
        take = np.where(pad_mask, anchor, slot_src)

        def grab(x, pad_value=0):
            y = x[take].copy()
            y[pad_mask] = pad_value
            return y

        # v0 pads to the leaf's anchor vertex: with e1 = e2 = 0 the slot is
        # a guaranteed-miss point INSIDE the leaf's AABB (doesn't bloat it).
        v0 = v0[take]
        e1, e2 = grab(e1), grab(e2)
        fn_arr = grab(fn_arr)
        n0_arr, n1_arr, n2_arr = grab(n0_arr), grab(n1_arr), grab(n2_arr)
        uv0_arr, uv1_arr, uv2_arr = grab(uv0_arr), grab(uv1_arr), grab(uv2_arr)
        mat_arr = grab(mat_arr, pad_value=-1)
        mesh_arr = grab(mesh_arr, pad_value=-1)
        local_arr = grab(local_arr, pad_value=-1)

    woop = _woop_transforms(v0, e1, e2)
    p1, p2 = v0 + e1, v0 + e2
    scene_lo = np.minimum(np.minimum(v0, p1), p2).min(axis=0).astype(np.float32)
    scene_hi = np.maximum(np.maximum(v0, p1), p2).max(axis=0).astype(np.float32)

    total = max(tri_pad, -(-len(v0) // tri_pad) * tri_pad)
    bad_woop = np.zeros((3, 4), np.float32)
    bad_woop[:, 3] = -1e30
    woop = _pad(woop, total)
    woop[len(v0):] = bad_woop

    def dev(x):
        return np.asarray(x)

    pv0 = _pad(v0, total)
    pe1 = _pad(e1, total)
    pe2 = _pad(e2, total)
    pfn = _pad(fn_arr, total)
    pn0, pn1, pn2 = _pad(n0_arr, total), _pad(n1_arr, total), _pad(n2_arr, total)
    puv0, puv1, puv2 = _pad(uv0_arr, total), _pad(uv1_arr, total), _pad(uv2_arr, total)
    pmat = _pad(mat_arr, total, fill=-1)
    pmesh = _pad(mesh_arr, total, fill=-1)
    plocal = _pad(local_arr, total, fill=-1)

    packed = np.zeros((total, 40), np.float32)
    packed[:, 0:3] = pv0
    packed[:, 3:6] = pe1
    packed[:, 6:9] = pe2
    packed[:, 9] = plocal.view(np.float32)
    packed[:, 10] = pmesh.view(np.float32)
    packed[:, 11] = pmat.view(np.float32)
    packed[:, 12:15] = pn0
    packed[:, 15:18] = pn1
    packed[:, 18:21] = pn2
    packed[:, 21:24] = pfn
    packed[:, 24:26] = puv0[:, :2]
    packed[:, 26:28] = puv1[:, :2]
    packed[:, 28:30] = puv2[:, :2]
    if mat_rows is not None:
        # Denormalize the material row per triangle (mat tables are tiny;
        # the per-ray material gather this removes costs a full row-gather
        # pass). Padding/invalid ids use row 0 — misses are masked anyway.
        packed[:, 30:39] = mat_rows[np.maximum(pmat, 0) % len(mat_rows)]

    geo = Geometry(
        v0=dev(pv0),
        e1=dev(pe1),
        e2=dev(pe2),
        woop=dev(woop),
        face_normal=dev(pfn),
        n0=dev(pn0),
        n1=dev(pn1),
        n2=dev(pn2),
        uv0=dev(puv0),
        uv1=dev(puv1),
        uv2=dev(puv2),
        mat_id=dev(pmat),
        mesh_id=dev(pmesh),
        local_id=dev(plocal),
        packed=dev(packed),
        scene_lo=scene_lo,
        scene_hi=scene_hi,
        n_tris=len(v0) if n_true > 0 else 0,
        n_real_tris=n_true,
        morton_sorted=True,
    )
    return geo


def build_material_table(scene: Scene) -> MaterialTable:
    mats = scene.materials or [Material()]
    m = len(mats)
    mtype = np.zeros(m, np.int32)
    albedo = np.zeros((m, 3), np.float32)
    ior = np.ones(m, np.float32)
    smooth = np.zeros(m, bool)
    tex_id = np.full(m, -1, np.int32)
    specular = np.zeros(m, np.float32)
    shininess = np.full(m, 32.0, np.float32)
    tex_index = {t.name: i for i, t in enumerate(scene.textures)}
    for i, mat in enumerate(mats):
        mtype[i] = int(mat.type)
        albedo[i] = mat.albedo
        ior[i] = mat.ior
        smooth[i] = mat.smooth_shading
        specular[i] = getattr(mat, "specular", 0.0)
        shininess[i] = getattr(mat, "shininess", 32.0)
        if mat.is_texture():
            tex_id[i] = tex_index.get(mat.texture_name, -1)
    packed = np.zeros((m, 12), np.float32)
    packed[:, 0] = mtype.astype(np.float32)
    packed[:, 1:4] = albedo
    packed[:, 4] = ior
    packed[:, 5] = smooth.astype(np.float32)
    packed[:, 6] = tex_id.astype(np.float32)
    packed[:, 7] = specular
    packed[:, 8] = shininess
    return MaterialTable(mtype=mtype, albedo=albedo, ior=ior, smooth=smooth,
                         tex_id=tex_id, packed=packed)


def build_texture_table(scene: Scene, base_dir: str = ".") -> TextureTable:
    texs = scene.textures or [Texture()]
    k = len(texs)
    ttype = np.zeros(k, np.int32)
    color_a = np.zeros((k, 3), np.float32)
    color_b = np.zeros((k, 3), np.float32)
    scalar = np.ones(k, np.float32)
    bitmap_id = np.full(k, -1, np.int32)

    images = []
    for i, tex in enumerate(texs):
        ttype[i] = int(tex.type)
        color_a[i] = tex.color_a
        color_b[i] = tex.color_b
        scalar[i] = tex.scalar if tex.scalar else 1.0
        if tex.type == TextureType.BITMAP:
            tex.load(base_dir)
            bitmap_id[i] = len(images)
            images.append(tex.image)

    if images:
        hmax = max(im.shape[0] for im in images)
        wmax = max(im.shape[1] for im in images)
        atlas = np.zeros((len(images), hmax, wmax, 3), np.float32)
        sizes = np.zeros((len(images), 2), np.int32)
        for b, im in enumerate(images):
            h, w, c = im.shape
            rgb = np.zeros((h, w, 3), np.float32)
            rgb[:, :, 0] = im[:, :, 0]
            if c > 1:
                rgb[:, :, 1] = im[:, :, 1]
            if c > 2:
                rgb[:, :, 2] = im[:, :, 2]
            atlas[b, :h, :w] = rgb / 255.0
            sizes[b] = (h, w)
    else:
        atlas = np.zeros((1, 1, 1, 3), np.float32)
        sizes = np.ones((1, 2), np.int32)

    packed = np.zeros((k, 12), np.float32)
    packed[:, 0] = ttype.astype(np.float32)
    packed[:, 1:4] = color_a
    packed[:, 4:7] = color_b
    packed[:, 7] = scalar
    packed[:, 8] = bitmap_id.astype(np.float32)
    packed[:, 9] = sizes[np.clip(bitmap_id, 0, len(sizes) - 1), 0].astype(np.float32)
    packed[:, 10] = sizes[np.clip(bitmap_id, 0, len(sizes) - 1), 1].astype(np.float32)
    return TextureTable(
        ttype=ttype, color_a=color_a, color_b=color_b, scalar=scalar,
        bitmap_id=bitmap_id, atlas=atlas, atlas_size=sizes, packed=packed,
    )


def build_light_table(scene: Scene) -> LightTable:
    lights = scene.lights
    n = len(lights)
    pos = np.zeros((max(n, 1), 3), np.float32)
    inten = np.zeros(max(n, 1), np.float32)
    for i, l in enumerate(lights):
        pos[i] = l.position
        inten[i] = l.intensity
    return LightTable(position=pos, intensity=inten, n_lights=n)


def build_device_scene(scene: Scene, base_dir: str = ".", tri_pad: int = TRI_PAD) -> DeviceScene:
    """Flatten a host Scene into the device SoA pytree — the analog of the
    one-time geometry upload at DXRTRenderer.cpp:302-453, minus the
    per-mesh fence stalls.

    The pytree is device_put ONCE here: numpy leaves passed as jit
    arguments are re-uploaded on EVERY call (jit only skips pruned/unused
    leaves), and through a remote-device tunnel a 21 MB record table costs
    ~100 ms per frame of silent re-transfer."""
    materials = build_material_table(scene)
    dscene = DeviceScene(
        geometry=build_geometry(scene.meshes, tri_pad,
                                mat_rows=np.asarray(materials.packed)[:, :9]),
        materials=materials,
        textures=build_texture_table(scene, base_dir),
        lights=build_light_table(scene),
        background_color=np.asarray(scene.settings.background_color, np.float32),
        has_specular=any(
            getattr(m, "specular", 0.0) > 0.0 for m in scene.materials
        ),
        has_textures=bool(scene.textures),
        has_refractive=any(
            m.type == MaterialType.REFRACTIVE for m in scene.materials
        ),
    )
    return jax.device_put(dscene)
