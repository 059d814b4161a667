"""Flat geometry buffers and surface-interaction records.

The reference stores a polymorphic Primitive tree
(/root/reference/src/pbrt/cpu/primitive.h:33-119). Here the whole scene's
geometry is a handful of dense tensors; primitive identity is an int32 index,
and per-primitive attributes (material id, area-light id) are parallel arrays
— the SOA layout the reference's wavefront backend generates with `soac`
(src/pbrt/util/soa.h) falls out of the representation for free.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.pytree import pytree, static_field


@pytree
class GeometryBuffers:
    """All scene geometry in flat arrays.

    tri_verts:  (T, 3, 3) float32 world-space triangle vertices
    tri_mat:    (T,)      int32   material index
    tri_light:  (T,)      int32   area-light index, -1 if not emissive
    sph:        (S, 4)    float32 sphere center + radius
    sph_mat:    (S,)      int32
    sph_light:  (S,)      int32
    crv:        (C, 8)    float32 curve segments [p0 p1 r0 r1] (shapes/curve.py)
    crv_u:      (C, 2)    float32 per-segment curve-parameter span [u0 u1]
    crv_mat:    (C,)      int32
    disk:       (D, 8)    float32 [center(3) normal(3) radius inner_radius]
    disk_mat:   (D,)      int32
    cyl:        (Cy, 8)   float32 [base_point(3) axis(3) radius half_len]
    cyl_mat:    (Cy,)     int32
    blp:        (Bp, 12)  float32 bilinear patches [p00 p10 p01 p11]
    blp_mat:    (Bp,)     int32
    """

    tri_verts: jnp.ndarray
    tri_mat: jnp.ndarray
    tri_light: jnp.ndarray
    # Per-triangle face index within its source shape (Ptex faceIndex;
    # the reference's TriangleMesh faceIndices, util/mesh.h).
    tri_face: jnp.ndarray
    # Geometry alpha masks (GeometricPrimitive alpha,
    # cpu/primitive.h:59-63 / gpu any-hit alpha tests): per-triangle
    # constant alpha (1 = opaque) and alpha-texture id (-1 = none).
    tri_alpha: jnp.ndarray
    tri_alpha_tex: jnp.ndarray
    # Per-triangle per-vertex texture coordinates (T, 3, 2) — the mesh
    # "point2 uv"/"st" parameterization (util/mesh.h TriangleMesh::uv).
    # Default is the identity map [(0,0),(1,0),(0,1)]: interpolation then
    # returns the raw barycentrics, so meshes without declared uvs keep
    # the historical behavior (and ptex's per-face barycentric indexing).
    tri_uv: jnp.ndarray
    sph: jnp.ndarray
    sph_mat: jnp.ndarray
    sph_light: jnp.ndarray
    crv: jnp.ndarray
    crv_u: jnp.ndarray
    crv_mat: jnp.ndarray
    disk: jnp.ndarray
    disk_mat: jnp.ndarray
    cyl: jnp.ndarray
    cyl_mat: jnp.ndarray
    blp: jnp.ndarray
    blp_mat: jnp.ndarray
    # has_alpha gates the traversal restart loop statically so opaque
    # scenes compile the plain single-query path.
    has_alpha: bool = static_field(default=False)

    @staticmethod
    def build(
        tri_verts=None, tri_mat=None, tri_light=None, tri_face=None,
        spheres=None,
        sph_mat=None, sph_light=None, crv=None, crv_u=None, crv_mat=None,
        disk=None, disk_mat=None, cyl=None, cyl_mat=None,
        blp=None, blp_mat=None, tri_alpha=None, tri_alpha_tex=None,
        tri_uv=None,
    ) -> "GeometryBuffers":
        def _arr(x, shape, dtype):
            if x is None:
                return jnp.zeros(shape, dtype)
            return jnp.asarray(x, dtype)

        t = 0 if tri_verts is None else len(tri_verts)
        s = 0 if spheres is None else len(spheres)
        c = 0 if crv is None else len(crv)
        return GeometryBuffers(
            tri_verts=_arr(tri_verts, (t, 3, 3), jnp.float32),
            tri_mat=_arr(tri_mat, (t,), jnp.int32),
            tri_light=(
                jnp.full((t,), -1, jnp.int32)
                if tri_light is None
                else jnp.asarray(tri_light, jnp.int32)
            ),
            tri_face=(
                jnp.zeros((t,), jnp.int32)
                if tri_face is None
                else jnp.asarray(tri_face, jnp.int32)
            ),
            tri_alpha=(
                jnp.ones((t,), jnp.float32)
                if tri_alpha is None
                else jnp.asarray(tri_alpha, jnp.float32)
            ),
            tri_alpha_tex=(
                jnp.full((t,), -1, jnp.int32)
                if tri_alpha_tex is None
                else jnp.asarray(tri_alpha_tex, jnp.int32)
            ),
            tri_uv=(
                jnp.broadcast_to(
                    jnp.asarray(
                        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], jnp.float32
                    ),
                    (t, 3, 2),
                )
                if tri_uv is None
                else jnp.asarray(tri_uv, jnp.float32)
            ),
            has_alpha=bool(
                (tri_alpha is not None
                 and bool(np.any(np.asarray(tri_alpha) < 1.0)))
                or (tri_alpha_tex is not None
                    and bool(np.any(np.asarray(tri_alpha_tex) >= 0)))
            ),
            sph=_arr(spheres, (s, 4), jnp.float32),
            sph_mat=_arr(sph_mat, (s,), jnp.int32),
            sph_light=(
                jnp.full((s,), -1, jnp.int32)
                if sph_light is None
                else jnp.asarray(sph_light, jnp.int32)
            ),
            crv=_arr(crv, (c, 8), jnp.float32),
            crv_u=_arr(crv_u, (c, 2), jnp.float32),
            crv_mat=_arr(crv_mat, (c,), jnp.int32),
            disk=_arr(disk, (0 if disk is None else len(disk), 8),
                      jnp.float32),
            disk_mat=_arr(disk_mat, (0 if disk is None else len(disk),),
                          jnp.int32),
            cyl=_arr(cyl, (0 if cyl is None else len(cyl), 8), jnp.float32),
            cyl_mat=_arr(cyl_mat, (0 if cyl is None else len(cyl),),
                         jnp.int32),
            blp=_arr(blp, (0 if blp is None else len(blp), 12), jnp.float32),
            blp_mat=_arr(blp_mat, (0 if blp is None else len(blp),),
                         jnp.int32),
        )

    @property
    def num_triangles(self) -> int:
        return self.tri_verts.shape[0]

    @property
    def num_spheres(self) -> int:
        return self.sph.shape[0]

    @property
    def num_curves(self) -> int:
        return self.crv.shape[0]

    @property
    def num_disks(self) -> int:
        return self.disk.shape[0]

    @property
    def num_cyls(self) -> int:
        return self.cyl.shape[0]

    @property
    def num_blps(self) -> int:
        return self.blp.shape[0]


@pytree
class Interaction:
    """Surface interaction SOA (ref: SurfaceInteraction, interaction.h:506).

    All fields are batched over rays. `valid` is the hit mask (the reference's
    pstd::optional<ShapeIntersection> becomes a mask lane).
    """

    valid: jnp.ndarray  # (N,) bool
    t: jnp.ndarray  # (N,) ray parameter
    p: jnp.ndarray  # (N, 3) hit point
    n: jnp.ndarray  # (N, 3) geometric normal (unit, faces ray origin side decided by caller)
    uv: jnp.ndarray  # (N, 2)
    wo: jnp.ndarray  # (N, 3) outgoing (toward origin)
    mat: jnp.ndarray  # (N,) int32 material index
    light: jnp.ndarray  # (N,) int32 area light index or -1
    prim: jnp.ndarray  # (N,) int32 primitive id (triangles, spheres, curves)
    dpdu: jnp.ndarray  # (N, 3) surface tangent; zero => caller picks any frame


# --- Host-side mesh builders (scene construction helpers) -------------------


def make_quad(p0, p1, p2, p3) -> np.ndarray:
    """Two triangles (2, 3, 3) spanning the quad p0 p1 p2 p3 (ccw)."""
    p0, p1, p2, p3 = (np.asarray(p, np.float32) for p in (p0, p1, p2, p3))
    return np.stack([np.stack([p0, p1, p2]), np.stack([p0, p2, p3])])


def make_box(lo, hi) -> np.ndarray:
    """12 triangles (12, 3, 3) of an axis-aligned box with inward/outward
    normals determined by winding (outward)."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    quads = [
        # -z face (looking from -z: ccw)
        make_quad((x0, y0, z0), (x0, y1, z0), (x1, y1, z0), (x1, y0, z0)),
        # +z
        make_quad((x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1)),
        # -y
        make_quad((x0, y0, z0), (x1, y0, z0), (x1, y0, z1), (x0, y0, z1)),
        # +y
        make_quad((x0, y1, z0), (x0, y1, z1), (x1, y1, z1), (x1, y1, z0)),
        # -x
        make_quad((x0, y0, z0), (x0, y0, z1), (x0, y1, z1), (x0, y1, z0)),
        # +x
        make_quad((x1, y0, z0), (x1, y1, z0), (x1, y1, z1), (x1, y0, z1)),
    ]
    return np.concatenate(quads, axis=0)


def triangle_areas(tri_verts) -> jnp.ndarray:
    e1 = tri_verts[:, 1] - tri_verts[:, 0]
    e2 = tri_verts[:, 2] - tri_verts[:, 0]
    return 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)


def triangle_normals(tri_verts) -> jnp.ndarray:
    e1 = tri_verts[:, 1] - tri_verts[:, 0]
    e2 = tri_verts[:, 2] - tri_verts[:, 0]
    n = jnp.cross(e1, e2)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
