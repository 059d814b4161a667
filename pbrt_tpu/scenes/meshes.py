"""Procedural mesh generators + a mesh benchmark scene (toward BASELINE
config 2: triangle meshes with conductor/dielectric/coated BSDFs)."""

from __future__ import annotations

import numpy as np

from ..cameras.perspective import PerspectiveCamera
from ..core import transform
from ..lights.buffers import LightBuffers
from ..materials.buffers import (
    MAT_CONDUCTOR,
    MAT_DIELECTRIC,
    MAT_DIFFUSE,
    MaterialBuffers,
)
from ..scene import Scene
from ..shapes.geometry import GeometryBuffers, make_quad


def icosphere(subdiv: int = 3, radius: float = 1.0, center=(0, 0, 0)):
    """Subdivided icosahedron -> (T, 3, 3) triangle array (T = 20 * 4^subdiv)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    tris = verts[faces]  # (20, 3, 3)
    for _ in range(subdiv):
        a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
        ab = (a + b) / 2
        bc = (b + c) / 2
        ca = (c + a) / 2
        for m in (ab, bc, ca):
            m /= np.linalg.norm(m, axis=1, keepdims=True)
        tris = np.concatenate(
            [
                np.stack([a, ab, ca], 1),
                np.stack([ab, b, bc], 1),
                np.stack([ca, bc, c], 1),
                np.stack([ab, bc, ca], 1),
            ]
        )
    return (tris * radius + np.asarray(center)).astype(np.float32)


def torus(major=1.0, minor=0.35, nu=64, nv=32, center=(0, 0, 0)):
    """Triangulated torus -> (T, 3, 3)."""
    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    v = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    ug, vg = np.meshgrid(u, v, indexing="ij")

    def pt(ug, vg):
        x = (major + minor * np.cos(vg)) * np.cos(ug)
        z = (major + minor * np.cos(vg)) * np.sin(ug)
        y = minor * np.sin(vg)
        return np.stack([x, y, z], -1)

    p00 = pt(ug, vg)
    p10 = pt(np.roll(ug, -1, 0), np.roll(vg, -1, 0) * 0 + vg)
    p01 = pt(ug, np.roll(vg, -1, 1))
    p11 = pt(np.roll(ug, -1, 0), np.roll(vg, -1, 1))
    t1 = np.stack([p00, p10, p11], -2).reshape(-1, 3, 3)
    t2 = np.stack([p00, p11, p01], -2).reshape(-1, 3, 3)
    tris = np.concatenate([t1, t2]).astype(np.float32)
    return tris + np.asarray(center, np.float32)


def mesh_gallery_scene(resolution=(256, 256), subdiv=4):
    """Dense-mesh benchmark: icosphere (copper) + torus (glass) + diffuse
    icosphere on a floor under an area light. ~20k-80k triangles."""
    parts = []
    mats = []

    def add(tris, mat):
        parts.append(tris)
        mats.append(np.full(len(tris), mat, np.int32))

    add(icosphere(subdiv, radius=0.55, center=(-0.75, 0.55, 0.2)), 1)
    add(torus(0.5, 0.18, 96, 48, center=(0.75, 0.22, 0.0)), 2)
    add(icosphere(subdiv - 1, radius=0.45, center=(0.0, 0.45, 0.9)), 3)
    add(make_quad((-3, 0, -3), (3, 0, -3), (3, 0, 3), (-3, 0, 3)), 0)

    light_quad = make_quad(
        (-0.8, 2.5, -0.8), (0.8, 2.5, -0.8), (0.8, 2.5, 0.8), (-0.8, 2.5, 0.8)
    )
    tri_verts = np.concatenate(parts + [light_quad])
    tri_mat = np.concatenate(mats + [np.zeros(2, np.int32)])
    tri_light = np.full(len(tri_verts), -1, np.int32)
    tri_light[-2:] = [0, 1]

    materials = MaterialBuffers.build(
        [
            {"kind": MAT_DIFFUSE, "albedo": (0.5, 0.5, 0.5)},
            {"kind": MAT_CONDUCTOR, "conductor": "Cu", "roughness": 0.05},
            {"kind": MAT_DIELECTRIC, "eta": 1.5},
            {"kind": MAT_DIFFUSE, "albedo": (0.2, 0.35, 0.65)},
        ]
    )
    lights = LightBuffers.build(
        area_tris=[
            {"verts": light_quad[0], "rgb": (1, 0.95, 0.9), "scale": 12.0},
            {"verts": light_quad[1], "rgb": (1, 0.95, 0.9), "scale": 12.0},
        ],
        infinite={"rgb": (0.35, 0.45, 0.7), "scale": 0.3},
    )
    geom = GeometryBuffers.build(
        tri_verts=tri_verts, tri_mat=tri_mat, tri_light=tri_light
    )
    scene = Scene(geom=geom, materials=materials, lights=lights).with_accel()
    cam2world = transform.look_at(
        eye=(0.0, 1.3, -3.2), target=(0.0, 0.5, 0.0), up=(0.0, 1.0, 0.0)
    )
    camera = PerspectiveCamera(
        camera_to_world=cam2world, resolution=resolution, fov_deg=40.0
    )
    return scene, camera
