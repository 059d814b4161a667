"""Acceleration dispatch: dense brute force, Pallas clusters, or jnp BVH.

The scene carries at most one accelerator: `clusters` (the Pallas cull/test
kernel, ops/cluster.py — preferred) or `bvh` (the jnp implicit-tree
traversal, accel/bvh.py — reference implementation). Triangles route through
it; spheres are always tested densely (scenes have few analytic quadrics).
Mirrors the reference's Primitive aggregate dispatch (cpu/primitive.h)
without the polymorphism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..shapes.geometry import Interaction
from . import dense
from .bvh import bvh_intersect

_INF = jnp.inf


def _recompute_uv(geom, o, d, prim):
    """Barycentrics for known hit triangles (one gathered Moller-Trumbore)."""
    idx = jnp.clip(prim, 0, max(geom.num_triangles - 1, 0))
    tv = geom.tri_verts[idx]
    v0 = tv[:, 0]
    e1 = tv[:, 1] - tv[:, 0]
    e2 = tv[:, 2] - tv[:, 0]
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    valid = prim >= 0
    return jnp.where(valid, u, 0.0), jnp.where(valid, v, 0.0)


def _tri_best(scene, o, d, tmax, any_hit: bool):
    """Triangle-only best-hit tuple via whichever accelerator is attached."""
    interp = jax.default_backend() == "cpu"
    if scene.clusters is not None:
        from ..ops.cluster import cluster_intersect

        t, prim = cluster_intersect(
            scene.clusters, o, d, tmax, any_hit=any_hit, interpret=interp
        )
        if any_hit:
            return t, prim, None, None
        u, v = _recompute_uv(scene.geom, o, d, prim)
        return t, prim, u, v
    t, prim, u, v = bvh_intersect(scene.bvh, o, d, tmax, any_hit=any_hit)
    t = jnp.where(prim >= 0, t, _INF)
    return t, prim, u, v


def closest(scene, o, d, tmax=None) -> Interaction:
    geom = scene.geom
    if scene.bvh is None and getattr(scene, "clusters", None) is None:
        return dense.intersect_closest(geom, o, d, tmax)

    n_rays = o.shape[0]
    if tmax is None:
        tmax = jnp.full((n_rays,), _INF, o.dtype)
    t, prim, u, v = _tri_best(scene, o, d, tmax, any_hit=False)
    best = (t, prim, u, v)

    n_sph = geom.num_spheres
    if n_sph > 0:
        sblk, _ = dense._sph_soa(geom.sph)
        t_s = dense._intersect_sph_block(o, d, tmax, sblk)
        t_s = jnp.where(
            jnp.arange(t_s.shape[1])[None, :] < n_sph, t_s, _INF
        )
        zeros = jnp.zeros_like(t_s)
        best = dense._fold_min(
            best, t_s, zeros, zeros, jnp.int32(geom.num_triangles)
        )
    return dense.assemble_interaction(geom, o, d, best)


def any_hit(scene, o, d, tmax) -> jnp.ndarray:
    geom = scene.geom
    if scene.bvh is None and getattr(scene, "clusters", None) is None:
        return dense.intersect_any(geom, o, d, tmax)
    _, prim, _, _ = _tri_best(scene, o, d, tmax, any_hit=True)
    occ = prim >= 0
    if geom.num_spheres > 0:
        sblk, _ = dense._sph_soa(geom.sph)
        t_s = dense._intersect_sph_block(o, d, tmax, sblk)
        t_s = jnp.where(
            jnp.arange(t_s.shape[1])[None, :] < geom.num_spheres, t_s, _INF
        )
        occ = occ | jnp.any(jnp.isfinite(t_s), axis=1)
    return occ
