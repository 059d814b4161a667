"""Pallas hierarchical ray-scene intersection: super-cluster culling +
cluster culling + sub-group-gated dense leaves.

The TPU-native answer to BVH traversal (SURVEY.md section 7 hard-part #1),
replacing pointer chasing with vector-friendly culling tiers:

  1. SUPER-CULL: Morton-sorted triangles are grouped into clusters of 128
     and clusters into super-clusters of 32 (4096 triangles). A fori_loop
     walks supers; one (8, 128) slab test evaluates the whole 1024-ray tile
     against the super AABB and a lax.cond skips missed supers — for a
     100k-triangle scene a sorted beam tile touches a handful of the ~25
     supers, so the per-cluster work below only runs where geometry is.
  2. CULL: inside a hit super, a fori_loop walks its 32 clusters with the
     same (8, 128) per-ray slab gate + lax.cond. The per-ray mask feeds the
     next tier instead of being thrown away.
  3. TEST: a hit cluster is tested densely, but gated per SUB-GROUP BLOCK:
     the per-ray box mask reduces to a (1, 128) per-sub-group mask, and the
     128 sub-groups are processed in 16 blocks of 8 (64 rays); a block whose
     rays all miss the cluster box (or already hold a closer hit) skips its
     Moller-Trumbore work behind one scalar lax.cond. Within a live block,
     (8 rays x 128 triangles) tests run per sub-group, triangle components
     loaded as contiguous (1, 128) rows. Closest-hit selection avoids
     per-lane gathers with a min-reduce plus an equality-masked reduce over
     float-encoded primitive ids — the same masked reduce selects the hit's
     u, v, geometric normal, material and light ids IN the kernel, so
     closest-hit assembly needs zero XLA gathers (this backend lowers
     gathers per-element, ~3 ms / 64k rows).

Shadow (any-hit) rays run a cut-down mode: no attribute selection, and a
ray's t_best collapses to 0 on its first hit so every later super/cluster
fails the (tmin < t_best) gate for that ray — early-out without divergence.

No gathers, no per-ray stacks; worst case degrades to the dense tester,
best case skips everything outside the tile's beam. Ray tiles are 1024
sorted rays (sublane-major (8, 128) layout; see accel.api.ray_sort_perm).

Reference analogue: the role of BVHAggregate/OptiX GAS traversal
(/root/reference/src/pbrt/cpu/aggregates.cpp:529, gpu/aggregate.cpp).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.pytree import pytree, static_field

_CLUSTER = 128  # triangles per cluster (lane width)
_SUPER = 32  # clusters per super-cluster (4096 triangles)
_TILE = 1024  # rays per kernel tile
_SUB = _TILE // 8  # ray sub-groups of 8 (sublane width)
_BLK = 8  # sub-groups per dense-test cond block (64 rays)
_BIG = 3e38


@pytree
class ClusterAccel:
    # Triangle components, cluster-major: (C, 128) each.
    v0x: jnp.ndarray
    v0y: jnp.ndarray
    v0z: jnp.ndarray
    e1x: jnp.ndarray
    e1y: jnp.ndarray
    e1z: jnp.ndarray
    e2x: jnp.ndarray
    e2y: jnp.ndarray
    e2z: jnp.ndarray
    pid: jnp.ndarray  # (C, 128) float32 prim id + 1 (0.0 = pad slot)
    # Per-triangle hit attributes, cluster-major (C, 128): unit geometric
    # normal components and float-encoded material / light ids (id + 1).
    nx: jnp.ndarray
    ny: jnp.ndarray
    nz: jnp.ndarray
    matf: jnp.ndarray
    lightf: jnp.ndarray
    # Cluster AABB rows: (C, 8) = [lox loy loz hix hiy hiz 0 0].
    boxes: jnp.ndarray
    # Super-cluster AABB rows: (S, 8); pad supers hold a far degenerate
    # point box so they mostly fail the gate (their cluster range is empty
    # anyway — the inner loop bound clamps to n_clusters).
    sboxes: jnp.ndarray
    n_clusters: int = static_field(default=0)
    n_supers: int = static_field(default=0)


def build_clusters(
    tri_verts: np.ndarray,
    tri_mat: np.ndarray | None = None,
    tri_light: np.ndarray | None = None,
) -> ClusterAccel:
    """Morton-sort triangles; pack 128-triangle clusters + AABBs + attrs,
    then 32-cluster super-AABBs."""
    from ..accel.bvh import morton_order

    tri_verts = np.asarray(tri_verts, np.float32)
    t = tri_verts.shape[0]
    if tri_mat is None:
        tri_mat = np.zeros((t,), np.int32)
    if tri_light is None:
        tri_light = np.full((t,), -1, np.int32)
    cent = tri_verts.mean(axis=1)
    order = morton_order(cent)
    v = tri_verts[order]

    c = -(-t // _CLUSTER)
    p = c * _CLUSTER
    vp = np.full((p, 3, 3), 1e30, np.float32)
    vp[:t] = v
    pid = np.full((p,), -1, np.int64)
    pid[:t] = order
    vp = vp.reshape(c, _CLUSTER, 3, 3)
    real = (pid.reshape(c, _CLUSTER) >= 0)[..., None, None]
    cl_lo = np.where(real, vp, np.inf).min(axis=(1, 2)).astype(np.float32)
    cl_hi = np.where(real, vp, -np.inf).max(axis=(1, 2)).astype(np.float32)

    boxes = np.concatenate(
        [cl_lo, cl_hi, np.zeros((c, 2), np.float32)], axis=1
    )

    # Super-cluster AABBs over runs of 32 Morton-adjacent clusters.
    s = -(-c // _SUPER)
    sp = s * _SUPER
    slo = np.full((sp, 3), np.inf, np.float32)
    shi = np.full((sp, 3), -np.inf, np.float32)
    slo[:c] = cl_lo
    shi[:c] = cl_hi
    slo = slo.reshape(s, _SUPER, 3).min(axis=1)
    shi = shi.reshape(s, _SUPER, 3).max(axis=1)
    pad_s = ~np.isfinite(slo[:, 0])
    slo[pad_s] = 2e30
    shi[pad_s] = 2e30
    sboxes = np.concatenate([slo, shi, np.zeros((s, 2), np.float32)], axis=1)

    e1 = vp[:, :, 1] - vp[:, :, 0]
    e2 = vp[:, :, 2] - vp[:, :, 0]
    # Geometric normals (winding orientation), zero on pad slots.
    nrm = np.cross(e1.reshape(p, 3), e2.reshape(p, 3))
    nlen = np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = np.where(nlen > 1e-30, nrm / np.maximum(nlen, 1e-30), 0.0)
    nrm = np.where((pid >= 0)[:, None], nrm, 0.0).astype(np.float32)
    nrm = nrm.reshape(c, _CLUSTER, 3)
    # Float id encoding: id+1 (exact for < 2^24 triangles); 0.0 = pad.
    # (A bitcast encoding would hit denormal flush-to-zero on TPU.)
    pid_f = (pid + 1).astype(np.float32).reshape(c, _CLUSTER)
    matp = np.zeros((p,), np.int64)
    matp[:t] = np.asarray(tri_mat, np.int64)[order]
    lightp = np.full((p,), -1, np.int64)
    lightp[:t] = np.asarray(tri_light, np.int64)[order]
    return ClusterAccel(
        v0x=jnp.asarray(vp[:, :, 0, 0]),
        v0y=jnp.asarray(vp[:, :, 0, 1]),
        v0z=jnp.asarray(vp[:, :, 0, 2]),
        e1x=jnp.asarray(e1[..., 0]),
        e1y=jnp.asarray(e1[..., 1]),
        e1z=jnp.asarray(e1[..., 2]),
        e2x=jnp.asarray(e2[..., 0]),
        e2y=jnp.asarray(e2[..., 1]),
        e2z=jnp.asarray(e2[..., 2]),
        pid=jnp.asarray(pid_f.copy()),
        nx=jnp.asarray(nrm[..., 0]),
        ny=jnp.asarray(nrm[..., 1]),
        nz=jnp.asarray(nrm[..., 2]),
        matf=jnp.asarray((matp + 1).astype(np.float32).reshape(c, _CLUSTER)),
        lightf=jnp.asarray((lightp + 1).astype(np.float32).reshape(c, _CLUSTER)),
        boxes=jnp.asarray(boxes),
        sboxes=jnp.asarray(sboxes),
        n_clusters=c,
        n_supers=s,
    )


def _cluster_kernel(
    sboxes_ref,  # (S, 8) super AABB rows
    boxes_ref,  # (C, 8) cluster AABB rows
    v0x_ref, v0y_ref, v0z_ref,
    e1x_ref, e1y_ref, e1z_ref,
    e2x_ref, e2y_ref, e2z_ref, pid_ref,
    nx_ref, ny_ref, nz_ref, matf_ref, lightf_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    *out_refs,
    n_clusters: int,
    n_supers: int,
    any_hit: bool,
    defer_attrs: bool = False,
):
    eps = 1e-12
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]  # (8, 128)
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < eps, eps, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < eps, eps, dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < eps, eps, dz)
    tmax = tmax_ref[:]

    # defer_attrs: traversal carries only (t, prim); u/v/n/mat/light are
    # resolved OUTSIDE the kernel in one batched gather + MT re-evaluation
    # (accel/api.py). Measured: the in-kernel 7-attribute select chain was
    # ~45% of traversal time (scripts/micro_entry.py), while a native XLA
    # gather at (122k rows, 1M indices) costs ~8 ms — deferral wins on any
    # bench scene.
    n_attr = 0 if (any_hit or defer_attrs) else 7
    n_blocks = _SUB // _BLK

    def slab(lox, loy, loz, hix, hiy, hiz, t_best):
        """Per-ray AABB overlap mask (8, 128), including the closer-hit
        prune (tmin < t_best)."""
        tx0 = (lox - ox) * inv_dx
        tx1 = (hix - ox) * inv_dx
        ty0 = (loy - oy) * inv_dy
        ty1 = (hiy - oy) * inv_dy
        tz0 = (loz - oz) * inv_dz
        tz1 = (hiz - oz) * inv_dz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), 0.0),
        )
        tmx = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        return (tmx >= tmin) & (tmin < t_best)

    # ---- Dense cluster test, gated per 64-ray block.
    def cluster_body(c, carry):
        t_best, prim, attrs = carry
        rayhit = slab(
            boxes_ref[c, 0], boxes_ref[c, 1], boxes_ref[c, 2],
            boxes_ref[c, 3], boxes_ref[c, 4], boxes_ref[c, 5], t_best,
        )
        bm = jnp.max(rayhit.astype(jnp.float32), axis=0, keepdims=True)
        m = jnp.max(bm) > 0.0

        def test(args):
            t_best, prim, attrs = args
            v0x = v0x_ref[pl.ds(c, 1), :]  # (1, 128)
            v0y = v0y_ref[pl.ds(c, 1), :]
            v0z = v0z_ref[pl.ds(c, 1), :]
            e1x = e1x_ref[pl.ds(c, 1), :]
            e1y = e1y_ref[pl.ds(c, 1), :]
            e1z = e1z_ref[pl.ds(c, 1), :]
            e2x = e2x_ref[pl.ds(c, 1), :]
            e2y = e2y_ref[pl.ds(c, 1), :]
            e2z = e2z_ref[pl.ds(c, 1), :]
            pid = pid_ref[pl.ds(c, 1), :]
            if n_attr:
                attr_rows = [
                    None, None,  # u, v computed per sub-group
                    nx_ref[pl.ds(c, 1), :],
                    ny_ref[pl.ds(c, 1), :],
                    nz_ref[pl.ds(c, 1), :],
                    matf_ref[pl.ds(c, 1), :],
                    lightf_ref[pl.ds(c, 1), :],
                ]

            def sub_group(rg, t_best, prim, attrs):
                """One (8 rays x 128 triangles) MT column -> (8, 1) cols."""
                oxg = ox[:, rg : rg + 1]
                oyg = oy[:, rg : rg + 1]
                ozg = oz[:, rg : rg + 1]
                dxg = dx[:, rg : rg + 1]
                dyg = dy[:, rg : rg + 1]
                dzg = dz[:, rg : rg + 1]
                px = dyg * e2z - dzg * e2y
                py = dzg * e2x - dxg * e2z
                pz = dxg * e2y - dyg * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
                tvx = oxg - v0x
                tvy = oyg - v0y
                tvz = ozg - v0z
                uk = (tvx * px + tvy * py + tvz * pz) * inv_det
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                vk = (dxg * qx + dyg * qy + dzg * qz) * inv_det
                tk = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                tb = t_best[:, rg : rg + 1]
                hit = (
                    (jnp.abs(det) > eps)
                    & (uk >= 0.0)
                    & (vk >= 0.0)
                    & (uk + vk <= 1.0)
                    & (tk > 0.0)
                    & (tk < tb)
                )
                if any_hit:
                    # First hit wins: collapse t to 0 so later tiers fail
                    # the (tmin < t_best) gate for this ray.
                    got = jnp.any(hit, axis=1, keepdims=True)  # (8, 1)
                    t_col = jnp.where(got, 0.0, tb)
                    p_col = jnp.where(
                        got,
                        jnp.max(jnp.where(hit, pid, 0.0), axis=1,
                                keepdims=True),
                        prim[:, rg : rg + 1],
                    )
                    return t_col, p_col, None
                tkh = jnp.where(hit, tk, _BIG)
                tmin_new = jnp.min(tkh, axis=1, keepdims=True)  # (8,1)
                better = tmin_new < tb
                eq = hit & (tkh == tmin_new)
                pid_sel = jnp.max(
                    jnp.where(eq, pid, 0.0), axis=1, keepdims=True
                )
                # Resolve exact-t ties to ONE triangle so every attribute
                # comes from the same primitive.
                eq1 = eq & (pid == pid_sel)
                t_col = jnp.where(better, tmin_new, tb)
                p_col = jnp.where(better, pid_sel, prim[:, rg : rg + 1])
                a_cols = []
                for ai in range(n_attr):
                    row = (uk, vk)[ai] if ai < 2 else attr_rows[ai]
                    sel = jnp.sum(
                        jnp.where(eq1, row, 0.0), axis=1, keepdims=True
                    )
                    a_cols.append(
                        jnp.where(better, sel, attrs[ai][:, rg : rg + 1])
                    )
                return t_col, p_col, a_cols

            t_blocks, p_blocks = [], []
            a_blocks = [[] for _ in range(n_attr)]
            for b in range(n_blocks):
                lo, hi = b * _BLK, (b + 1) * _BLK
                pred = jnp.max(bm[:, lo:hi]) > 0.0

                def hit_fn(_, lo=lo, hi=hi):
                    tc, pc = [], []
                    ac = [[] for _ in range(n_attr)]
                    for rg in range(lo, hi):
                        t_col, p_col, a_cols = sub_group(
                            rg, t_best, prim, attrs
                        )
                        tc.append(t_col)
                        pc.append(p_col)
                        for ai in range(n_attr):
                            ac[ai].append(a_cols[ai])
                    if n_attr == 0:
                        return (
                            jnp.concatenate(tc, axis=1),
                            jnp.concatenate(pc, axis=1),
                            (),
                        )
                    return (
                        jnp.concatenate(tc, axis=1),
                        jnp.concatenate(pc, axis=1),
                        tuple(
                            jnp.concatenate(ac[ai], axis=1)
                            for ai in range(n_attr)
                        ),
                    )

                def miss_fn(_, lo=lo, hi=hi):
                    if n_attr == 0:
                        return t_best[:, lo:hi], prim[:, lo:hi], ()
                    return (
                        t_best[:, lo:hi],
                        prim[:, lo:hi],
                        tuple(attrs[ai][:, lo:hi] for ai in range(n_attr)),
                    )

                tb8, pb8, ab8 = jax.lax.cond(pred, hit_fn, miss_fn, None)
                t_blocks.append(tb8)
                p_blocks.append(pb8)
                for ai in range(n_attr):
                    a_blocks[ai].append(ab8[ai])
            new_attrs = tuple(
                jnp.concatenate(a_blocks[ai], axis=1)
                for ai in range(n_attr)
            )
            return (
                jnp.concatenate(t_blocks, axis=1),
                jnp.concatenate(p_blocks, axis=1),
                new_attrs,
            )

        return jax.lax.cond(m, test, lambda a: a, (t_best, prim, attrs))

    # ---- Super-cluster walk: one slab test gates 4096 triangles.
    def super_body(s, carry):
        t_best = carry[0]
        sh = slab(
            sboxes_ref[s, 0], sboxes_ref[s, 1], sboxes_ref[s, 2],
            sboxes_ref[s, 3], sboxes_ref[s, 4], sboxes_ref[s, 5], t_best,
        )
        m = jnp.any(sh)

        def walk(args):
            lo = s * _SUPER
            hi = jnp.minimum(lo + _SUPER, n_clusters)
            return jax.lax.fori_loop(lo, hi, cluster_body, args)

        return jax.lax.cond(m, walk, lambda a: a, carry)

    t_best = tmax
    prim = jnp.zeros_like(tmax)
    attrs = tuple(jnp.zeros_like(tmax) for _ in range(n_attr))
    t_best, prim, attrs = jax.lax.fori_loop(
        0, n_supers, super_body, (t_best, prim, attrs)
    )
    for ref, val in zip(out_refs, (t_best, prim) + attrs):
        ref[:] = val


@functools.partial(
    jax.jit, static_argnames=("any_hit", "interpret", "defer_attrs")
)
def _cluster_intersect_impl(accel: ClusterAccel, o, d, tmax,
                            any_hit: bool = False, interpret: bool = False,
                            defer_attrs: bool = True):
    """Full hit query.

    Returns a dict with per-ray 't', 'prim' (int32, -1 = miss) and, for
    closest-hit mode with defer_attrs=False, 'u', 'v', 'n' (N, 3 geometric
    normal), 'mat', 'light' (int32 ids, light -1 = none) selected inside
    the kernel. With defer_attrs=True (default) only 't'/'prim' return and
    the caller resolves attributes in one batched pass
    (accel/api.py resolve_tri_attrs — measured faster than the in-kernel
    select chain on every scene).
    For any_hit mode only 't'/'prim' are meaningful (prim >= 0 = occluded).
    """
    n = o.shape[0]
    pad = (-n) % _TILE
    npad = n + pad

    def comp(x, fill=0.0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        # ray j -> (j % 8, j // 8) sublane-major layout
        return x.reshape(npad // 8, 8).T.reshape(8, npad // 8)

    ox, oy, oz = comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2])
    dx, dy, dz = comp(d[:, 0], 1.0), comp(d[:, 1], 1.0), comp(d[:, 2], 1.0)
    tm = comp(tmax, -1.0)

    grid = npad // _TILE
    ray_spec = pl.BlockSpec(
        (8, _SUB), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    lean = any_hit or defer_attrs
    n_out = 2 if lean else 9
    kernel = functools.partial(
        _cluster_kernel,
        n_clusters=accel.n_clusters,
        n_supers=accel.n_supers,
        any_hit=any_hit,
        defer_attrs=defer_attrs,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[full] * 17 + [ray_spec] * 7,
        out_specs=[ray_spec] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((8, npad // 8), jnp.float32)
            for _ in range(n_out)
        ],
        interpret=interpret,
    )(
        accel.sboxes, accel.boxes,
        accel.v0x, accel.v0y, accel.v0z,
        accel.e1x, accel.e1y, accel.e1z,
        accel.e2x, accel.e2y, accel.e2z, accel.pid,
        accel.nx, accel.ny, accel.nz, accel.matf, accel.lightf,
        ox, oy, oz, dx, dy, dz, tm,
    )

    def uncomp(x):
        return x.reshape(8, npad // 8).T.reshape(npad)[:n]

    if lean:
        t, prim_f = (uncomp(x) for x in outs)
        miss = prim_f <= 0.0
        prim = jnp.where(miss, -1, prim_f.astype(jnp.int32) - 1)
        t = jnp.where(miss, jnp.inf, t)
        return {"t": t, "prim": prim}
    t, prim_f, u, v, n0, n1, n2, matf, lightf = (uncomp(x) for x in outs)
    miss = prim_f <= 0.0
    prim = jnp.where(miss, -1, prim_f.astype(jnp.int32) - 1)
    t = jnp.where(miss, jnp.inf, t)
    z = jnp.zeros_like(u)
    return {
        "t": t,
        "prim": prim,
        "u": jnp.where(miss, z, u),
        "v": jnp.where(miss, z, v),
        "n": jnp.stack([n0, n1, n2], axis=-1),
        "mat": jnp.where(miss, 0, matf.astype(jnp.int32) - 1),
        "light": jnp.where(miss, -1, lightf.astype(jnp.int32) - 1),
    }


# Geometry is detached under reverse-mode AD (see ops/detach.py): gradients
# flow through shading at fixed hit points; the Pallas kernel itself has no
# autodiff rule.
from .detach import detached_query  # noqa: E402

cluster_intersect = detached_query(_cluster_intersect_impl)
