"""Pallas BVH traversal: shared-stack packet traversal over ray tiles.

Why this shape (SURVEY.md section 7 "hard parts" #1): TPU vector units have
no per-lane gather, so the classic per-ray stack traversal (one node index
per ray) cannot vectorize — an XLA gather-based port runs at ~0.005 Mrays/s.
Instead each TILE of rays shares ONE traversal: the node index is a scalar,
node AABBs and leaf triangles are loaded with scalar dynamic indexing from
VMEM (legal and fast), every box/triangle test is vectorized across the
tile's 128-lane rows, and the shared stack lives in SMEM. Descent is gated
on `any(ray hits node box)`.

Properties:
  * coherent tiles (camera/shadow rays) visit near the per-ray optimal node
    set; incoherent tiles degrade toward scanning more of the tree but every
    visited node still amortizes over the whole tile — never asymptotically
    worse than the dense tester, usually far better.
  * Ray sorting (direction octant + origin Morton) before traversal restores
    coherence for bounce rays; handled by the caller.

Reference analogue: BVHAggregate::Intersect's explicit-stack loop
(/root/reference/src/pbrt/cpu/aggregates.cpp:529-624) and the OptiX
hardware traversal it replaces on GPU (gpu/aggregate.*).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.bvh import BVH

_TILE = 1024  # rays per packet (8 sublanes x 128 lanes)
_ROWS = _TILE // 128


def _pack_nodes(bvh: BVH):
    """Node AABBs -> rows [lox loy loz hix hiy hiz 0 0], padded to 2x+2 rows
    of never-hit boxes so "children of a leaf" reads are safe."""
    lo = bvh.node_lo
    hi = bvh.node_hi
    n = lo.shape[0]
    out = jnp.concatenate([lo, hi, jnp.zeros((n, 2), lo.dtype)], axis=1)
    pad = jnp.tile(
        jnp.asarray([[jnp.inf] * 3 + [-jnp.inf] * 3 + [0.0, 0.0]], lo.dtype),
        (n + 2, 1),
    )
    return jnp.concatenate([out, pad], axis=0)


def _pack_tris(bvh: BVH):
    """Triangles -> (P, 16) rows [v0 e1 e2 prim_id_bits 0...]."""
    p = bvh.v0.shape[0]
    pid = jax.lax.bitcast_convert_type(bvh.prim_id, jnp.float32)[:, None]
    out = jnp.concatenate(
        [bvh.v0, bvh.e1, bvh.e2, pid, jnp.zeros((p, 6), jnp.float32)],
        axis=1,
    )
    return out


def _traverse_kernel(
    nodes_ref,  # (n_nodes, 8) VMEM
    tris_ref,  # (P, 16) VMEM
    ox_ref, oy_ref, oz_ref,  # (ROWS, 128) VMEM ray tiles
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    t_out, prim_out, u_out, v_out,
    stack_ref,  # SMEM (depth + 2,)
    *,
    depth: int,
    leaf_size: int,
    any_hit: bool,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    eps = 1e-12
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < eps, eps, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < eps, eps, dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < eps, eps, dz)

    first_leaf = (1 << depth) - 1

    def box_test(node, t_best):
        """Vectorized slab test of node's AABB against the whole tile."""
        lox = nodes_ref[node, 0]
        loy = nodes_ref[node, 1]
        loz = nodes_ref[node, 2]
        hix = nodes_ref[node, 3]
        hiy = nodes_ref[node, 4]
        hiz = nodes_ref[node, 5]
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
        tmaxb = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        return jnp.any((tmaxb >= tmin) & (tmin < t_best))

    # Stack holds nodes whose boxes are already known to be hit.
    stack_ref[0] = 0  # root (tested implicitly: assume hit)

    def body(state):
        sp, t_best, prim, uu, vv = state
        node = stack_ref[sp - 1]
        sp = sp - 1

        is_leaf = node >= first_leaf

        # --- leaf: test triangles (scalar-loaded, vectorized over rays).
        def leaf_fn(args):
            t_best, prim, uu, vv = args
            leaf = node - first_leaf
            for k in range(leaf_size):
                row = leaf * leaf_size + k
                v0x = tris_ref[row, 0]
                v0y = tris_ref[row, 1]
                v0z = tris_ref[row, 2]
                e1x = tris_ref[row, 3]
                e1y = tris_ref[row, 4]
                e1z = tris_ref[row, 5]
                e2x = tris_ref[row, 6]
                e2y = tris_ref[row, 7]
                e2z = tris_ref[row, 8]
                pid = tris_ref[row, 9]
                # p = d x e2
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
                tvx = ox - v0x
                tvy = oy - v0y
                tvz = oz - v0z
                uk = (tvx * px + tvy * py + tvz * pz) * inv_det
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                vk = (dx * qx + dy * qy + dz * qz) * inv_det
                tk = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                hit = (
                    (jnp.abs(det) > eps)
                    & (uk >= 0.0)
                    & (vk >= 0.0)
                    & (uk + vk <= 1.0)
                    & (tk > 0.0)
                    & (tk < t_best)
                )
                t_best = jnp.where(hit, tk, t_best)
                prim = jnp.where(hit, pid, prim)
                uu = jnp.where(hit, uk, uu)
                vv = jnp.where(hit, vk, vv)
            return t_best, prim, uu, vv

        t_best, prim, uu, vv = jax.lax.cond(
            is_leaf, leaf_fn, lambda a: a, (t_best, prim, uu, vv)
        )

        # --- internal: test both children (the node table is padded with
        # never-hit rows so leaf "children" read safely), push hit ones.
        c0 = 2 * node + 1
        c1 = 2 * node + 2
        hit1 = jnp.logical_not(is_leaf) & box_test(c1, t_best)
        hit0 = jnp.logical_not(is_leaf) & box_test(c0, t_best)

        @pl.when(hit1)
        def _():
            stack_ref[sp] = c1

        sp = jnp.where(hit1, sp + 1, sp)

        @pl.when(hit0)
        def _():
            stack_ref[sp] = c0

        sp = jnp.where(hit0, sp + 1, sp)
        if any_hit:
            # Stop the tile once every live lane has a confirmed hit.
            all_hit = jnp.all(prim >= 0.0)
            sp = jnp.where(all_hit, 0, sp)
        return sp, t_best, prim, uu, vv

    def cond(state):
        return state[0] > 0

    t0 = tmax_ref[:]
    init = (
        jnp.int32(1),
        t0,
        jnp.full_like(t0, -1.0),
        jnp.zeros_like(t0),
        jnp.zeros_like(t0),
    )
    _, t_best, prim, uu, vv = jax.lax.while_loop(cond, body, init)

    t_out[:] = t_best
    prim_out[:] = prim
    u_out[:] = uu
    v_out[:] = vv


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def pallas_bvh_intersect(bvh: BVH, o, d, tmax, any_hit: bool = False,
                         interpret: bool = False):
    """Packet traversal over ray tiles. Same contract as bvh.bvh_intersect:
    returns (t, prim_id, u, v), prim_id == -1 on miss."""
    n = o.shape[0]
    pad = (-n) % _TILE
    npad = n + pad

    def comp(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(
            npad // 128, 128
        )

    ox, oy, oz = comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2])
    dx, dy, dz = comp(d[:, 0], 1.0), comp(d[:, 1], 1.0), comp(d[:, 2], 1.0)
    tm = comp(tmax, -1.0)  # padded rays: tmax < 0 -> no hits

    nodes = _pack_nodes(bvh)
    tris = _pack_tris(bvh)

    grid = npad // _TILE
    ray_spec = pl.BlockSpec(
        (_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _traverse_kernel,
        depth=bvh.depth,
        leaf_size=bvh.leaf_size,
        any_hit=any_hit,
    )
    out_shape = [
        jax.ShapeDtypeStruct((npad // 128, 128), jnp.float32)
        for _ in range(4)
    ]
    t, prim_f, u, v = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[full, full] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((bvh.depth + 3,), jnp.int32)],
        interpret=interpret,
    )(nodes, tris, ox, oy, oz, dx, dy, dz, tm)

    t = t.reshape(npad)[:n]
    prim_f = prim_f.reshape(npad)[:n]
    u = u.reshape(npad)[:n]
    v = v.reshape(npad)[:n]
    # prim row carries bitcast prim_id when hit, -1.0 float when miss.
    miss = prim_f == -1.0
    prim = jnp.where(
        miss,
        jnp.int32(-1),
        jax.lax.bitcast_convert_type(prim_f, jnp.int32),
    )
    return t, prim, u, v
