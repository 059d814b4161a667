"""Pallas brute-force intersector for small scenes (<= ~1k triangles).

For scenes under the cluster-accel threshold the round-1 design used a pure
XLA lane-blocked tester (accel/dense.py), but XLA materializes the (N, 128)
intermediates through HBM — measured ~11 ms per closest-hit at 1M rays for a
36-triangle Cornell box, ~10x above the VPU flops bound. This kernel keeps a
ray tile resident in VMEM and walks the triangle table with SCALAR
broadcasts (one fori_loop row per triangle, all components read as scalars
with static column indices — the pattern this backend's Mosaic lowers
cleanly), so the whole Moller-Trumbore chain is register-resident: zero HBM
round trips per triangle.

Like ops/cluster.py, every hit attribute (u, v, geometric normal, material
and light ids) is selected IN the kernel via the running-best compare, so
closest-hit assembly needs no XLA gathers.

Reference analogue: the role of the flat no-BVH fallback aggregate
(cpu/aggregates.cpp exhaustive primitive loop), engineered for the VPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.pytree import pytree, static_field

_TILE = 8192  # rays per kernel invocation, laid out (8, _TILE // 8)
_BIG = 3e38


@pytree
class SmallTriAccel:
    # Packed rows, one per triangle: columns
    # 0:3 v0 | 3:6 e1 | 6:9 e2 | 9:12 unit geometric normal |
    # 12 pid+1 | 13 mat+1 | 14 light+1 | 15 pad. The table lives in SMEM:
    # scalar-memory reads broadcast to vector registers for free, whereas
    # VMEM scalar extraction measured ~15 us per read on this backend
    # (30 ms of pure overhead per 1M-ray query). Pad rows have e1=e2=0 so
    # the determinant test rejects them.
    table: jnp.ndarray  # (T, 16) float32
    n_tris: int = static_field(default=0)


def build_smallscene(tri_verts, tri_mat=None, tri_light=None) -> SmallTriAccel:
    tri_verts = np.asarray(tri_verts, np.float32)
    t = tri_verts.shape[0]
    if tri_mat is None:
        tri_mat = np.zeros((t,), np.int64)
    if tri_light is None:
        tri_light = np.full((t,), -1, np.int64)
    e1 = tri_verts[:, 1] - tri_verts[:, 0]
    e2 = tri_verts[:, 2] - tri_verts[:, 0]
    n = np.cross(e1, e2)
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(ln > 1e-30, n / np.maximum(ln, 1e-30), 0.0)
    tab = np.zeros((t, 16), np.float32)
    tab[:, 0:3] = tri_verts[:, 0]
    tab[:, 3:6] = e1
    tab[:, 6:9] = e2
    tab[:, 9:12] = n
    tab[:, 12] = np.arange(1, t + 1, dtype=np.float32)
    tab[:, 13] = np.asarray(tri_mat, np.float32) + 1.0
    tab[:, 14] = np.asarray(tri_light, np.float32) + 1.0
    return SmallTriAccel(table=jnp.asarray(tab), n_tris=t)


def _kernel(tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tmax_ref,
            t_out, prim_out, u_out, v_out, n0_out, n1_out, n2_out,
            mat_out, light_out, *, n_tris: int, any_hit: bool):
    eps = 1e-12
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]  # (8, _TILE // 8)
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmax = tmax_ref[:]
    zero = jnp.zeros_like(tmax)

    def body(c, carry):
        tb, pb, ub, vb, nxb, nyb, nzb, mb, lb = carry
        v0x = tri_ref[c, 0]
        v0y = tri_ref[c, 1]
        v0z = tri_ref[c, 2]
        e1x = tri_ref[c, 3]
        e1y = tri_ref[c, 4]
        e1z = tri_ref[c, 5]
        e2x = tri_ref[c, 6]
        e2y = tri_ref[c, 7]
        e2z = tri_ref[c, 8]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        u = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        tk = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = (
            (jnp.abs(det) > eps)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (tk > 0.0)
            & (tk < tb)
        )
        if any_hit:
            # Any hit ends the ray: collapse t so later triangles fail the
            # (tk < tb) gate, and flag the ray in prim.
            tb = jnp.where(hit, 0.0, tb)
            pb = jnp.where(hit, tri_ref[c, 12], pb)
            return (tb, pb, ub, vb, nxb, nyb, nzb, mb, lb)
        tb = jnp.where(hit, tk, tb)
        pb = jnp.where(hit, tri_ref[c, 12], pb)
        ub = jnp.where(hit, u, ub)
        vb = jnp.where(hit, v, vb)
        nxb = jnp.where(hit, tri_ref[c, 9], nxb)
        nyb = jnp.where(hit, tri_ref[c, 10], nyb)
        nzb = jnp.where(hit, tri_ref[c, 11], nzb)
        mb = jnp.where(hit, tri_ref[c, 13], mb)
        lb = jnp.where(hit, tri_ref[c, 14], lb)
        return (tb, pb, ub, vb, nxb, nyb, nzb, mb, lb)

    init = (tmax, zero, zero, zero, zero, zero, zero, zero, zero)
    if n_tris <= 128:
        # Static unroll: every triangle component becomes a hoistable
        # scalar constant read; no loop-carried serialization.
        out = init
        for c in range(n_tris):
            out = body(c, out)
    else:
        out = jax.lax.fori_loop(0, n_tris, body, init)
    t_out[:] = out[0]
    prim_out[:] = out[1]
    u_out[:] = out[2]
    v_out[:] = out[3]
    n0_out[:] = out[4]
    n1_out[:] = out[5]
    n2_out[:] = out[6]
    mat_out[:] = out[7]
    light_out[:] = out[8]


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _smallscene_intersect_impl(accel: SmallTriAccel, o, d, tmax,
                         any_hit: bool = False, interpret: bool = False):
    """Same contract as ops.cluster.cluster_intersect."""
    n = o.shape[0]
    pad = (-n) % _TILE
    npad = n + pad
    sub = npad // 8

    def comp(x, fill=0.0):
        # Contiguous (8, S) view — NO sublane interleave: ray order inside
        # the kernel is irrelevant, and this backend executes the
        # (N/8, 8) -> (8, N/8) transpose pathologically slowly (~2 ms per
        # 4 MB operand; 16 operands dwarfed the kernel itself).
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(8, npad // 8)

    ox, oy, oz = comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2])
    dx, dy, dz = comp(d[:, 0], 1.0), comp(d[:, 1], 1.0), comp(d[:, 2], 1.0)
    tm = comp(tmax, -1.0)

    grid = npad // _TILE
    ray_spec = pl.BlockSpec(
        (8, _TILE // 8), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _kernel, n_tris=accel.n_tris, any_hit=any_hit
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[full] + [ray_spec] * 7,
        out_specs=[ray_spec] * 9,
        out_shape=[
            jax.ShapeDtypeStruct((8, sub), jnp.float32) for _ in range(9)
        ],
        interpret=interpret,
    )(accel.table, ox, oy, oz, dx, dy, dz, tm)

    def uncomp(x):
        return x.reshape(npad)[:n]

    t, prim_f, u, v, n0, n1, n2, matf, lightf = (uncomp(x) for x in outs)
    miss = prim_f <= 0.0
    prim = jnp.where(miss, -1, prim_f.astype(jnp.int32) - 1)
    t = jnp.where(miss, jnp.inf, t)
    if any_hit:
        return {"t": t, "prim": prim}
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


# Geometry detached under reverse-mode AD (ops/detach.py).
from .detach import detached_query  # noqa: E402

smallscene_intersect = detached_query(_smallscene_intersect_impl)
