"""Split-path ray-scene intersection: dense full-tile + sparse bit-scan.

The TPU-native replacement for BVH traversal on big meshes. Measured
costs on this target (scripts/micro_dyn.py) shape the design:

  - a taken `lax.cond` costs ~150 ns — more than an (8 rays x 128 tris)
    Moller-Trumbore block — so the hot loops contain NO conds at all;
  - `fori_loop` iteration overhead is ~30 ns, dynamic-sublane loads are
    ~1-2 ns marginal, but small lane<->sublane relayouts cost ~70-100 ns —
    so per-entry work uses 3D scratch blocks whose slices are already in
    the right orientation, never reshaped across lanes;
  - per-ray culling matters: on a 122k-tri scene a sorted 1024-ray tile's
    beam covers ~600/956 clusters while one ray covers ~10, so bounce rays
    need per-8-ray-subgroup granularity, while coherent camera tiles want
    whole-tile processing of their few live clusters.

Per 1024-ray tile the kernel runs four cond-free phases:

  1. PREPASS: walk clusters (4-wide unrolled fori, one lax.cond per
     32-cluster super gate only) computing the per-subgroup liveness row
     of each cluster into an M matrix scratch (cluster-major rows,
     subgroups on lanes).
  2. PACK + SPLIT: per 128-cluster chunk, one matmul packs M rows into
     16-bit words (8 per cluster, exact in f32) for the sparse path, one
     matmul counts live subgroups, and prefix-sum + one-hot-scatter
     matmuls compact the live cluster ids — split by count into a DENSE
     list (>= _DENSE_THR live subgroups) and a SPARSE list — into SMEM.
  3. DENSE path: fori over the dense list; each cluster is tested against
     the whole tile with a statically unrolled 128-subgroup MT sweep on
     (8, 128) carries (maximum ILP, ~35 vector ops per 1024 ray-triangle
     tests; cheaper than per-subgroup dispatch once >=~24 subgroups live).
  4. SPARSE path: fori over the sparse list; a scalar bit-scan of the
     cluster's liveness words (ctz via float log2) drives exactly the live
     (cluster, subgroup) entries; each entry reads its 8 rays as an (8, 8)
     block of the rayT3 scratch and its hit state as an (8, 16) block of
     accT3 (subgroup on the dynamically-indexable leading dim), runs one
     (8 x 128) MT, and writes the state block back.

The dense path finishes before the sparse path starts, and both prune on
the evolving per-ray t_best, so closest-hit work collapses as hits land.

Reference analogue: the role of BVHAggregate / OptiX GAS traversal
(/root/reference/src/pbrt/cpu/aggregates.cpp:529, gpu/aggregate.cpp) plus
the wavefront ray-queue partitioning (wavefront/workqueue.h).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cluster import ClusterAccel, build_clusters  # noqa: F401 (re-export)

# Perf bisection: comma-set of phases to run ("pre1,pre2,dense,sparse");
# default all. Used by scripts/bench_cluster.py only.
import os as _os

_PHASES = frozenset(
    _os.environ.get("PBRT_PAIRS_PHASES", "pre1,pre2,dense,sparse").split(",")
)

_CLUSTER = 128
_SUPER = 32
_TILE = 1024
_SUB = _TILE // 8  # 128 subgroups of 8 rays
_BIG = 3e38
_DENSE_THR = 24  # live subgroups above which full-tile beats bit-scan
_NATTR = 7  # u, v, nx, ny, nz, mat, light


def _pairs_kernel(
    sboxes_ref, boxes_ref,
    v0x_ref, v0y_ref, v0z_ref,
    e1x_ref, e1y_ref, e1z_ref,
    e2x_ref, e2y_ref, e2z_ref, pid_ref,
    nx_ref, ny_ref, nz_ref, matf_ref, lightf_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    t_out, prim_out, u_out, v_out, n0_out, n1_out, n2_out, mat_out, light_out,
    m_scr, w_scr, rayT3, accT3, colbuf,
    sm_dense, sm_sparse,
    *,
    n_clusters: int,
    n_supers: int,
    c_pad: int,
    any_hit: bool,
):
    eps = 1e-12
    f32 = jnp.float32
    i32 = jnp.int32
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]  # (8, 128)
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < eps, eps, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < eps, eps, dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < eps, eps, dz)
    tmax = tmax_ref[:]
    n_chunks = c_pad // _CLUSTER

    # Transposed ray blocks: rayT3[g, k, c] = component c of ray k of
    # subgroup g — one (8, 8) dynamic-sublane block read per entry, no
    # lane<->sublane relayouts on the hot path.
    for ci, comp in enumerate((ox, oy, oz, dx, dy, dz)):
        rayT3[:, :, ci : ci + 1] = jnp.transpose(comp).reshape(_SUB, 8, 1)

    def slab(lox, loy, loz, hix, hiy, hiz):
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
        return (tmx >= tmin) & (tmin < tmax)

    # ---- Phase 1: per-subgroup liveness matrix M (cluster rows,
    # subgroups on lanes). Zero first: dead supers leave stale rows.
    zero_row = jnp.zeros((_CLUSTER, _SUB), f32)
    for ch in range(n_chunks):
        m_scr[ch * _CLUSTER : (ch + 1) * _CLUSTER, :] = zero_row

    def cluster4_pre(i, _):
        for k in range(4):
            c = i * 4 + k
            rayhit = slab(
                boxes_ref[c, 0], boxes_ref[c, 1], boxes_ref[c, 2],
                boxes_ref[c, 3], boxes_ref[c, 4], boxes_ref[c, 5],
            )
            live = jnp.max(rayhit.astype(f32), axis=0, keepdims=True)
            m_scr[pl.ds(c, 1), :] = live
        return 0

    def super_pre(s, _):
        sh = slab(
            sboxes_ref[s, 0], sboxes_ref[s, 1], sboxes_ref[s, 2],
            sboxes_ref[s, 3], sboxes_ref[s, 4], sboxes_ref[s, 5],
        )

        def walk(x):
            lo = s * (_SUPER // 4)
            return jax.lax.fori_loop(lo, lo + _SUPER // 4, cluster4_pre, x)

        return jax.lax.cond(jnp.any(sh), walk, lambda x: x, 0)

    if "pre1" in _PHASES:
        jax.lax.fori_loop(0, n_supers, super_pre, 0)

    # ---- Phase 2: pack 16-bit liveness words + split live clusters into
    # dense / sparse SMEM lists. All per-chunk matmuls, no conds.
    gi = jax.lax.broadcasted_iota(i32, (_SUB, 8), 0)
    wi = jax.lax.broadcasted_iota(i32, (_SUB, 8), 1)
    in_word = (gi >= wi * 16) & (gi < (wi + 1) * 16)
    # Exact powers of two via integer shifts (exp2 lowers to exp(x ln 2)
    # and is NOT exact, which silently corrupts the packed words).
    pow2 = jnp.where(
        in_word, jnp.left_shift(jnp.int32(1), gi % 16).astype(f32), 0.0
    )  # (128, 8)
    ones_col = jnp.ones((_SUB, 1), f32)
    ri = jax.lax.broadcasted_iota(i32, (_CLUSTER, _CLUSTER), 0).astype(f32)
    ci_ = jax.lax.broadcasted_iota(i32, (_CLUSTER, _CLUSTER), 1).astype(f32)
    tri = (ci_ <= ri).astype(f32)  # cum[i] = sum_{j<=i} mask[j]
    iota_col = jax.lax.broadcasted_iota(
        i32, (_CLUSTER, 1), 0).astype(f32)

    def compact(mask_col, base, sm, ptr):
        """Append chunk-local live ids (+base) of mask_col to SMEM list."""
        count = jnp.sum(mask_col).astype(i32)
        # positions: live-first stable order
        cum = jnp.dot(tri, mask_col, preferred_element_type=f32)  # incl.
        pos = jnp.where(
            mask_col > 0, cum - 1.0,
            count.astype(f32) + iota_col - cum,
        )  # (128,1)
        pos_row = jnp.transpose(pos)  # (1,128)
        m2 = (pos_row == ri).astype(f32)  # M2[i,j] = (pos[j] == i)
        sorted_col = jnp.dot(m2, iota_col, preferred_element_type=f32)
        colbuf[:, 0:1] = sorted_col

        def copy(k, _):
            sm[ptr + k] = colbuf[k, 0].astype(i32) + base
            return 0

        jax.lax.fori_loop(0, count, copy, 0)
        return ptr + count

    nd = jnp.int32(0)
    ns = jnp.int32(0)
    for ch in range(n_chunks if "pre2" in _PHASES else 0):
        mc = m_scr[ch * _CLUSTER : (ch + 1) * _CLUSTER, :]  # (128c, 128g)
        words = jnp.dot(mc, pow2, preferred_element_type=f32)  # (128, 8)
        w_scr[ch * _CLUSTER : (ch + 1) * _CLUSTER, :] = words
        cnt = jnp.dot(mc, ones_col, preferred_element_type=f32)  # (128,1)
        dense = (cnt >= float(_DENSE_THR)).astype(f32)
        sparse = ((cnt > 0) & (cnt < float(_DENSE_THR))).astype(f32)
        nd = compact(dense, ch * _CLUSTER, sm_dense, nd)
        ns = compact(sparse, ch * _CLUSTER, sm_sparse, ns)

    # ---- Phase 3: dense clusters, whole-tile statically unrolled MT.
    def rows_of(c):
        r = [
            v0x_ref[pl.ds(c, 1), :], v0y_ref[pl.ds(c, 1), :],
            v0z_ref[pl.ds(c, 1), :],
            e1x_ref[pl.ds(c, 1), :], e1y_ref[pl.ds(c, 1), :],
            e1z_ref[pl.ds(c, 1), :],
            e2x_ref[pl.ds(c, 1), :], e2y_ref[pl.ds(c, 1), :],
            e2z_ref[pl.ds(c, 1), :], pid_ref[pl.ds(c, 1), :],
        ]
        if not any_hit:
            r += [
                nx_ref[pl.ds(c, 1), :], ny_ref[pl.ds(c, 1), :],
                nz_ref[pl.ds(c, 1), :], matf_ref[pl.ds(c, 1), :],
                lightf_ref[pl.ds(c, 1), :],
            ]
        return r

    def mt_cols(rows, oxg, oyg, ozg, dxg, dyg, dzg, tb, pb, attr_cols):
        """One (8 rays x 128 tris) MT; returns updated (8,1) columns."""
        (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, pid) = rows[:10]
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
        hit = (
            (jnp.abs(det) > eps)
            & (uk >= 0.0)
            & (vk >= 0.0)
            & (uk + vk <= 1.0)
            & (tk > 0.0)
            & (tk < tb)
        )
        if any_hit:
            got = jnp.any(hit, axis=1, keepdims=True)
            t_col = jnp.where(got, 0.0, tb)
            p_col = jnp.where(
                got,
                jnp.max(jnp.where(hit, pid, 0.0), axis=1, keepdims=True),
                pb,
            )
            return t_col, p_col, ()
        tkh = jnp.where(hit, tk, _BIG)
        tmin_new = jnp.min(tkh, axis=1, keepdims=True)
        better = tmin_new < tb
        eq = hit & (tkh == tmin_new)
        pid_sel = jnp.max(jnp.where(eq, pid, 0.0), axis=1, keepdims=True)
        # Exact-t ties resolve to ONE triangle (max pid) so every
        # attribute comes from the same primitive.
        eq1 = eq & (pid == pid_sel)
        t_col = jnp.where(better, tmin_new, tb)
        p_col = jnp.where(better, pid_sel, pb)
        new_attrs = []
        for ai in range(_NATTR):
            row = (uk, vk)[ai] if ai < 2 else rows[8 + ai]
            sel = jnp.sum(jnp.where(eq1, row, 0.0), axis=1, keepdims=True)
            new_attrs.append(jnp.where(better, sel, attr_cols[ai]))
        return t_col, p_col, tuple(new_attrs)

    n_state = 2 if any_hit else 2 + _NATTR

    def dense_body(i, carry):
        t_best, prim, attrs = carry
        c = sm_dense[i]
        rows = rows_of(c)
        t_cols, p_cols = [], []
        a_cols = [[] for _ in range(_NATTR)]
        for rg in range(_SUB):
            acols = tuple(a[:, rg : rg + 1] for a in attrs)
            t_c, p_c, a_c = mt_cols(
                rows,
                ox[:, rg : rg + 1], oy[:, rg : rg + 1], oz[:, rg : rg + 1],
                dx[:, rg : rg + 1], dy[:, rg : rg + 1], dz[:, rg : rg + 1],
                t_best[:, rg : rg + 1], prim[:, rg : rg + 1], acols,
            )
            t_cols.append(t_c)
            p_cols.append(p_c)
            for ai in range(len(a_c)):
                a_cols[ai].append(a_c[ai])
        new_attrs = tuple(
            jnp.concatenate(a_cols[ai], axis=1) for ai in range(len(attrs))
        )
        return (
            jnp.concatenate(t_cols, axis=1),
            jnp.concatenate(p_cols, axis=1),
            new_attrs,
        )

    t_best = tmax
    prim = jnp.zeros_like(tmax)
    attrs = tuple(
        jnp.zeros_like(tmax) for _ in range(0 if any_hit else _NATTR)
    )
    if "dense" in _PHASES:
        t_best, prim, attrs = jax.lax.fori_loop(
            0, nd, dense_body, (t_best, prim, attrs)
        )

    # Persist dense-path state into the accT3 blocks the sparse path
    # (and the final writeback) operate on.
    for fi, field in enumerate((t_best, prim) + attrs):
        accT3[:, :, fi : fi + 1] = jnp.transpose(field).reshape(_SUB, 8, 1)

    # ---- Phase 4: sparse clusters, scalar bit-scan over liveness words.
    def sparse_body(i, _):
        c = sm_sparse[i]
        rows = rows_of(c)

        def entry(g):
            blk = rayT3[pl.ds(g, 1)].reshape(8, 8)
            ab = accT3[pl.ds(g, 1)].reshape(8, 16)
            tb = ab[:, 0:1]
            pb = ab[:, 1:2]
            acols = tuple(
                ab[:, 2 + ai : 3 + ai] for ai in range(_NATTR)
            )
            t_c, p_c, a_c = mt_cols(
                rows,
                blk[:, 0:1], blk[:, 1:2], blk[:, 2:3],
                blk[:, 3:4], blk[:, 4:5], blk[:, 5:6],
                tb, pb, acols,
            )
            cols = [t_c, p_c] + list(a_c)
            new_ab = jnp.concatenate(
                cols + [ab[:, n_state:]], axis=1
            )
            accT3[pl.ds(g, 1)] = new_ab.reshape(1, 8, 16)

        for w in range(8):
            mw0 = w_scr[c, w].astype(i32)

            def bit_body(mw):
                low = mw & (-mw)
                b = jnp.log2(low.astype(f32) + 0.5).astype(i32)
                entry(w * 16 + b)
                return mw ^ low

            jax.lax.while_loop(lambda mw: mw != 0, bit_body, mw0)
        return 0

    if "sparse" in _PHASES:
        jax.lax.fori_loop(0, ns, sparse_body, 0)

    # ---- Writeback: accT3 blocks -> (8, 128) ray-major outputs.
    outs = (t_out, prim_out, u_out, v_out, n0_out, n1_out, n2_out,
            mat_out, light_out)
    for fi, o_ref in enumerate(outs):
        if fi < n_state:
            fld = accT3[:, :, fi : fi + 1].reshape(_SUB, 8)
            o_ref[:] = jnp.transpose(fld)
        else:
            o_ref[:] = jnp.zeros((8, _SUB), f32)


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _pairs_intersect_impl(accel: ClusterAccel, o, d, tmax,
                          any_hit: bool = False, interpret: bool = False):
    """Full hit query over the split-path kernel.

    Same contract as ops.cluster.cluster_intersect: dict with per-ray 't',
    'prim' (int32, -1 = miss) and, for closest-hit mode, 'u', 'v', 'n',
    'mat', 'light' selected inside the kernel.
    """
    n = o.shape[0]
    pad = (-n) % _TILE
    npad = n + pad

    def comp(x, fill=0.0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(npad // 8, 8).T.reshape(8, npad // 8)

    ox, oy, oz = comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2])
    dx, dy, dz = comp(d[:, 0], 1.0), comp(d[:, 1], 1.0), comp(d[:, 2], 1.0)
    tm = comp(tmax, -1.0)

    grid = npad // _TILE
    ray_spec = pl.BlockSpec(
        (8, _SUB), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    c_pad = accel.boxes.shape[0]
    c_pad = -(-c_pad // _CLUSTER) * _CLUSTER
    kernel = functools.partial(
        _pairs_kernel,
        n_clusters=accel.n_clusters,
        n_supers=accel.n_supers,
        c_pad=c_pad,
        any_hit=any_hit,
    )
    # Cluster AABB rows padded to the chunk multiple. Pad rows use
    # disjoint per-axis t-intervals (x at +2e30, y at -2e30) so the slab
    # test always fails — pad clusters must never reach the triangle
    # arrays, which have exactly n_clusters rows.
    boxes = accel.boxes
    if boxes.shape[0] < c_pad:
        padrow = jnp.tile(
            jnp.asarray([[2e30, -2e30, 0.0, 2e30, -2e30, 0.0, 0.0, 0.0]],
                        boxes.dtype),
            (c_pad - boxes.shape[0], 1),
        )
        boxes = jnp.concatenate([boxes, padrow], axis=0)

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[full] * 17 + [ray_spec] * 7,
        out_specs=[ray_spec] * 9,
        out_shape=[
            jax.ShapeDtypeStruct((8, npad // 8), jnp.float32) for _ in range(9)
        ],
        scratch_shapes=[
            pltpu.VMEM((c_pad, _SUB), jnp.float32),   # m_scr
            pltpu.VMEM((c_pad, 8), jnp.float32),      # w_scr
            pltpu.VMEM((_SUB, 8, 8), jnp.float32),    # rayT3
            pltpu.VMEM((_SUB, 8, 16), jnp.float32),   # accT3
            pltpu.VMEM((_CLUSTER, 8), jnp.float32),   # colbuf
            pltpu.SMEM((c_pad + 1,), jnp.int32),      # sm_dense
            pltpu.SMEM((c_pad + 1,), jnp.int32),      # sm_sparse
        ],
        interpret=interpret,
    )(
        accel.sboxes, boxes,
        accel.v0x, accel.v0y, accel.v0z,
        accel.e1x, accel.e1y, accel.e1z,
        accel.e2x, accel.e2y, accel.e2z, accel.pid,
        accel.nx, accel.ny, accel.nz, accel.matf, accel.lightf,
        ox, oy, oz, dx, dy, dz, tm,
    )

    def uncomp(x):
        return x.reshape(8, npad // 8).T.reshape(npad)[:n]

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


# ---------------------------------------------------------------------------
# Measured status (killeroo-class scene, 122k tris, 1M rays, v5e):
#   phase bisect (scripts/bisect_pairs.py):
#     prepass M-build        camera 32 ms   bounce 58 ms
#     pack+split             camera +11 ms  bounce +37 ms
#     dense full-tile        camera +631 ms bounce +3813 ms  (~34 us/cluster)
#     sparse bit-scan        camera +31 ms  bounce +1677 ms  (~0.5-1.3 us/entry)
#   entry ablation (scripts/micro_entry.py): per sparse entry ~470 ns =
#     ~175 ns row loads + ~70 ns state blocks + ~130 ns MT + ~270 ns the
#     7-attribute select chain — the attribute machinery dominates BOTH
#     paths (it is ~45% of ops/cluster.py's time too).
# Round-4 status: the recorded conclusion (traversal carries only (t, pid),
# attributes resolved in one batched final pass) is now implemented in the
# PRODUCTION path — ops/cluster.py defer_attrs=True + accel/api.py
# resolve_tri_attrs (native gather at 122k rows / 1M rays measured ~8 ms,
# invalidating the round-3 assumption that post-hoc gathers are
# prohibitive). Measured on killeroo-class (122k tris, 1M rays):
# cluster+defer = 3.1 Mrays/s camera closest vs pairs dense+sparse ~1.4 —
# the cluster kernel remains the production default and this kernel stays a
# testbed for the flat pair-list formulation (its sparse path informs the
# next redesign: per-entry scalar orchestration ~470 ns dominates).
# ---------------------------------------------------------------------------


# Geometry detached under reverse-mode AD (ops/detach.py).
from .detach import detached_query  # noqa: E402

pairs_intersect = detached_query(_pairs_intersect_impl)
