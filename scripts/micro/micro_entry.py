#!/usr/bin/env python
"""Time the sparse-path entry body in isolation, with ablations."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N_ENT = 2000
GRID = 64


def timeit(f, *a, n=10):
    o = f(*a)
    _ = float(jnp.sum(o))
    t0 = time.perf_counter()
    for _i in range(n):
        o = f(*a)
    _ = float(jnp.sum(o))
    return (time.perf_counter() - t0) / n


def kern(tri_ref, o_ref, rayT3, accT3, *, mode):
    # init scratches
    base = jnp.full((128, 8, 1), 0.5) + pl.program_id(0).astype(jnp.float32)
    for c in range(6):
        rayT3[:, :, c : c + 1] = base * (c + 1.0)
    accT3[:, :, 0:1] = jnp.full((128, 8, 1), 1e30)
    accT3[:, :, 1:16] = jnp.zeros((128, 8, 15))

    def body(j, acc):
        g = (j * 13) % 128
        c = (j * 7) % 900

        rows = [tri_ref[pl.ds(c + r, 1), :] for r in range(13)]
        (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, pid,
         anx, any_, anz) = rows
        if mode == "loads_only":
            return acc + jnp.sum(v0x) + jnp.sum(pid)
        blk = rayT3[pl.ds(g, 1)].reshape(8, 8)
        oxg, oyg, ozg = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
        dxg, dyg, dzg = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
        if mode == "blocks_only":
            return acc + jnp.sum(oxg * dzg)
        ab = accT3[pl.ds(g, 1)].reshape(8, 16)
        tb = ab[:, 0:1]
        pb = ab[:, 1:2]
        eps = 1e-12
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
        hit = ((jnp.abs(det) > eps) & (uk >= 0.0) & (vk >= 0.0)
               & (uk + vk <= 1.0) & (tk > 0.0) & (tk < tb))
        tkh = jnp.where(hit, tk, 3e38)
        tmin_new = jnp.min(tkh, axis=1, keepdims=True)
        if mode == "mt_only":
            return acc + tmin_new
        better = tmin_new < tb
        eq = hit & (tkh == tmin_new)
        pid_sel = jnp.max(jnp.where(eq, pid, 0.0), axis=1, keepdims=True)
        eq1 = eq & (pid == pid_sel)
        cols = [jnp.where(better, tmin_new, tb),
                jnp.where(better, pid_sel, pb)]
        for ai, row in enumerate((uk, vk, anx, any_, anz, anx, any_)):
            sel = jnp.sum(jnp.where(eq1, row, 0.0), axis=1, keepdims=True)
            cols.append(jnp.where(better, sel, ab[:, 2 + ai : 3 + ai]))
        new_ab = jnp.concatenate(cols + [ab[:, 9:]], axis=1)
        if mode == "no_write":
            return acc + jnp.sum(new_ab[:, 0:1], axis=1, keepdims=True) * 0.0 \
                + tmin_new
        accT3[pl.ds(g, 1)] = new_ab.reshape(1, 8, 16)
        return acc

    if mode == "while":
        def wbody(carry):
            j, acc = carry
            acc = body(j, acc)
            return (j + 1, acc)

        _, acc = jax.lax.while_loop(
            lambda c: c[0] < N_ENT, wbody, (0, jnp.zeros((8, 1))))
    else:
        acc = jax.lax.fori_loop(0, N_ENT, body, jnp.zeros((8, 1)))
    o_ref[:, :] = acc + accT3[0].reshape(8, 16)[:, 0:1]


def run(mode):
    k = functools.partial(kern, mode=mode)
    f = pl.pallas_call(
        k, grid=(GRID,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128, 8, 8), jnp.float32),
                        pltpu.VMEM((128, 8, 16), jnp.float32)],
    )
    tri = jnp.asarray(np.random.default_rng(0).normal(
        size=(1024, 128)).astype(np.float32))
    dt = timeit(jax.jit(lambda t: f(t)), tri)
    print(f"{mode:12s}: {dt*1e3:8.3f} ms -> {dt/GRID/N_ENT*1e9:7.1f} ns/entry",
          flush=True)


if __name__ == "__main__":
    for m in ("loads_only", "blocks_only", "mt_only", "no_write", "full",
              "while"):
        run(m)
