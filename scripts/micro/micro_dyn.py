#!/usr/bin/env python
"""Microbench dynamic-index primitive costs inside Mosaic loops.

Each case runs GRID x N_IT loop iterations; report ns/iter. Real sync via
host readback (block_until_ready does not synchronize on the axon tunnel).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

GRID = 64
N_IT = 2048


def timeit(f, *a, n=10):
    o = f(*a)
    _ = float(jnp.sum(o))
    t0 = time.perf_counter()
    for _i in range(n):
        o = f(*a)
    _ = float(jnp.sum(o))
    return (time.perf_counter() - t0) / n


def kern(tab_ref, o_ref, scr, sm, *, mode):
    base = pl.program_id(0)

    def body(i, acc):
        j = (i * 7 + base) % 900  # data-dependent-ish dynamic index
        if mode == "dynload":
            row = tab_ref[pl.ds(j, 1), :]  # (1,128) dynamic sublane load
            return acc + row
        if mode == "dynload8":
            row = tab_ref[pl.ds(j, 1), :]
            r = row
            for k in range(7):
                r = r + tab_ref[pl.ds(j + k + 1, 1), :]
            return acc + r
        if mode == "staticload":
            row = tab_ref[0:1, :]
            return acc + row * i
        if mode == "dynstore":
            scr[pl.ds(j, 1), :] = acc
            return acc + 1.0
        if mode == "smemread":
            s = sm[j]
            return acc + s.astype(jnp.float32)
        if mode == "smemwrite":
            sm[j] = i
            return acc + 1.0
        if mode == "reshape18":
            row = tab_ref[pl.ds(j, 1), 0:8]  # (1,8)
            col = row.reshape(8, 1)
            return acc + col  # acc (8,128) bcast
        if mode == "matmul_small":
            m = tab_ref[0:128, :]  # (128,128)
            v = acc[0:1, :]
            r = jnp.dot(v, m, preferred_element_type=jnp.float32)
            return acc + r
        if mode == "mt35":
            row = tab_ref[pl.ds(j, 1), :]
            x = acc
            for _ in range(11):
                x = x * row + 1.0
                x = jnp.minimum(x, row * x + 0.5)
                x = jnp.maximum(x - row, x * 0.3)
            return x
        raise ValueError(mode)

    def init():
        return jnp.zeros((1, 128)) if mode in (
            "dynload", "dynload8", "staticload", "smemread", "smemwrite",
            "dynstore", "matmul_small") else jnp.zeros((8, 128))

    acc = jax.lax.fori_loop(0, N_IT, body, init() + base)
    o_ref[:, :] = jnp.sum(acc).reshape(1, 1)


def run(mode):
    k = functools.partial(kern, mode=mode)
    f = pl.pallas_call(
        k, grid=(GRID,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1024, 128), jnp.float32),
                        pltpu.SMEM((1024,), jnp.int32)],
    )
    tab = jnp.asarray(np.random.default_rng(0).normal(
        size=(1024, 128)).astype(np.float32))
    dt = timeit(jax.jit(lambda t: f(t)), tab)
    print(f"{mode:14s}: {dt*1e3:8.3f} ms -> {dt/GRID/N_IT*1e9:7.1f} ns/iter",
          flush=True)


if __name__ == "__main__":
    for m in ("staticload", "dynload", "dynload8", "dynstore", "smemread",
              "smemwrite", "reshape18", "mt35", "matmul_small"):
        run(m)
