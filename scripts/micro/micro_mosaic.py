#!/usr/bin/env python
"""Microbench: Mosaic fori_loop+cond overhead vs raw VPU dense-test rate."""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def timeit(f, *a, n=10):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n


N_IT = 1000


def loop_kernel(x_ref, o_ref, *, mode):
    x = x_ref[:]

    def body(i, acc):
        if mode == "empty":
            return acc + 1.0
        # tiny slab-ish vector op + scalar reduce
        v = x * (1.0 + i) + acc
        m = jnp.max(v) > 1e30
        if mode == "reduce":
            return acc + jnp.where(m, 1.0, 0.5)
        # mode == "cond": cond that never takes the hot branch

        def hot(a):
            return a + jnp.sum(x)

        def cold(a):
            return a

        return jax.lax.cond(m, hot, cold, acc)

    acc = jax.lax.fori_loop(0., float(N_IT), body, jnp.zeros((8, 128)))
    o_ref[:] = acc


def dense_kernel(a_ref, b_ref, o_ref, *, n_it):
    a = a_ref[:]
    b = b_ref[:]

    def body(i, acc):
        # ~35 vector ops on (8,128): a fake Moller-Trumbore worth of VPU work
        x = a * (i + 1.0)
        for _ in range(5):
            x = x * b + a
            x = jnp.minimum(x * 1.0001, b + x)
            y = x * x - b
            x = jnp.where(y > 0, x, y)
        return acc + x

    acc = jax.lax.fori_loop(0., float(n_it), body, jnp.zeros((8, 128)))
    o_ref[:] = acc


def run(mode, grid=1024):
    k = functools.partial(loop_kernel, mode=mode)
    f = pl.pallas_call(
        k, grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    x = jnp.ones((8, 128))
    dt = timeit(jax.jit(lambda x: f(x)), x)
    per_it = dt / grid / N_IT
    print(f"loop[{mode}]: {dt*1e3:.2f} ms for {grid}x{N_IT} iters "
          f"= {per_it*1e9:.0f} ns/iter", flush=True)


def run_dense(grid=1024, n_it=256):
    k = functools.partial(dense_kernel, n_it=n_it)
    f = pl.pallas_call(
        k, grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    x = jnp.ones((8, 128))
    y = jnp.ones((8, 128)) * 0.5
    dt = timeit(jax.jit(lambda x, y: f(x, y)), x, y)
    vops = grid * n_it * 21.0  # vector ops per body
    lane_flops = vops * 1024
    print(f"dense: {dt*1e3:.2f} ms for {grid}x{n_it} bodies = "
          f"{lane_flops/dt/1e12:.2f} Tlaneops/s, "
          f"{dt/grid/n_it*1e9:.0f} ns/body", flush=True)


if __name__ == "__main__":
    for m in ("empty", "reduce", "cond"):
        run(m)
    run_dense()
