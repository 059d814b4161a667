#!/usr/bin/env python
"""Microbench v2: per-iteration cost scaling, unfoldable work."""
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


def timeit(f, *a, n=20):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n


def kern(x_ref, tab_ref, o_ref, *, n_it, mode, body_reps):
    x = x_ref[:] + pl.program_id(0).astype(jnp.float32)

    def mt_like(x, row):
        for _ in range(body_reps):
            x = x * row + 1.0
            x = jnp.minimum(x, row * x + 0.5)
            x = jnp.maximum(x - row, x * 0.3)
        return x

    def body(c, acc):
        row = tab_ref[c, :]  # (128,) dynamic row load
        row = row.reshape(1, 128)
        if mode == "nocond":
            return acc + mt_like(x, row)
        m = jnp.max(row) + jnp.max(acc) > -1.0  # data-dep, usually True

        def hot(a):
            return a + mt_like(x, row)

        return jax.lax.cond(m, hot, lambda a: a, acc)

    acc = jax.lax.fori_loop(0, n_it, body, x * 0.0)
    o_ref[:] = acc


def run(mode, n_it, body_reps=12, grid=256):
    k = functools.partial(kern, n_it=n_it, mode=mode, body_reps=body_reps)
    f = pl.pallas_call(
        k, grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    x = jnp.full((8, 128), 0.5)
    tab = jnp.asarray(np.random.default_rng(0).normal(size=(2048, 128))
                      .astype(np.float32))
    dt = timeit(jax.jit(lambda x, t: f(x, t)), x, tab)
    per = dt / grid / n_it
    print(f"{mode} n_it={n_it} reps={body_reps}: {dt*1e3:.3f} ms "
          f"-> {per*1e9:.1f} ns/iter", flush=True)
    return per


if __name__ == "__main__":
    for mode in ("nocond", "cond"):
        for n_it in (256, 1024):
            run(mode, n_it)
    # vary body size to split fixed-vs-variable cost
    for reps in (1, 4, 12, 36):
        run("cond", 1024, body_reps=reps)
