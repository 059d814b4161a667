#!/usr/bin/env python
"""Micro-test the Mosaic primitives needed by the pair-list intersector."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def kern(live_ref, rays_ref, o_list, o_gather, o_meta):
    # 1) lane cumsum + live-first permutation of 128 lanes
    live = live_ref[0:1, :]  # (1,128) 0/1
    # inclusive prefix sum over lanes as a triangular matmul (no cumsum
    # lowering in Mosaic): cum[j] = sum_i live[i] * (i <= j)
    ri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0).astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1).astype(jnp.float32)
    tri = (ri <= ci).astype(jnp.float32)
    cum = jnp.dot(live, tri, preferred_element_type=jnp.float32)
    count = cum[0, 127]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(jnp.float32)
    pos = jnp.where(live > 0, cum - 1.0, count + idx - cum)
    # scatter iota by pos, COLUMN form (entries on sublanes so the main
    # loop can scalar-read them): M2[i,j] = (pos[j] == i);
    # sorted_col = M2 @ iota_col
    rowi = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0).astype(jnp.float32)
    m2 = (pos == rowi).astype(jnp.float32)  # pos (1,128) bcast over rows
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0).astype(jnp.float32)
    sorted_col = jnp.dot(m2, iota_col, preferred_element_type=jnp.float32)
    o_list[:, 0:1] = sorted_col
    o_meta[0:1, 0:1] = count.reshape(1, 1)

    # 2) dynamic-bound fori over live entries; per entry: dynamic sublane
    #    read of transposed rays (1,8) -> (8,1) transpose -> accumulate
    def body(j, acc):
        g = o_list[j, 0].astype(jnp.int32)  # scalar read, dynamic sublane
        row = rays_ref[pl.ds(g, 1), :]  # (1,8) dynamic sublane
        colv = row.reshape(8, 1)  # transpose-equivalent relayout
        return acc + colv * (j + 1.0)

    acc = jax.lax.fori_loop(0, count.astype(jnp.int32), body,
                            jnp.zeros((8, 1)))
    o_gather[:, 0:1] = acc
    # 3) dynamic sublane store
    o_gather[pl.ds(count.astype(jnp.int32) % 8, 1), 1:2] = jnp.full(
        (1, 1), 123.0)


def run(interpret):
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((128, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )
    rng = np.random.default_rng(0)
    live = (rng.random((1, 128)) < 0.3).astype(np.float32)
    rays = rng.normal(size=(128, 8)).astype(np.float32)
    lst, gat, meta = jax.jit(lambda a, b: f(a, b))(jnp.asarray(live),
                                                   jnp.asarray(rays))
    lst, gat, meta = map(np.asarray, (lst, gat, meta))
    n = int(live.sum())
    ids = lst[:n, 0].astype(int)
    assert meta[0, 0] == n, (meta[0, 0], n)
    assert set(ids) == set(np.nonzero(live[0])[0]), "live-first ids wrong"
    # expected accumulate
    exp = np.zeros(8)
    for j, g in enumerate(ids):
        exp += rays[g] * (j + 1.0)
    np.testing.assert_allclose(gat[:, 0], exp, rtol=1e-5)
    print(f"interpret={interpret}: OK count={n}", flush=True)


if __name__ == "__main__":
    import sys
    if jax.default_backend() == "cpu":
        run(True)
    else:
        run(False)
