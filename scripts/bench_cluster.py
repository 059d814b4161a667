#!/usr/bin/env python
"""Ad-hoc: time the cluster intersector on the killeroo-class scene (TPU).

Measures 1M sorted camera rays (closest), 1M shuffled diffuse-bounce rays
(closest), and 1M shadow rays (any-hit), mirroring the numbers quoted in
accel/api.py's docstring so tier changes are comparable across rounds.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pbrt_tpu.accel.api import ray_sort_perm  # noqa: E402
from pbrt_tpu.ops.cluster import cluster_intersect  # noqa: E402
from pbrt_tpu.render import camera_rays  # noqa: E402
from pbrt_tpu.scenes.meshes import killeroo_class_scene  # noqa: E402


def time_it(fn, *args, n=5):
    out = fn(*args)
    _ = float(jnp.sum(out[0]))  # real sync: block_until_ready lies on axon
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out[0]))
    return (time.perf_counter() - t0) / n


def main():
    scene, camera = killeroo_class_scene(resolution=(1024, 1024))
    acc = scene.clusters
    print(f"tris={scene.geom.num_triangles} clusters={acc.n_clusters} "
          f"supers={acc.n_supers}", flush=True)

    n = 1024 * 1024
    pixel = jnp.arange(n, dtype=jnp.int32)
    sample = jnp.zeros((n,), jnp.int32)
    o, d, _ = camera_rays(camera, pixel, sample, jnp.int32(0))
    tmax = jnp.full((n,), jnp.inf, jnp.float32)

    impl = cluster_intersect

    @jax.jit
    def closest_sorted(o, d, tmax):
        perm, invp = ray_sort_perm(o, d)
        res = impl(acc, o[perm], d[perm], tmax[perm])
        return res["t"][invp], res["prim"][invp]

    @jax.jit
    def anyhit_sorted(o, d, tmax):
        perm, invp = ray_sort_perm(o, d)
        res = impl(acc, o[perm], d[perm], tmax[perm],
                                any_hit=True)
        return (res["prim"] > 0)[invp]

    dt = time_it(closest_sorted, o, d, tmax)
    print(f"camera closest: {dt*1e3:.1f} ms/1M rays = "
          f"{1.0/dt/1e6*1e6:.1f} Mrays/s", flush=True)

    # Diffuse-bounce-like rays: origins on hit surfaces, random directions.
    t, prim = closest_sorted(o, d, tmax)
    hitmask = np.asarray(prim > 0)
    t_np = np.asarray(t)
    o_np, d_np = np.asarray(o), np.asarray(d)
    p = o_np + t_np[:, None] * d_np
    rng = np.random.default_rng(1)
    idx = rng.choice(np.nonzero(hitmask)[0], size=n)
    o2 = jnp.asarray(p[idx] + 1e-3)
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    d2 = jnp.asarray(dd)

    dt = time_it(closest_sorted, o2, d2, tmax)
    print(f"bounce closest: {dt*1e3:.1f} ms/1M rays = "
          f"{1.0/dt:.1f} Mrays/s-ish ({1e6/dt/1e6:.2f} M)", flush=True)

    dt = time_it(anyhit_sorted, o2, d2, tmax)
    print(f"bounce any-hit: {dt*1e3:.1f} ms/1M rays = {1e6/dt/1e6:.2f} M",
          flush=True)


if __name__ == "__main__":
    main()
