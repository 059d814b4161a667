#!/usr/bin/env python
"""Phase-level timing of the pairs kernel on the killeroo-class scene."""
import importlib
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")

from pbrt_tpu.accel.api import ray_sort_perm  # noqa: E402
from pbrt_tpu.render import camera_rays  # noqa: E402
from pbrt_tpu.scenes.meshes import killeroo_class_scene  # noqa: E402


def timed(fn, *args, n=3):
    out = fn(*args)
    _ = float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out[0]))
    return (time.perf_counter() - t0) / n


def main():
    scene, camera = killeroo_class_scene(resolution=(1024, 1024))
    acc = scene.clusters
    n = 1024 * 1024
    pixel = jnp.arange(n, dtype=jnp.int32)
    o, d, _ = camera_rays(camera, pixel, jnp.zeros((n,), jnp.int32),
                          jnp.int32(0))
    tmax = jnp.full((n,), jnp.inf, jnp.float32)
    perm, _ = ray_sort_perm(o, d)
    oc, dc = o[perm], d[perm]

    # bounce rays from a cheap numpy proxy: sample scene surface points
    rng = np.random.default_rng(1)
    tv = np.asarray(scene.geom.tri_verts)
    tsel = rng.integers(0, len(tv), n)
    bar = rng.dirichlet((1, 1, 1), n).astype(np.float32)
    p = (tv[tsel] * bar[:, :, None]).sum(1)
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    ob = jnp.asarray(p + 1e-3 * dd)
    db = jnp.asarray(dd)
    perm2, _ = ray_sort_perm(ob, db)
    ob, db = ob[perm2], db[perm2]

    for phases in (os.environ.get("PH", "pre1,pre2,dense,sparse"),):
        os.environ["PBRT_PAIRS_PHASES"] = phases
        import pbrt_tpu.ops.pairs as P
        importlib.reload(P)

        def closest(o, d, tmax):
            res = P.pairs_intersect(acc, o, d, tmax)
            return res["t"], res["prim"]

        f = jax.jit(closest)
        dtc = timed(f, oc, dc, tmax)
        dtb = timed(f, ob, db, tmax)
        print(f"[{phases}] camera {dtc*1e3:7.1f} ms  bounce {dtb*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
