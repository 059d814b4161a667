#!/usr/bin/env python
"""Compare dense vs cluster-kernel closest/any-hit on the Cornell scene."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:8.3f} ms")
    return out


def main():
    import numpy as np

    from pbrt_tpu.accel import api as accel_api
    from pbrt_tpu.render import camera_rays
    from pbrt_tpu.scenes.cornell import cornell_box

    n = 1 << 20
    scene, camera = cornell_box(resolution=(512, 512))
    pixel = jnp.arange(n, dtype=jnp.int32) % (512 * 512)
    sample = jnp.zeros((n,), jnp.int32)
    o, d, wl = camera_rays(camera, pixel, sample, jnp.int32(0))
    scene_cl = scene.with_accel(threshold=0)
    print("clusters:", scene_cl.clusters.n_clusters)

    tmax = jnp.full((n,), 10.0)
    a = timeit("dense closest", jax.jit(lambda o, d: accel_api.closest(scene, o, d)), o, d)
    b = timeit("cluster closest", jax.jit(lambda o, d: accel_api.closest(scene_cl, o, d)), o, d)
    timeit("dense any", jax.jit(lambda o, d: accel_api.any_hit(scene, o, d, tmax)), o, d)
    timeit("cluster any", jax.jit(lambda o, d: accel_api.any_hit(scene_cl, o, d, tmax)), o, d)
    for f in ("t", "prim", "n", "mat", "light"):
        x, y = np.asarray(getattr(a, f if f != "n" else "n")), np.asarray(getattr(b, f))
        ok = np.allclose(x, y, atol=1e-4)
        print(f"match {f}: {ok}" + ("" if ok else f"  maxdiff={np.abs(x - y).max()}"))


if __name__ == "__main__":
    main()
