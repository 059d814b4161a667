#!/usr/bin/env python
"""Sort-key experiment on the killeroo-class scene (round-5): measured
r4/r5 data shows the 15-bit-origin/16-bit-direction key HELPS camera rays
(221 vs 437 ms) but HURTS diffuse bounce rays 2.5x (2692 vs 1088 ms
unsorted). Candidates: finer origin bins, direction demoted, raster
(unsorted), pure-origin keys. Also decomposes the sweep accel's cost into
candidate-pass vs kernel.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PBRT_TPU_NSPECTRUM", "8")


def main():
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from pbrt_tpu.accel import api as accel_api
    from pbrt_tpu.ops.cluster import cluster_intersect
    from pbrt_tpu.render import camera_rays
    from pbrt_tpu.scenes.meshes import killeroo_class_scene
    from pbrt_tpu.utils.profile import sync, timed_breakdown

    scene, camera = killeroo_class_scene(resolution=(512, 512))
    scene = scene.with_accel(kind="cluster")
    sweep_scene = scene.replace(clusters=None).with_accel(kind="sweep")
    sync(scene.clusters.boxes)

    n = 1 << 20
    nx, ny = camera.resolution
    npix = nx * ny
    k = max(1, n // npix)
    pixel = jnp.tile(jnp.arange(npix, dtype=jnp.int32), (k,))
    sample = jnp.repeat(jnp.arange(k, dtype=jnp.int32), npix)
    o_c, d_c, _ = jax.jit(
        lambda p, s: camera_rays(camera, p, s, jnp.int32(0)))(pixel, sample)
    sync(o_c)

    @jax.jit
    def gen_bounce(o, d):
        isect = accel_api.closest(scene, o, d)
        key = jax.random.PRNGKey(7)
        u = jax.random.uniform(key, (o.shape[0], 2))
        nrm = jnp.where(isect.valid[:, None], isect.n,
                        jnp.asarray([0.0, 1.0, 0.0]))
        r = jnp.sqrt(u[:, 0:1])
        phi = 2 * jnp.pi * u[:, 1:2]
        z = jnp.sqrt(jnp.maximum(1 - u[:, 0:1], 0.0))
        up = jnp.where(jnp.abs(nrm[:, 2:3]) < 0.9,
                       jnp.asarray([0.0, 0.0, 1.0]),
                       jnp.asarray([1.0, 0.0, 0.0]))
        t1 = jnp.cross(up, nrm)
        t1 = t1 / jnp.maximum(
            jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
        t2 = jnp.cross(nrm, t1)
        d_new = r * jnp.cos(phi) * t1 + r * jnp.sin(phi) * t2 + z * nrm
        o_new = jnp.where(isect.valid[:, None], isect.p + 1e-3 * nrm,
                          o + 1e3 * d)
        return o_new, d_new, jnp.where(isect.valid, jnp.inf, 0.0)

    o_b, d_b, tm_b = gen_bounce(o_c, d_c)
    sync(o_b)
    inf = jnp.full((n,), jnp.inf)

    def key_current(o, d, tmax):
        return accel_api.ray_sort_perm(o, d, tmax)[0]

    def _spread8(x):
        x = (x | (x << 8)) & 0x00F00F
        x = (x | (x << 4)) & 0x0C30C3
        x = (x | (x << 2)) & 0x249249
        return x

    def key_fine_origin(o, d, tmax):
        """24-bit origin Morton (256^3), 7-bit direction, dead bit 31."""
        lo = jnp.min(o, axis=0)
        hi = jnp.max(o, axis=0)
        q = jnp.clip(((o - lo) / jnp.maximum(hi - lo, 1e-6) * 255)
                     .astype(jnp.int32), 0, 255)
        ocode = (_spread8(q[:, 0]) | (_spread8(q[:, 1]) << 1)
                 | (_spread8(q[:, 2]) << 2)).astype(jnp.uint32)
        an = jnp.sum(jnp.abs(d), axis=-1)
        px = d[:, 0] / jnp.maximum(an, 1e-20)
        py = d[:, 1] / jnp.maximum(an, 1e-20)
        neg = d[:, 2] < 0
        px2 = jnp.where(neg, (1 - jnp.abs(py)) * jnp.sign(px), px)
        py2 = jnp.where(neg, (1 - jnp.abs(px)) * jnp.sign(py), py)
        qx = jnp.clip(((px2 + 1) * 5.5).astype(jnp.int32), 0, 10)
        qy = jnp.clip(((py2 + 1) * 5.5).astype(jnp.int32), 0, 10)
        dcode = (qx * 11 + qy).astype(jnp.uint32)  # 7 bits
        key = (ocode << 7) | dcode
        key = key | jnp.where(tmax <= 0.0, jnp.uint32(1) << 31,
                              jnp.uint32(0))
        return jnp.argsort(key)

    def key_origin_only(o, d, tmax):
        lo = jnp.min(o, axis=0)
        hi = jnp.max(o, axis=0)
        q = jnp.clip(((o - lo) / jnp.maximum(hi - lo, 1e-6) * 255)
                     .astype(jnp.int32), 0, 255)
        ocode = (_spread8(q[:, 0]) | (_spread8(q[:, 1]) << 1)
                 | (_spread8(q[:, 2]) << 2)).astype(jnp.uint32)
        key = ocode | jnp.where(tmax <= 0.0, jnp.uint32(1) << 31,
                                jnp.uint32(0))
        return jnp.argsort(key)

    def trav_time(perm_fn, o, d, tm, tag):
        if perm_fn is None:
            os_, ds_, ts_ = o, d, tm
        else:
            perm = jax.jit(perm_fn)(o, d, tm)
            os_, ds_, ts_ = o[perm], d[perm], tm[perm]
            sync(os_)
        f = jax.jit(lambda o, d, tm: cluster_intersect(
            scene.clusters, o, d, tm, any_hit=False, defer_attrs=True)["t"])
        sync(f(os_, ds_, ts_))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f(os_, ds_, ts_))
            best = min(best, time.perf_counter() - t0)
        print(f"  {tag:28s} {best * 1e3:9.2f} ms "
              f"{n / best / 1e6:8.2f} Mrays/s", flush=True)

    for rays, lab in ((( o_c, d_c, inf), "camera"),
                      ((o_b, d_b, tm_b), "bounce")):
        o, d, tm = rays
        print(f"== {lab} ==", flush=True)
        trav_time(None, o, d, tm, "unsorted")
        trav_time(key_current, o, d, tm, "current(o15,d16)")
        trav_time(key_fine_origin, o, d, tm, "fine-origin(o24,d7)")
        trav_time(key_origin_only, o, d, tm, "origin-only(o24)")

    # Sweep decomposition: candidates-pass vs full intersect.
    from pbrt_tpu.ops.sweep import _candidates, sweep_intersect

    acc = sweep_scene.sweep
    perm = jax.jit(key_current)(o_c, d_c, inf)
    os_, ds_ = o_c[perm], d_c[perm]
    pad = (-n) % 1024
    o_p = jnp.pad(os_, ((0, pad), (0, 0)))
    d_p = jnp.pad(ds_, ((0, pad), (0, 0)), constant_values=1.0)
    tm_p = jnp.pad(inf, (0, pad), constant_values=-1.0)
    n_tiles = (n + pad) // 1024
    cand = jax.jit(lambda o, d, t: _candidates(acc, o, d, t, n_tiles)[3])
    full = jax.jit(lambda o, d, t: sweep_intersect(
        acc, o, d, t, any_hit=False)["t"])
    res = timed_breakdown({
        "sweep/candidates_only": lambda: cand(o_p, d_p, tm_p),
        "sweep/full": lambda: full(os_, ds_, inf),
    }, warmup=1, iters=3)
    for k_, v in res.items():
        print(f"  {k_:28s} {v * 1e3:9.2f} ms", flush=True)
    cnt = jax.jit(lambda o, d, t: _candidates(acc, o, d, t, n_tiles)[3])(
        o_p, d_p, tm_p)
    import numpy as np

    c = np.asarray(cnt).ravel()
    print(f"  camera candidates/tile: mean={c.mean():.1f} "
          f"p50={np.percentile(c, 50):.0f} p95={np.percentile(c, 95):.0f} "
          f"max={c.max()}", flush=True)


if __name__ == "__main__":
    main()
