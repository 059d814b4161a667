#!/usr/bin/env python
"""Benchmark: Cornell box (BASELINE.json config 1) forward render throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = Mrays/s on one chip, counting live closest-hit + shadow-ray queries
(the quantity the reference's wavefront kernels dispatch per bounce).
vs_baseline is against the 50 Mrays/s/chip north star (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from pbrt_tpu.films.rgb import spectrum_to_rgb
    from pbrt_tpu.models.path import PathIntegrator
    from pbrt_tpu.render import camera_rays
    from pbrt_tpu.scenes.cornell import cornell_box

    res = 256
    spp = 64
    samples_per_pass = 4
    max_depth = 5

    scene, camera = cornell_box(resolution=(res, res))
    integrator = PathIntegrator(max_depth=max_depth)
    nx, ny = camera.resolution
    npix = nx * ny
    pixel = jnp.arange(npix, dtype=jnp.int32)
    k = samples_per_pass
    pixel_b = jnp.tile(pixel, (k,))

    @jax.jit
    def render_pass(scene, pass_idx):
        sample_b = jnp.repeat(pass_idx * k + jnp.arange(k, dtype=jnp.int32), npix)
        o, d, wl = camera_rays(camera, pixel_b, sample_b, jnp.int32(0))
        radiance, stats = integrator.trace_with_stats(
            scene, o, d, wl, pixel_b, sample_b, jnp.int32(0)
        )
        rgb = spectrum_to_rgb(radiance, wl)
        img = jnp.mean(rgb.reshape(k, ny, nx, 3), axis=0)
        return img, stats["rays"]

    n_passes = spp // samples_per_pass

    # Warmup / compile.
    img, nrays_pass = render_pass(scene, jnp.int32(0))
    jax.block_until_ready(img)

    t0 = time.perf_counter()
    total_rays = 0.0
    acc = None
    for p in range(n_passes):
        img, nrays = render_pass(scene, jnp.int32(p))
        acc = img if acc is None else acc + img
        total_rays += float(nrays)
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "cornell_forward_throughput",
                "value": round(mrays, 3),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / 50.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
