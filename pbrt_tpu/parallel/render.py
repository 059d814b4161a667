"""Sharded rendering strategies over a device mesh.

Two data-parallel decompositions (SURVEY.md section 5.8 green-field design):
  * tile-sharded  — pixels split across devices; film shards concatenate with
    no cross-device traffic (the common forward-render mode).
  * spp-sharded   — every device renders all pixels at a sample-index subset;
    film accumulators reduce with an explicit psum over the mesh (the mode
    whose reduction overlaps gradient all-reduce in training, and the
    checkpoint/resume boundary: each wave is a film delta).

Both are bitwise deterministic: sample values derive from (pixel, sample,
dim) hashes, so the result is independent of the device layout, and the film
reduction order is fixed by the mesh axis order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..films.rgb import spectrum_to_rgb
from ..render import camera_rays_full


def render_tile_sharded(scene, camera, integrator, mesh: Mesh, spp: int = 4,
                        seed: int = 0):
    """Pixels sharded over mesh axis 'data'. Returns (ny, nx, 3) image."""
    nx, ny = camera.resolution
    npix = nx * ny
    n_dev = mesh.devices.size
    assert npix % n_dev == 0

    pixel = jnp.arange(npix, dtype=jnp.int32)
    pixel = jax.device_put(pixel, NamedSharding(mesh, P("data")))
    scene = jax.device_put(scene, NamedSharding(mesh, P()))

    @jax.jit
    def run(scene, pixel):
        acc = jnp.zeros((pixel.shape[0], 3), jnp.float32)

        def body(s, acc):
            o, d, wl, w = camera_rays_full(
                camera, pixel, s, jnp.int32(seed)
            )
            L = integrator.trace(scene, o, d, wl, pixel, s, jnp.int32(seed))
            return acc + spectrum_to_rgb(L, wl) * w[:, None]

        acc = jax.lax.fori_loop(0, spp, body, acc)
        return acc / spp

    img = run(scene, pixel)
    return img.reshape(ny, nx, 3)


def render_spp_sharded(scene, camera, integrator, mesh: Mesh, spp: int = 8,
                       seed: int = 0):
    """Sample indices sharded; film reduced with an explicit psum."""
    from jax import shard_map

    nx, ny = camera.resolution
    npix = nx * ny
    n_dev = mesh.devices.size
    assert spp % n_dev == 0
    per_dev = spp // n_dev

    samples = jnp.arange(spp, dtype=jnp.int32)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P(),
        # The integrator's scan carries start as replicated constants and
        # become device-varying through the loop; skip the static vma check.
        check_vma=False,
    )
    def run(scene, my_samples):
        pixel = jnp.arange(npix, dtype=jnp.int32)
        acc = jnp.zeros((npix, 3), jnp.float32)

        def body(i, acc):
            s = my_samples[i]
            o, d, wl, w = camera_rays_full(
                camera, pixel, s, jnp.int32(seed)
            )
            L = integrator.trace(scene, o, d, wl, pixel, s, jnp.int32(seed))
            return acc + spectrum_to_rgb(L, wl) * w[:, None]

        acc = jax.lax.fori_loop(0, per_dev, body, acc)
        # Film reduction across the mesh (the psum that overlaps the
        # backward gradient all-reduce in training).
        return jax.lax.psum(acc, "data")

    img = jax.jit(run)(scene, samples)
    return (img / spp).reshape(ny, nx, 3)
