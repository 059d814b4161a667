"""Single-transfer scene upload (utils/device_pack.py): packed round-trip
is exact and renders identically."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.utils.device_pack import pack_to_device


def test_pack_roundtrip_scene():
    from pbrt_tpu.scenes.cornell import cornell_box

    scene, camera = cornell_box(resolution=(32, 32))
    scene = scene.with_accel()
    packed = pack_to_device(scene)
    import jax

    la, ta = jax.tree_util.tree_flatten(scene)
    lb, tb = jax.tree_util.tree_flatten(packed)
    assert ta == tb
    for x, y in zip(la, lb):
        if hasattr(x, "shape"):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        else:
            assert x == y


def test_pack_renders_identically():
    from pbrt_tpu.films.rgb import spectrum_to_rgb
    from pbrt_tpu.models.path import PathIntegrator
    from pbrt_tpu.render import camera_rays
    from pbrt_tpu.scenes.cornell import cornell_box

    scene, camera = cornell_box(resolution=(24, 24))
    scene = scene.with_accel()
    packed = pack_to_device(scene)
    integ = PathIntegrator(max_depth=3, rr_start_depth=3)
    nx, ny = camera.resolution
    pixel = jnp.arange(nx * ny, dtype=jnp.int32)
    sample = jnp.zeros_like(pixel)
    o, d, wl = camera_rays(camera, pixel, sample, jnp.int32(0))
    la = integ.trace(scene, o, d, wl, pixel, sample, jnp.int32(0))
    lb = integ.trace(packed, o, d, wl, pixel, sample, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
