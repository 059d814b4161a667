"""Tag-sorted shading dispatch (materials/sorted.py) equivalence gates.

The sorted tier is the wavefront per-material kernel-specialization
analogue (surfscatter.cpp:39-58): results must match the lockstep masked
path bit-for-bit-per-ray (all BxDF math is per-lane; the layered walk's RNG
is keyed on direction bits, not lane index), so the gate is a tight
allclose on full renders of a multi-family scene.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.models.path import PathIntegrator
from pbrt_tpu.render import render
from pbrt_tpu.scenes.cornell import cornell_box


def test_sorted_shading_matches_lockstep_render():
    scene, camera = cornell_box(resolution=(24, 24), variant="specular")
    scene = scene.with_accel()
    kwargs = dict(max_depth=4, rr_start_depth=4)
    img0 = np.asarray(
        render(scene, camera, PathIntegrator(**kwargs), spp=4,
               samples_per_pass=4)
    )
    # Small sort_tile so 24x24x4 rays span many tiles (uniform AND mixed).
    img1 = np.asarray(
        render(scene, camera,
               PathIntegrator(sorted_shading=True, sort_tile=256, **kwargs),
               spp=4, samples_per_pass=4)
    )
    assert np.isfinite(img1).all()
    np.testing.assert_allclose(img1, img0, rtol=2e-5, atol=2e-6)


def test_shade_sorted_unit_roundtrip():
    """shade_sorted must return fn's outputs in original ray order for an
    arbitrary per-ray function, padding and mixed tiles included."""
    from pbrt_tpu.materials.sorted import shade_sorted

    n = 1000
    rng = np.random.default_rng(3)
    kind = jnp.asarray(
        rng.choice([0, 1, 2], size=n, p=[0.6, 0.3, 0.1]), jnp.int32
    )
    x = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    params = {
        "kind": kind,
        "any_conductor": True,
        "any_dielectric": True,
        "any_thin": False,
        "any_coated": False,
        "any_diffusetrans": False,
        "any_hair": False,
        "any_subsurface": False,
        "any_measured": False,
        "any_mix": False,
        "any_retro": False,
        "any_interface_mat": False,
    }

    def fn(pp, oo):
        k = pp["kind"].astype(jnp.float32)
        return {"y": oo["x"] * (k[:, None] + 1.0), "z": k * 2.0}

    out = shade_sorted(params, {"x": x}, fn, tile=128)
    ref = fn(params, {"x": x})
    np.testing.assert_array_equal(np.asarray(out["y"]), np.asarray(ref["y"]))
    np.testing.assert_array_equal(np.asarray(out["z"]), np.asarray(ref["z"]))
