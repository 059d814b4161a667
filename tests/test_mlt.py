"""PSS-MLT correctness gates.

Modeled on the reference's integrator-consistency render tests
(/root/reference/src/pbrt/cpu/integrators_test.cpp:274-435): Metropolis must
converge to the same image as the unidirectional Path integrator, since the
Kelemen weighting makes every mutation step an unbiased estimator.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.models.mlt import MLTIntegrator, PSSSampler, render_mlt
from pbrt_tpu.models.path import PathIntegrator
from pbrt_tpu.render import render
from pbrt_tpu.scenes.cornell import cornell_box


def test_pss_sampler_replay():
    """The replay sampler serves exactly the stored coordinates, by slot."""
    u = jnp.arange(2 * 5 * 2, dtype=jnp.float32).reshape(2, 5, 2) / 100.0
    s = PSSSampler(u=u)
    np.testing.assert_allclose(np.asarray(s.get_1d(None, 0, 3)), u[:, 3, 0])
    a, b = s.get_2d(None, 0, jnp.int32(4))
    np.testing.assert_allclose(np.asarray(a), u[:, 4, 0])
    np.testing.assert_allclose(np.asarray(b), u[:, 4, 1])
    # Out-of-range dims clamp rather than wrap (layout safety).
    np.testing.assert_allclose(np.asarray(s.get_1d(None, 0, 99)), u[:, 4, 0])


def test_mlt_matches_path_cornell():
    """Mean image of MLT vs Path on the Cornell box — the reference's
    +-0.025 CheckSceneAverage-style gate on mean radiance."""
    scene, camera = cornell_box(resolution=(10, 10))
    img_p = np.asarray(
        render(scene, camera, PathIntegrator(max_depth=3), spp=96, seed=1)
    )
    img_m = np.asarray(
        render_mlt(
            scene, camera, max_depth=3, seed=2,
            mutations_per_pixel=192, n_chains=2048,
        )
    )
    mp, mm = img_p.mean(), img_m.mean()
    assert np.all(np.isfinite(img_m))
    assert abs(mp - mm) < 0.03, (mp, mm)
    # Spatial structure must match too, not just the global mean: the bright
    # ceiling-light region and the floor must correlate.
    corr = np.corrcoef(img_p.mean(-1).ravel(), img_m.mean(-1).ravel())[0, 1]
    assert corr > 0.9, corr


def test_mlt_zero_scene():
    """A black scene bootstraps b = 0 and returns a black image instead of
    dividing by zero."""
    from pbrt_tpu.scenes.analytic import furnace_sphere_scene

    scene, camera = furnace_sphere_scene(
        albedo=0.5, intensity=0.0, resolution=(6, 6)
    )
    integ = MLTIntegrator(
        base=PathIntegrator(max_depth=2), n_chains=64,
        mutations_per_chain=4,
    )
    img = np.asarray(integ.render(scene, camera, seed=0))
    assert np.all(np.isfinite(img))
    assert img.max() == 0.0
