"""Light-path integrator: adjoint transport must match forward path tracing.

The strongest unbiasedness check available: two completely different
estimators (eye paths with NEE vs light paths with camera splats) must
converge to the same image.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.models.lightpath import render_lightpath
from pbrt_tpu.models.path import PathIntegrator
from pbrt_tpu.render import render
from pbrt_tpu.scenes.cornell import cornell_box


def test_lightpath_matches_forward():
    res = 16
    scene, camera = cornell_box(resolution=(res, res))
    fwd = np.asarray(
        render(scene, camera, PathIntegrator(max_depth=4), spp=64,
               samples_per_pass=8, sampler_kind="sobol")
    )
    lp = np.asarray(
        render_lightpath(scene, camera, n_paths_total=1 << 19,
                         max_depth=4, paths_per_pass=1 << 16)
    )
    assert np.isfinite(lp).all()
    assert (lp >= 0).all()
    # Global energy agreement.
    assert abs(lp.mean() - fwd.mean()) < 0.12 * fwd.mean(), (
        lp.mean(), fwd.mean()
    )
    # Block-wise agreement (light tracing is noisy per pixel; compare 4x4
    # block means).
    fb = fwd.reshape(4, 4, 4, 4, 3).mean(axis=(1, 3))
    lb = lp.reshape(4, 4, 4, 4, 3).mean(axis=(1, 3))
    rel = np.abs(fb - lb) / np.maximum(fb, 0.05)
    assert np.median(rel) < 0.25, np.median(rel)
