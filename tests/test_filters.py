"""Filter family tests (ref: filters.h + FilterSampler)."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import rng
from pbrt_tpu.filters.filters import Filter


def _u2(n, seed=0):
    i = jnp.arange(n, dtype=jnp.int32)
    a, b = rng.uniform_2d(i, 0, 0, seed)
    return jnp.stack([a, b], axis=-1)


def test_filter_samples_within_radius():
    for kind in ("triangle", "gaussian", "mitchell", "lanczos"):
        f = Filter.create(kind)
        fs = f.sample(_u2(8192, 1))
        p = np.asarray(fs.p)
        rx, ry = f.radius
        assert (np.abs(p[:, 0]) <= rx + 1e-4).all(), kind
        assert (np.abs(p[:, 1]) <= ry + 1e-4).all(), kind
        # Symmetric filters: zero-mean offsets.
        assert abs(p.mean()) < 0.05, kind
        w = np.asarray(fs.weight)
        assert np.isfinite(w).all()
        if kind in ("triangle", "gaussian"):
            np.testing.assert_allclose(w, 1.0)
        else:
            # Negative lobes appear with |weight| constant.
            assert (w < 0).any() and (w > 0).any(), kind
            assert np.allclose(np.abs(w), np.abs(w[0]))


def test_filter_weight_normalization():
    """E[weight] ~= 1: a constant radiance field stays unchanged."""
    for kind in ("gaussian", "mitchell", "lanczos"):
        f = Filter.create(kind)
        fs = f.sample(_u2(300_000, 2))
        m = float(np.asarray(fs.weight).mean())
        assert abs(m - 1.0) < 0.02, (kind, m)


def test_render_with_gaussian_filter():
    from pbrt_tpu.models.path import PathIntegrator
    from pbrt_tpu.render import render
    from pbrt_tpu.scenes.cornell import cornell_box

    scene, camera = cornell_box(resolution=(24, 24))
    integ = PathIntegrator(max_depth=3)
    a = np.asarray(render(scene, camera, integ, spp=16, samples_per_pass=4))
    b = np.asarray(
        render(scene, camera, integ, spp=16, samples_per_pass=4,
               filter_kind="gaussian")
    )
    assert np.isfinite(b).all()
    # Same mean energy within MC noise; smoother image (lower local var).
    assert abs(a.mean() - b.mean()) < 0.1 * a.mean()
    def local_var(img):
        d = np.diff(img.mean(-1), axis=0)
        return float((d * d).mean())
    assert local_var(b) < local_var(a) * 1.05
