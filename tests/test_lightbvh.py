"""Light-BVH sampler gates.

Mirrors /root/reference/src/pbrt/lightsamplers_test.cpp: the sampler's PMF
must match brute-force empirical sampling frequencies, and the BVH must beat
the power sampler on many-light MSE at equal spp.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.lights import bvh as light_bvh
from pbrt_tpu.lights.buffers import LightBuffers


def _grid_lights(n_side=8, seed=0):
    r = np.random.default_rng(seed)
    specs = []
    for i in range(n_side):
        for j in range(n_side):
            x, z = i * 2.0, j * 2.0
            s = 0.4
            v = np.array(
                [[x - s, 4.0, z - s], [x + s, 4.0, z - s], [x, 4.0, z + s]],
                np.float32,
            )
            specs.append(
                {"verts": v, "rgb": (1, 1, 1),
                 "scale": float(r.uniform(0.2, 8.0))}
            )
    return LightBuffers.build(area_tris=specs, sampler="bvh")


def test_pmf_matches_sample_frequencies():
    """Empirical selection frequencies over many u draws vs pmf(), at a few
    shading points (lightsamplers_test.cpp methodology)."""
    lights = _grid_lights(6)
    bvh = lights.bvh
    nl = bvh.n_lights
    pts = jnp.asarray(
        [[3.0, 0.0, 3.0], [11.0, 1.0, 0.0], [0.0, 2.0, 11.0]], jnp.float32
    )
    nrm = jnp.asarray([[0, 1, 0], [0, 1, 0], [0, 1, 0]], jnp.float32)
    m = 20000
    for k in range(pts.shape[0]):
        p = jnp.broadcast_to(pts[k], (m, 3))
        n = jnp.broadcast_to(nrm[k], (m, 3))
        u = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m
        li, pm = light_bvh.sample(bvh, p, n, u)
        li = np.asarray(li)
        pm = np.asarray(pm)
        assert (li >= 0).all()
        freq = np.bincount(li, minlength=nl) / m
        pmf_q = np.asarray(
            light_bvh.pmf(
                bvh,
                jnp.broadcast_to(pts[k], (nl, 3)),
                jnp.broadcast_to(nrm[k], (nl, 3)),
                jnp.arange(nl, dtype=jnp.int32),
            )
        )
        # PMF sums to 1 and matches frequencies.
        assert abs(pmf_q.sum() - 1.0) < 1e-3, pmf_q.sum()
        err = np.abs(freq - pmf_q)
        assert err.max() < 0.01, err.max()
        # And the pmf returned by sample() agrees with pmf() per light.
        pm_q = pmf_q[li]
        assert np.abs(pm - pm_q).max() < 1e-3


def test_importance_prefers_near_lights():
    """A shading point directly under one corner of the grid must select
    nearby lights far more often than the opposite corner's."""
    lights = _grid_lights(8, seed=3)
    bvh = lights.bvh
    m = 8000
    p = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0]), (m, 3))
    n = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (m, 3))
    u = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m
    li, _ = light_bvh.sample(bvh, p, n, u)
    li = np.asarray(li)
    # Light (i, j) has index i*8+j; near corner = (0, 0), far = (7, 7).
    near = (li < 16).mean()
    far = (li >= 48).mean()
    assert near > 3.0 * max(far, 1e-3), (near, far)


def test_bvh_beats_power_on_manylight_mse():
    """Equal-spp MSE vs a high-spp reference: BVH < power sampler
    (the many-light value proposition; BASELINE config 3)."""
    from pbrt_tpu.models.path import PathIntegrator
    from pbrt_tpu.render import render
    from pbrt_tpu.scenes.manylight import manylight_scene

    res = (48, 48)
    integ = PathIntegrator(max_depth=2)
    sc_p, cam = manylight_scene(resolution=res, n_lights=64, seed=7,
                                sampler="power")
    sc_b, _ = manylight_scene(resolution=res, n_lights=64, seed=7,
                              sampler="bvh")
    ref = np.asarray(render(sc_b, cam, integ, spp=96, seed=11))
    img_p = np.asarray(render(sc_p, cam, integ, spp=8, seed=1))
    img_b = np.asarray(render(sc_b, cam, integ, spp=8, seed=1))
    mse_p = float(np.mean((img_p - ref) ** 2))
    mse_b = float(np.mean((img_b - ref) ** 2))
    # Unbiasedness: means agree.
    assert abs(img_b.mean() - ref.mean()) < 0.06 * max(ref.mean(), 1e-6)
    assert mse_b < mse_p, (mse_b, mse_p)


def _grid_lights_exh(n_side=6, seed=0):
    r = np.random.default_rng(seed)
    specs = []
    for i in range(n_side):
        for j in range(n_side):
            x, z = i * 2.0, j * 2.0
            s = 0.4
            v = np.array(
                [[x - s, 4.0, z - s], [x + s, 4.0, z - s], [x, 4.0, z + s]],
                np.float32,
            )
            specs.append(
                {"verts": v, "rgb": (1, 1, 1),
                 "scale": float(r.uniform(0.2, 8.0))}
            )
    return specs


def test_exhaustive_sampler_frequencies_match_pmf():
    """ExhaustiveLightSampler (base/lightsampler.h:29): empirical selection
    frequencies over stratified u draws match selection_pmf exactly-ish."""
    specs = _grid_lights_exh(5)
    lights = LightBuffers.build(area_tris=specs, sampler="exhaustive")
    assert lights.exh_recs is not None
    nl = lights.n_lights
    m = 20000
    p0 = jnp.asarray([3.0, 0.0, 3.0], jnp.float32)
    n0 = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    p = jnp.broadcast_to(p0, (m, 3))
    n = jnp.broadcast_to(n0, (m, 3))
    u = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m
    li, pm = lights.select(p, n, u)
    li, pm = np.asarray(li), np.asarray(pm)
    assert (li >= 0).all()
    freq = np.bincount(li, minlength=nl) / m
    pmf_q = np.asarray(
        lights.selection_pmf(
            jnp.arange(nl, dtype=jnp.int32),
            p_ref=jnp.broadcast_to(p0, (nl, 3)),
            n_ref=jnp.broadcast_to(n0, (nl, 3)),
        )
    )
    np.testing.assert_allclose(pmf_q.sum(), 1.0, atol=1e-3)
    np.testing.assert_allclose(freq, pmf_q, atol=2e-3)
    # Reported sampling pmf agrees with the queried pmf per pick.
    np.testing.assert_allclose(pm, pmf_q[li], rtol=1e-4, atol=1e-6)


def test_bvh_pmf_tracks_exhaustive_oracle():
    """The BVH sampler's PMF approximates the exhaustive oracle: positive
    wherever the oracle is positive, and within a bounded distortion factor
    (the BVH replaces per-light importance with cluster importances along
    the descent — exactness is not expected, bounded error is)."""
    specs = _grid_lights_exh(5)
    l_exh = LightBuffers.build(area_tris=specs, sampler="exhaustive")
    l_bvh = LightBuffers.build(area_tris=specs, sampler="bvh")
    nl = l_exh.n_lights
    for pt in ([3.0, 0.0, 3.0], [9.0, 1.0, 1.0]):
        p = jnp.broadcast_to(jnp.asarray(pt, jnp.float32), (nl, 3))
        n = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (nl, 3))
        idx = jnp.arange(nl, dtype=jnp.int32)
        pe = np.asarray(l_exh.selection_pmf(idx, p_ref=p, n_ref=n))
        pb = np.asarray(l_bvh.selection_pmf(idx, p_ref=p, n_ref=n))
        np.testing.assert_allclose(pb.sum(), 1.0, atol=1e-3)
        mask = pe > 1e-6
        assert (pb[mask] > 0).all()
        ratio = pb[mask] / pe[mask]
        # Bounded distortion: no light under- or over-sampled by > 8x.
        assert ratio.max() < 8.0 and ratio.min() > 1.0 / 8.0, (
            ratio.min(), ratio.max()
        )
