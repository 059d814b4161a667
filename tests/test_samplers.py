"""Sampler tests: stratification coverage, QMC variance reduction,
determinism. (Ref model: the sampler checks exercised via samplers.h +
lowdiscrepancy tests; pspec-style spectral analysis comes later.)"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.samplers.samplers import Sampler, _sobol_dim0
from pbrt_tpu.samplers.sobol import sobol_bits


def _variance_of_pixel_means(kind, f, spp=16, n_pixels=256, dim=6):
    s = Sampler.create(kind, spp=spp, seed=3)
    pix = jnp.repeat(jnp.arange(n_pixels, dtype=jnp.int32), spp)
    sample = jnp.tile(jnp.arange(spp, dtype=jnp.int32), (n_pixels,))
    u0, u1 = s.get_2d(pix, sample, jnp.int32(dim))
    vals = np.asarray(f(u0, u1)).reshape(n_pixels, spp).mean(axis=1)
    return vals.var(), vals.mean()


def test_sobol_first_dims_are_sobol():
    idx = jnp.arange(8, dtype=jnp.uint32)
    d0 = np.asarray(_sobol_dim0(idx)) / 2.0**32
    d1 = np.asarray(sobol_bits(idx, 1)) / 2.0**32
    # dim 0 via the Joe-Kuo matrices must equal the analytic bit reversal.
    np.testing.assert_array_equal(
        np.asarray(sobol_bits(idx, 0)), np.asarray(_sobol_dim0(idx))
    )
    np.testing.assert_allclose(
        d0, [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875]
    )
    # Straight-binary index convention (no Gray code): x_i = XOR of v_j over
    # set bits of i with v = (0.1, 0.11, 0.101)b — same nets as the Gray-code
    # listing for any power-of-two prefix.
    np.testing.assert_allclose(
        d1, [0.0, 0.5, 0.75, 0.25, 0.625, 0.125, 0.375, 0.875]
    )


def test_all_kinds_uniform_mean():
    for kind in ("independent", "stratified", "sobol"):
        s = Sampler.create(kind, spp=64, seed=1)
        pix = jnp.repeat(jnp.arange(128, dtype=jnp.int32), 64)
        sample = jnp.tile(jnp.arange(64, dtype=jnp.int32), (128,))
        u = np.asarray(s.get_1d(pix, sample, jnp.int32(9)))
        assert 0.0 <= u.min() and u.max() < 1.0, kind
        assert abs(u.mean() - 0.5) < 0.01, (kind, u.mean())


def test_stratified_covers_strata():
    spp = 16
    s = Sampler.create("stratified", spp=spp, seed=0)
    pix = jnp.zeros((spp,), jnp.int32)
    sample = jnp.arange(spp, dtype=jnp.int32)
    u = np.asarray(s.get_1d(pix, sample, jnp.int32(11)))
    strata = np.sort((u * spp).astype(int))
    np.testing.assert_array_equal(strata, np.arange(spp))


def test_sobol_pair_is_stratified():
    """The per-pixel 16-point Sobol' (dim0, dim1) pair must be a (0,m,2)-net:
    exactly one point in EVERY elementary interval of area 1/16."""
    spp = 16
    s = Sampler.create("sobol", spp=spp, seed=5)
    pix = jnp.full((spp,), 37, jnp.int32)
    sample = jnp.arange(spp, dtype=jnp.int32)
    u0, u1 = s.get_2d(pix, sample, jnp.int32(0))
    u0, u1 = np.asarray(u0), np.asarray(u1)
    for kx in range(5):
        nx, ny = 1 << kx, 1 << (4 - kx)
        cells = (u0 * nx).astype(int) * ny + (u1 * ny).astype(int)
        np.testing.assert_array_equal(np.sort(cells), np.arange(16), err_msg=f"{nx}x{ny}")


def test_sobol_high_dims_stratify():
    """Every Sobol' dimension (not just 0/1) is a (0,1)-sequence in base 2:
    the first 32 points land one per 1/32 stratum — the low-discrepancy
    property the round-1 padded sampler lacked above dim 1."""
    spp = 32
    s = Sampler.create("sobol", spp=spp, seed=9)
    pix = jnp.full((spp,), 11, jnp.int32)
    sample = jnp.arange(spp, dtype=jnp.int32)
    for dim in (2, 3, 7, 19, 40, 101, 255):
        u = np.asarray(s.get_1d(pix, sample, jnp.int32(dim)))
        strata = np.sort((u * spp).astype(int))
        np.testing.assert_array_equal(strata, np.arange(spp), err_msg=str(dim))


def test_zsobol_stratifies_and_renders():
    spp = 16
    s = Sampler.create("zsobol", spp=spp, seed=4, nx=64, log2_res=6)
    sample = jnp.arange(spp, dtype=jnp.int32)
    for pixid in (0, 37, 63 * 64 + 5):
        pix = jnp.full((spp,), pixid, jnp.int32)
        u = np.asarray(s.get_1d(pix, sample, jnp.int32(5)))
        strata = np.sort((u * spp).astype(int))
        np.testing.assert_array_equal(strata, np.arange(spp), err_msg=str(pixid))
        u0, u1 = s.get_2d(pix, sample, jnp.int32(3))
        cells = (np.asarray(u0) * 4).astype(int) * 4 + (
            np.asarray(u1) * 4
        ).astype(int)
        np.testing.assert_array_equal(np.sort(cells), np.arange(16))
    # Distinct pixels decorrelate.
    a = np.asarray(s.get_1d(jnp.full((spp,), 1, jnp.int32), sample, jnp.int32(5)))
    b = np.asarray(s.get_1d(jnp.full((spp,), 2, jnp.int32), sample, jnp.int32(5)))
    assert np.abs(a - b).max() > 0.05


def test_qmc_variance_reduction():
    f = lambda a, b: jnp.sin(3 * a) * b + a * a
    v_ind, m_ind = _variance_of_pixel_means("independent", f)
    v_strat, m_strat = _variance_of_pixel_means("stratified", f)
    v_sobol, m_sobol = _variance_of_pixel_means("sobol", f)
    # All unbiased (agree on the mean).
    assert abs(m_ind - m_sobol) < 0.01
    assert abs(m_ind - m_strat) < 0.01
    # QMC/stratified beat independent sampling decisively on a smooth f.
    assert v_sobol < 0.25 * v_ind, (v_sobol, v_ind)
    assert v_strat < 0.5 * v_ind, (v_strat, v_ind)


def test_decorrelated_across_pixels_and_dims():
    s = Sampler.create("sobol", spp=16, seed=0)
    sample = jnp.arange(16, dtype=jnp.int32)
    a, _ = s.get_2d(jnp.full((16,), 1, jnp.int32), sample, jnp.int32(8))
    b, _ = s.get_2d(jnp.full((16,), 2, jnp.int32), sample, jnp.int32(8))
    c, _ = s.get_2d(jnp.full((16,), 1, jnp.int32), sample, jnp.int32(16))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0.05
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0.05


def test_render_with_each_sampler():
    from pbrt_tpu.models.path import PathIntegrator
    from pbrt_tpu.render import render
    from pbrt_tpu.scenes.cornell import cornell_box

    scene, camera = cornell_box(resolution=(16, 16))
    integ = PathIntegrator(max_depth=3)
    means = {}
    for kind in ("independent", "stratified", "sobol", "zsobol", "halton",
                 "padded"):
        img = np.asarray(
            render(scene, camera, integ, spp=16, samples_per_pass=4,
                   sampler_kind=kind)
        )
        assert np.isfinite(img).all(), kind
        means[kind] = img.mean()
    # Same scene: all samplers agree on the mean image value within noise.
    vals = list(means.values())
    assert max(vals) - min(vals) < 0.15 * max(vals), means


def test_halton_sampler():
    # True per-dimension primes: dim 0 -> base 2, dim 1 -> base 3,
    # dim 2 -> base 5 (ref HaltonSampler, samplers.h:53).
    s = Sampler.create("halton", spp=16, seed=2)
    pix = jnp.zeros((16,), jnp.int32)
    sample = jnp.arange(16, dtype=jnp.int32)
    u0 = np.asarray(s.get_1d(pix, sample, jnp.int32(0)))
    u1 = np.asarray(s.get_1d(pix, sample, jnp.int32(1)))
    assert (0 <= u0).all() and (u0 < 1).all()
    assert (0 <= u1).all() and (u1 < 1).all()
    # Base-2 component of 16 consecutive samples is perfectly stratified.
    strata = np.sort((u0 * 16).astype(int))
    np.testing.assert_array_equal(strata, np.arange(16))
    # Base-3 component: each third contains at least 4 of 16.
    thirds = np.bincount((u1 * 3).astype(int), minlength=3)
    assert thirds.min() >= 4
    # Base-5 component: 25 consecutive samples stratify into 5 fifths of 5
    # (the affine digit permutation preserves base-5 stratification).
    s25 = Sampler.create("halton", spp=25, seed=2)
    pix25 = jnp.zeros((25,), jnp.int32)
    sample25 = jnp.arange(25, dtype=jnp.int32)
    u2 = np.asarray(s25.get_1d(pix25, sample25, jnp.int32(2)))
    fifths = np.bincount((u2 * 5).astype(int), minlength=5)
    np.testing.assert_array_equal(fifths, np.full(5, 5))
    # Variance reduction vs independent on a smooth integrand (bases 2/3).
    f = lambda a, b: jnp.sin(3 * a) * b + a * a
    v_h, m_h = _variance_of_pixel_means("halton", f, dim=0)
    v_i, m_i = _variance_of_pixel_means("independent", f, dim=0)
    assert abs(m_h - m_i) < 0.02
    assert v_h < 0.5 * v_i, (v_h, v_i)


def test_pmj02_elementary_intervals():
    """Every generated pmj02 table is a (0,2)-net: each elementary interval
    of area 1/n holds exactly one point (lowdiscrepancy gates of the
    reference's pmj02bn tables)."""
    from pbrt_tpu.samplers.pmj02 import generate_pmj02_table

    n = 1024
    for seed in (0, 5):
        p = generate_pmj02_table(n, seed)
        assert p.shape == (n, 2)
        assert (p >= 0).all() and (p < 1).all()
        k = 10
        for a in range(k + 1):
            b = k - a
            cells = (
                (p[:, 0] * (1 << a)).astype(int) * (1 << b)
                + (p[:, 1] * (1 << b)).astype(int)
            )
            cnt = np.bincount(cells, minlength=n)
            assert (cnt == 1).all(), (a, b)


def test_bluenoise_texture_is_blue():
    """The ranking texture is a permutation with suppressed low-frequency
    energy (void-and-cluster signature)."""
    from pbrt_tpu.samplers.pmj02 import load_tables

    _, bn = load_tables()
    res = bn.shape[0]
    ranks = np.round(bn * res * res - 0.5).astype(int)
    assert sorted(ranks.ravel().tolist()) == list(range(res * res))
    # Thresholded mask's spectrum: low-frequency rings weaker than mid.
    mask = (bn < 0.5).astype(np.float64) - 0.5
    f = np.abs(np.fft.fftshift(np.fft.fft2(mask)))
    c = res // 2
    yy, xx = np.mgrid[0:res, 0:res]
    rad = np.sqrt((yy - c) ** 2 + (xx - c) ** 2)
    low = f[(rad > 0.5) & (rad < res * 0.1)].mean()
    mid = f[(rad > res * 0.25) & (rad < res * 0.45)].mean()
    assert mid > 1.5 * low, (low, mid)


def test_pmj02bn_sampler_kind():
    """The pmj02bn sampler: valid range, pixel decorrelation, and a
    variance win over independent sampling on a smooth integrand."""
    s = Sampler.create("pmj02bn", spp=16, seed=1, nx=64)
    pix = jnp.zeros((16,), jnp.int32)
    sidx = jnp.arange(16, dtype=jnp.int32)
    u0, u1 = s.get_2d(pix, sidx, 3)
    u0 = np.asarray(u0); u1 = np.asarray(u1)
    assert (u0 >= 0).all() and (u0 < 1).all()
    assert (u1 >= 0).all() and (u1 < 1).all()
    assert len(np.unique(np.round(u0 * 1e6))) > 12  # distinct samples
    # Smooth-integrand variance: mean of f(u) = u0*u1 over 16 samples,
    # across many pixels; pmj02bn stratification beats independent.
    npx = 256
    pixg = jnp.repeat(jnp.arange(npx, dtype=jnp.int32), 16)
    sg = jnp.tile(jnp.arange(16, dtype=jnp.int32), (npx,))
    est = {}
    for kind in ("pmj02bn", "independent"):
        sk = Sampler.create(kind, spp=16, seed=2, nx=16)
        a, b = sk.get_2d(pixg, sg, 5)
        f = (np.asarray(a) * np.asarray(b)).reshape(npx, 16).mean(1)
        est[kind] = f.var()
    assert est["pmj02bn"] < 0.5 * est["independent"], est
