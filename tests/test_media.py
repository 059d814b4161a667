"""Volumetric transport tests.

Analytic gates modeled on the reference's test strategy: homogeneous-slab
Beer-Lambert attenuation, phase-function chi-square-lite checks, grid
trilinear lookup, majorant conservativeness, cloud render smoke.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import rng, spectrum
from pbrt_tpu.media import phase as ph
from pbrt_tpu.media.medium import MediumBuffers
from pbrt_tpu.models.volpath import VolPathIntegrator
from pbrt_tpu.render import camera_rays
from pbrt_tpu.scenes.cloud import cloud_scene, fog_box_scene


def _u2(n, seed=0):
    i = jnp.arange(n, dtype=jnp.int32)
    a, b = rng.uniform_2d(i, 0, 0, seed)
    return jnp.stack([a, b], axis=-1)


def test_hg_sample_pdf_consistency():
    n = 100_000
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    for g in (-0.5, 0.0, 0.6):
        wi, pdf = ph.hg_sample(wo, _u2(n, seed=int(g * 10) + 7), g)
        pdf2 = ph.hg_pdf(wo, wi, g)
        np.testing.assert_allclose(
            np.asarray(pdf), np.asarray(pdf2), rtol=1e-4
        )
        # Mean cosine relative to the *forward* direction (-wo) equals g.
        mean_cos = float(jnp.mean(jnp.sum(wi * (-wo), axis=-1)))
        assert abs(mean_cos - g) < 0.01, (g, mean_cos)
        # pdf normalizes: E[1/pdf] over sampled dirs = 4pi... instead check
        # E[f/pdf] = 1 with f = pdf (trivially); use histogram mass instead:
        assert np.isfinite(np.asarray(pdf)).all()


def test_hg_pdf_normalizes():
    # Quadrature over the sphere.
    nt, np_ = 256, 64
    theta = (np.arange(nt) + 0.5) / nt * np.pi
    phi = (np.arange(np_) + 0.5) / np_ * 2 * np.pi
    tg, pg = np.meshgrid(theta, phi, indexing="ij")
    wi = jnp.asarray(
        np.stack(
            [np.sin(tg) * np.cos(pg), np.sin(tg) * np.sin(pg), np.cos(tg)], -1
        ).reshape(-1, 3),
        jnp.float32,
    )
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (wi.shape[0], 3))
    for g in (-0.7, 0.0, 0.4):
        p = np.asarray(ph.hg_pdf(wo, wi, g)).reshape(nt, np_)
        integral = (p * np.sin(tg)).sum() * (np.pi / nt) * (2 * np.pi / np_)
        assert abs(integral - 1.0) < 0.01, (g, integral)


def test_grid_density_trilinear():
    dens = np.zeros((4, 4, 4), np.float32)
    dens[2, 1, 1] = 2.0
    med = MediumBuffers.grid(
        density=dens,
        sigma_a_rgb=(1, 1, 1),
        sigma_s_rgb=(0, 0, 0),
        bounds_lo=(0, 0, 0),
        bounds_hi=(1, 1, 1),
        maj_res=2,
    )
    # Voxel (z=2, y=1, x=1) center is at ((1+.5)/4, (1+.5)/4, (2+.5)/4).
    p = jnp.asarray([[0.375, 0.375, 0.625]])
    np.testing.assert_allclose(float(med.density_at(p)[0]), 2.0, rtol=1e-5)
    # Halfway toward a zero neighbor: half the value.
    p2 = jnp.asarray([[0.375, 0.375, 0.5]])
    np.testing.assert_allclose(float(med.density_at(p2)[0]), 1.0, rtol=1e-4)
    # Outside the bounds: zero.
    assert float(med.density_at(jnp.asarray([[1.5, 0.5, 0.5]]))[0]) == 0.0
    # Majorant grid is conservative everywhere.
    assert float(med.maj_grid.max()) >= 2.0
    assert float(med.max_density) == 2.0


def test_majorant_bounds_sigma():
    med = MediumBuffers.homogeneous(
        sigma_a_rgb=(0.5, 1.0, 0.2), sigma_s_rgb=(1.0, 0.3, 0.8),
        bounds_lo=(0, 0, 0), bounds_hi=(1, 1, 1),
    )
    wl = spectrum.sample_uniform_hero(jnp.linspace(0.0, 0.99, 32))
    sa, ss = med.sigma_base(wl.lam)
    smaj = med.sigma_majorant(wl.lam)
    assert np.all(np.asarray(sa + ss) <= np.asarray(smaj)[:, None] + 1e-5)


def test_beer_lambert_homogeneous():
    """Emissive wall behind an absorbing slab: L = Le * exp(-sigma_t)."""
    def run(sa, ss, max_depth, spp=32):
        scene, camera = fog_box_scene(sigma_a=sa, sigma_s=ss, le_scale=5.0)
        integ = VolPathIntegrator(max_depth=max_depth, rr_start_depth=100,
                                  use_nee=False)
        nx, ny = camera.resolution
        npix = nx * ny
        # One batched trace over all samples (keeps CPU test time sane).
        pixel = jnp.tile(jnp.arange(npix, dtype=jnp.int32), (spp,))
        sample = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), npix)
        o, d, wl = camera_rays(camera, pixel, sample, jnp.int32(0))
        L = integ.trace(scene, o, d, wl, pixel, sample, jnp.int32(0))
        return float(jnp.mean(L))

    # Absorption only: exact Beer-Lambert (small fov -> path length ~ 1).
    got = run(1.0, 0.0, max_depth=3)
    expected = 5.0 * np.exp(-1.0)
    assert abs(got - expected) / expected < 0.06, (got, expected)
    # Absorb+scatter with single-segment transport (max_depth=1 kills the
    # scattered continuation): attenuation uses the full sigma_t.
    got_t = run(0.5, 0.5, max_depth=1)
    assert abs(got_t - expected) / expected < 0.06, (got_t, expected)
    # With bounces allowed, in-scattering ADDS radiance over Beer-Lambert
    # (the big light fills much of the scattered hemisphere) but cannot
    # exceed the unattenuated source.
    got_s = run(0.5, 0.5, max_depth=4)
    assert expected < got_s < 5.0, (got_s, expected)


def test_scattering_conserves_energy_vs_absorption():
    """With NEE on, a scattering slab in front of a big light keeps more
    total energy than a purely absorbing slab of equal sigma_t."""
    scene_a, camera = fog_box_scene(sigma_a=1.0, sigma_s=0.0)
    scene_s, _ = fog_box_scene(sigma_a=0.0, sigma_s=1.0)
    integ = VolPathIntegrator(max_depth=6, rr_start_depth=100)
    nx, ny = camera.resolution
    npix = nx * ny
    spp = 16
    pixel = jnp.tile(jnp.arange(npix, dtype=jnp.int32), (spp,))
    sample = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), npix)

    def run(scene):
        o, d, wl = camera_rays(camera, pixel, sample, jnp.int32(1))
        L = integ.trace(scene, o, d, wl, pixel, sample, jnp.int32(1))
        return float(jnp.mean(L))

    l_abs = run(scene_a)
    l_scat = run(scene_s)
    assert l_scat > l_abs * 1.3, (l_abs, l_scat)
    # Scattering cannot create energy: stays below the unoccluded radiance.
    assert l_scat < 5.0 * 1.02, l_scat


def test_cloud_render_smoke():
    from pbrt_tpu.render import render

    scene, camera = cloud_scene(resolution=(32, 32))
    integ = VolPathIntegrator(max_depth=5, max_null_steps=48, max_tr_steps=48)
    img = np.asarray(render(scene, camera, integ, spp=4, samples_per_pass=2))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
    # The cloud region (center) should differ from the sky background.
    center = img[10:20, 12:20].mean()
    corner = img[0:5, 0:5].mean()
    assert abs(center - corner) > 0.01
