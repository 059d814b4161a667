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
    # Absorb+scatter at max_depth=1: the reference's depth semantics (and
    # ours, via the terminal emission tier) still see source emission after
    # ONE scatter event, so the result sits strictly between pure
    # Beer-Lambert and the unattenuated source.
    got_t = run(0.5, 0.5, max_depth=1)
    assert expected < got_t < 5.0, (got_t, expected)
    # And it must exceed pure-absorption attenuation only mildly at a
    # single bounce (sanity bound against double counting).
    assert got_t < expected * 1.5, (got_t, expected)
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


def _slab_medium(sigma=4.0, mres=8):
    """Empty corridor [0, 0.9) then a dense slab [0.9, 1.0) along x."""
    nz = ny = 4
    nxv = 64
    dens = np.zeros((nz, ny, nxv), np.float32)
    dens[:, :, int(0.9 * nxv):] = 1.0
    return MediumBuffers.grid(
        dens, sigma_a_rgb=(sigma, sigma, sigma), sigma_s_rgb=(0, 0, 0),
        bounds_lo=(0, 0, 0), bounds_hi=(1, 1, 1), maj_res=mres,
    )


def test_dda_majorant_local_lookup():
    med = _slab_medium()
    lam_base = jnp.ones((3,))
    # Empty corridor cells: local majorant 0; slab cells: > 0.
    p = jnp.asarray([[0.3, 0.5, 0.5], [0.97, 0.5, 0.5], [2.0, 0.5, 0.5]])
    m = np.asarray(med.majorant_local(p, lam_base))
    assert m[0] == 0.0 or m[0] < 1e-6 * m[1]  # corridor (dilation margin)
    assert m[1] > 0.5
    assert m[2] == 0.0  # outside the bounds: vacuum
    # Cell exits advance monotonically along +x.
    o = jnp.asarray([[-0.5, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    t = jnp.asarray([0.6])  # inside the grid (x = 0.1)
    te = float(med.cell_exit_t(o, d, t)[0])
    assert te > 0.6 and te < 1.6


def test_dda_skips_empty_space_where_global_truncates():
    """The VERDICT media-tier gate: a thin dense slab behind a long empty
    corridor. With a tight step budget the global-majorant walk burns every
    step on null collisions in the vacuum and never reaches the slab (tr
    stays ~1 — silently wrong); the DDA walk crosses empty cells in single
    steps and recovers the analytic Beer-Lambert transmittance."""
    from pbrt_tpu.core import spectrum as spec

    sigma = 60.0
    med = _slab_medium(sigma=sigma)
    n = 64
    o = jnp.tile(jnp.asarray([[-0.001, 0.5, 0.5]]), (n, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    wl = spec.sample_visible(jnp.full((n,), 0.4))
    pixel = jnp.arange(n, dtype=jnp.int32)

    import types

    class _S:
        pass

    scene = types.SimpleNamespace(medium=med)

    def tr_mean(use_dda, budget):
        integ = VolPathIntegrator(
            max_tr_steps=budget, use_dda=use_dda, differentiable=False
        )
        # Occlusion-free straight-line transmittance through the medium:
        # call the internal walk with no geometry by faking any_hit via a
        # scene that has an empty accel — use the real scene helper instead.
        from pbrt_tpu.scene import Scene
        from pbrt_tpu.shapes.geometry import GeometryBuffers
        from pbrt_tpu.materials.buffers import MaterialBuffers
        from pbrt_tpu.lights.buffers import LightBuffers

        sc = Scene(
            geom=GeometryBuffers.build(),
            materials=MaterialBuffers.build(
                [{"kind": 0, "albedo": (0.5, 0.5, 0.5)}]
            ),
            lights=LightBuffers.build(),
            medium=med,
        )
        from pbrt_tpu.samplers.samplers import as_sampler

        tr = integ._transmittance(
            sc, o, d, jnp.full((n,), 1.5), wl.lam, pixel, jnp.int32(0),
            as_sampler(7), 100,
        )
        return float(np.asarray(tr).mean())

    # Analytic: slab thickness 0.1, density 1 => tr = exp(-sigma_t * 0.1).
    sa, _ = med.sigma_base(wl.lam)
    want = float(np.asarray(jnp.exp(-sa * 0.1)).mean())
    got_dda = tr_mean(True, 24)
    got_glob = tr_mean(False, 24)
    assert abs(got_dda - want) < 0.05, (got_dda, want)
    # The global walk's expected step count to REACH the slab is
    # ~sigma_majorant * 0.9 ≈ 54 > 24, so it reports ~1.0.
    assert got_glob > want + 0.3, (got_glob, want)


def test_dda_consistent_with_global_on_cloud():
    """At a generous step budget both walks are unbiased estimators of the
    same image: cloud-scene means agree."""
    from pbrt_tpu.render import render

    scene, camera = cloud_scene(resolution=(16, 16))
    img_a = np.asarray(render(
        scene, camera, VolPathIntegrator(max_depth=3, use_dda=True),
        spp=16, samples_per_pass=4, seed=3,
    ))
    img_b = np.asarray(render(
        scene, camera, VolPathIntegrator(max_depth=3, use_dda=False),
        spp=16, samples_per_pass=4, seed=4,
    ))
    assert np.isfinite(img_a).all() and np.isfinite(img_b).all()
    ma, mb = img_a.mean(), img_b.mean()
    assert abs(ma - mb) < 0.1 * max(ma, mb), (ma, mb)


def test_rgbgrid_matches_homogeneous_fit():
    """A constant-RGB rgbgrid medium must reproduce the homogeneous medium's
    fitted sigma spectra at interior points, and delta tracking through it
    must Beer-Lambert-attenuate chromatically."""
    rgb_a = (5.0, 1.0, 0.2)
    nz = ny = nxv = 8
    sa_grid = np.broadcast_to(
        np.asarray(rgb_a, np.float32), (nz, ny, nxv, 3)
    )
    ss_grid = np.zeros((nz, ny, nxv, 3), np.float32)
    med = MediumBuffers.rgbgrid(
        sa_grid, ss_grid, bounds_lo=(0, 0, 0), bounds_hi=(1, 1, 1),
    )
    hom = MediumBuffers.homogeneous(
        rgb_a, (0, 0, 0), bounds_lo=(0, 0, 0), bounds_hi=(1, 1, 1)
    )
    wl = spectrum.sample_visible(jnp.full((4,), 0.3))
    p = jnp.asarray([[0.5, 0.5, 0.5], [0.25, 0.5, 0.75],
                     [0.5, 0.25, 0.25], [0.9, 0.9, 0.9]])
    sa_r, ss_r = med.sigma_at(p, wl.lam)
    sa_h, _ = hom.sigma_base(wl.lam)
    np.testing.assert_allclose(np.asarray(sa_r), np.asarray(sa_h),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(ss_r), 0.0, atol=1e-5)
    # Majorant conservative over sampled wavelengths.
    maj = float(med.max_density)
    assert maj >= float(jnp.max(sa_r)) - 1e-4
    # Outside: vacuum.
    sa_o, _ = med.sigma_at(jnp.asarray([[2.0, 0.5, 0.5]]), wl.lam[:1])
    np.testing.assert_allclose(np.asarray(sa_o), 0.0, atol=1e-6)


def test_rgbgrid_chromatic_transmittance_render():
    """Delta-tracked transmittance through an rgbgrid slab is chromatic:
    red-absorbing medium passes blue. Monte Carlo vs analytic per channel."""
    from pbrt_tpu.samplers.samplers import as_sampler
    from pbrt_tpu.scene import Scene
    from pbrt_tpu.shapes.geometry import GeometryBuffers
    from pbrt_tpu.materials.buffers import MaterialBuffers
    from pbrt_tpu.lights.buffers import LightBuffers
    from pbrt_tpu.films.rgb import spectrum_to_rgb

    rgb_a = (8.0, 2.0, 0.2)
    sa_grid = np.broadcast_to(np.asarray(rgb_a, np.float32), (4, 4, 4, 3))
    med = MediumBuffers.rgbgrid(
        sa_grid, np.zeros((4, 4, 4, 3), np.float32),
        bounds_lo=(0, 0, 0), bounds_hi=(1, 1, 1),
    )
    sc = Scene(
        geom=GeometryBuffers.build(),
        materials=MaterialBuffers.build([{"kind": 0, "albedo": (0.5,) * 3}]),
        lights=LightBuffers.build(),
        medium=med,
    )
    n = 512
    o = jnp.tile(jnp.asarray([[-0.5, 0.5, 0.5]]), (n, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    u = (jnp.arange(n) + 0.5) / n
    wl = spectrum.sample_visible(u)
    integ = VolPathIntegrator(max_tr_steps=96)
    tr = integ._transmittance(
        sc, o, d, jnp.full((n,), 5.0), wl.lam, jnp.arange(n, dtype=jnp.int32),
        jnp.int32(0), as_sampler(11), 50,
    )
    got = np.asarray(spectrum_to_rgb(tr, wl)).mean(0)
    sa_h, _ = med.sigma_at(
        jnp.tile(jnp.asarray([[0.5, 0.5, 0.5]]), (n, 1)), wl.lam
    )
    want = np.asarray(spectrum_to_rgb(jnp.exp(-sa_h), wl)).mean(0)
    np.testing.assert_allclose(got, want, atol=0.05)
    assert got[2] > got[0] + 0.2  # blue passes, red blocked


def test_cloud_medium(tmp_path):
    """Procedural CloudMedium (media.h:430): density in [0, 1], varies in
    space, falls off with altitude; renders finite through volpath."""
    import jax.numpy as jnp

    from pbrt_tpu.media.medium import MediumBuffers

    med = MediumBuffers.cloud(
        (0.2, 0.2, 0.2), (0.8, 0.8, 0.8), (-1, 0, -1), (1, 2, 1),
        density=1.0, wispiness=1.0, frequency=5.0,
    )
    rng = np.random.default_rng(0)
    p = jnp.asarray(
        rng.uniform(-1, 1, (512, 3)) * [1, 0, 1] + [0, 0, 0]
        + rng.uniform(0, 2, (512, 3)) * [0, 1, 0], jnp.float32
    )
    d = np.asarray(med.density_at(p))
    assert (d >= 0).all() and (d <= 1).all()
    assert d.std() > 0.01  # spatial variation
    # Low altitude (y < 0.5 in medium space => y < 1 world) is denser on
    # average than cloud tops.
    y = np.asarray(p[:, 1])
    assert d[y < 0.6].mean() > d[y > 1.6].mean()
    # Outside the bounds: zero.
    p_out = jnp.asarray([[0.0, 5.0, 0.0], [3.0, 1.0, 0.0]], jnp.float32)
    assert np.asarray(med.density_at(p_out)).max() == 0.0
    # Parser binding + a tiny render.
    scene_file = tmp_path / "cloud.pbrt"
    scene_file.write_text(
        'Integrator "volpath" "integer maxdepth" 4\n'
        'Film "rgb" "integer xresolution" 6 "integer yresolution" 6\n'
        "LookAt 0 1 -4  0 1 0  0 1 0\n"
        'Camera "perspective" "float fov" 40\n'
        "WorldBegin\n"
        'MakeNamedMedium "sky" "string type" "cloud" '
        '"rgb sigma_a" [0.1 0.1 0.1] "rgb sigma_s" [1 1 1] '
        '"point3 p0" [-1 0 -1] "point3 p1" [1 2 1]\n'
        'MediumInterface "sky" ""\n'
        'AttributeBegin\n'
        '  AreaLightSource "diffuse" "rgb L" [8 8 8]\n'
        '  Shape "trianglemesh" "point3 P" [-3 -3 3  3 -3 3  3 3 3  -3 3 3] '
        '"integer indices" [0 2 1 0 3 2]\n'
        "AttributeEnd\n"
    )
    from pbrt_tpu.io.parser import load_pbrt
    from pbrt_tpu.render import render

    scene, camera, settings = load_pbrt(str(scene_file))
    assert scene.medium is not None and scene.medium.kind == "cloud"
    img = np.asarray(render(
        scene, camera, settings["integrator"], spp=8, samples_per_pass=4
    ))
    assert np.isfinite(img).all() and img.mean() > 0
