"""Film tests: GBuffer AOVs, spectral buckets, custom pixel sensor.

Reference model: film.h GBufferFilm/SpectralFilm/PixelSensor semantics.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import cie, spectrum
from pbrt_tpu.films.gbuffer import render_aovs, spectral_basis_compress
from pbrt_tpu.films.sensor import PixelSensor
from pbrt_tpu.models.path import PathIntegrator
from pbrt_tpu.scenes.cornell import cornell_box


def test_gbuffer_aovs():
    scene, camera = cornell_box(resolution=(24, 24))
    aovs = render_aovs(
        scene, camera, PathIntegrator(max_depth=3), spp=2, spectral_buckets=8
    )
    assert aovs["rgb"].shape == (24, 24, 3)
    assert aovs["p"].shape == (24, 24, 3)
    assert aovs["n"].shape == (24, 24, 3)
    assert aovs["spectral"].shape == (24, 24, 8)
    # Interior rays hit the (front-open) box; border rays may slip past.
    np.testing.assert_allclose(aovs["valid"][4:-4, 4:-4], 1.0)
    # Depth is positive and bounded where rays hit.
    inner = aovs["depth"][4:-4, 4:-4]
    assert (inner > 0.2).all() and (inner < 4.0).all()
    # Normals are unit-ish in the interior (borders average with misses).
    nlen = np.linalg.norm(aovs["n"], axis=-1)[4:-4, 4:-4]
    assert (nlen > 0.5).all() and (nlen < 1.001).all()
    # Left third sees the red material id (1), right third green (2).
    assert 1.0 in aovs["material_id"][8:16, 4:8]
    assert 2.0 in aovs["material_id"][8:16, -8:-4]
    # Albedo AOV on a red-wall pixel is red-dominant.
    ys, xs = np.nonzero(aovs["material_id"][:, :8] == 1.0)
    a = aovs["albedo_rgb"][ys[0], xs[0]]
    assert a[0] > a[1] and a[0] > a[2]
    # Spectral buckets sum ~ to total radiance scale (nonnegative).
    assert (aovs["spectral"] >= -1e-4).all()
    assert aovs["spectral"].sum() > 0


def test_spectral_basis_compression():
    r = np.random.default_rng(0)
    # Low-rank spectral image + noise.
    basis_true = r.normal(size=(3, 16))
    coeffs_true = r.uniform(0, 1, size=(16, 16, 3))
    img = coeffs_true @ basis_true
    coeffs, basis = spectral_basis_compress(img, n_basis=3)
    rec = coeffs @ basis
    np.testing.assert_allclose(rec, img, atol=1e-4)


def test_xyz_sensor_matches_spectrum_to_rgb():
    from pbrt_tpu.films.rgb import spectrum_to_rgb

    wl = spectrum.sample_uniform_hero(jnp.linspace(0, 0.99, 64))
    vals = jnp.ones_like(wl.lam) * 0.7
    sensor = PixelSensor.xyz()
    a = np.asarray(sensor.to_sensor_rgb(vals, wl))
    b = np.asarray(spectrum_to_rgb(vals, wl))
    np.testing.assert_allclose(a, b, rtol=0.02, atol=0.005)


def test_custom_sensor_white_normalization():
    # A sensor built from the CIE curves themselves reproduces the XYZ path.
    lam = np.linspace(cie.LAMBDA_MIN, cie.LAMBDA_MAX, 96)
    cmf = cie.cie_xyz_np(lam)
    sensor = PixelSensor.from_curves(lam, cmf[:, 0], cmf[:, 1], cmf[:, 2])
    wl = spectrum.sample_uniform_hero(jnp.linspace(0, 0.99, 128))
    # A D65-shaped unit-luminance spectrum maps near RGB (1,1,1).
    d65 = cie.illuminant_d65(wl.lam) / 100.0
    rgb = np.asarray(sensor.to_sensor_rgb(d65, wl))
    scale = rgb.mean()
    np.testing.assert_allclose(rgb / scale, 1.0, atol=0.06)


def test_checkpoint_resume(tmp_path):
    """Interrupted render resumed from checkpoint == uninterrupted render."""
    from pbrt_tpu.films.checkpoint import load_checkpoint, render_resumable
    from pbrt_tpu.render import render_chunked

    scene, camera = cornell_box(resolution=(12, 12))
    integ = PathIntegrator(max_depth=2)
    ck = str(tmp_path / "film.npz")

    # Run the first half only (simulate a kill after 8 of 16 spp).
    import pbrt_tpu.films.checkpoint as ckpt

    try:
        orig = ckpt.save_checkpoint
        calls = {"n": 0}

        def killing_save(path, rgb_sum, spp_done, total_spp, seed):
            orig(path, rgb_sum, spp_done, total_spp, seed)
            calls["n"] += 1
            if calls["n"] == 1:
                raise KeyboardInterrupt

        ckpt.save_checkpoint = killing_save
        try:
            render_resumable(scene, camera, integ, spp=16,
                             checkpoint_path=ck, chunk_spp=8,
                             samples_per_pass=4)
            assert False, "expected interrupt"
        except KeyboardInterrupt:
            pass
    finally:
        ckpt.save_checkpoint = orig

    _, done, total, _ = load_checkpoint(ck)
    assert done == 8 and total == 16
    resumed = np.asarray(
        render_resumable(scene, camera, integ, spp=16, checkpoint_path=ck,
                         chunk_spp=8, samples_per_pass=4)
    )
    direct = np.asarray(
        render_chunked(scene, camera, integ, spp=16, chunk_spp=8,
                       samples_per_pass=4)
    )
    np.testing.assert_allclose(resumed, direct, atol=1e-6)
