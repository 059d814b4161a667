"""Foundation tests: CIE data, color spaces, RGB->spectrum round trips.

Modeled on the reference's spectrum_test.cpp / color_test.cpp strategy
(SURVEY.md section 4, item 7): consistency and round-trip checks rather than
golden values.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import cie, colorspace, rgb2spec, spectrum


def test_cie_fit_shapes():
    lam = jnp.linspace(360.0, 830.0, 471)
    x, y, z = cie.cie_x(lam), cie.cie_y(lam), cie.cie_z(lam)
    # Peaks near the canonical maxima of the 1931 observer.
    assert abs(float(lam[jnp.argmax(x)]) - 599.0) < 6.0
    assert abs(float(lam[jnp.argmax(y)]) - 555.0) < 15.0
    assert abs(float(lam[jnp.argmax(z)]) - 446.0) < 10.0
    assert float(jnp.min(y)) >= 0.0
    assert 100.0 < cie.CIE_Y_INTEGRAL < 115.0


def test_d65_normalization():
    assert abs(float(cie.illuminant_d65(jnp.asarray(560.0))) - 100.0) < 1e-3
    # D65 whitepoint chromaticity should be near (0.3127, 0.3290).
    wx, wy = cie.whitepoint_xy()
    assert abs(wx - 0.3127) < 0.01
    assert abs(wy - 0.3290) < 0.01


def test_blackbody_wien():
    # Peak of a 6000 K blackbody is ~482.9 nm (Wien displacement law).
    lam = jnp.linspace(200.0, 1500.0, 2601)
    vals = cie.blackbody(lam, 6000.0)
    peak = float(lam[jnp.argmax(vals)])
    assert abs(peak - 482.9) < 2.0
    nb = cie.normalized_blackbody(lam, 6000.0)
    assert abs(float(jnp.max(nb)) - 1.0) < 1e-3


def test_colorspace_white_roundtrip():
    for cs in (colorspace.SRGB, colorspace.REC2020, colorspace.DCI_P3):
        white_xyz = colorspace._xyy_to_xyz(*cs.white_xy)
        rgb = np.asarray(cs.to_rgb(jnp.asarray(white_xyz, dtype=jnp.float32)))
        np.testing.assert_allclose(rgb, 1.0, atol=1e-4)
        back = np.asarray(cs.to_xyz(jnp.ones(3, dtype=jnp.float32)))
        np.testing.assert_allclose(back, white_xyz, atol=1e-4)


def test_srgb_transfer_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    rt = colorspace.srgb_decode(colorspace.srgb_encode(x))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x), atol=1e-5)


def _rgb_roundtrip(rgb_in):
    """Fit coeffs, evaluate densely, project back to RGB under D65."""
    coeffs = rgb2spec.fit_albedo(jnp.asarray(rgb_in, dtype=jnp.float32))
    rgb_from_s, lam = rgb2spec._projection("srgb")
    out = rgb2spec.eval_sigmoid(coeffs, lam) @ rgb_from_s.T
    return np.asarray(out)


def test_rgb2spec_roundtrip_grid():
    grid = np.stack(
        np.meshgrid(*[np.linspace(0.05, 0.95, 4)] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    out = _rgb_roundtrip(grid)
    np.testing.assert_allclose(out, grid, atol=0.015)


def test_rgb2spec_extremes():
    out = _rgb_roundtrip(np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]))
    np.testing.assert_allclose(out[0], 0.0, atol=0.01)
    np.testing.assert_allclose(out[1], 1.0, atol=0.02)
    # Spectra must stay within [0, 1] (physical reflectance).
    coeffs = rgb2spec.fit_albedo(jnp.asarray([[0.9, 0.1, 0.1]]))
    lam = jnp.linspace(cie.LAMBDA_MIN, cie.LAMBDA_MAX, 200)
    s = np.asarray(rgb2spec.eval_sigmoid(coeffs, lam[None, :]))
    assert s.min() >= 0.0 and s.max() <= 1.0


def test_hero_wavelength_sampling():
    u = jnp.linspace(0.0, 0.999, 64)
    wl = spectrum.sample_uniform_hero(u)
    assert wl.lam.shape == (64, spectrum.N_SPECTRUM)
    assert float(jnp.min(wl.lam)) >= spectrum.LAMBDA_MIN - 1e-3
    assert float(jnp.max(wl.lam)) <= spectrum.LAMBDA_MAX + 1e-3
    np.testing.assert_allclose(
        np.asarray(wl.pdf), 1.0 / (spectrum.LAMBDA_MAX - spectrum.LAMBDA_MIN)
    )
    # A constant spectrum has luminance equal to its value.
    ones = jnp.ones_like(wl.lam)
    y = spectrum.luminance(ones, wl)
    np.testing.assert_allclose(np.asarray(y), 1.0, rtol=0.05)


def test_visible_importance_sampling():
    # MC estimate of integral of cie_y using the visible distribution should
    # match quadrature.
    u = (jnp.arange(4096) + 0.5) / 4096
    wl = spectrum.sample_visible(u)
    est = float(
        jnp.mean(spectrum.safe_div(cie.cie_y(wl.lam), wl.pdf))
    )
    lam = jnp.linspace(cie.LAMBDA_MIN, cie.LAMBDA_MAX, 1024)
    quad = float(jnp.trapezoid(cie.cie_y(lam), lam))
    assert abs(est - quad) / quad < 0.01


def test_terminate_secondary():
    wl = spectrum.sample_uniform_hero(jnp.asarray([0.3]))
    t = wl.terminate_secondary()
    assert float(t.pdf[0, 1]) == 0.0
    np.testing.assert_allclose(
        float(t.pdf[0, 0]), float(wl.pdf[0, 0]) / spectrum.N_SPECTRUM
    )
    # Terminating twice is a no-op.
    t2 = t.terminate_secondary()
    np.testing.assert_allclose(np.asarray(t2.pdf), np.asarray(t.pdf))
