"""RGL .bsdf loader: tensor container, marginal-conditional warp, exact
MeasuredBxDF::f evaluation, parser binding (bxdfs.cpp:740-1040)."""

import numpy as np
import pytest

from pbrt_tpu.materials.rgl import (
    Marginal2D, RGLBrdf, _phi2u, _theta2u, read_tensor_file,
    write_tensor_file,
)


def test_tensor_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    fields = {
        "theta_i": rng.uniform(0, 1.5, 8).astype(np.float32),
        "ndf": rng.uniform(size=(16, 32)).astype(np.float32),
        "description": np.frombuffer(b"synthetic", np.uint8),
        "jacobian": np.zeros(1, np.uint8),
    }
    p = tmp_path / "t.bsdf"
    write_tensor_file(str(p), fields)
    back = read_tensor_file(str(p))
    assert set(back) == set(fields)
    for k in fields:
        np.testing.assert_array_equal(back[k], fields[k])


def test_marginal2d_uniform_is_identity():
    m = Marginal2D(np.ones((9, 17)))
    u1 = np.linspace(0.05, 0.95, 7)
    u2 = np.linspace(0.9, 0.1, 7)
    x, y = m.sample(u1, u2)
    np.testing.assert_allclose(x, u1, atol=1e-9)
    np.testing.assert_allclose(y, u2, atol=1e-9)
    v1, v2 = m.invert(x, y)
    np.testing.assert_allclose(v1, u1, atol=1e-9)
    np.testing.assert_allclose(v2, u2, atol=1e-9)


def test_marginal2d_sample_invert_inverse():
    rng = np.random.default_rng(1)
    g = rng.uniform(0.2, 3.0, size=(12, 20))
    m = Marginal2D(g)
    u1 = rng.uniform(0.01, 0.99, 200)
    u2 = rng.uniform(0.01, 0.99, 200)
    x, y = m.sample(u1, u2)
    v1, v2 = m.invert(x, y)
    np.testing.assert_allclose(v1, u1, atol=1e-6)
    np.testing.assert_allclose(v2, u2, atol=1e-6)


def test_marginal2d_linear_cdf_analytic():
    """Density 1 + x: invert must produce the exact CDF
    (x + x^2/2) / 1.5, independent of y."""
    nx, ny = 33, 5
    xs = np.linspace(0, 1, nx)
    g = np.tile(1.0 + xs, (ny, 1))
    m = Marginal2D(g)
    x = np.linspace(0.03, 0.97, 11)
    y = np.full_like(x, 0.37)
    u1, u2 = m.invert(x, y)
    np.testing.assert_allclose(u1, (x + 0.5 * x * x) / 1.5, atol=1e-9)
    np.testing.assert_allclose(u2, y, atol=1e-9)


def _synthetic_bsdf(tmp_path, warp_linear=False):
    """Isotropic .bsdf: sigma = c, ndf = N(x), spectra = S(lam) * G(u_x),
    vndf uniform (identity warp) or 1 + x (analytic warp)."""
    n_t, n_p, n_w = 16, 2, 4
    res = 32
    theta_i = np.linspace(0, np.pi / 2, n_t).astype(np.float32)
    phi_i = np.asarray([-np.pi, np.pi], np.float32)
    wavelengths = np.linspace(400, 700, n_w).astype(np.float32)
    xs = np.linspace(0, 1, res)
    ndf = np.tile(0.5 + xs**2, (res, 1)).astype(np.float32)
    sigma = np.full((res, res), 0.25, np.float32)
    base = (1.0 + xs) if warp_linear else np.ones(res)
    vndf = np.broadcast_to(
        base, (n_p, n_t, res, res)
    ).astype(np.float32).copy()
    s_l = 0.5 + 0.5 * (wavelengths - 400.0) / 300.0  # S(lam)
    g_x = 0.2 + 0.8 * xs  # G(u_x)
    spectra = (
        s_l[None, None, :, None, None]
        * g_x[None, None, None, None, :]
        * np.ones((n_p, n_t, 1, res, 1))
    ).astype(np.float32)
    lum = spectra[:, :, 1].copy()
    path = tmp_path / ("warp.bsdf" if warp_linear else "flat.bsdf")
    write_tensor_file(str(path), {
        "theta_i": theta_i, "phi_i": phi_i, "wavelengths": wavelengths,
        "ndf": ndf, "sigma": sigma, "vndf": vndf, "spectra": spectra,
        "luminance": lum,
        "description": np.frombuffer(b"synth", np.uint8),
        "jacobian": np.zeros(1, np.uint8),
    })
    return str(path), (s_l, wavelengths)


def _dirs(rng, n):
    wo = rng.normal(size=(n, 3))
    wi = rng.normal(size=(n, 3))
    for a in (wo, wi):
        a[:, 2] = np.abs(a[:, 2]) + 0.3
        a /= np.linalg.norm(a, axis=1, keepdims=True)
    return wo, wi


def test_rgl_f_matches_analytic(tmp_path):
    path, (s_l, wls) = _synthetic_bsdf(tmp_path, warp_linear=False)
    brdf = RGLBrdf.load(path)
    assert brdf.isotropic
    rng = np.random.default_rng(3)
    wo, wi = _dirs(rng, 64)
    lam = np.asarray([450.0, 650.0])
    got = brdf.f(wo, wi, lam)
    wm = wo + wi
    wm /= np.linalg.norm(wm, axis=1, keepdims=True)
    ux = _theta2u(np.arccos(np.clip(wm[:, 2], -1, 1)))
    s_at = np.interp(lam, wls, s_l)
    expect = (
        s_at[None, :]
        * (0.2 + 0.8 * ux)[:, None]          # G at identity-warped u_x
        * (0.5 + ux**2)[:, None]             # ndf
        / (4 * 0.25 * wi[:, 2])[:, None]     # 1/(4 sigma cos_i)
    )
    np.testing.assert_allclose(got, expect, rtol=0.02, atol=1e-3)


def test_rgl_f_with_nonuniform_warp(tmp_path):
    """vndf density 1 + x: spectra is stored in warped coordinates, so f
    must read G at cdf(u_x) = (u_x + u_x^2/2)/1.5."""
    path, (s_l, wls) = _synthetic_bsdf(tmp_path, warp_linear=True)
    brdf = RGLBrdf.load(path)
    rng = np.random.default_rng(4)
    wo, wi = _dirs(rng, 64)
    lam = np.asarray([550.0])
    got = brdf.f(wo, wi, lam)
    wm = wo + wi
    wm /= np.linalg.norm(wm, axis=1, keepdims=True)
    ux = _theta2u(np.arccos(np.clip(wm[:, 2], -1, 1)))
    cdf = (ux + 0.5 * ux * ux) / 1.5
    s_at = np.interp(lam, wls, s_l)
    expect = (
        s_at[None, :]
        * (0.2 + 0.8 * cdf)[:, None]
        * (0.5 + ux**2)[:, None]
        / (4 * 0.25 * wi[:, 2])[:, None]
    )
    np.testing.assert_allclose(got, expect, rtol=0.02, atol=1e-3)


def test_parser_bakes_bsdf(tmp_path):
    path, _ = _synthetic_bsdf(tmp_path)
    (tmp_path / "scene.pbrt").write_text(
        'Film "rgb" "integer xresolution" 8 "integer yresolution" 8\n'
        "Camera \"perspective\"\n"
        "WorldBegin\n"
        f'Material "measured" "string filename" "{path}"\n'
        'Shape "sphere" "float radius" 1\n'
    )
    from pbrt_tpu.io.parser import load_pbrt

    scene, _, settings = load_pbrt(str(tmp_path / "scene.pbrt"))
    assert scene.materials.any_measured
    for w in settings["warnings"]:
        assert "measured" not in w, w
    tab = np.asarray(scene.materials.measured_coeffs)
    assert tab.shape[0] == 1 and np.isfinite(tab).all()
