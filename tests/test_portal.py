"""PortalImageInfiniteLight gates (ref model: lights.h:738 + the
lights_test.cpp sampling-consistency strategy)."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import spectrum
from pbrt_tpu.lights.portal import PortalLight


def _sky():
    """Lat-long test env: bright band near the horizon +x, dark elsewhere."""
    img = np.full((32, 64, 3), 0.05, np.float32)
    img[10:22, 0:16] = (4.0, 2.0, 1.0)
    return img


def _portal():
    # A 2x2 window in the x = 5 plane, normal -x (toward the interior at
    # the origin side).
    return np.asarray(
        [[5.0, -1.0, -1.0], [5.0, 1.0, -1.0], [5.0, 1.0, 1.0],
         [5.0, -1.0, 1.0]], np.float32
    )


def test_portal_uv_roundtrip():
    pl = PortalLight.build(_sky(), _portal(), res=64)
    rng = np.random.default_rng(0)
    # Random directions in the portal-facing hemisphere.
    d = rng.normal(size=(256, 3))
    d[:, 0] = np.abs(d[:, 0]) + 0.2  # toward +x (portal normal is -x...)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dj = jnp.asarray(d, jnp.float32)
    uv, ok = pl.dir_to_uv(dj)
    ok = np.asarray(ok)
    assert ok.mean() > 0.9
    back = np.asarray(pl.uv_to_dir(uv))
    np.testing.assert_allclose(back[ok], d[ok], atol=1e-4)


def test_portal_samples_pass_through_portal():
    pl = PortalLight.build(_sky(), _portal(), res=64)
    n = 4096
    rng = np.random.default_rng(1)
    p_ref = jnp.tile(jnp.asarray([[0.0, 0.3, -0.2]]), (n, 1))
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    wl = spectrum.sample_visible(jnp.full((n,), 0.5))
    wi, L, pdf = pl.sample(u2, wl.lam, p_ref)
    wi = np.asarray(wi)
    pdf = np.asarray(pdf)
    assert (pdf > 0).mean() > 0.95
    # Every positive-pdf direction must cross the x = 5 plane inside the
    # 2x2 portal rectangle.
    sel = pdf > 0
    t = (5.0 - 0.0) / wi[sel, 0]
    y = 0.3 + t * wi[sel, 1]
    z = -0.2 + t * wi[sel, 2]
    assert (t > 0).all()
    assert (np.abs(y) <= 1.0 + 1e-3).all(), np.abs(y).max()
    assert (np.abs(z) <= 1.0 + 1e-3).all(), np.abs(z).max()
    # pdf_dir agrees with the sampling pdf.
    pdf2 = np.asarray(pl.pdf_dir(jnp.asarray(wi), p_ref))
    np.testing.assert_allclose(pdf2[sel], pdf[sel], rtol=5e-2, atol=1e-5)


def test_portal_sampling_unbiased():
    """E[L/pdf] over portal samples equals the brute-force integral of the
    portal-windowed environment over the sphere (solid-angle measure)."""
    pl = PortalLight.build(_sky(), _portal(), res=64)
    n = 60000
    rng = np.random.default_rng(2)
    p0 = jnp.asarray([[0.0, 0.0, 0.0]])
    p_ref = jnp.tile(p0, (n, 1))
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    wl = spectrum.sample_visible(jnp.full((n,), 0.5))
    wi, L, pdf = pl.sample(u2, wl.lam, p_ref)
    w = np.asarray(L.mean(-1)) / np.maximum(np.asarray(pdf), 1e-12)
    w[np.asarray(pdf) <= 0] = 0.0
    est = w.mean()

    # Brute force: uniform sphere directions, keep those passing the portal.
    m = 400000
    d = rng.normal(size=(m, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    lam1 = wl.lam[:1]
    Lb = np.asarray(
        pl.radiance(jnp.asarray(d, jnp.float32), lam1,
                    jnp.tile(p0, (m, 1)))
    ).mean(-1)
    brute = Lb.mean() * 4.0 * np.pi
    assert abs(est - brute) < 0.08 * max(brute, 1e-6), (est, brute)


def test_portal_scene_render(tmp_path):
    """Parser 'portal' binding + a room lit only through the window."""
    from pbrt_tpu.io.image import write_png

    write_png(str(tmp_path / "sky.png"), np.clip(_sky() / 4.0, 0, 1))
    scene_file = tmp_path / "room.pbrt"
    scene_file.write_text(
        """
Integrator "path" "integer maxdepth" [3]
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
Camera "perspective" "float fov" [60]
WorldBegin
LightSource "infinite" "string filename" ["sky.png"]
    "point3 portal" [5 -1 3  5 1 3  5 1 5  5 -1 5]
Material "diffuse" "rgb reflectance" [0.6 0.6 0.6]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point3 P" [-3 -1 2  3 -1 2  3 -1 8  -3 -1 8]
"""
    )
    from pbrt_tpu.io.parser import load_pbrt
    from pbrt_tpu.lights.portal import PortalLight as PL
    from pbrt_tpu.render import render

    scene, camera, settings = load_pbrt(str(scene_file))
    assert isinstance(scene.lights.env, PL)
    img = np.asarray(render(
        scene, camera, settings["integrator"], spp=8, samples_per_pass=4
    ))
    assert np.isfinite(img).all()
    assert img.mean() > 0.0
