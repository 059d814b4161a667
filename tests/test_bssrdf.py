"""Burley-diffusion BSSRDF gates (ref model: bssrdf.h TabulatedBSSRDF +
the normalization identities of the Burley profile)."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.materials.bssrdf import (
    burley_cdf,
    burley_d,
    burley_pdf_r,
    burley_profile,
    burley_sample_r,
    fresnel_moment1,
)


def test_profile_normalization_and_sampling():
    d = jnp.asarray([0.1])
    r = jnp.linspace(1e-4, 5.0, 20000)
    # Polar pdf integrates to 1; planar profile integrates to 1 too.
    pdf = np.asarray(burley_pdf_r(r, d))
    dr = float(r[1] - r[0])
    assert abs(pdf.sum() * dr - 1.0) < 1e-3
    # CDF/pdf consistency.
    cdf = np.asarray(burley_cdf(r, d))
    num = np.gradient(cdf, dr)
    mid = slice(100, 15000)
    np.testing.assert_allclose(num[mid], pdf[mid], rtol=0.05, atol=1e-3)
    # Inverse-CDF sampling reproduces the CDF (moment check).
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random(200000), jnp.float32)
    rs = np.asarray(burley_sample_r(u, jnp.float32(0.1)))
    assert abs(np.mean(rs < 0.1) - float(burley_cdf(
        jnp.asarray([0.1]), d)[0])) < 0.01
    assert abs(np.mean(rs < 0.3) - float(burley_cdf(
        jnp.asarray([0.3]), d)[0])) < 0.01


def test_burley_d_and_fresnel_moment():
    # Higher albedo -> wider profile (smaller s -> larger d).
    d_lo = float(burley_d(jnp.asarray(0.2), jnp.asarray(1.0)))
    d_hi = float(burley_d(jnp.asarray(0.95), jnp.asarray(1.0)))
    assert d_hi > d_lo
    # Fresnel moment: ~0 at eta=1, positive and finite around water/skin.
    assert abs(float(fresnel_moment1(jnp.asarray(1.0)))) < 0.02
    fm = float(fresnel_moment1(jnp.asarray(1.33)))
    assert 0.05 < fm < 0.25, fm


def test_subsurface_exit_on_plane():
    """Flat-floor probe geometry: exits stay on the floor at ~the sampled
    radius, and the spectral weight's mean reproduces the albedo (the
    profile integrates to A per wavelength)."""
    from pbrt_tpu.accel import api as accel_api
    from pbrt_tpu.materials.bssrdf import subsurface_exit
    from pbrt_tpu.core.vecmath import coordinate_system
    from pbrt_tpu.materials.buffers import MaterialBuffers
    from pbrt_tpu.lights.buffers import LightBuffers
    from pbrt_tpu.scene import Scene
    from pbrt_tpu.shapes.geometry import GeometryBuffers

    tri = np.asarray(
        [[[-50, 0, -50], [50, 0, -50], [0, 0, 80]]], np.float32
    )
    scene = Scene(
        geom=GeometryBuffers.build(
            tri_verts=tri, tri_mat=np.zeros(1, np.int32),
            tri_light=np.full(1, -1, np.int32),
        ),
        materials=MaterialBuffers.build([{"kind": 0, "albedo": (0.5,) * 3}]),
        lights=LightBuffers.build(),
    )
    n = 8192
    o = jnp.tile(jnp.asarray([[0.0, 3.0, 0.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (n, 1))
    isect = accel_api.closest(scene, o, d)
    ns = isect.n
    t1, t2 = coordinate_system(ns)
    rng = np.random.default_rng(1)
    alb = jnp.full((n, 4), 0.7)
    mfp = jnp.full((n,), 0.3)
    p_exit, n_exit, w, ok = subsurface_exit(
        scene, isect, ns, t1, t2, alb, mfp,
        jnp.asarray(rng.random(n), jnp.float32),
        jnp.asarray(rng.random(n), jnp.float32),
    )
    ok = np.asarray(ok)
    assert ok.mean() > 0.95  # flat plane: nearly every probe lands
    pe = np.asarray(p_exit)
    assert np.abs(pe[ok][:, 1]).max() < 1e-3  # still on the y=0 plane
    w = np.asarray(w)
    assert np.isfinite(w).all()
    # E[w] ~ albedo: the full-plane integral of A * Sp is A and the pdf
    # matches the hero profile (tolerance covers the r_max truncation).
    mean_w = w[ok].mean()
    assert 0.5 < mean_w < 0.9, mean_w


def test_subsurface_material_renders(tmp_path):
    """Parser binding + end-to-end render energy sanity: a subsurface
    floor is finite and darker than a white diffuse floor."""
    base = """
Integrator "path" "integer maxdepth" [3]
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
AreaLightSource "diffuse" "rgb L" [4 4 4]
Shape "trianglemesh" "integer indices" [0 1 2]
    "point3 P" [-2 2 4  2 2 4  0 2 8]
Material {MAT}
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point3 P" [-6 -1 1  6 -1 1  6 -1 12  -6 -1 12]
"""
    from pbrt_tpu.io.parser import load_pbrt
    from pbrt_tpu.render import render
    from pbrt_tpu.materials.buffers import MAT_SUBSURFACE

    out = {}
    for name, mat in [
        ("ss", '"subsurface" "rgb sigma_s" [2 2 2] "rgb sigma_a" [0.05 0.1 0.2]'),
        ("dif", '"diffuse" "rgb reflectance" [0.98 0.98 0.98]'),
    ]:
        f = tmp_path / f"{name}.pbrt"
        f.write_text(base.replace("{MAT}", mat))
        scene, camera, settings = load_pbrt(str(f))
        if name == "ss":
            assert (np.asarray(scene.materials.kind) == MAT_SUBSURFACE).any()
        img = np.asarray(render(
            scene, camera, settings["integrator"], spp=8, samples_per_pass=4
        ))
        assert np.isfinite(img).all()
        out[name] = img
    assert out["ss"].mean() > 0.0
    assert out["ss"].mean() < out["dif"].mean() * 1.1
