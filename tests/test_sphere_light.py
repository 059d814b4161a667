"""Analytic emissive spheres: parser routing, cone-sampled NEE, MIS
consistency.

Reference analogues: DiffuseAreaLight over a Sphere shape (lights.h),
Sphere::Sample/PDF cone solid-angle sampling (shapes.cpp), and the
SampleLi/PDF_Li consistency the reference's lights_test.cpp checks.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.io.parser import load_pbrt_string
from pbrt_tpu.lights.buffers import LightBuffers
from pbrt_tpu.models.path import PathIntegrator
from pbrt_tpu.render import render


_SCENE = """
Integrator "path" "integer maxdepth" [3]
Sampler "independent" "integer pixelsamples" [4]
Film "rgb" "integer xresolution" [24] "integer yresolution" [24]
Camera "perspective" "float fov" [60]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [4 4 4]
  Translate 0 1.2 3
  Shape "sphere" "float radius" [0.4]
AttributeEnd
Material "diffuse" "rgb reflectance" [0.6 0.6 0.6]
Shape "trianglemesh"
  "point3 P" [-5 -1 -5  5 -1 -5  5 -1 8  -5 -1 8]
  "integer indices" [0 1 2 0 2 3]
"""


def test_parser_routes_analytic_sphere_light():
    scene, _, _ = load_pbrt_string(_SCENE)
    lights = scene.lights
    assert lights.n_sphl == 1
    assert lights.n_area == 0
    np.testing.assert_allclose(
        np.asarray(lights.sphl_c[0]), [0.0, 1.2, 3.0], atol=1e-5
    )
    np.testing.assert_allclose(float(lights.sphl_r[0]), 0.4, atol=1e-6)
    # The sphere is also analytic geometry carrying its light id.
    sl = np.asarray(scene.geom.sph_light)
    assert (sl >= 0).sum() == 1
    assert sl.max() == 0  # global id 0 (no area triangles precede it)


def test_cone_sampling_solid_angle_and_surface():
    """E[1/pdf] over cone samples = subtended solid angle; sampled points
    lie on the sphere and face the reference point."""
    c = np.array([0.0, 2.0, 0.0], np.float32)
    r = 0.5
    lights = LightBuffers.build(
        sphere_lights=[{"c": c, "r": r, "rgb": (1, 1, 1), "scale": 1.0,
                        "illuminant": False}],
    )
    n = 4096
    rng = np.random.default_rng(7)
    p_ref = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32), (n, 1))
    u_sel = jnp.asarray(rng.random(n), jnp.float32)
    u_pos = jnp.asarray(rng.random((n, 2)), jnp.float32)
    lam = jnp.full((n, 4), 550.0, jnp.float32)
    ls = lights.sample_li(p_ref, lam, u_sel, u_pos)
    # points on the sphere
    p_l = p_ref + ls.wi * ls.dist[:, None]
    d_c = np.linalg.norm(np.asarray(p_l) - c, axis=-1)
    np.testing.assert_allclose(d_c, r, atol=1e-3)
    # pdf integrates the cone: mean(1/pdf) == 2 pi (1 - cos theta_max)
    dc = float(np.linalg.norm(c))
    cosmax = np.sqrt(1.0 - (r / dc) ** 2)
    omega = 2.0 * np.pi * (1.0 - cosmax)
    est = float(jnp.mean(1.0 / ls.pdf))
    np.testing.assert_allclose(est, omega, rtol=1e-3)
    # emission faces the reference point (one-sided outward emitter)
    assert float(jnp.min(jnp.max(ls.L, axis=-1))) > 0.0


def test_pdf_li_matches_sample_pdf():
    """pdf_li_area for a BSDF ray that hits the sphere equals the cone pdf
    sample_li reports (the SampleLi/PDF_Li consistency gate)."""
    c = np.array([0.0, 2.0, 0.0], np.float32)
    r = 0.5
    lights = LightBuffers.build(
        sphere_lights=[{"c": c, "r": r, "rgb": (1, 1, 1),
                        "illuminant": False}],
    )
    n = 256
    rng = np.random.default_rng(3)
    p_ref = jnp.asarray(
        rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        * np.array([1, 0.2, 1], np.float32)
    )
    u_sel = jnp.asarray(rng.random(n), jnp.float32)
    u_pos = jnp.asarray(rng.random((n, 2)), jnp.float32)
    lam = jnp.full((n, 4), 550.0, jnp.float32)
    ls = lights.sample_li(p_ref, lam, u_sel, u_pos)
    p_l = p_ref + ls.wi * ls.dist[:, None]
    n_l = (p_l - c) / r
    cos_l = jnp.sum(n_l * (-ls.wi), axis=-1)
    pdf2 = lights.pdf_li_area(
        jnp.zeros((n,), jnp.int32), ls.dist, cos_l, p_ref=p_ref
    )
    np.testing.assert_allclose(
        np.asarray(ls.pdf), np.asarray(pdf2), rtol=1e-4, atol=1e-7
    )


def test_sample_le_origin_covers_spheres():
    c = np.array([1.0, 2.0, 3.0], np.float32)
    r = 0.25
    lights = LightBuffers.build(
        sphere_lights=[{"c": c, "r": r, "rgb": (2, 2, 2),
                        "illuminant": False}],
    )
    n = 512
    rng = np.random.default_rng(11)
    org = lights.sample_le_origin(
        jnp.asarray(rng.random(n), jnp.float32),
        jnp.asarray(rng.random((n, 2)), jnp.float32),
    )
    d_c = np.linalg.norm(np.asarray(org["p"]) - c, axis=-1)
    np.testing.assert_allclose(d_c, r, atol=1e-5)
    np.testing.assert_allclose(
        float(org["area"][0]), 4.0 * np.pi * r * r, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(org["pmf"]), 1.0)


def test_nee_mis_matches_bsdf_only():
    """Path tracing the emissive-sphere scene with NEE+MIS converges to the
    BSDF-sampling-only answer (unbiasedness of the cone pdf + emitted +
    pdf_li_area trio)."""
    scene, camera, _ = load_pbrt_string(_SCENE)
    a = np.asarray(render(
        scene, camera,
        PathIntegrator(max_depth=3, rr_start_depth=99,
                       use_nee=True, use_mis=True),
        spp=16, samples_per_pass=4,
    ))
    b = np.asarray(render(
        scene, camera,
        PathIntegrator(max_depth=3, rr_start_depth=99,
                       use_nee=False, use_mis=False),
        spp=128, samples_per_pass=4, seed=9,
    ))
    assert a.mean() > 0.0
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.06)
