"""Hair BSDF tests: white furnace, reciprocity-free sanity, chi-squared
sampling, and pigment mappings (reference: src/pbrt/hair_test.cpp,
bsdfs_test.cpp methodology)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.materials import hair

from .chisq import run_chi2, uniform_streams

N_RUNS = 4  # chi2 runs in this module (Sidak denominator)


def _wo(n, seed=3):
    u = uniform_streams(n, 2, seed=seed)
    z = 1.0 - 2.0 * u[:, 0]
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    ph = 2 * np.pi * u[:, 1]
    return jnp.asarray(
        np.stack([r * np.cos(ph), r * np.sin(ph), z], -1).astype(np.float32)
    )


@pytest.mark.parametrize("beta", [0.2, 0.4, 0.8])
def test_hair_white_furnace(beta):
    """sigma_a = 0 must conserve energy: E[f |cos| / pdf] ~ 1 over random wo
    (hair_test.cpp WhiteFurnaceSampled)."""
    n = 1 << 18
    wo = _wo(n)
    u = uniform_streams(n, 3, seed=17)
    sigma_a = jnp.zeros((n, 4))
    for h in (-0.6, 0.1, 0.7):
        wi, f, pdf = hair.hair_sample(
            h, 1.55, sigma_a, beta, beta, 2.0, wo,
            jnp.asarray(u[:, :2]), jnp.asarray(u[:, 2]),
        )
        w = np.asarray(f.mean(-1)) * np.abs(np.asarray(wi)[:, 2])
        w = np.where(np.asarray(pdf) > 0, w / np.maximum(np.asarray(pdf), 1e-9), 0.0)
        est = float(w.mean())
        assert 0.95 < est < 1.05, f"h={h} beta={beta}: furnace={est}"


def test_hair_pdf_normalizes():
    """hair_pdf integrates to ~1 over the sphere at several (h, wo)."""
    m = 1 << 18
    u2 = uniform_streams(m, 2, seed=11)
    z = 1 - 2 * u2[:, 0]
    r = np.sqrt(np.maximum(0, 1 - z * z))
    ph = 2 * np.pi * u2[:, 1]
    d = jnp.asarray(np.stack([r * np.cos(ph), r * np.sin(ph), z], -1).astype(np.float32))
    sigma_a = jnp.full((m, 4), 0.5)
    for h, deg in [(0.3, 40.0), (-0.8, 70.0)]:
        t = np.deg2rad(deg)
        wo_v = np.array([np.sin(t), np.cos(t), 0.0], np.float32)
        wo = jnp.broadcast_to(jnp.asarray(wo_v), (m, 3))
        pd = np.asarray(hair.hair_pdf(h, 1.55, sigma_a, 0.3, 0.3, 2.0, wo, d))
        integral = pd.mean() * 4 * np.pi
        assert abs(integral - 1.0) < 0.02, f"h={h}: pdf integral {integral}"


@pytest.mark.parametrize(
    "h,beta_m,beta_n,deg", [
        (0.5, 0.3, 0.3, 35.0),
        (-0.4, 0.6, 0.4, 60.0),
        (0.1, 0.25, 0.7, 20.0),
        (0.9, 0.45, 0.25, 75.0),
    ],
)
def test_hair_chisq(h, beta_m, beta_n, deg):
    """Chi-squared: sampled direction histogram vs hair_pdf quadrature."""
    t = np.deg2rad(deg)
    wo_v = np.array([np.sin(t), np.cos(t) * 0.8, np.cos(t) * 0.6], np.float32)
    wo_v /= np.linalg.norm(wo_v)

    def sample_fn(u2, uc):
        n = u2.shape[0]
        wo = jnp.broadcast_to(jnp.asarray(wo_v), (n, 3))
        sigma_a = jnp.full((n, 4), 0.25)
        wi, _f, pdf = hair.hair_sample(
            h, 1.55, sigma_a, beta_m, beta_n, 2.0, wo,
            jnp.asarray(u2), jnp.asarray(uc),
        )
        return wi, pdf > 0

    def pdf_fn(wi):
        n = wi.shape[0]
        wo = jnp.broadcast_to(jnp.asarray(wo_v), (n, 3))
        sigma_a = jnp.full((n, 4), 0.25)
        return hair.hair_pdf(h, 1.55, sigma_a, beta_m, beta_n, 2.0, wo, jnp.asarray(wi))

    ok, p, stat, dof = run_chi2(
        sample_fn, pdf_fn, n_samples=1 << 20, seed=int(deg) + int(10 * h),
        n_tests=N_RUNS, sub=5,
    )
    assert ok, f"hair chi2 p={p:.2e} stat={stat:.1f} dof={dof}"


def test_sigma_a_mappings():
    """Darker pigment -> more absorption; reflectance mapping monotone."""
    black = hair.sigma_a_from_concentration(8.0, 0.0)
    blonde = hair.sigma_a_from_concentration(0.3, 0.0)
    assert np.all(np.asarray(black) > np.asarray(blonde))
    dark = hair.sigma_a_from_reflectance(jnp.asarray([0.1]), 0.3)
    light = hair.sigma_a_from_reflectance(jnp.asarray([0.8]), 0.3)
    assert float(dark[0]) > float(light[0]) > 0.0


HAIR_SCENE = """
Integrator "path" "integer maxdepth" [ 4 ]
Sampler "independent" "integer pixelsamples" [ 8 ]
Film "rgb" "integer xresolution" [ 24 ] "integer yresolution" [ 24 ]
LookAt 0.5 0.5 -1.4   0.5 0.5 0.5   0 1 0
Camera "perspective" "float fov" [ 40 ]
WorldBegin
Material "diffuse" "rgb reflectance" [ 0.6 0.6 0.6 ]
Shape "trianglemesh"
    "point3 P" [ 0 0 0   1 0 0   1 0 1   0 0 1 ]
    "integer indices" [ 0 2 1   0 3 2 ]
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [ 12 12 12 ]
  Shape "trianglemesh"
      "point3 P" [ 0.3 0.99 0.3   0.7 0.99 0.3   0.7 0.99 0.7   0.3 0.99 0.7 ]
      "integer indices" [ 0 1 2   0 2 3 ]
AttributeEnd
AttributeBegin
  Material "hair" "float eumelanin" [ 0.4 ] "float beta_m" [ 0.3 ]
  Translate 0.5 0.4 0.4
  Shape "sphere" "float radius" [ 0.25 ]
AttributeEnd
"""


def test_hair_material_end_to_end():
    """Parse + render a scene with a hair material; image stays finite and
    the hair object scatters visible energy."""
    from pbrt_tpu.io.parser import load_pbrt_string
    from pbrt_tpu.render import render

    scene, camera, settings = load_pbrt_string(HAIR_SCENE)
    assert scene.materials.any_hair
    img = np.asarray(
        render(scene, camera, settings["integrator"], spp=8,
               samples_per_pass=4)
    )
    assert np.isfinite(img).all()
    assert img.mean() > 0.005
