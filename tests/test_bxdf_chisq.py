"""Reference-strength chi-squared sampling tests for every BxDF lobe.

Mirrors /root/reference/src/pbrt/bsdfs_test.cpp:280-365: 80x160-bin
frequency tables from ~1M Sample_f draws vs PDF quadrature, significance
0.01 Sidak-corrected across all runs in this file.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.materials import bxdf
from pbrt_tpu.materials import scattering as sc

from .chisq import run_chi2

# Total chi2 runs in this module (Sidak correction denominator).
N_RUNS = 8

_WO_ANGLES = [30.0, 60.0]


def _wo(deg, n):
    t = np.deg2rad(deg)
    w = np.array([np.sin(t), 0.0, np.cos(t)], np.float32)
    return jnp.broadcast_to(jnp.asarray(w), (n, 3))


def _run(name, sample_fn, pdf_fn, seed, sub=5):
    ok, p, stat, dof = run_chi2(
        sample_fn, pdf_fn, n_samples=1 << 20, seed=seed, n_tests=N_RUNS,
        sub=sub,
    )
    assert ok, f"{name}: chi2 p={p:.2e} stat={stat:.1f} dof={dof}"


@pytest.mark.parametrize("deg", _WO_ANGLES)
def test_chisq_diffuse(deg):
    albedo = jnp.full((1, 1), 0.7)

    def sample_fn(u2, uc):
        n = u2.shape[0]
        wo = _wo(deg, n)
        wi, _f, pdf = bxdf.diffuse_sample(
            jnp.broadcast_to(albedo, (n, 1)), wo, jnp.asarray(u2)
        )
        return wi, pdf > 0

    def pdf_fn(wi):
        n = wi.shape[0]
        return bxdf.diffuse_pdf(_wo(deg, n), jnp.asarray(wi))

    _run(f"diffuse/{deg}", sample_fn, pdf_fn, seed=int(deg))


@pytest.mark.parametrize("deg,alpha", [(30.0, 0.3), (60.0, 0.1)])
def test_chisq_conductor(deg, alpha):
    def sample_fn(u2, uc):
        n = u2.shape[0]
        wo = _wo(deg, n)
        eta = jnp.full((n, 1), 0.2)
        k = jnp.full((n, 1), 3.9)
        a = jnp.full((n,), alpha)
        wi, _f, pdf, spec = bxdf.conductor_sample(
            eta, k, a, wo, jnp.asarray(u2)
        )
        return wi, (pdf > 0) & ~spec

    def pdf_fn(wi):
        n = wi.shape[0]
        return bxdf.conductor_pdf(
            jnp.full((n,), alpha), _wo(deg, n), jnp.asarray(wi)
        )

    _run(f"conductor/{deg}/{alpha}", sample_fn, pdf_fn, seed=41 + int(deg),
         sub=7 if alpha < 0.2 else 5)


@pytest.mark.parametrize("deg,alpha", [(30.0, 0.3), (60.0, 0.25)])
def test_chisq_rough_dielectric(deg, alpha):
    eta = 1.5

    def sample_fn(u2, uc):
        n = u2.shape[0]
        wo = _wo(deg, n)
        wi, _f, pdf, spec = bxdf.dielectric_sample(
            jnp.full((n,), eta), jnp.full((n,), alpha), wo,
            jnp.asarray(u2), jnp.asarray(uc),
        )
        return wi, (pdf > 0) & ~spec

    def pdf_fn(wi):
        n = wi.shape[0]
        return bxdf.dielectric_pdf(
            jnp.full((n,), eta), jnp.full((n,), alpha), _wo(deg, n),
            jnp.asarray(wi),
        )

    _run(f"dielectric/{deg}/{alpha}", sample_fn, pdf_fn, seed=77 + int(deg),
         sub=5)


@pytest.mark.parametrize("deg", [45.0])
def test_chisq_diffuse_transmission(deg):
    def sample_fn(u2, uc):
        n = u2.shape[0]
        wo = _wo(deg, n)
        refl = jnp.full((n, 1), 0.25)
        trans = jnp.full((n, 1), 0.6)
        wi, _f, pdf = bxdf.diffusetrans_sample(
            refl, trans, wo, jnp.asarray(u2), jnp.asarray(uc)
        )
        return wi, pdf > 0

    def pdf_fn(wi):
        n = wi.shape[0]
        return bxdf.diffusetrans_pdf(_wo(deg, n), jnp.asarray(wi))

    _run(f"diffusetrans/{deg}", sample_fn, pdf_fn, seed=99)


@pytest.mark.parametrize("deg", [30.0])
def test_chisq_coated_diffuse(deg):
    """Coated-diffuse sampling vs its pdf (2-lobe Fresnel mixture)."""
    albedo = 0.6
    alpha_c = jnp.asarray(0.1)

    def sample_fn(u2, uc):
        n = u2.shape[0]
        wo = _wo(deg, n)
        alb = jnp.full((n, 1), albedo)
        wi, _f, pdf = bxdf.coated_sample(
            lambda u: bxdf.diffuse_sample(alb, wo, u),
            lambda wi_: bxdf.diffuse_f(alb, wo, wi_),
            lambda wi_: bxdf.diffuse_pdf(wo, wi_),
            jnp.full((n,), alpha_c), wo, jnp.asarray(u2), jnp.asarray(uc),
        )
        return wi, pdf > 0

    def pdf_fn(wi):
        n = wi.shape[0]
        wo = _wo(deg, n)
        return bxdf.coated_pdf(
            bxdf.diffuse_pdf(wo, jnp.asarray(wi)),
            jnp.full((n,), alpha_c), wo, jnp.asarray(wi),
        )

    _run(f"coated/{deg}", sample_fn, pdf_fn, seed=123, sub=7)
