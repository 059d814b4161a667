"""Branchless BxDF evaluation/sampling over ray batches.

Reference analogue: /root/reference/src/pbrt/bxdfs.h (DiffuseBxDF :30,
ConductorBxDF :413, DielectricBxDF :300) + BSDF local-frame wrapper
(bsdf.h:19). Directions here are in the *shading-local* frame (z = shading
normal). Spectral throughputs have shape (N, S).

Dispatch model: every BxDF family computes for all rays; the material `kind`
tag selects per ray with jnp.where. For the small closed set of families this
evaluate-all-and-select is cheaper on TPU than any divergent dispatch.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import rgb2spec
from ..core.sampling import (
    INV_PI,
    cosine_hemisphere_pdf,
    sample_cosine_hemisphere,
)
from .buffers import MAT_CONDUCTOR, MAT_DIELECTRIC, MAT_DIFFUSE

_EPS = 1e-7


def _cos_theta(w):
    return w[..., 2]


def _abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def _same_hemisphere(a, b):
    return a[..., 2] * b[..., 2] > 0.0


# --- Diffuse (Lambertian) ---------------------------------------------------


def diffuse_f(albedo, wo, wi):
    """albedo: (N, S); wo, wi local. Returns (N, S)."""
    same = _same_hemisphere(wo, wi)
    return jnp.where(same[..., None], albedo * INV_PI, 0.0)


def diffuse_sample(albedo, wo, u2):
    """Cosine-hemisphere sample. Returns (wi, f, pdf)."""
    wi = sample_cosine_hemisphere(u2)
    wi = wi.at[..., 2].multiply(jnp.sign(jnp.where(wo[..., 2] == 0, 1.0, wo[..., 2])))
    pdf = cosine_hemisphere_pdf(_abs_cos_theta(wi))
    f = albedo * INV_PI
    return wi, f, pdf


def diffuse_pdf(wo, wi):
    same = _same_hemisphere(wo, wi)
    return jnp.where(same, cosine_hemisphere_pdf(_abs_cos_theta(wi)), 0.0)


# --- Unified per-ray dispatch ----------------------------------------------


def evaluate(params, wo, wi, lam):
    """f(wo, wi) for each ray given gathered material params.

    params: dict from MaterialBuffers.gather; lam: (N, S) wavelengths.
    Returns (N, S). Specular (smooth conductor/dielectric) kinds return 0
    here — their contribution arrives only through sampling.
    """
    albedo = rgb2spec.eval_sigmoid(params["albedo_coeffs"], lam)
    f_d = diffuse_f(albedo, wo, wi)
    kind = params["kind"]
    return jnp.where((kind == MAT_DIFFUSE)[..., None], f_d, 0.0)


def pdf(params, wo, wi):
    p_d = diffuse_pdf(wo, wi)
    kind = params["kind"]
    return jnp.where(kind == MAT_DIFFUSE, p_d, 0.0)


def sample(params, wo, lam, u2, uc):
    """Sample wi for each ray. Returns dict(wi, f, pdf, specular).

    uc is reserved for lobe selection in layered/dielectric materials.
    """
    albedo = rgb2spec.eval_sigmoid(params["albedo_coeffs"], lam)
    wi_d, f_d, pdf_d = diffuse_sample(albedo, wo, u2)
    kind = params["kind"]
    is_diffuse = kind == MAT_DIFFUSE
    wi = wi_d
    f = jnp.where(is_diffuse[..., None], f_d, 0.0)
    p = jnp.where(is_diffuse, pdf_d, 0.0)
    specular = jnp.zeros_like(is_diffuse)
    return {"wi": wi, "f": f, "pdf": p, "specular": specular}
