"""Microfacet distribution + Fresnel terms.

Reference analogue: /root/reference/src/pbrt/util/scattering.h —
TrowbridgeReitzDistribution (GGX, :109) with visible-NDF sampling,
FrDielectric (:61), FrComplex (:81). All functions operate on batched local
directions (z = shading normal) and are branch-free.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.sampling import sample_uniform_disk_concentric
from ..core.vecmath import length_squared, normalize, safe_sqrt

_EPS = 1e-9


def cos2_theta(w):
    return w[..., 2] * w[..., 2]


def sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def tan2_theta(w):
    return sin2_theta(w) / jnp.maximum(cos2_theta(w), 1e-12)


# --- Fresnel ----------------------------------------------------------------


def fr_dielectric(cos_theta_i, eta):
    """Unpolarized Fresnel reflectance, real IOR (scattering.h:61).

    cos_theta_i may be negative (ray arriving from below); eta is the IOR of
    the transmission side over the incident side before any flip.
    """
    cos_theta_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    flip = cos_theta_i < 0.0
    eta = jnp.where(flip, 1.0 / eta, eta)
    cos_theta_i = jnp.abs(cos_theta_i)
    sin2_t = (1.0 - cos_theta_i * cos_theta_i) / (eta * eta)
    tir = sin2_t >= 1.0
    cos_theta_t = safe_sqrt(1.0 - sin2_t)
    r_parl = (eta * cos_theta_i - cos_theta_t) / jnp.maximum(
        eta * cos_theta_i + cos_theta_t, _EPS
    )
    r_perp = (cos_theta_i - eta * cos_theta_t) / jnp.maximum(
        cos_theta_i + eta * cos_theta_t, _EPS
    )
    fr = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, fr)


def fr_complex(cos_theta_i, eta, k):
    """Unpolarized Fresnel reflectance for a conductor with complex IOR
    eta + i k, exact formula in real arithmetic (scattering.h:81 FrComplex).
    Broadcasts over spectral axes.
    """
    cos_theta_i = jnp.clip(jnp.abs(cos_theta_i), 0.0, 1.0)
    cos2 = cos_theta_i * cos_theta_i
    sin2 = 1.0 - cos2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - sin2
    a2b2 = safe_sqrt(t0 * t0 + 4.0 * e2 * k2)
    t1 = a2b2 + cos2
    a = safe_sqrt(jnp.maximum(0.0, 0.5 * (a2b2 + t0)))
    t2 = 2.0 * a * cos_theta_i
    rs = (t1 - t2) / jnp.maximum(t1 + t2, _EPS)
    t3 = cos2 * a2b2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, _EPS)
    return jnp.clip(0.5 * (rs + rp), 0.0, 1.0)


# --- Trowbridge-Reitz (GGX), isotropic --------------------------------------


def ggx_d(wm, alpha):
    """Microfacet NDF D(wm)."""
    a2 = alpha * alpha
    c2 = cos2_theta(wm)
    t = c2 * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * t * t, 1e-12)


def ggx_lambda(w, alpha):
    return 0.5 * (safe_sqrt(1.0 + alpha * alpha * tan2_theta(w)) - 1.0)


def ggx_g1(w, alpha):
    return 1.0 / (1.0 + ggx_lambda(w, alpha))


def ggx_g(wo, wi, alpha):
    return 1.0 / (1.0 + ggx_lambda(wo, alpha) + ggx_lambda(wi, alpha))


def ggx_sample_wm(wo, u2, alpha):
    """Sample the visible normal distribution (Heitz 2018; scattering.h
    Sample_wm). wo local; returns unit half-vectors wm with z >= 0."""
    # Transform to the hemisphere configuration.
    wh = normalize(
        jnp.stack(
            [alpha * wo[..., 0], alpha * wo[..., 1], wo[..., 2]], axis=-1
        )
    )
    wh = jnp.where((wh[..., 2] < 0.0)[..., None], -wh, wh)
    # Orthonormal basis around wh.
    up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], wo.dtype), wh.shape)
    t1_raw = jnp.cross(up, wh)
    degenerate = length_squared(t1_raw) < 1e-9
    t1 = jnp.where(
        degenerate[..., None],
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], wo.dtype), wh.shape),
        t1_raw / jnp.maximum(jnp.sqrt(length_squared(t1_raw, keepdims=True)), 1e-12),
    )
    t2 = jnp.cross(wh, t1)
    # Uniform disk sample warped to the visible hemisphere.
    p = sample_uniform_disk_concentric(u2)
    h = safe_sqrt(1.0 - p[..., 0] * p[..., 0])
    py = (1.0 + wh[..., 2]) * 0.5 * p[..., 1] + (1.0 - (1.0 + wh[..., 2]) * 0.5) * h
    pz = safe_sqrt(1.0 - p[..., 0] ** 2 - py**2)
    nh = (
        p[..., 0:1] * t1
        + py[..., None] * t2
        + pz[..., None] * wh
    )
    wm = jnp.stack(
        [
            alpha * nh[..., 0],
            alpha * nh[..., 1],
            jnp.maximum(nh[..., 2], 1e-6),
        ],
        axis=-1,
    )
    return normalize(wm)


def ggx_pdf_wm(wo, wm, alpha):
    """Visible-NDF pdf of wm given wo (scattering.h PDF)."""
    return (
        ggx_g1(wo, alpha)
        / jnp.maximum(jnp.abs(wo[..., 2]), 1e-8)
        * ggx_d(wm, alpha)
        * jnp.abs(jnp.sum(wo * wm, axis=-1))
    )


def effectively_smooth(alpha) -> jnp.ndarray:
    """pbrt's EffectivelySmooth threshold (scattering.h:~160)."""
    return alpha < 1e-3


def roughness_to_alpha(roughness):
    """pbrt-v4 maps user roughness to alpha = sqrt(roughness)
    (materials.cpp RoughnessToAlpha)."""
    return jnp.sqrt(jnp.maximum(roughness, 0.0))
