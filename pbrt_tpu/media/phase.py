"""Henyey-Greenstein phase function.

Reference analogue: HGPhaseFunction (/root/reference/src/pbrt/media.h:28-30 /
util/scattering.h HenyeyGreenstein). Directions are world-space; wo points
back along the arriving ray (pbrt convention: p(wo, wi) with both away from
the collision point).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import coordinate_system, dot, from_local, normalize

INV_4PI = 1.0 / (4.0 * jnp.pi)


def hg_p(cos_theta, g):
    """HG density over solid angle; cos_theta = dot(wo, wi)."""
    g = jnp.clip(g, -0.99, 0.99)
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_4PI * (1.0 - g * g) / jnp.maximum(
        denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12
    )


def hg_pdf(wo, wi, g):
    return hg_p(dot(wo, wi), g)


def hg_sample(wo, u2, g):
    """Sample wi with pdf = hg_p(dot(wo, wi)). Returns (wi, pdf).

    Matches media.h HGPhaseFunction::Sample_p: cos_theta is measured against
    +wo, and the sampled density peaks at cos_theta = -1 for g > 0 — i.e.
    wi = -wo, continuing the ray forward.
    """
    g = jnp.clip(g, -0.99, 0.99)
    u0, u1 = u2[..., 0], u2[..., 1]
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sqr = (1.0 - g_safe * g_safe) / (1.0 + g_safe - 2.0 * g_safe * u0)
    cos_hg = -(1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe)
    cos_iso = 1.0 - 2.0 * u0
    cos_theta = jnp.where(jnp.abs(g) < 1e-3, cos_iso, cos_hg)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * u1
    # Frame around +wo: wi such that dot(wi, wo) = cos_theta.
    axis = normalize(wo)
    t1, t2 = coordinate_system(axis)
    local = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
        axis=-1,
    )
    wi = from_local(local, t1, t2, axis)
    pdf = hg_p(dot(wo, wi), g)
    return wi, pdf
