"""Chi-squared goodness-of-fit harness for BxDF sampling.

Ports the methodology of /root/reference/src/pbrt/bsdfs_test.cpp:31-53 to
vectorized JAX/numpy: build an 80x160 (theta, phi) frequency table from ~1M
Sample_f draws over the full sphere, integrate the claimed PDF over each
cell with midpoint quadrature, pool cells with expected count < 5, and
compare with a chi-squared test at significance 0.01 with Sidak correction
across runs (bsdfs_test.cpp:32,365).
"""

from __future__ import annotations

import numpy as np
from scipy.stats import chi2 as _chi2

THETA_RES = 80
PHI_RES = 160
MIN_EXPECTED = 5.0
SIGNIFICANCE = 0.01


def uniform_streams(n, dims, seed):
    """Deterministic uniforms via the repo's stateless pcg4d streams."""
    import jax.numpy as jnp

    from pbrt_tpu.core import rng as prng

    idx = jnp.arange(n, dtype=jnp.int32)
    cols = [
        np.asarray(prng.uniform_1d(idx, jnp.int32(seed), jnp.int32(d)))
        for d in range(dims)
    ]
    return np.stack(cols, axis=-1)


def histogram_sphere(wi, weights=None):
    """(THETA_RES, PHI_RES) counts of unit directions over the sphere."""
    wi = np.asarray(wi)
    cos_t = np.clip(wi[:, 2], -1.0, 1.0)
    theta = np.arccos(cos_t)
    phi = np.arctan2(wi[:, 1], wi[:, 0]) + np.pi
    ti = np.minimum((theta / np.pi * THETA_RES).astype(np.int64), THETA_RES - 1)
    pi_ = np.minimum((phi / (2 * np.pi) * PHI_RES).astype(np.int64), PHI_RES - 1)
    flat = ti * PHI_RES + pi_
    counts = np.bincount(
        flat, weights=weights, minlength=THETA_RES * PHI_RES
    )
    return counts.reshape(THETA_RES, PHI_RES)


def integrate_pdf(pdf_fn, sub=5, batch=200_000):
    """Expected probability mass per cell: sub x sub midpoint quadrature of
    pdf(wi) * sin(theta) over each (theta, phi) cell."""
    t_edges = np.linspace(0.0, np.pi, THETA_RES + 1)
    p_edges = np.linspace(0.0, 2 * np.pi, PHI_RES + 1)
    dt = t_edges[1] - t_edges[0]
    dp = p_edges[1] - p_edges[0]
    offs = (np.arange(sub) + 0.5) / sub
    tt = (t_edges[:-1, None] + offs[None, :] * dt).reshape(-1)  # (T*sub,)
    pp = (p_edges[:-1, None] + offs[None, :] * dp).reshape(-1)  # (P*sub,)
    T, P = tt.shape[0], pp.shape[0]
    theta = np.repeat(tt, P)
    phi = np.tile(pp, T)
    st, ct = np.sin(theta), np.cos(theta)
    wi = np.stack(
        [st * np.cos(phi - np.pi), st * np.sin(phi - np.pi), ct], axis=-1
    ).astype(np.float32)
    vals = np.concatenate(
        [np.asarray(pdf_fn(wi[i:i + batch])) for i in range(0, wi.shape[0], batch)]
    )
    integrand = (vals * st).reshape(THETA_RES, sub, PHI_RES, sub)
    return integrand.mean(axis=(1, 3)) * dt * dp


def chi2_statistic(counts, expected):
    """Pool cells below MIN_EXPECTED (bsdfs_test.cpp:48), return (stat, dof)."""
    c = counts.reshape(-1)
    e = expected.reshape(-1)
    big = e >= MIN_EXPECTED
    stat = float(np.sum((c[big] - e[big]) ** 2 / np.maximum(e[big], 1e-12)))
    dof = int(big.sum()) - 1
    pc, pe = float(c[~big].sum()), float(e[~big].sum())
    if pe > MIN_EXPECTED:
        stat += (pc - pe) ** 2 / pe
        dof += 1
    return stat, max(dof, 1)


def run_chi2(sample_fn, pdf_fn, n_samples=1 << 20, seed=0, n_tests=1,
             sub=5):
    """One chi-squared run.

    sample_fn(u2 (N,2), uc (N,)) -> (wi (N,3), keep (N,) bool) — keep masks
    out rejected/specular draws (their mass must be absent from pdf too).
    pdf_fn(wi (N,3)) -> (N,) solid-angle pdf of the continuous component.
    Returns (passed, p_value, stat, dof).
    """
    u = uniform_streams(n_samples, 3, seed)
    wi, keep = sample_fn(u[:, 0:2], u[:, 2])
    wi = np.asarray(wi)[np.asarray(keep)]
    counts = histogram_sphere(wi)
    expected = integrate_pdf(pdf_fn, sub=sub) * n_samples
    stat, dof = chi2_statistic(counts, expected)
    p = float(_chi2.sf(stat, dof))
    alpha = 1.0 - (1.0 - SIGNIFICANCE) ** (1.0 / max(n_tests, 1))
    return p >= alpha, p, stat, dof


def rho_energy(sample_fn_full, n=1 << 18, seed=7):
    """Hemispherical albedo estimate: mean of f*|cos|/pdf over samples.

    sample_fn_full(u2, uc) -> (wi, f_over_pdf_cos (N,) or (N,S), keep).
    Returns the mean estimate (must be <= 1 + tolerance for passive BxDFs;
    bsdfs_test.cpp energy-conservation tests :555-652)."""
    u = uniform_streams(n, 3, seed)
    _wi, weight, keep = sample_fn_full(u[:, 0:2], u[:, 2])
    w = np.asarray(weight)
    k = np.asarray(keep)
    if w.ndim == 2:
        w = w.mean(axis=-1)
    return float(np.where(k, w, 0.0).mean())
