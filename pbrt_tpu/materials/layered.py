"""LayeredBxDF: stochastic 1D-transport walk through a coated surface.

Reference analogue: LayeredBxDF (/root/reference/src/pbrt/bxdfs.h:565-1035)
specialized to the CoatedDiffuse / CoatedConductor configurations
(top = rough dielectric interface, bottom = opaque base lobe). The BSDF
value is itself a Monte Carlo estimate: simulate light entering through the
interface, attenuating through the layer medium, reflecting off the base,
and bouncing between base and interface until it exits — with next-event
estimation toward the exit direction at every interior vertex
(bxdfs.h:699-830). pbrt evaluates this with a per-(wo, wi) deterministic
RNG (`RNG rng(Hash(wo), Hash(wi))`, bxdfs.h:692); we do exactly the same
with pcg4d over the direction bit patterns, so evaluation stays a pure
function and the whole estimator JITs as a fixed-depth masked scan.

Differences from the reference, by design:
  * The layer medium is absorbing-only (albedo = 0 path of the reference
    walk, bxdfs.h:785-793: beta *= Tr(thickness, w)); HG in-layer
    scattering is a planned extension.
  * The interior interface bounce samples the top interface's REFLECTION
    lobe (downward) exactly like bxdfs.h:879-906, but TIR handling rides
    the dielectric Fresnel (no separate flag).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.vecmath import normalize
from . import scattering as sc

_EPS = 1e-7


def _bits(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _walk_rng(wo, wi, salt):
    """Deterministic per-(wo, wi, salt) uniform stream (bxdfs.h:692)."""
    a = _bits(wo[..., 0]) ^ (_bits(wo[..., 2]) << 1)
    b = _bits(wi[..., 0]) ^ (_bits(wi[..., 2]) << 1)

    def uniform(i):
        v0, v1, _, _ = rng.pcg4d(a, b, jnp.uint32(salt), jnp.uint32(i))
        return rng.u32_to_uniform(v0), rng.u32_to_uniform(v1)

    return uniform


def _abscos(w):
    return jnp.abs(w[..., 2])


def _tr(thickness, w):
    """Beer-Lambert transmittance for one layer crossing (bxdfs.h:556)."""
    return jnp.exp(-jnp.abs(thickness / jnp.maximum(_abscos(w), 1e-6)))


def _interface_refract(wo, wm, eta):
    """Refract wo about microfacet wm (Snell); returns (wi, ok)."""
    cos_i = jnp.sum(wo * wm, axis=-1)
    flip = cos_i < 0.0
    wm_f = jnp.where(flip[..., None], -wm, wm)
    cos_i = jnp.abs(cos_i)
    eta_r = jnp.where(wo[..., 2] > 0.0, eta, 1.0 / eta)
    sin2_t = jnp.maximum(0.0, 1.0 - cos_i * cos_i) / (eta_r * eta_r)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wi = (-wo / eta_r[..., None]
          + (cos_i / eta_r - cos_t)[..., None] * wm_f)
    return normalize(wi), ~tir


def _top_sample(wo, u2, uc, alpha, eta, mode_transmit, radiance=True):
    """Sample the dielectric interface lobe: returns (wi, weight, ok).

    weight = f * |cos| / pdf for the chosen event class
    (DielectricBxDF::Sample_f, bxdfs.h:332-420 restricted to the requested
    class). `radiance` selects the transport mode: radiance-mode
    transmission carries the 1/eta_rel^2 radiance-compression factor;
    importance mode (the walk's exit coupling path, bxdfs.h:758's !mode)
    does not."""
    alpha_r = jnp.maximum(alpha, 1e-4)
    wm = sc.ggx_sample_wm(wo, u2, alpha_r)
    cos_om = jnp.sum(wo * wm, axis=-1)
    eta_rel = jnp.where(wo[..., 2] > 0.0, eta, 1.0 / eta)
    fr = sc.fr_dielectric(jnp.abs(cos_om), eta_rel)
    if mode_transmit:
        wi, ok = _interface_refract(wo, wm, eta)
        # Class-restricted transmission weight f|cos|/pdf = (1-F) * G2/G1:
        # with reflection disabled the selection probability is 1, so the
        # (1-F) in the BTDF does NOT cancel (DielectricBxDF::Sample_f flag
        # handling, bxdfs.h:380-420).
        w = (1.0 - fr) * sc.ggx_g(wo, wi, alpha_r) / jnp.maximum(
            sc.ggx_g1(wo, alpha_r), 1e-6
        )
        if radiance:
            w = w / (eta_rel * eta_rel)
        ok = ok & (wi[..., 2] * wo[..., 2] < 0.0)
        return wi, jnp.where(ok, w, 0.0), ok & (fr < 1.0 - 1e-6)
    wi = -wo + 2.0 * cos_om[..., None] * wm
    ok = wi[..., 2] * wo[..., 2] > 0.0
    w = sc.ggx_g(wo, wi, alpha_r) / jnp.maximum(
        sc.ggx_g1(wo, alpha_r), 1e-6
    )
    return wi, jnp.where(ok, w, 0.0), ok


def layered_walk(
    wo, wi, base_f_fn, base_sample_fn, alpha_c, eta=1.5,
    thickness=0.01, n_samples=2, max_depth=10, salt=0,
):
    """Stochastic estimate of the layered BSDF value f(wo, wi): (N, S).

    base_f_fn(wo_l, wi_l) -> (N, S); base_sample_fn(wo_l, u2, uc) ->
    (wi, f, pdf) for the opaque bottom lobe. Directions are in the local
    frame with z up; wo, wi must be in the upper hemisphere (opaque base).
    """
    n = wo.shape[0]
    alpha_c = jnp.broadcast_to(jnp.asarray(alpha_c, jnp.float32), (n,))
    eta_v = jnp.full((n,), eta, jnp.float32)

    # Direct specular reflection at the entrance interface (bxdfs.h:706).
    wm_ok = jnp.sum((wo + wi) ** 2, axis=-1) > 1e-16
    wm = normalize(wo + wi)
    fr_m = sc.fr_dielectric(jnp.abs(jnp.sum(wo * wm, -1)), eta_v)
    d = sc.ggx_d(wm, alpha_c)
    g = sc.ggx_g(wo, wi, alpha_c)
    spec = jnp.where(
        wm_ok & (wi[..., 2] * wo[..., 2] > 0.0),
        d * g * fr_m / jnp.maximum(4.0 * _abscos(wo) * _abscos(wi), _EPS),
        0.0,
    )

    s_dim = base_f_fn(wo, wi).shape[-1]
    f_acc = jnp.zeros((n, s_dim), jnp.float32)

    for s_i in range(n_samples):
        uni = _walk_rng(wo, wi, salt * 131 + s_i)
        # Enter: transmit wo through the interface (bxdfs.h:747).
        u0a, u0b = uni(0)
        u0c, _ = uni(1)
        w_in, wt_in, ok_in = _top_sample(
            wo, jnp.stack([u0a, u0b], -1), u0c, alpha_c, eta_v, True
        )
        # Exit importance path: transmit wi inward (bxdfs.h:758) — gives
        # the exit-side coupling weight for NEE at interior vertices.
        u1a, u1b = uni(2)
        u1c, _ = uni(3)
        w_exit, wt_exit, ok_exit = _top_sample(
            wi, jnp.stack([u1a, u1b], -1), u1c, alpha_c, eta_v, True,
            radiance=False,
        )
        beta = jnp.where(
            (ok_in & ok_exit), wt_in, 0.0
        )[..., None] * jnp.ones((n, s_dim))
        beta_exit = jnp.where(ok_exit, wt_exit, 0.0)

        w = w_in  # traveling downward (z < 0)
        contrib = jnp.zeros((n, s_dim), jnp.float32)
        for depth in range(max_depth):
            du = 4 + depth * 3
            # Cross the layer toward the base, attenuating (bxdfs.h:785).
            beta = beta * _tr(thickness, w)[..., None]
            # --- Base vertex: NEE toward the exit direction -w_exit
            # (bxdfs.h:806-830): f_base(-w, -w_exit) * Tr * exit coupling.
            wo_b = -w  # pointing up/away from base
            wi_b = -w_exit
            f_nee = base_f_fn(wo_b, wi_b) * _abscos(wi_b)[..., None]
            contrib = contrib + (
                beta * f_nee * (_tr(thickness, wi_b) * beta_exit)[..., None]
            )
            # --- Sample the base lobe to continue upward (bxdfs.h:838).
            ua, ub = uni(du)
            uc_, _ = uni(du + 1)
            wi_up, f_b, pdf_b = base_sample_fn(
                wo_b, jnp.stack([ua, ub], -1), uc_
            )
            ok_b = (pdf_b > 1e-9) & (wi_up[..., 2] > 0.0)
            beta = jnp.where(
                ok_b[..., None],
                beta * f_b * (_abscos(wi_up)
                              / jnp.maximum(pdf_b, 1e-9))[..., None],
                0.0,
            )
            w = jnp.where(ok_b[..., None], wi_up, w)
            # Cross back up to the interface. Exit energy is carried
            # EXCLUSIVELY by the per-base-vertex NEE above (with albedo = 0
            # every transmitted path's last scatter is at the base, so that
            # estimator covers each exit path exactly once — the reference's
            # specular-exit-interface branch, bxdfs.h:812-818); here the
            # walk only reflects back down with the Fresnel mass.
            beta = beta * _tr(thickness, w)[..., None]
            # --- Reflect back down at the interface (bxdfs.h:879):
            # interface.Sample_f(-w, Reflection); the BxDF-convention
            # outgoing direction is -w (away from the interface, pointing
            # back into the layer), and the sampled wi IS the new
            # downward propagation direction.
            ra, rb = uni(du + 2)
            w_dn, wt_r, ok_r = _top_sample(
                -w, jnp.stack([ra, rb], -1), ra, alpha_c, eta_v, False
            )
            # Internal Fresnel (dense -> air side): carries TIR mass.
            fr_i = sc.fr_dielectric(_abscos(w), 1.0 / eta_v)
            # Weight: choosing reflection happens with prob 1 here, so the
            # Fresnel reflectance multiplies beta directly.
            ok_r = ok_r & (w_dn[..., 2] < 0.0)
            beta = jnp.where(
                ok_r[..., None], beta * (fr_i * wt_r)[..., None], 0.0
            )
            w = jnp.where(ok_r[..., None], w_dn, w)

        f_acc = f_acc + contrib

    return spec[..., None] + f_acc / n_samples
