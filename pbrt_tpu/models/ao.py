"""Ambient-occlusion and simple-path integrators.

Reference analogue: AOIntegrator (/root/reference/src/pbrt/cpu/
integrators.h:296) and SimplePathIntegrator (:183 — no MIS, optional
NEE/BSDF-sampling toggles, used as a correctness oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..accel import api as accel_api
from ..accel.dense import offset_ray_origin
from ..core.pytree import pytree, static_field
from ..core.sampling import sample_cosine_hemisphere
from ..core.vecmath import coordinate_system, dot, from_local, shading_frame
from ..scene import Scene
from .path import PathIntegrator


def SimplePathIntegrator(max_depth: int = 5, sample_lights: bool = True,
                         sample_bsdf: bool = True) -> PathIntegrator:
    """pbrt's SimplePath = path tracing without MIS (integrators.h:183)."""
    return PathIntegrator(
        max_depth=max_depth,
        use_nee=sample_lights,
        use_mis=False,
        rr_start_depth=10**6,
    )


@pytree
class AOIntegrator:
    """Cosine-weighted ambient occlusion (integrators.h:296)."""

    max_distance: float = static_field(default=1e30)
    illuminant_scale: float = static_field(default=1.0)

    def trace(self, scene: Scene, o, d, wl, pixel, sample_idx, sampler):
        return self.trace_with_stats(
            scene, o, d, wl, pixel, sample_idx, sampler
        )[0]

    def trace_with_stats(self, scene: Scene, o, d, wl, pixel, sample_idx,
                         sampler):
        from ..samplers.samplers import as_sampler

        sampler = as_sampler(sampler)
        n = o.shape[0]
        s = wl.lam.shape[-1]

        isect = accel_api.closest(scene, o, d)
        ns = isect.n * jnp.sign(
            jnp.where(
                dot(isect.n, isect.wo, keepdims=True) == 0.0,
                1.0,
                dot(isect.n, isect.wo, keepdims=True),
            )
        )
        t1, t2 = coordinate_system(ns)
        u = sampler.get_2d(pixel, sample_idx, 8)
        wi_local = sample_cosine_hemisphere(jnp.stack(u, axis=-1))
        wi = from_local(wi_local, t1, t2, ns)
        so = offset_ray_origin(isect.p, isect.n, wi)
        occluded = accel_api.any_hit(
            scene, so, wi, jnp.full((n,), self.max_distance)
        )
        # Estimator: (cos/pi) / pdf(=cos/pi) * visibility = visibility.
        vis = (~occluded & isect.valid).astype(jnp.float32)
        L = jnp.broadcast_to(
            (vis * self.illuminant_scale)[:, None], (n, s)
        )
        rays = jnp.asarray(2 * n, jnp.float32)
        return L, {"rays": rays}


@pytree
class RandomWalkIntegrator:
    """Uniform-hemisphere random walk without NEE — the teaching/correctness
    oracle (integrators.h:115 RandomWalkIntegrator)."""

    max_depth: int = static_field(default=5)

    def trace(self, scene: Scene, o, d, wl, pixel, sample_idx, sampler):
        return self.trace_with_stats(
            scene, o, d, wl, pixel, sample_idx, sampler
        )[0]

    def trace_with_stats(self, scene: Scene, o, d, wl, pixel, sample_idx,
                         sampler):
        from ..core.sampling import UNIFORM_SPHERE_PDF, sample_uniform_sphere
        from ..core.vecmath import dot as vdot
        from ..materials import bxdf as bxdf_mod
        from ..core.vecmath import to_local as _to_local
        from ..samplers.samplers import as_sampler

        sampler = as_sampler(sampler)
        n = o.shape[0]
        s = wl.lam.shape[-1]
        lam = wl.lam

        def bounce(carry, depth):
            o, d = carry["o"], carry["d"]
            L, beta, active = carry["L"], carry["beta"], carry["active"]
            isect = accel_api.closest(scene, o, d)
            hit = active & isect.valid
            le = scene.lights.emitted(isect.light, isect.n, isect.wo, lam)
            L = L + jnp.where(
                (hit & (isect.light >= 0))[..., None], beta * le, 0.0
            )
            escaped = active & ~isect.valid
            L = L + jnp.where(
                escaped[..., None],
                beta * scene.lights.escaped_radiance(d, lam, o),
                0.0,
            )
            ns = isect.n * jnp.sign(
                jnp.where(
                    vdot(isect.n, isect.wo, keepdims=True) == 0.0, 1.0,
                    vdot(isect.n, isect.wo, keepdims=True),
                )
            )
            t1, t2 = shading_frame(ns, isect.dpdu)
            params = bxdf_mod.surface_params(scene, isect, lam)
            u = sampler.get_2d(pixel, sample_idx, 8 + depth * 4)
            wi = sample_uniform_sphere(jnp.stack(u, axis=-1))
            wo_l = _to_local(isect.wo, t1, t2, ns)
            wi_l = _to_local(wi, t1, t2, ns)
            f = bxdf_mod.evaluate(params, wo_l, wi_l, lam)
            cosw = jnp.abs(wi_l[..., 2])
            beta = jnp.where(
                hit[..., None],
                beta * f * (cosw / UNIFORM_SPHERE_PDF)[..., None],
                beta,
            )
            o_new = offset_ray_origin(isect.p, isect.n, wi)
            return {
                "o": jnp.where(hit[..., None], o_new, o),
                "d": jnp.where(hit[..., None], wi, d),
                "L": L,
                "beta": beta,
                "active": hit,
            }, None

        init = {
            "o": o, "d": d,
            "L": jnp.zeros((n, s), o.dtype),
            "beta": jnp.ones((n, s), o.dtype),
            "active": jnp.ones((n,), bool),
        }
        final, _ = jax.lax.scan(
            bounce, init, jnp.arange(self.max_depth), length=self.max_depth
        )
        return final["L"], {"rays": jnp.asarray(n * self.max_depth, jnp.float32)}
