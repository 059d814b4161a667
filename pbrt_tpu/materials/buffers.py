"""Flat material parameter arrays.

One row per scene material; `kind` is the dispatch tag. RGB parameters are
stored as fitted sigmoid-polynomial coefficients (core.rgb2spec) so spectral
evaluation at sampled wavelengths is a fused polynomial, not a table gather.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import rgb2spec
from ..core.pytree import pytree

MAT_DIFFUSE = 0
MAT_CONDUCTOR = 1
MAT_DIELECTRIC = 2


@pytree
class MaterialBuffers:
    kind: jnp.ndarray  # (M,) int32 dispatch tag
    albedo_coeffs: jnp.ndarray  # (M, 3) sigmoid coeffs of reflectance
    roughness: jnp.ndarray  # (M,) GGX alpha (0 = smooth)
    eta: jnp.ndarray  # (M,) dielectric IOR (or conductor eta proxy)
    k: jnp.ndarray  # (M,) conductor extinction proxy

    @staticmethod
    def build(materials) -> "MaterialBuffers":
        """materials: list of dicts with keys kind, albedo(list rgb),
        roughness, eta, k."""
        kinds, albedos, rough, eta, k = [], [], [], [], []
        for m in materials:
            kinds.append(m.get("kind", MAT_DIFFUSE))
            albedos.append(m.get("albedo", (0.5, 0.5, 0.5)))
            rough.append(m.get("roughness", 0.0))
            eta.append(m.get("eta", 1.5))
            k.append(m.get("k", 0.0))
        coeffs = rgb2spec.fit_albedo(jnp.asarray(albedos, jnp.float32))
        return MaterialBuffers(
            kind=jnp.asarray(kinds, jnp.int32),
            albedo_coeffs=coeffs,
            roughness=jnp.asarray(rough, jnp.float32),
            eta=jnp.asarray(eta, jnp.float32),
            k=jnp.asarray(k, jnp.float32),
        )

    def gather(self, mat_idx):
        """Per-ray material parameters (one gather per field)."""
        return {
            "kind": self.kind[mat_idx],
            "albedo_coeffs": self.albedo_coeffs[mat_idx],
            "roughness": self.roughness[mat_idx],
            "eta": self.eta[mat_idx],
            "k": self.k[mat_idx],
        }
