"""Realistic (lens-stack) and Omni cameras.

Reference analogue: RealisticCamera (/root/reference/src/pbrt/cameras.h:485,
full element-by-element lens tracing with exit-pupil precomputation) and the
ISET OmniCamera (:853-1086; adds conic/aspheric surfaces + microlens array —
conics are supported here through the shared LensStack; microlens arrays and
HURB diffraction are later tiers).

TPU design: GenerateRay = sample a point on the rear element disk, build the
film->rear ray, then trace the whole batch through the stack with one scan.
Rays clipped by apertures return weight 0 (vignetting) instead of resampling
— the film accumulates weighted samples, so the estimator matches pbrt's
exit-pupil-area weighting up to normalization.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.pytree import pytree, static_field
from ..core.sampling import sample_uniform_disk_concentric
from ..core.transform import Transform
from ..core.vecmath import normalize
from .lens import LensStack, trace_through_stack


@pytree
class RealisticCamera:
    camera_to_world: Transform
    lens: LensStack
    resolution: tuple = static_field()
    film_diag_mm: float = static_field(default=35.0)
    # Distance film -> rear element vertex is lens.vertex_z[0]; the rear
    # aperture radius bounds the sampled pupil disk.
    rear_radius_scale: float = static_field(default=1.0)
    shutter_open: float = static_field(default=0.0)
    shutter_close: float = static_field(default=1.0)

    def _film_extent(self):
        nx, ny = self.resolution
        aspect = nx / ny
        diag = self.film_diag_mm
        h = diag / np.sqrt(1.0 + aspect * aspect)
        w = aspect * h
        return w, h

    def generate_rays(self, p_film, u_lens):
        """p_film: (N, 2) raster coords; u_lens: (N, 2) pupil samples.

        Returns (o_world, d_world, weight) — weight 0 marks vignetted rays.
        All lens math is in millimetres in the camera frame (film at z=0,
        scene toward +z); output is in world units (the camera_to_world
        transform carries the mm -> scene-unit scale).
        """
        nx, ny = self.resolution
        w, h = self._film_extent()
        # Film point (note image is inverted through the lens; flip to keep
        # the final image upright, as pbrt does).
        fx = (0.5 - p_film[..., 0] / nx) * w
        fy = (p_film[..., 1] / ny - 0.5) * h
        o = jnp.stack([fx, fy, jnp.zeros_like(fx)], axis=-1)
        # Sample the rear element disk.
        rear_z = self.lens.vertex_z[0]
        rear_r = (
            jnp.sqrt(self.lens.aperture2[0]) * self.rear_radius_scale
        )
        p_disk = sample_uniform_disk_concentric(u_lens) * rear_r
        target = jnp.stack(
            [p_disk[..., 0], p_disk[..., 1], jnp.broadcast_to(rear_z, fx.shape)],
            axis=-1,
        )
        d = normalize(target - o)
        o_out, d_out, valid = trace_through_stack(self.lens, o, d)
        o_w = self.camera_to_world.apply_point(o_out)
        d_w = normalize(self.camera_to_world.apply_vector(d_out))
        return o_w, d_w, valid.astype(jnp.float32)


def biconvex_singlet(
    focal_mm: float = 50.0, aperture_mm: float = 12.5, eta: float = 1.5,
    film_distance_mm: float | None = None,
) -> LensStack:
    """A symmetric thin biconvex lens with the requested focal length
    (lensmaker's equation), for tests and as a default lens."""
    # 1/f = (n-1) (1/R1 - 1/R2) with R2 = -R1 -> R = 2 (n-1) f.
    r = 2.0 * (eta - 1.0) * focal_mm
    fd = film_distance_mm if film_distance_mm is not None else focal_mm
    thick = 2.0
    # Conicoid sign convention (lens.py): local z = rho^2/(2R), so R > 0
    # recedes toward the scene (convex toward the film) and R < 0 is convex
    # toward the scene. Biconvex = (+R film side, -R scene side).
    return LensStack.build(
        [
            # film -> scene ordering; rear surface first.
            {"z": fd, "radius": r, "conic": 0.0, "aperture": aperture_mm,
             "eta_before": 1.0, "eta_after": eta},
            {"z": fd + thick, "radius": -r, "conic": 0.0,
             "aperture": aperture_mm, "eta_before": eta, "eta_after": 1.0},
        ]
    )


def omni_camera(
    camera_to_world, resolution, lens: LensStack, film_diag_mm: float = 35.0
) -> RealisticCamera:
    """OmniCamera = RealisticCamera over a conic-capable lens stack.

    (The ISET Omni extensions beyond conics — microlens arrays, HURB
    diffraction — are tracked for a later tier.)
    """
    return RealisticCamera(
        camera_to_world=camera_to_world,
        lens=lens,
        resolution=resolution,
        film_diag_mm=film_diag_mm,
    )
