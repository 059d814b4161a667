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
    # Exit-pupil bounds per film-radius segment: (S, 4) [x0, x1, y0, y1]
    # rear-element-plane rectangles (RealisticCamera::ComputeExitPupilBounds,
    # cameras.h:544). None -> sample the full rear disk.
    pupil_bounds: object = None

    @staticmethod
    def create(camera_to_world, lens, resolution, film_diag_mm=35.0,
               exit_pupil=True, n_pupil_segments=32):
        cam = RealisticCamera(
            camera_to_world=camera_to_world, lens=lens,
            resolution=resolution, film_diag_mm=film_diag_mm,
        )
        if exit_pupil:
            cam = cam.replace(pupil_bounds=compute_exit_pupil_bounds(
                lens, film_diag_mm, n_segments=n_pupil_segments,
            ))
        return cam

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
        rear_z = self.lens.vertex_z[0]
        rear_r = (
            jnp.sqrt(self.lens.aperture2[0]) * self.rear_radius_scale
        )
        if self.pupil_bounds is None:
            # Full rear-disk sampling (most samples vignette through
            # multi-element stops; kept as the fallback path).
            p_disk = sample_uniform_disk_concentric(u_lens) * rear_r
            px, py = p_disk[..., 0], p_disk[..., 1]
            w_pupil = jnp.ones_like(fx)
        else:
            # SampleExitPupil (cameras.h:551): pick the precomputed pupil
            # rectangle for this film radius, sample uniformly inside it,
            # and rotate into the film point's azimuthal frame. The weight
            # ratio area_bounds/area_disk keeps the estimator's expectation
            # identical to full-disk sampling while concentrating samples
            # on the non-vignetted window.
            from ..core.gather import gather_rows

            nseg = self.pupil_bounds.shape[0]
            r_film = jnp.sqrt(fx * fx + fy * fy)
            r_max = 0.5 * self.film_diag_mm
            seg = jnp.clip(
                (r_film / r_max * nseg).astype(jnp.int32), 0, nseg - 1
            )
            b = gather_rows(self.pupil_bounds, seg)  # (N, 4)
            bx = b[..., 0] + u_lens[..., 0] * (b[..., 1] - b[..., 0])
            by = b[..., 2] + u_lens[..., 1] * (b[..., 3] - b[..., 2])
            area = jnp.maximum(
                (b[..., 1] - b[..., 0]) * (b[..., 3] - b[..., 2]), 0.0
            )
            safe_r = jnp.maximum(r_film, 1e-8)
            cos_p = jnp.where(r_film > 1e-8, fx / safe_r, 1.0)
            sin_p = jnp.where(r_film > 1e-8, fy / safe_r, 0.0)
            px = cos_p * bx - sin_p * by
            py = sin_p * bx + cos_p * by
            w_pupil = area / jnp.maximum(np.pi * rear_r * rear_r, 1e-12)
        target = jnp.stack(
            [px, py, jnp.broadcast_to(rear_z, fx.shape)], axis=-1
        )
        d = normalize(target - o)
        o_out, d_out, valid = trace_through_stack(self.lens, o, d)
        o_w = self.camera_to_world.apply_point(o_out)
        d_w = normalize(self.camera_to_world.apply_vector(d_out))
        return o_w, d_w, valid.astype(jnp.float32) * w_pupil


def compute_exit_pupil_bounds(lens: LensStack, film_diag_mm: float,
                              n_segments: int = 32, n_grid: int = 48):
    """Per-film-radius-segment bounding rectangles of the non-vignetted
    rear-element window (RealisticCamera::ComputeExitPupilBounds,
    cameras.h:544): trace a grid of candidate pupil points from the outer
    radius of each segment, keep the bbox of survivors, padded by one grid
    cell. Host-side, one vectorized trace for all segments."""
    rear_z = float(lens.vertex_z[0])
    rear_r = float(np.sqrt(lens.aperture2[0]))
    r_max = 0.5 * film_diag_mm
    s = np.arange(n_segments)
    # Sample the segment's outer edge (conservative for the whole segment).
    film_x = (s + 1.0) / n_segments * r_max
    g = (np.arange(n_grid) + 0.5) / n_grid * 2.0 - 1.0
    px, py = np.meshgrid(g * rear_r, g * rear_r, indexing="ij")
    o = np.zeros((n_segments, n_grid, n_grid, 3), np.float32)
    o[..., 0] = film_x[:, None, None]
    tgt = np.zeros_like(o)
    tgt[..., 0] = px[None]
    tgt[..., 1] = py[None]
    tgt[..., 2] = rear_z
    o_j = jnp.asarray(o.reshape(-1, 3))
    d_j = normalize(jnp.asarray(tgt.reshape(-1, 3)) - o_j)
    _, _, valid = trace_through_stack(lens, o_j, d_j)
    valid = np.asarray(valid).reshape(n_segments, n_grid, n_grid)
    pad = 2.0 * rear_r / n_grid
    bounds = np.zeros((n_segments, 4), np.float32)
    for i in range(n_segments):
        m = valid[i]
        if not m.any():
            # Nothing survives (fully vignetted segment): degenerate box.
            bounds[i] = (0.0, 0.0, 0.0, 0.0)
            continue
        xs = px[m]
        ys = py[m]
        bounds[i] = (
            xs.min() - pad, xs.max() + pad, ys.min() - pad, ys.max() + pad
        )
    return jnp.asarray(bounds)


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
