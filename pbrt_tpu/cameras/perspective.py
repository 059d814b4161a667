"""Perspective (and orthographic) projective cameras.

Reference analogue: ProjectiveCamera -> PerspectiveCamera / OrthographicCamera
(/root/reference/src/pbrt/cameras.h:295-424). Conventions match pbrt: camera
space is left-handed with the view direction +z; the screen window spans
[-1,1] on the wider axis; `fov` is the full angle on the *shorter* image axis.
Thin-lens defocus via lens_radius / focal_distance.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.pytree import pytree, static_field
from ..core.sampling import sample_uniform_disk_concentric
from ..core.transform import Transform
from ..core.vecmath import normalize


@pytree
class PerspectiveCamera:
    camera_to_world: Transform
    resolution: tuple = static_field()  # (nx, ny)
    fov_deg: float = static_field(default=90.0)
    lens_radius: float = static_field(default=0.0)
    focal_distance: float = static_field(default=1e6)
    shutter_open: float = static_field(default=0.0)
    shutter_close: float = static_field(default=1.0)
    # Camera motion blur: AnimatedTransform replacing camera_to_world over
    # the shutter interval (CameraBase + AnimatedTransform in the
    # reference, cameras.h:87 CameraTransform).
    motion: object = None

    def _screen_window(self):
        nx, ny = self.resolution
        aspect = nx / ny
        if aspect > 1.0:
            return (-aspect, aspect, -1.0, 1.0)
        return (-1.0, 1.0, -1.0 / aspect, 1.0 / aspect)

    def sample_time(self, u_time):
        """Map a uniform sample to a shutter time (CameraBase::SampleTime)."""
        return self.shutter_open + u_time * (
            self.shutter_close - self.shutter_open
        )

    def generate_rays(self, p_film, u_lens=None, time=None):
        """p_film: (N, 2) continuous raster coords in [0,nx)x[0,ny).

        Returns (o, d) world-space rays, unit direction. time: optional (N,)
        shutter times — used when `motion` is set (camera motion blur).
        Reference: PerspectiveCamera::GenerateRay (cameras.cpp).
        """
        nx, ny = self.resolution
        x0, x1, y0, y1 = self._screen_window()
        tan_half = float(np.tan(np.deg2rad(self.fov_deg) / 2.0))
        # Raster -> screen (note y flips: raster y grows downward).
        sx = x0 + (p_film[..., 0] / nx) * (x1 - x0)
        sy = y1 - (p_film[..., 1] / ny) * (y1 - y0)
        # Screen -> camera: z=1 plane scaled by tan(fov/2).
        d_cam = jnp.stack(
            [sx * tan_half, sy * tan_half, jnp.ones_like(sx)], axis=-1
        )
        o_cam = jnp.zeros_like(d_cam)
        if self.lens_radius > 0.0 and u_lens is not None:
            p_lens = self.lens_radius * sample_uniform_disk_concentric(u_lens)
            ft = self.focal_distance  # focus plane at z = ft
            p_focus = d_cam * (ft / d_cam[..., 2:3])
            o_cam = jnp.concatenate(
                [p_lens, jnp.zeros_like(p_lens[..., :1])], axis=-1
            )
            d_cam = p_focus - o_cam
        d_cam = normalize(d_cam)
        if self.motion is not None and time is not None:
            o_w = self.motion.apply_point(o_cam, time)
            d_w = self.motion.apply_vector(d_cam, time)
            return o_w, normalize(d_w)
        o_w = self.camera_to_world.apply_point(o_cam)
        d_w = self.camera_to_world.apply_vector(d_cam)
        return o_w, d_w

    @property
    def position(self):
        """World-space pinhole position (lens_radius == 0)."""
        return self.camera_to_world.apply_point(jnp.zeros((1, 3)))[0]

    def pixel_solid_angle_base(self) -> float:
        """Pixel area on the camera-space z=1 plane; the solid angle of pixel
        j is this times cos^3(theta_j) (for light-path / BDPT splatting:
        PerspectiveCamera::We, cameras.cpp)."""
        nx, ny = self.resolution
        x0, x1, y0, y1 = self._screen_window()
        tan_half = float(np.tan(np.deg2rad(self.fov_deg) / 2.0))
        w = (x1 - x0) * tan_half
        h = (y1 - y0) * tan_half
        return (w * h) / (nx * ny)

    def project(self, p_world):
        """World points -> (raster xy, cos_theta_cam, valid_in_film).

        Inverse of generate_rays' raster mapping (pinhole path).
        """
        nx, ny = self.resolution
        x0, x1, y0, y1 = self._screen_window()
        tan_half = float(np.tan(np.deg2rad(self.fov_deg) / 2.0))
        p_cam = self.camera_to_world.inverse().apply_point(p_world)
        z = p_cam[..., 2]
        valid = z > 1e-6
        zs = jnp.where(valid, z, 1.0)
        sx = p_cam[..., 0] / (zs * tan_half)
        sy = p_cam[..., 1] / (zs * tan_half)
        px = (sx - x0) / (x1 - x0) * nx
        py = (y1 - sy) / (y1 - y0) * ny
        cos_t = zs / jnp.sqrt(jnp.sum(p_cam * p_cam, axis=-1) + 1e-20)
        inside = (
            valid & (px >= 0) & (px < nx) & (py >= 0) & (py < ny)
        )
        return jnp.stack([px, py], axis=-1), cos_t, inside
