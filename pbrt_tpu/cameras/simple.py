"""Orthographic and spherical cameras.

Reference analogue: OrthographicCamera (/root/reference/src/pbrt/cameras.h:295)
and SphericalCamera (:425, equal-area / equirectangular mappings).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.pytree import pytree, static_field
from ..core.transform import Transform
from ..core.vecmath import equal_area_square_to_sphere, normalize


@pytree
class OrthographicCamera:
    camera_to_world: Transform
    resolution: tuple = static_field()
    screen_half_width: float = static_field(default=1.0)

    def generate_rays(self, p_film, u_lens=None):
        nx, ny = self.resolution
        aspect = nx / ny
        hw = self.screen_half_width
        hh = hw / aspect
        sx = (p_film[..., 0] / nx * 2.0 - 1.0) * hw
        sy = (1.0 - p_film[..., 1] / ny * 2.0) * hh
        o = jnp.stack([sx, sy, jnp.zeros_like(sx)], axis=-1)
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), o.shape)
        return (
            self.camera_to_world.apply_point(o),
            normalize(self.camera_to_world.apply_vector(d)),
        )


@pytree
class SphericalCamera:
    camera_to_world: Transform
    resolution: tuple = static_field()
    mapping: str = static_field(default="equalarea")  # or "equirectangular"

    def generate_rays(self, p_film, u_lens=None):
        nx, ny = self.resolution
        u = p_film[..., 0] / nx
        v = p_film[..., 1] / ny
        if self.mapping == "equalarea":
            d = equal_area_square_to_sphere(jnp.stack([u, v], axis=-1))
        else:
            theta = v * jnp.pi
            phi = u * 2.0 * jnp.pi
            st = jnp.sin(theta)
            d = jnp.stack(
                [st * jnp.cos(phi), jnp.cos(theta), st * jnp.sin(phi)],
                axis=-1,
            )
        o = jnp.zeros_like(d)
        return (
            self.camera_to_world.apply_point(o),
            normalize(self.camera_to_world.apply_vector(d)),
        )
