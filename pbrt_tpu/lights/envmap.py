"""Image-based infinite lights on the equal-area octahedral parameterization.

Reference analogue: ImageInfiniteLight (/root/reference/src/pbrt/lights.h:
557-640): an equal-area octahedral environment image with a
PiecewiseConstant2D importance distribution. The equal-area map's constant
Jacobian (4*pi / 1) makes pdf conversion a multiplication — no sin(theta)
terms (the reason pbrt adopted it; util/vecmath.h EqualAreaSquareToSphere).

RGB texels are fitted to sigmoid-polynomial spectra at build time (the
on-the-fly rgb2spec fit vectorizes over all texels at once).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import rgb2spec
from ..core.pytree import pytree
from ..core.sampling import PiecewiseConstant2D
from ..core.vecmath import (
    equal_area_sphere_to_square,
    equal_area_square_to_sphere,
)

_INV_4PI = 1.0 / (4.0 * np.pi)


@pytree
class EnvironmentMap:
    coeffs: jnp.ndarray  # (H, W, 3) sigmoid coefficients per texel
    scale: jnp.ndarray  # (H, W) spectrum scale per texel
    dist: PiecewiseConstant2D  # importance distribution over the map
    luminance: jnp.ndarray  # (H, W) for MIS pdf lookups
    strength: jnp.ndarray  # () global scale

    @staticmethod
    def build(rgb_image, strength: float = 1.0) -> "EnvironmentMap":
        """rgb_image: (H, W, 3) linear RGB in the equal-area octahedral
        layout (use `from_latlong` for equirectangular sources)."""
        img = jnp.asarray(rgb_image, jnp.float32)
        coeffs, scale = rgb2spec.fit_unbounded(img)
        lum = jnp.mean(img, axis=-1)
        dist = PiecewiseConstant2D.build(jnp.maximum(lum, 1e-9))
        return EnvironmentMap(
            coeffs=coeffs,
            scale=scale,
            dist=dist,
            luminance=lum,
            strength=jnp.asarray(strength, jnp.float32),
        )

    @staticmethod
    def from_latlong(latlong_rgb, out_res: int = 256, strength: float = 1.0):
        """Resample an equirectangular (lat-long) image to the octahedral
        layout (the imgtool `makeequiarea` operation, cmd/imgtool.cpp)."""
        src = np.asarray(latlong_rgb, np.float32)
        sh, sw, _ = src.shape
        u = (np.arange(out_res) + 0.5) / out_res
        uu, vv = np.meshgrid(u, u, indexing="xy")
        p = np.stack([uu, vv], axis=-1).reshape(-1, 2)
        d = np.asarray(equal_area_square_to_sphere(jnp.asarray(p)))
        theta = np.arccos(np.clip(d[:, 2], -1, 1))
        phi = np.arctan2(d[:, 1], d[:, 0]) % (2 * np.pi)
        x = np.clip((phi / (2 * np.pi) * sw).astype(int), 0, sw - 1)
        y = np.clip((theta / np.pi * sh).astype(int), 0, sh - 1)
        img = src[y, x].reshape(out_res, out_res, 3)
        return EnvironmentMap.build(img, strength)

    @property
    def resolution(self):
        return self.luminance.shape

    def _texel(self, uv):
        """Nearest-texel lookup of (coeffs, scale) at uv in [0,1]^2."""
        h, w = self.resolution
        xi = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        return self.coeffs[yi, xi], self.scale[yi, xi]

    def radiance(self, directions, lam):
        """L for rays escaping in `directions`: (N, 3) x (N, S) -> (N, S)."""
        uv = equal_area_sphere_to_square(directions)
        c, s = self._texel(uv)
        return rgb2spec.eval_unbounded(c, s, lam) * self.strength

    def sample(self, u2, lam):
        """Importance-sample a direction. Returns (wi, L, pdf_solidangle)."""
        uv, pdf_uv = self.dist.sample(u2)
        wi = equal_area_square_to_sphere(uv)
        c, s = self._texel(uv)
        L = rgb2spec.eval_unbounded(c, s, lam) * self.strength
        return wi, L, pdf_uv * _INV_4PI

    def pdf_dir(self, directions):
        """Solid-angle pdf that `sample` would pick these directions."""
        uv = equal_area_sphere_to_square(directions)
        return self.dist.pdf(uv) * _INV_4PI
