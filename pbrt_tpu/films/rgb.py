"""RGB film: spectral sample -> sensor RGB -> accumulation buffers.

Reference analogue: RGBFilm (/root/reference/src/pbrt/film.h:234) with the
default CIE-XYZ PixelSensor (film.h:36-117, imagingRatio = 1). Accumulation
is a pair of (rgb_sum, weight_sum) tensors — the same sums pbrt keeps per
pixel (`double rgbSum[3] + weightSum`), here as one fused array op per sample
wave instead of per-sample atomics.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import colorspace, spectrum
from ..core.pytree import pytree, static_field


def spectrum_to_rgb(values, wl, cs=colorspace.SRGB):
    """Sensor response: sampled spectrum -> linear RGB in `cs`.

    values: (..., S). Returns (..., 3).
    """
    xyz = spectrum.to_xyz(values, wl)
    return cs.to_rgb(xyz)


@pytree
class RGBFilm:
    rgb_sum: jnp.ndarray  # (ny, nx, 3)
    weight_sum: jnp.ndarray  # (ny, nx)
    resolution: tuple = static_field()  # (nx, ny)

    @staticmethod
    def zeros(resolution) -> "RGBFilm":
        nx, ny = resolution
        return RGBFilm(
            rgb_sum=jnp.zeros((ny, nx, 3), jnp.float32),
            weight_sum=jnp.zeros((ny, nx), jnp.float32),
            resolution=(nx, ny),
        )

    def add_sample_image(self, rgb, weight=None) -> "RGBFilm":
        """Accumulate one full-resolution sample wave.

        rgb: (ny, nx, 3) per-pixel filtered sample values; weight: (ny, nx).
        """
        if weight is None:
            weight = jnp.ones(rgb.shape[:2], rgb.dtype)
        return self.replace(
            rgb_sum=self.rgb_sum + rgb * weight[..., None],
            weight_sum=self.weight_sum + weight,
        )

    def image(self):
        """Developed linear-RGB image (ny, nx, 3)."""
        w = jnp.maximum(self.weight_sum, 1e-12)[..., None]
        return self.rgb_sum / w
