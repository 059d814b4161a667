"""Pixel sensor: spectral response -> sensor RGB with white balance.

Reference analogue: PixelSensor (/root/reference/src/pbrt/film.h:36-117) —
the ISET fork's camera-sensor pipeline: spectral sensitivities (r̄, ḡ, b̄),
exposure (imagingRatio), white balance, and a least-squares XYZ-from-sensor
matrix. Default sensitivities are the CIE XYZ matching functions (pbrt's
default sensor), giving a colorimetric pipeline.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import cie, colorspace, spectrum
from ..core.pytree import pytree, static_field


@pytree
class PixelSensor:
    # Tabulated sensitivities on a uniform wavelength grid.
    lam_grid: jnp.ndarray  # (K,)
    response: jnp.ndarray  # (3, K) r/g/b sensitivities
    # 3x3 matrix taking raw sensor integrals to output linear RGB.
    rgb_from_sensor: jnp.ndarray  # (3, 3)
    imaging_ratio: jnp.ndarray  # () exposure scale
    is_xyz: bool = static_field(default=True)

    @staticmethod
    def xyz(imaging_ratio: float = 1.0, cs=colorspace.SRGB) -> "PixelSensor":
        """Default colorimetric sensor: CIE XYZ matching + colorspace matrix."""
        lam = np.linspace(cie.LAMBDA_MIN, cie.LAMBDA_MAX, 128)
        resp = cie.cie_xyz_np(lam).T  # (3, K)
        return PixelSensor(
            lam_grid=jnp.asarray(lam, jnp.float32),
            response=jnp.asarray(resp, jnp.float32),
            rgb_from_sensor=jnp.asarray(cs.rgb_from_xyz, jnp.float32),
            imaging_ratio=jnp.asarray(imaging_ratio, jnp.float32),
            is_xyz=True,
        )

    @staticmethod
    def from_curves(
        lam, r, g, b, imaging_ratio: float = 1.0, cs=colorspace.SRGB,
        white_src=None,
    ) -> "PixelSensor":
        """Custom sensor sensitivities (the ISET camera-sensor path).

        Solves the least-squares XYZ-from-sensor matrix over reflectance
        training spectra the way film.h:60-110 does — here with a compact
        basis of smooth reflectances instead of the 24 swatches.
        """
        lam = np.asarray(lam, np.float64)
        resp = np.stack([r, g, b]).astype(np.float64)  # (3, K)
        # Training reflectances: constant + sigmoid ramps + bumps.
        k = lam.shape[0]
        x = (lam - lam.min()) / (lam.max() - lam.min())
        train = [np.ones(k)]
        for c in (0.25, 0.5, 0.75):
            train.append(1.0 / (1.0 + np.exp(-12 * (x - c))))
            train.append(np.exp(-0.5 * ((x - c) / 0.15) ** 2))
        train = np.stack(train)  # (T, K)
        illum = cie.illuminant_d65_np(lam)
        cmf = cie.cie_xyz_np(lam)  # (K, 3)
        norm_xyz = np.sum(cmf[:, 1] * illum)
        xyz_t = (train * illum) @ cmf / norm_xyz  # (T, 3)
        norm_s = np.sum(resp[1] * illum)
        sens_t = (train * illum) @ resp.T / max(norm_s, 1e-9)  # (T, 3)
        m, *_ = np.linalg.lstsq(sens_t, xyz_t, rcond=None)  # sensor->XYZ
        rgb_from_sensor = np.asarray(cs.rgb_from_xyz) @ m.T
        return PixelSensor(
            lam_grid=jnp.asarray(lam, jnp.float32),
            response=jnp.asarray(resp, jnp.float32),
            rgb_from_sensor=jnp.asarray(rgb_from_sensor, jnp.float32),
            imaging_ratio=jnp.asarray(imaging_ratio, jnp.float32),
            is_xyz=False,
        )

    def to_sensor_rgb(self, values, wl):
        """Monte Carlo sensor integration: (..., S) spectra -> (..., 3)."""
        r = jnp.stack(
            [
                jnp.interp(wl.lam, self.lam_grid, self.response[i])
                for i in range(3)
            ],
            axis=-1,
        )  # (..., S, 3)
        w = spectrum.safe_div(values, wl.pdf)[..., None] * r
        raw = jnp.mean(w, axis=-2) / cie.CIE_Y_INTEGRAL
        rgb = raw @ self.rgb_from_sensor.T
        return rgb * self.imaging_ratio
