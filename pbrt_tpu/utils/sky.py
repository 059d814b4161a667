"""Analytic clear-sky radiance model (Preetham et al. 1999).

Reference analogue: imgtool's `makesky` (cmd/imgtool.cpp) which uses the
vendored Hosek-Wilkie dataset (/root/reference/src/ext/skymodel). The
Hosek-Wilkie model is a large fitted dataset; this implementation uses the
older Preetham analytic model (public formulas: zenith chromaticity
polynomials + the Perez luminance function), which needs no tables and
covers the same use: generating a physically-plausible sun/sky environment
map from (sun elevation, turbidity).
"""

from __future__ import annotations

import numpy as np

# Perez coefficient rows [A..E] as linear functions of turbidity T for
# luminance Y and chromaticities x, y (Preetham Tables A.1-A.3).
_PEREZ_Y = np.asarray([
    [0.1787, -1.4630], [-0.3554, 0.4275], [-0.0227, 5.3251],
    [0.1206, -2.5771], [-0.0670, 0.3703],
])
_PEREZ_X = np.asarray([
    [-0.0193, -0.2592], [-0.0665, 0.0008], [-0.0004, 0.2125],
    [-0.0641, -0.8989], [-0.0033, 0.0452],
])
_PEREZ_YC = np.asarray([
    [-0.0167, -0.2608], [-0.0950, 0.0092], [-0.0079, 0.2102],
    [-0.0441, -1.6537], [-0.0109, 0.0529],
])


def _perez(theta, gamma, c):
    return (1.0 + c[0] * np.exp(c[1] / np.maximum(np.cos(theta), 0.01))) * (
        1.0 + c[2] * np.exp(c[3] * gamma) + c[4] * np.cos(gamma) ** 2
    )


def _zenith(turbidity, theta_s):
    t = turbidity
    chi = (4.0 / 9.0 - t / 120.0) * (np.pi - 2.0 * theta_s)
    yz = (4.0453 * t - 4.9710) * np.tan(chi) - 0.2155 * t + 2.4192  # kcd/m^2
    tv = np.asarray([t * t, t, 1.0])
    sv = np.asarray(
        [theta_s ** 3, theta_s ** 2, theta_s, 1.0]
    )
    mx = np.asarray([
        [0.00166, -0.00375, 0.00209, 0.0],
        [-0.02903, 0.06377, -0.03202, 0.00394],
        [0.11693, -0.21196, 0.06052, 0.25886],
    ])
    my = np.asarray([
        [0.00275, -0.00610, 0.00317, 0.0],
        [-0.04214, 0.08970, -0.04153, 0.00516],
        [0.15346, -0.26756, 0.06670, 0.26688],
    ])
    xz = tv @ mx @ sv
    yz_c = tv @ my @ sv
    return max(yz, 1e-3), xz, yz_c


def sky_radiance_rgb(directions, sun_dir, turbidity: float = 3.0,
                     sun_intensity: float = 0.0, sun_half_angle=0.2665):
    """Linear-RGB sky radiance for unit `directions` (N, 3), z = up.

    sun_intensity > 0 adds a solar disk of that radiance (the model itself
    covers only the sky dome)."""
    d = np.asarray(directions, np.float64)
    s = np.asarray(sun_dir, np.float64)
    s = s / np.linalg.norm(s)
    theta_s = np.arccos(np.clip(s[2], -1.0, 1.0))
    cos_t = np.clip(d[..., 2], 0.01, 1.0)
    theta = np.arccos(cos_t)
    cos_g = np.clip(d @ s, -1.0, 1.0)
    gamma = np.arccos(cos_g)

    t = turbidity
    cy = _PEREZ_Y @ np.asarray([t, 1.0])
    cx = _PEREZ_X @ np.asarray([t, 1.0])
    cyc = _PEREZ_YC @ np.asarray([t, 1.0])
    yz, xz, yzc = _zenith(t, theta_s)

    def channel(zen, c):
        num = _perez(theta, gamma, c)
        den = _perez(0.0, theta_s, c)
        return zen * num / max(den, 1e-9)

    Y = channel(yz, cy)  # luminance
    x = channel(xz, cx)
    y = channel(yzc, cyc)

    # xyY -> XYZ -> linear sRGB.
    y_ = np.maximum(y, 1e-6)
    X = x / y_ * Y
    Z = (1.0 - x - y) / y_ * Y
    m = np.asarray([
        [3.2406, -1.5372, -0.4986],
        [-0.9689, 1.8758, 0.0415],
        [0.0557, -0.2040, 1.0570],
    ])
    rgb = np.einsum("ij,...j->...i", m, np.stack([X, Y, Z], -1))
    rgb = np.clip(rgb, 0.0, None) * 0.025  # kcd/m^2 -> renderer-scale units
    below = d[..., 2] < 0.0
    rgb[below] = 0.0
    if sun_intensity > 0.0:
        disk = gamma < np.deg2rad(sun_half_angle)
        rgb[disk & ~below] += sun_intensity
    return rgb.astype(np.float32)


def make_sky_latlong(res_y: int = 128, sun_elevation_deg: float = 30.0,
                     sun_azimuth_deg: float = 0.0, turbidity: float = 3.0,
                     sun_intensity: float = 100.0,
                     sun_half_angle: float = 0.2665):
    """(res_y, 2*res_y, 3) lat-long environment image of the sky."""
    h, w = res_y, 2 * res_y
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    theta = v * np.pi
    phi = u * 2.0 * np.pi
    tg, pg = np.meshgrid(theta, phi, indexing="ij")
    d = np.stack(
        [np.sin(tg) * np.cos(pg), np.sin(tg) * np.sin(pg), np.cos(tg)], -1
    )
    el = np.deg2rad(sun_elevation_deg)
    az = np.deg2rad(sun_azimuth_deg)
    sun = np.asarray(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)]
    )
    return sky_radiance_rgb(
        d.reshape(-1, 3), sun, turbidity, sun_intensity,
        sun_half_angle=sun_half_angle,
    ).reshape(h, w, 3)
