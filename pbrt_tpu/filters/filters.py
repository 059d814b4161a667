"""Filter evaluation + tabulated importance sampling.

A Filter is a pytree with a tabulated 2D |f| distribution (FilterSampler,
reference filters.h:26): GetCameraSample importance-samples the pixel offset
and weights the sample by sign(f) (the |f|-normalized weight f/(pdf*I) is
folded so box/positive filters carry weight exactly 1).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.pytree import pytree, static_field
from ..core.sampling import PiecewiseConstant2D


def _mitchell_1d(x, b=1.0 / 3.0, c=1.0 / 3.0):
    x = np.abs(2.0 * x)
    y = np.where(
        x > 1.0,
        (-b - 6 * c) * x**3 + (6 * b + 30 * c) * x**2
        + (-12 * b - 48 * c) * x + (8 * b + 24 * c),
        (12 - 9 * b - 6 * c) * x**3 + (-18 + 12 * b + 6 * c) * x**2
        + (6 - 2 * b),
    ) * (1.0 / 6.0)
    return np.where(x > 2.0, 0.0, y)


def _sinc(x):
    x = np.abs(x)
    return np.where(x < 1e-5, 1.0, np.sin(np.pi * x) / (np.pi * x + 1e-12))


def _windowed_sinc(x, radius, tau=3.0):
    return np.where(
        np.abs(x) > radius, 0.0, _sinc(x) * _sinc(x / tau)
    )


def _eval_2d(kind: str, x, y, radius):
    rx, ry = radius
    if kind == "box":
        return np.where((np.abs(x) <= rx) & (np.abs(y) <= ry), 1.0, 0.0)
    if kind == "triangle":
        return np.maximum(rx - np.abs(x), 0.0) * np.maximum(ry - np.abs(y), 0.0)
    if kind == "gaussian":
        sig = rx / 3.0

        def g(v, s):
            return np.exp(-0.5 * (v / s) ** 2) - np.exp(-0.5 * (3.0) ** 2)

        return np.maximum(g(x, sig), 0.0) * np.maximum(g(y, ry / 3.0), 0.0)
    if kind == "mitchell":
        return _mitchell_1d(x / rx) * _mitchell_1d(y / ry)
    if kind == "lanczos":
        return _windowed_sinc(x, rx) * _windowed_sinc(y, ry)
    raise ValueError(kind)


@pytree
class FilterSample:
    p: jnp.ndarray  # (..., 2) offset from the pixel center
    weight: jnp.ndarray  # (...,) f/(pdf * integral_of_|f|) * integral_of_f


@pytree
class Filter:
    dist: PiecewiseConstant2D
    values: jnp.ndarray  # (ny, nx) signed filter values on the table grid
    kind: str = static_field(default="box")
    radius: tuple = static_field(default=(0.5, 0.5))
    integral_ratio: float = static_field(default=1.0)  # int f / int |f|

    @staticmethod
    def create(kind: str = "box", radius=None, table: int = 32) -> "Filter":
        defaults = {
            "box": (0.5, 0.5),
            "triangle": (2.0, 2.0),
            "gaussian": (1.5, 1.5),
            "mitchell": (2.0, 2.0),
            "lanczos": (4.0, 4.0),
        }
        radius = tuple(radius) if radius is not None else defaults[kind]
        rx, ry = radius
        xs = (np.arange(table) + 0.5) / table * 2 * rx - rx
        ys = (np.arange(table) + 0.5) / table * 2 * ry - ry
        xg, yg = np.meshgrid(xs, ys, indexing="xy")
        vals = _eval_2d(kind, xg, yg, radius).astype(np.float32)
        dist = PiecewiseConstant2D.build(np.abs(vals))
        ratio = float(vals.sum() / max(np.abs(vals).sum(), 1e-9))
        return Filter(
            dist=dist,
            values=jnp.asarray(vals),
            kind=kind,
            radius=radius,
            integral_ratio=ratio,
        )

    def evaluate(self, p):
        """Signed filter value at offsets p (..., 2) (nearest table cell)."""
        ny, nx = self.values.shape
        rx, ry = self.radius
        u = (p[..., 0] + rx) / (2 * rx)
        v = (p[..., 1] + ry) / (2 * ry)
        xi = jnp.clip((u * nx).astype(jnp.int32), 0, nx - 1)
        yi = jnp.clip((v * ny).astype(jnp.int32), 0, ny - 1)
        inside = (jnp.abs(p[..., 0]) <= rx) & (jnp.abs(p[..., 1]) <= ry)
        return jnp.where(inside, self.values[yi, xi], 0.0)

    def sample(self, u2) -> FilterSample:
        """Importance-sample an offset; weight = sign(f) (|f|-proportional
        sampling makes |weight| == 1; negative lobes flip the sign).
        Reference: FilterSampler::Sample (filters.h)."""
        uv, _ = self.dist.sample(u2)
        rx, ry = self.radius
        p = jnp.stack(
            [uv[..., 0] * 2 * rx - rx, uv[..., 1] * 2 * ry - ry], axis=-1
        )
        f = self.evaluate(p)
        # Estimator of the f-weighted pixel mean with x ~ |f|/int|f|:
        # weight = sign(f(x)) * int|f| / int f; positive filters give exactly 1.
        w = jnp.sign(f) / max(abs(self.integral_ratio), 1e-6) * jnp.sign(
            jnp.asarray(self.integral_ratio)
        )
        return FilterSample(p=p, weight=w)
