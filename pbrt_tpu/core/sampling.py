"""Sampling warps, their inverses, and tabulated distributions.

Reference analogue: /root/reference/src/pbrt/util/sampling.h/.cpp (2,411 LoC):
hemisphere/sphere/disk/triangle/cone warps + inverses, PiecewiseConstant1D/2D,
SampleDiscrete, VarianceEstimator. Everything is batched jnp over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from .pytree import pytree
from .vecmath import safe_sqrt

INV_PI = 1.0 / jnp.pi
INV_2PI = 1.0 / (2.0 * jnp.pi)
INV_4PI = 1.0 / (4.0 * jnp.pi)


# --- Warps ------------------------------------------------------------------


def sample_uniform_disk_concentric(u):
    """Shirley-Chiu concentric map: [0,1]^2 -> unit disk. u: (..., 2)."""
    uo = 2.0 * u - 1.0
    x, y = uo[..., 0], uo[..., 1]
    zero = (x == 0.0) & (y == 0.0)
    use_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(use_x, x, y)
    safe = jnp.where(r == 0.0, 1.0, r)
    theta = jnp.where(
        use_x,
        (jnp.pi / 4.0) * (y / safe),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * (x / safe),
    )
    p = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return jnp.where(zero[..., None], 0.0, p)


def sample_cosine_hemisphere(u):
    d = sample_uniform_disk_concentric(u)
    z = safe_sqrt(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2)
    return jnp.concatenate([d, z[..., None]], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def sample_uniform_hemisphere(u):
    z = u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


UNIFORM_HEMISPHERE_PDF = INV_2PI


def sample_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


UNIFORM_SPHERE_PDF = INV_4PI


def sample_uniform_triangle(u):
    """Low-distortion triangle warp returning barycentrics (b0, b1, b2).

    Uses the sqrt-free fold (Talbot/Heitz): split the square along the
    diagonal instead of the classic sqrt parameterization.
    """
    u0, u1 = u[..., 0], u[..., 1]
    flip = u0 < u1
    b0 = jnp.where(flip, u0 / 2.0, u0 - u1 / 2.0)
    b1 = jnp.where(flip, u1 - b0, u1 / 2.0)
    return jnp.stack([b0, b1, 1.0 - b0 - b1], axis=-1)


def invert_uniform_triangle(b):
    b0, b1 = b[..., 0], b[..., 1]
    flip = b0 < b1  # region where u0 < u1 in the forward map
    # Forward: flip: b0=u0/2, b1=u1-b0  => u0=2 b0, u1=b1+b0
    #         else: b0=u0-u1/2, b1=u1/2 => u1=2 b1, u0=b0+b1
    u0 = jnp.where(flip, 2.0 * b0, b0 + b1)
    u1 = jnp.where(flip, b1 + b0, 2.0 * b1)
    return jnp.stack([u0, u1], axis=-1)


def sample_uniform_cone(u, cos_theta_max):
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * jnp.pi * (1.0 - cos_theta_max))


def sample_exponential(u, a):
    """Sample t with pdf a*exp(-a t) on [0, inf)."""
    return -jnp.log(jnp.maximum(1.0 - u, 1e-38)) / a


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """Veach's beta=2 power heuristic (src/pbrt/util/sampling.h PowerHeuristic)."""
    f = nf * f_pdf
    g = ng * g_pdf
    w = f * f / jnp.maximum(f * f + g * g, 1e-38)
    return jnp.where(f_pdf > 0.0, w, 0.0)


def balance_heuristic(nf, f_pdf, ng, g_pdf):
    f = nf * f_pdf
    g = ng * g_pdf
    return jnp.where(f > 0.0, f / jnp.maximum(f + g, 1e-38), 0.0)


def sample_discrete(weights, u):
    """Sample an index from unnormalized weights along the last axis.

    Returns (index, pmf, u_remapped). Reference: SampleDiscrete
    (src/pbrt/util/sampling.h:72).
    """
    total = jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(weights, axis=-1) / jnp.maximum(total, 1e-38)
    below = u[..., None] >= cdf
    idx = jnp.minimum(
        jnp.sum(below.astype(jnp.int32), axis=-1), weights.shape[-1] - 1
    )
    pmf = jnp.take_along_axis(weights, idx[..., None], axis=-1)[..., 0] / jnp.maximum(
        total[..., 0], 1e-38
    )
    lo = jnp.where(
        idx > 0,
        jnp.take_along_axis(cdf, jnp.maximum(idx - 1, 0)[..., None], axis=-1)[..., 0],
        0.0,
    )
    hi = jnp.take_along_axis(cdf, idx[..., None], axis=-1)[..., 0]
    u_new = jnp.clip((u - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0 - 1e-7)
    return idx, pmf, u_new


# --- Piecewise-constant distributions --------------------------------------


@pytree
class PiecewiseConstant1D:
    """Tabulated 1D distribution over [lo, hi].

    func: (..., n) non-negative; cdf: (..., n+1); integral: (...,)
    Reference: PiecewiseConstant1D (src/pbrt/util/sampling.h).
    """

    func: jnp.ndarray
    cdf: jnp.ndarray
    integral: jnp.ndarray
    lo: float
    hi: float

    @staticmethod
    def build(func, lo: float = 0.0, hi: float = 1.0) -> "PiecewiseConstant1D":
        func = jnp.abs(jnp.asarray(func, dtype=jnp.float32))
        n = func.shape[-1]
        width = (hi - lo) / n
        partial = jnp.cumsum(func * width, axis=-1)
        integral = partial[..., -1]
        zeros = jnp.zeros_like(partial[..., :1])
        cdf_un = jnp.concatenate([zeros, partial], axis=-1)
        # Degenerate all-zero function -> uniform cdf.
        uniform = jnp.arange(n + 1, dtype=jnp.float32) / n
        cdf = jnp.where(
            (integral > 0.0)[..., None],
            cdf_un / jnp.maximum(integral[..., None], 1e-38),
            uniform,
        )
        return PiecewiseConstant1D(
            func=func, cdf=cdf, integral=integral, lo=float(lo), hi=float(hi)
        )

    @property
    def n(self) -> int:
        return self.func.shape[-1]

    def sample(self, u):
        """Returns (x, pdf, bin_index). Batched over the table's leading axes
        (u broadcasts against them)."""
        n = self.n
        batch = jnp.broadcast_shapes(self.cdf.shape[:-1], jnp.shape(u))
        cdf = jnp.broadcast_to(self.cdf, batch + (n + 1,))
        func = jnp.broadcast_to(self.func, batch + (n,))
        integral = jnp.broadcast_to(self.integral, batch)
        u = jnp.broadcast_to(u, batch)
        idx = (
            jnp.sum((cdf[..., :-1] <= u[..., None]).astype(jnp.int32), axis=-1)
            - 1
        )
        idx = jnp.clip(idx, 0, n - 1)
        c0 = jnp.take_along_axis(cdf, idx[..., None], axis=-1)[..., 0]
        c1 = jnp.take_along_axis(cdf, idx[..., None] + 1, axis=-1)[..., 0]
        du = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-38), 0.0)
        f = jnp.take_along_axis(func, idx[..., None], axis=-1)[..., 0]
        pdf = jnp.where(
            integral > 0.0,
            f / jnp.maximum(integral, 1e-38),
            1.0 / (self.hi - self.lo),
        )
        x = self.lo + (idx.astype(jnp.float32) + du) / n * (self.hi - self.lo)
        return x, pdf, idx

    def pdf(self, x):
        n = self.n
        batch = jnp.broadcast_shapes(self.func.shape[:-1], jnp.shape(x))
        func = jnp.broadcast_to(self.func, batch + (n,))
        integral = jnp.broadcast_to(self.integral, batch)
        x = jnp.broadcast_to(x, batch)
        t = (x - self.lo) / (self.hi - self.lo)
        idx = jnp.clip((t * n).astype(jnp.int32), 0, n - 1)
        f = jnp.take_along_axis(func, idx[..., None], axis=-1)[..., 0]
        return jnp.where(
            integral > 0.0,
            f / jnp.maximum(integral, 1e-38),
            1.0 / (self.hi - self.lo),
        )


@pytree
class PiecewiseConstant2D:
    """2D tabulated distribution: marginal over rows x conditional over cols.

    func: (ny, nx). Reference: PiecewiseConstant2D (src/pbrt/util/sampling.h).
    """

    conditional: PiecewiseConstant1D  # batched over rows: func (ny, nx)
    marginal: PiecewiseConstant1D  # func (ny,)

    @staticmethod
    def build(func) -> "PiecewiseConstant2D":
        func = jnp.abs(jnp.asarray(func, dtype=jnp.float32))
        conditional = PiecewiseConstant1D.build(func)
        marginal = PiecewiseConstant1D.build(conditional.integral)
        return PiecewiseConstant2D(conditional=conditional, marginal=marginal)

    def sample(self, u):
        """u: (..., 2) -> ((..., 2) point in [0,1]^2, pdf)."""
        v, pdf_v, iy = self.marginal.sample(u[..., 1])
        # Gather the conditional row for each sample, then sample it.
        row_func = self.conditional.func[iy]  # (..., nx)
        row_cdf = self.conditional.cdf[iy]
        row_int = self.conditional.integral[iy]
        row = PiecewiseConstant1D(
            func=row_func,
            cdf=row_cdf,
            integral=row_int,
            lo=self.conditional.lo,
            hi=self.conditional.hi,
        )
        x, pdf_x, _ = row.sample(u[..., 0])
        return jnp.stack([x, v], axis=-1), pdf_v * pdf_x

    def pdf(self, p):
        ny, nx = self.conditional.func.shape
        ix = jnp.clip((p[..., 0] * nx).astype(jnp.int32), 0, nx - 1)
        iy = jnp.clip((p[..., 1] * ny).astype(jnp.int32), 0, ny - 1)
        f = self.conditional.func[iy, ix]
        return jnp.where(
            self.marginal.integral > 0.0,
            f / jnp.maximum(self.marginal.integral, 1e-38),
            1.0,
        )


# --- Variance estimation ----------------------------------------------------


@pytree
class VarianceEstimator:
    """Welford online mean/variance (src/pbrt/util/sampling.h VarianceEstimator)."""

    mean: jnp.ndarray
    s: jnp.ndarray
    n: jnp.ndarray

    @staticmethod
    def zeros(shape=(), dtype=jnp.float32) -> "VarianceEstimator":
        z = jnp.zeros(shape, dtype)
        return VarianceEstimator(mean=z, s=z, n=jnp.zeros(shape, jnp.int32))

    def add(self, x) -> "VarianceEstimator":
        n = self.n + 1
        delta = x - self.mean
        mean = self.mean + delta / n.astype(x.dtype)
        s = self.s + delta * (x - mean)
        return VarianceEstimator(mean=mean, s=s, n=n)

    def variance(self):
        return jnp.where(self.n > 1, self.s / jnp.maximum(self.n - 1, 1), 0.0)


@pytree
class WindowedPiecewiseConstant2D:
    """Piecewise-constant 2D distribution sampled within per-query windows.

    Reference analogue: WindowedPiecewiseConstant2D
    (src/pbrt/util/sampling.h:122-239): a summed-area table answers
    integrals over any [x0,x1]x[y0,y1] window in O(1), and sampling inverts
    the windowed marginal/conditional CDFs by bisection. The reference
    bisects with pointer recursion per sample; here both inversions are
    fixed-count vectorized bisections (log2-resolution steps), so a whole
    shading-point batch samples in lockstep.
    """

    func: jnp.ndarray  # (ny, nx)
    sat: jnp.ndarray  # (ny + 1, nx + 1) inclusive summed-area table

    @staticmethod
    def build(func) -> "WindowedPiecewiseConstant2D":
        f = jnp.abs(jnp.asarray(func, jnp.float32))
        ny, nx = f.shape
        sat = jnp.cumsum(jnp.cumsum(f, axis=0), axis=1) / (nx * ny)
        sat = jnp.pad(sat, ((1, 0), (1, 0)))
        return WindowedPiecewiseConstant2D(func=f, sat=sat)

    def _sat_lookup(self, x, y):
        """Continuous SAT evaluation at (x, y) in [0,1]^2 (bilinear between
        SAT entries — exact for the piecewise-constant integrand)."""
        ny, nx = self.func.shape
        fx = jnp.clip(x, 0.0, 1.0) * nx
        fy = jnp.clip(y, 0.0, 1.0) * ny
        x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nx - 1)
        y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ny - 1)
        tx = fx - x0
        ty = fy - y0

        def at(yy, xx):
            return self.sat[yy, xx]

        v00 = at(y0, x0)
        v10 = at(y0, x0 + 1)
        v01 = at(y0 + 1, x0)
        v11 = at(y0 + 1, x0 + 1)
        return (
            v00 * (1 - tx) * (1 - ty) + v10 * tx * (1 - ty)
            + v01 * (1 - tx) * ty + v11 * tx * ty
        )

    def window_integral(self, b):
        """Integral over windows b = (..., 4) [x0, x1, y0, y1]."""
        return (
            self._sat_lookup(b[..., 1], b[..., 3])
            - self._sat_lookup(b[..., 0], b[..., 3])
            - self._sat_lookup(b[..., 1], b[..., 2])
            + self._sat_lookup(b[..., 0], b[..., 2])
        )

    def sample(self, u2, b):
        """Sample within windows b: returns ((..., 2) p, pdf). pdf is w.r.t.
        the unit square measure, normalized over the window."""
        ny, nx = self.func.shape
        n_steps = max(nx, ny).bit_length() + 6
        bint = self.window_integral(b)
        ok = bint > 0.0
        x0, x1 = b[..., 0], b[..., 1]
        y0, y1 = b[..., 2], b[..., 3]

        # Marginal in x: Fx(x) = I(x0..x, y0..y1) / I(window).
        def fx(x):
            return (
                self._sat_lookup(x, y1) - self._sat_lookup(x, y0)
                - self._sat_lookup(x0, y1) + self._sat_lookup(x0, y0)
            )

        target_x = u2[..., 0] * jnp.maximum(bint, 1e-38)
        lo, hi = x0, x1
        for _ in range(n_steps):
            mid = 0.5 * (lo + hi)
            below = fx(mid) < target_x
            lo = jnp.where(below, mid, lo)
            hi = jnp.where(below, hi, mid)
        px = 0.5 * (lo + hi)

        # Conditional in y at the sampled x column (one-texel-wide window).
        xs = jnp.clip(jnp.floor(px * nx), 0.0, nx - 1.0) / nx
        xe = xs + 1.0 / nx

        def fy(y):
            return (
                self._sat_lookup(xe, y) - self._sat_lookup(xs, y)
                - self._sat_lookup(xe, y0) + self._sat_lookup(xs, y0)
            )

        col_int = fy(y1)
        target_y = u2[..., 1] * jnp.maximum(col_int, 1e-38)
        lo, hi = y0, y1
        for _ in range(n_steps):
            mid = 0.5 * (lo + hi)
            below = fy(mid) < target_y
            lo = jnp.where(below, mid, lo)
            hi = jnp.where(below, hi, mid)
        py = 0.5 * (lo + hi)

        p = jnp.stack([px, py], axis=-1)
        pdf = self.pdf(p, b)
        return jnp.where(ok[..., None], p, 0.5), jnp.where(ok, pdf, 0.0)

    def pdf(self, p, b):
        """Window-normalized density at p (0 outside the window)."""
        ny, nx = self.func.shape
        ix = jnp.clip((p[..., 0] * nx).astype(jnp.int32), 0, nx - 1)
        iy = jnp.clip((p[..., 1] * ny).astype(jnp.int32), 0, ny - 1)
        f = self.func[iy, ix]
        bint = self.window_integral(b)
        inside = (
            (p[..., 0] >= b[..., 0]) & (p[..., 0] <= b[..., 1])
            & (p[..., 1] >= b[..., 2]) & (p[..., 1] <= b[..., 3])
        )
        # density over the unit square: f integrates to bint with texel
        # area 1/(nx*ny) already folded into the SAT normalization.
        return jnp.where(
            inside & (bint > 0.0), f / jnp.maximum(bint, 1e-38), 0.0
        )


@pytree
class WeightedReservoirSampler:
    """Streaming weighted reservoir over batched lanes.

    Reference analogue: WeightedReservoirSampler (util/sampling.h:82):
    feed candidates one at a time; each lane keeps one survivor with
    probability proportional to its weight. State is a pytree so reservoirs
    ride inside lax.scan carries; merging two reservoirs is `merge` (the
    RIS/ReSTIR building block).
    """

    value: jnp.ndarray  # (..., K) payload of the current survivor
    weight_sum: jnp.ndarray  # (...,) total seen weight
    survivor_w: jnp.ndarray  # (...,) the survivor's own weight

    @staticmethod
    def empty(shape, k):
        return WeightedReservoirSampler(
            value=jnp.zeros(shape + (k,), jnp.float32),
            weight_sum=jnp.zeros(shape, jnp.float32),
            survivor_w=jnp.zeros(shape, jnp.float32),
        )

    def add(self, value, weight, u):
        """Consider one candidate per lane; u: fresh uniforms."""
        new_sum = self.weight_sum + jnp.maximum(weight, 0.0)
        take = u * new_sum < weight
        return WeightedReservoirSampler(
            value=jnp.where(take[..., None], value, self.value),
            weight_sum=new_sum,
            survivor_w=jnp.where(take, weight, self.survivor_w),
        )

    def merge(self, other, u):
        """Combine two reservoirs (treat `other`'s survivor as one
        candidate carrying its whole weight sum)."""
        new_sum = self.weight_sum + other.weight_sum
        take = u * new_sum < other.weight_sum
        return WeightedReservoirSampler(
            value=jnp.where(take[..., None], other.value, self.value),
            weight_sum=new_sum,
            survivor_w=jnp.where(take, other.survivor_w, self.survivor_w),
        )
