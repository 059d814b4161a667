"""Interval arithmetic for conservative floating-point error tracking.

Reference analogue: /root/reference/src/pbrt/util/interval.h — intervals
[lo, hi] guaranteed to contain the exact real result of a chain of float
operations. Used for robust quadratic solves (sphere/curve intersection
epsilons) and ray-origin offsetting. Vectorized over arrays; the rounding
conservatism comes from ULP-stepping the bounds after each operation
(interval.h widens with NextFloatUp/Down the same way).
"""

from __future__ import annotations

import jax.numpy as jnp

from .floats import next_float_down, next_float_up
from .pytree import pytree


@pytree
class Interval:
    lo: jnp.ndarray
    hi: jnp.ndarray

    @staticmethod
    def exact(v):
        v = jnp.asarray(v, jnp.float32)
        return Interval(lo=v, hi=v)

    @staticmethod
    def from_value_and_error(v, err):
        v = jnp.asarray(v, jnp.float32)
        err = jnp.asarray(err, jnp.float32)
        return Interval(
            lo=next_float_down(v - err), hi=next_float_up(v + err)
        )

    @property
    def midpoint(self):
        return 0.5 * (self.lo + self.hi)

    @property
    def width(self):
        return self.hi - self.lo

    def contains(self, v):
        return (v >= self.lo) & (v <= self.hi)

    def __add__(self, o):
        o = _as_interval(o)
        return Interval(
            lo=next_float_down(self.lo + o.lo),
            hi=next_float_up(self.hi + o.hi),
        )

    def __sub__(self, o):
        o = _as_interval(o)
        return Interval(
            lo=next_float_down(self.lo - o.hi),
            hi=next_float_up(self.hi - o.lo),
        )

    def __neg__(self):
        return Interval(lo=-self.hi, hi=-self.lo)

    def __mul__(self, o):
        o = _as_interval(o)
        p = jnp.stack(
            [self.lo * o.lo, self.lo * o.hi, self.hi * o.lo, self.hi * o.hi]
        )
        return Interval(
            lo=next_float_down(jnp.min(p, axis=0)),
            hi=next_float_up(jnp.max(p, axis=0)),
        )

    def __truediv__(self, o):
        o = _as_interval(o)
        # Division by an interval containing 0 -> the whole real line
        # (interval.h operator/ semantics).
        straddles = (o.lo <= 0.0) & (o.hi >= 0.0)
        q = jnp.stack(
            [self.lo / o.lo, self.lo / o.hi, self.hi / o.lo, self.hi / o.hi]
        )
        lo = next_float_down(jnp.min(q, axis=0))
        hi = next_float_up(jnp.max(q, axis=0))
        big = jnp.float32(jnp.inf)
        return Interval(
            lo=jnp.where(straddles, -big, lo),
            hi=jnp.where(straddles, big, hi),
        )

    def sqr(self):
        alo = jnp.abs(self.lo)
        ahi = jnp.abs(self.hi)
        lo = jnp.minimum(alo, ahi)
        hi = jnp.maximum(alo, ahi)
        spans_zero = (self.lo < 0.0) & (self.hi > 0.0)
        return Interval(
            lo=jnp.where(spans_zero, 0.0, next_float_down(lo * lo)),
            hi=next_float_up(hi * hi),
        )

    def sqrt(self):
        return Interval(
            lo=next_float_down(jnp.sqrt(jnp.maximum(self.lo, 0.0))),
            hi=next_float_up(jnp.sqrt(jnp.maximum(self.hi, 0.0))),
        )


def _as_interval(x):
    if isinstance(x, Interval):
        return x
    return Interval.exact(x)


def interval_quadratic(a: Interval, b: Interval, c: Interval):
    """Conservative quadratic roots (interval.h Quadratic): returns
    (t0, t1, has_roots) where t0/t1 are Intervals bounding the true roots.
    """
    disc = b.sqr() - (a * c) * Interval.exact(4.0)
    has = disc.hi >= 0.0
    root = Interval(
        lo=jnp.maximum(disc.lo, 0.0), hi=jnp.maximum(disc.hi, 0.0)
    ).sqrt()
    # Direct interval evaluation of both root formulas, then order them.
    half = Interval.exact(0.5)
    r1 = ((-b) + root) * half / a
    r2 = ((-b) - root) * half / a
    t0 = Interval(
        lo=jnp.minimum(r1.lo, r2.lo), hi=jnp.minimum(r1.hi, r2.hi)
    )
    t1 = Interval(
        lo=jnp.maximum(r1.lo, r2.lo), hi=jnp.maximum(r1.hi, r2.hi)
    )
    return t0, t1, has
