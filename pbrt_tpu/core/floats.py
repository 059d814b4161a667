"""Floating-point utilities: ULP stepping, error bounds, compensated sums.

Reference analogue: /root/reference/src/pbrt/util/float.h (NextFloatUp/
NextFloatDown, gamma) and util/math.h (CompensatedSum, CompensatedFloat,
TwoProd/TwoSum error-free transforms). All functions are jittable and
vectorized; the bit tricks use bitcasts, which XLA lowers to no-ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MACHINE_EPSILON = float(jnp.finfo(jnp.float32).eps) * 0.5


def gamma(n):
    """Conservative floating-point error bound factor (float.h gamma(n))."""
    n = jnp.asarray(n, jnp.float32)
    return n * MACHINE_EPSILON / (1.0 - n * MACHINE_EPSILON)


def _to_bits(f):
    return jax.lax.bitcast_convert_type(jnp.asarray(f, jnp.float32), jnp.uint32)


def _from_bits(b):
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def next_float_up(f):
    """Smallest float32 strictly greater than f (float.h:NextFloatUp).

    +inf maps to itself; -0 is treated as +0 first.
    """
    f = jnp.asarray(f, jnp.float32)
    f0 = jnp.where(f == 0.0, jnp.float32(0.0), f)  # collapse -0 to +0
    b = _to_bits(f0)
    up = jnp.where(f0 >= 0.0, b + 1, b - 1)
    out = _from_bits(up)
    return jnp.where(jnp.isposinf(f), f, out)


def next_float_down(f):
    """Largest float32 strictly less than f (float.h:NextFloatDown)."""
    f = jnp.asarray(f, jnp.float32)
    f0 = jnp.where(f == 0.0, jnp.float32(-0.0), f)
    b = _to_bits(f0)
    down = jnp.where(f0 > 0.0, b - 1, b + 1)
    out = _from_bits(down)
    return jnp.where(jnp.isneginf(f), f, out)


def two_sum(a, b):
    """Error-free transform: a + b = s + err exactly (math.h TwoSum)."""
    s = a + b
    delta = s - a
    err = (a - (s - delta)) + (b - delta)
    return s, err


def _dekker_split(a):
    """Veltkamp split: a = hi + lo with hi holding the top 12 bits."""
    c = jnp.float32(4097.0) * a  # 2^12 + 1
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: a * b = p + err (math.h TwoProd).

    Dekker/Veltkamp splitting, NOT the `a*b - p` FMA idiom: whether XLA
    contracts that expression to fma() depends on fusion/CSE context
    (observed: under jit, CSE of an already-computed product kills one
    contraction but not its twin, so DifferenceOfProducts of two equal
    products returned a tiny NONZERO — fake watertight triangle hits on
    degenerate pads). The split version is exact in plain IEEE ops."""
    p = a * b
    ah, al = _dekker_split(a)
    bh, bl = _dekker_split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def difference_of_products(a, b, c, d):
    """a*b - c*d with round-off correction (math.h:57). Exactly
    antisymmetric: difference_of_products(c, d, a, b) is the exact
    negation, and equal products give exactly zero — the property the
    watertight triangle test's shared edges rely on."""
    p1, e1 = two_prod(a, b)
    p2, e2 = two_prod(c, d)
    return (p1 - p2) + (e1 - e2)


def compensated_sum(values, axis=0):
    """Kahan-compensated reduction along `axis` (math.h CompensatedSum).

    Deterministic sequential scan — used where bitwise reproducibility of
    accumulation matters more than reduction speed.
    """
    values = jnp.moveaxis(jnp.asarray(values, jnp.float32), axis, 0)

    def body(carry, v):
        s, c = carry
        y = v - c
        t = s + y
        c = (t - s) - y
        return (t, c), None

    (s, _), _ = jax.lax.scan(
        body,
        (jnp.zeros(values.shape[1:], values.dtype),
         jnp.zeros(values.shape[1:], values.dtype)),
        values,
    )
    return s
