"""Foundation utility gates: ULP stepping, compensated sums, interval
arithmetic, quaternions, DirectionCone.

Modeled on the reference's math_test.cpp / vecmath_test.cpp strategies:
property checks (containment, inverses, orthogonality) over random inputs.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core.floats import (
    compensated_sum,
    difference_of_products,
    gamma,
    next_float_down,
    next_float_up,
    two_sum,
)
from pbrt_tpu.core.interval import Interval, interval_quadratic
from pbrt_tpu.core.quaternion import (
    quat_from_axis_angle,
    quat_from_matrix,
    quat_mul,
    quat_to_matrix,
    slerp,
)
from pbrt_tpu.core.vecmath import (
    DirectionCone,
    bound_subtended_directions,
    direction_cone_union,
)


def test_next_float_up_down():
    vals = jnp.asarray([0.0, -0.0, 1.0, -1.0, 1e-30, -1e-30, 1e30])
    up = np.asarray(next_float_up(vals))
    dn = np.asarray(next_float_down(vals))
    v = np.asarray(vals)
    assert (up > v).all()
    assert (dn < v).all()
    # Adjacent: nothing in between (check via float32 nextafter).
    np.testing.assert_array_equal(
        up, np.nextafter(v.astype(np.float32), np.float32(np.inf))
    )
    np.testing.assert_array_equal(
        dn, np.nextafter(v.astype(np.float32), np.float32(-np.inf))
    )
    # Infinity fixed points.
    assert np.isposinf(float(next_float_up(jnp.asarray(np.inf))))
    assert np.isneginf(float(next_float_down(jnp.asarray(-np.inf))))
    assert float(gamma(3)) > 0.0


def test_two_sum_exact():
    a = jnp.float32(1.0)
    b = jnp.float32(1e-9)
    s, err = two_sum(a, b)
    # s + err recovers the exact double sum.
    assert abs((float(s) + float(err)) - (1.0 + 1e-9)) < 1e-17


def test_compensated_sum_beats_naive():
    # 1 + 1e-8 * N: naive float32 accumulation loses the small terms.
    n = 10000
    vals = jnp.concatenate(
        [jnp.asarray([1.0], jnp.float32), jnp.full((n,), 1e-8, jnp.float32)]
    )
    naive = float(jnp.cumsum(vals)[-1])
    comp = float(compensated_sum(vals))
    exact = 1.0 + 1e-8 * n
    assert abs(comp - exact) < abs(naive - exact)
    assert abs(comp - exact) < 1e-7


def test_difference_of_products_catastrophic_cancellation():
    a = jnp.float32(33962.035)
    b = jnp.float32(-30438.8)
    c = jnp.float32(41563.4)
    d = jnp.float32(-24871.969)
    got = float(difference_of_products(a, b, c, d))
    exact = float(a) * float(b) - float(c) * float(d)  # float64
    naive = np.float32(a * b) - np.float32(c * d)
    assert abs(got - exact) <= abs(float(naive) - exact)


def test_interval_containment_properties():
    rng = np.random.default_rng(3)
    av = rng.uniform(-10, 10, 256).astype(np.float32)
    bv = rng.uniform(-10, 10, 256).astype(np.float32)
    ea = rng.uniform(0, 0.1, 256).astype(np.float32)
    eb = rng.uniform(0, 0.1, 256).astype(np.float32)
    A = Interval.from_value_and_error(jnp.asarray(av), jnp.asarray(ea))
    B = Interval.from_value_and_error(jnp.asarray(bv), jnp.asarray(eb))
    # The exact real results must lie inside the result intervals.
    for op, ref in [
        (A + B, av.astype(np.float64) + bv),
        (A - B, av.astype(np.float64) - bv),
        (A * B, av.astype(np.float64) * bv),
        (A.sqr(), av.astype(np.float64) ** 2),
    ]:
        assert bool(np.all(np.asarray(op.lo) <= ref + 1e-6)), "lo"
        assert bool(np.all(np.asarray(op.hi) >= ref - 1e-6)), "hi"
    # Division (nonzero denominators).
    B2 = Interval.from_value_and_error(
        jnp.asarray(np.abs(bv) + 1.0), jnp.asarray(eb)
    )
    q = A / B2
    ref = av.astype(np.float64) / (np.abs(bv) + 1.0)
    assert bool(np.all(np.asarray(q.lo) <= ref + 1e-6))
    assert bool(np.all(np.asarray(q.hi) >= ref - 1e-6))


def test_interval_quadratic_brackets_roots():
    # (t - 2)(t - 5) = t^2 - 7t + 10.
    a = Interval.exact(jnp.asarray([1.0]))
    b = Interval.exact(jnp.asarray([-7.0]))
    c = Interval.exact(jnp.asarray([10.0]))
    t0, t1, has = interval_quadratic(a, b, c)
    assert bool(has[0])
    assert float(t0.lo[0]) <= 2.0 <= float(t0.hi[0])
    assert float(t1.lo[0]) <= 5.0 <= float(t1.hi[0])
    # No real roots.
    _, _, has2 = interval_quadratic(
        Interval.exact(jnp.asarray([1.0])),
        Interval.exact(jnp.asarray([0.0])),
        Interval.exact(jnp.asarray([1.0])),
    )
    assert not bool(has2[0])


def test_quaternion_roundtrip_and_slerp():
    rng = np.random.default_rng(0)
    axes = rng.normal(size=(32, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(-np.pi, np.pi, 32)
    q = quat_from_axis_angle(jnp.asarray(axes), jnp.asarray(angles))
    m = quat_to_matrix(q)
    # Rotation matrices: orthonormal, det +1.
    mtm = np.einsum("nij,nik->njk", np.asarray(m), np.asarray(m))
    np.testing.assert_allclose(mtm, np.broadcast_to(np.eye(3), (32, 3, 3)),
                               atol=1e-5)
    # Matrix -> quaternion -> matrix roundtrip.
    q2 = quat_from_matrix(m)
    m2 = quat_to_matrix(q2)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)
    # Composition: q*q == rotation by 2*angle.
    qq = quat_mul(q, q)
    m_sq = quat_to_matrix(qq)
    m_2 = quat_to_matrix(
        quat_from_axis_angle(jnp.asarray(axes), jnp.asarray(2.0 * angles))
    )
    np.testing.assert_allclose(np.asarray(m_sq), np.asarray(m_2), atol=1e-4)
    # Slerp endpoints + midpoint angle.
    qa = quat_from_axis_angle(jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([0.0]))
    qb = quat_from_axis_angle(
        jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([np.pi / 2])
    )
    np.testing.assert_allclose(
        np.asarray(slerp(qa, qb, 0.0)), np.asarray(qa), atol=1e-6
    )
    mid = quat_to_matrix(slerp(qa, qb, 0.5))
    want = quat_to_matrix(
        quat_from_axis_angle(jnp.asarray([[0.0, 0.0, 1.0]]),
                             jnp.asarray([np.pi / 4]))
    )
    np.testing.assert_allclose(np.asarray(mid), np.asarray(want), atol=1e-5)


def test_direction_cone():
    up = jnp.asarray([[0.0, 0.0, 1.0]])
    x = jnp.asarray([[1.0, 0.0, 0.0]])
    c_up = DirectionCone.from_direction(up)
    assert bool(c_up.inside(up)[0])
    assert not bool(c_up.inside(x)[0])
    # Union of +z and +x spans 90 degrees: contains the bisector.
    u = direction_cone_union(
        DirectionCone.from_direction(up), DirectionCone.from_direction(x)
    )
    bis = jnp.asarray([[np.sqrt(0.5), 0.0, np.sqrt(0.5)]])
    assert bool(u.inside(bis)[0])
    assert not bool(u.inside(jnp.asarray([[0.0, 0.0, -1.0]]))[0])
    # Bound subtended: from far away, a tight cone toward the box; from
    # inside, the whole sphere.
    bc = bound_subtended_directions(
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 1.0, 1.0]),
        jnp.asarray([[5.0, 0.5, 0.5], [0.5, 0.5, 0.5]]),
    )
    assert float(bc.cos_theta[0]) > 0.9
    assert float(bc.cos_theta[1]) == -1.0
    toward = jnp.asarray([[-1.0, 0.0, 0.0]])
    assert bool(bc.inside(toward)[0])
