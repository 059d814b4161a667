"""Vecmath and transform tests (ref: vecmath_test.cpp, transform_test.cpp)."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import transform, vecmath


def _rand_dirs(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))


def test_coordinate_system_orthonormal():
    v = _rand_dirs(256)
    t1, t2 = vecmath.coordinate_system(v)
    for a, b in [(t1, t2), (t1, v), (t2, v)]:
        np.testing.assert_allclose(np.asarray(vecmath.dot(a, b)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vecmath.length(t1)), 1.0, atol=1e-5)
    # Right-handed: t1 x t2 == v.
    np.testing.assert_allclose(
        np.asarray(vecmath.cross(t1, t2)), np.asarray(v), atol=1e-5
    )


def test_local_frame_roundtrip():
    n = _rand_dirs(128, 1)
    w = _rand_dirs(128, 2)
    t1, t2 = vecmath.coordinate_system(n)
    local = vecmath.to_local(w, t1, t2, n)
    back = vecmath.from_local(local, t1, t2, n)
    np.testing.assert_allclose(np.asarray(back), np.asarray(w), atol=1e-5)


def test_octahedral_roundtrip():
    v = _rand_dirs(512, 3)
    e = vecmath.octahedral_encode(v)
    assert float(jnp.max(jnp.abs(e))) <= 1.0 + 1e-6
    back = vecmath.octahedral_decode(e)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)


def test_equal_area_sphere_mapping():
    r = np.random.default_rng(4)
    p = jnp.asarray(r.uniform(0.01, 0.99, size=(512, 2)).astype(np.float32))
    d = vecmath.equal_area_square_to_sphere(p)
    np.testing.assert_allclose(np.asarray(vecmath.length(d)), 1.0, atol=1e-4)
    back = vecmath.equal_area_sphere_to_square(d)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-4)


def test_reflect_refract():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = vecmath.normalize(jnp.asarray([[1.0, 0.0, 1.0]]))
    r = vecmath.reflect(wo, n)
    np.testing.assert_allclose(
        np.asarray(r), np.asarray(vecmath.normalize(jnp.asarray([[-1.0, 0.0, 1.0]]))), atol=1e-6
    )
    # Refraction obeys Snell's law.
    eta = jnp.asarray([1.5])
    valid, wt, eta_eff = vecmath.refract(wo, n, eta)
    assert bool(valid[0])
    sin_i = float(vecmath.length(wo[..., :2])[0])
    sin_t = float((vecmath.length(wt[..., :2]) / vecmath.length(wt))[0])
    np.testing.assert_allclose(sin_i / sin_t, 1.5, rtol=1e-4)
    # Total internal reflection going the other way at grazing angle.
    wo_g = vecmath.normalize(jnp.asarray([[0.95, 0.0, -0.3]]))
    valid_t, _, _ = vecmath.refract(wo_g, n, eta)
    assert not bool(valid_t[0])


def test_transform_compose_inverse():
    t = (
        transform.translate((1.0, 2.0, 3.0))
        @ transform.rotate_y(37.0)
        @ transform.scale((2.0, 2.0, 2.0))
    )
    p = jnp.asarray([[0.5, -1.0, 2.0], [0.0, 0.0, 0.0]])
    q = t.apply_point(p)
    back = t.inverse().apply_point(q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t.m @ t.m_inv), np.eye(4), atol=1e-5
    )


def test_normals_stay_perpendicular():
    t = transform.scale((1.0, 4.0, 1.0)) @ transform.rotate_x(20.0)
    # Tangent/normal pair on a surface.
    tang = jnp.asarray([[1.0, 0.0, 0.0]])
    norm = jnp.asarray([[0.0, 1.0, 0.0]])
    tw = t.apply_vector(tang)
    nw = t.apply_normal(norm)
    np.testing.assert_allclose(np.asarray(vecmath.dot(tw, nw)), 0.0, atol=1e-5)


def test_look_at():
    t = transform.look_at((0.0, 0.0, -5.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    # Camera origin maps to eye; +z maps toward target.
    o = t.apply_point(jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(o[0]), [0.0, 0.0, -5.0], atol=1e-5)
    fwd = t.apply_vector(jnp.asarray([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(fwd[0]), [0.0, 0.0, 1.0], atol=1e-5)
