"""Quaternions for rotation interpolation.

Reference analogue: /root/reference/src/pbrt/util/quaternion.h and the
Transform decomposition in util/transform.cpp (AnimatedTransform needs
matrix -> quaternion -> slerp -> matrix). Layout: (x, y, z, w) with w the
scalar part, stored as a (..., 4) array — plain arrays, so every operation
vmaps/jits trivially.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity():
    return jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)


def quat_from_axis_angle(axis, theta):
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    theta = jnp.asarray(theta, jnp.float32)
    s = jnp.sin(theta / 2.0)[..., None]
    w = jnp.cos(theta / 2.0)[..., None]
    return jnp.concatenate([axis * s, jnp.broadcast_to(w, s.shape)], axis=-1)


def quat_mul(a, b):
    ax, ay, az, aw = (a[..., i] for i in range(4))
    bx, by, bz, bw = (b[..., i] for i in range(4))
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_from_matrix(m):
    """3x3 rotation matrix -> quaternion (quaternion.h Transform ctor,
    branch-free Shepperd variant: compute all four candidate constructions
    and pick the best-conditioned by where-select)."""
    m = jnp.asarray(m, jnp.float32)
    t = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]

    # Candidate 0: trace-dominant.
    s0 = jnp.sqrt(jnp.maximum(1.0 + t, 1e-12))
    q0 = jnp.stack(
        [
            (m[..., 2, 1] - m[..., 1, 2]) / (2.0 * s0),
            (m[..., 0, 2] - m[..., 2, 0]) / (2.0 * s0),
            (m[..., 1, 0] - m[..., 0, 1]) / (2.0 * s0),
            0.5 * s0,
        ],
        axis=-1,
    )
    # Candidates 1-3: diagonal-dominant per axis.
    s1 = jnp.sqrt(jnp.maximum(
        1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2], 1e-12))
    q1 = jnp.stack(
        [
            0.5 * s1,
            (m[..., 0, 1] + m[..., 1, 0]) / (2.0 * s1),
            (m[..., 0, 2] + m[..., 2, 0]) / (2.0 * s1),
            (m[..., 2, 1] - m[..., 1, 2]) / (2.0 * s1),
        ],
        axis=-1,
    )
    s2 = jnp.sqrt(jnp.maximum(
        1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2], 1e-12))
    q2 = jnp.stack(
        [
            (m[..., 0, 1] + m[..., 1, 0]) / (2.0 * s2),
            0.5 * s2,
            (m[..., 1, 2] + m[..., 2, 1]) / (2.0 * s2),
            (m[..., 0, 2] - m[..., 2, 0]) / (2.0 * s2),
        ],
        axis=-1,
    )
    s3 = jnp.sqrt(jnp.maximum(
        1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2], 1e-12))
    q3 = jnp.stack(
        [
            (m[..., 0, 2] + m[..., 2, 0]) / (2.0 * s3),
            (m[..., 1, 2] + m[..., 2, 1]) / (2.0 * s3),
            0.5 * s3,
            (m[..., 1, 0] - m[..., 0, 1]) / (2.0 * s3),
        ],
        axis=-1,
    )
    d = jnp.stack(
        [t, m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]], axis=-1
    )
    best = jnp.argmax(d, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(
        cands, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    return quat_normalize(q)


def quat_to_matrix(q):
    x, y, z, w = (q[..., i] for i in range(4))
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        axis=-1,
    )
    row1 = jnp.stack(
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        axis=-1,
    )
    row2 = jnp.stack(
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def slerp(q0, q1, t):
    """Spherical linear interpolation (quaternion.h Slerp), branch-free
    with the near-parallel lerp fallback."""
    t = jnp.asarray(t, jnp.float32)
    cos_th = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(cos_th[..., None] < 0.0, -q1, q1)
    cos_th = jnp.abs(cos_th)
    near = cos_th > 0.9995
    theta = jnp.arccos(jnp.clip(cos_th, -1.0, 1.0))
    sin_th = jnp.sin(theta)
    w0 = jnp.where(
        near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_th, 1e-9)
    )
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.maximum(sin_th, 1e-9))
    return quat_normalize(w0[..., None] * q0 + w1[..., None] * q1)
