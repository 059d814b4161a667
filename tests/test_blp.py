"""Analytic bilinear-patch gates (ref: BilinearPatch::Intersect,
shapes.h:1350 — Reshetov's 'Cool Patches' quadratic)."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.accel import api as accel_api
from pbrt_tpu.accel.dense import blp_best
from pbrt_tpu.lights.buffers import LightBuffers
from pbrt_tpu.materials.buffers import MaterialBuffers
from pbrt_tpu.scene import Scene
from pbrt_tpu.shapes.geometry import GeometryBuffers


def _scene(blp):
    return Scene(
        geom=GeometryBuffers.build(
            blp=np.asarray(blp, np.float32),
            blp_mat=np.arange(1, len(blp) + 1, dtype=np.int32),
        ),
        materials=MaterialBuffers.build(
            [{"kind": 0, "albedo": (0.5,) * 3}] * (len(blp) + 1)
        ),
        lights=LightBuffers.build(),
    )


def test_planar_patch_exact():
    """A flat unit quad at z=4: exact t, parametric uv, +z normal."""
    quad = [(0, 0, 4, 1, 0, 4, 0, 1, 4, 1, 1, 4)]  # p00 p10 p01 p11
    scene = _scene(quad)
    o = jnp.asarray([[0.25, 0.75, 0.0], [2.0, 0.5, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    it = accel_api.closest(scene, o, d)
    assert bool(it.valid[0]) and not bool(it.valid[1])
    np.testing.assert_allclose(float(it.t[0]), 4.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(it.uv[0]), [0.25, 0.75], atol=1e-4
    )
    assert abs(abs(float(it.n[0, 2])) - 1.0) < 1e-5
    assert int(it.mat[0]) == 1


def test_curved_patch_roundtrip():
    """Non-planar patch: rays aimed at P(u, v) recover (u, v) and the
    surface point (the quadratic's second root class)."""
    p00, p10 = np.array([0, 0, 4.0]), np.array([1, 0, 5.0])
    p01, p11 = np.array([0, 1, 5.0]), np.array([1, 1, 4.0])
    scene = _scene([tuple(p00) + tuple(p10) + tuple(p01) + tuple(p11)])
    rng = np.random.default_rng(0)
    uv = rng.random((128, 2)).astype(np.float32) * 0.98 + 0.01
    u, v = uv[:, 0:1], uv[:, 1:2]
    pts = (
        (1 - u) * (1 - v) * p00 + u * (1 - v) * p10
        + (1 - u) * v * p01 + u * v * p11
    )
    o = np.zeros((128, 3), np.float32)
    o[:, 0] = pts[:, 0] + rng.normal(0, 0.1, 128)
    o[:, 1] = pts[:, 1] + rng.normal(0, 0.1, 128)
    d = pts - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t, idx, uu, vv = blp_best(
        scene.geom, jnp.asarray(o), jnp.asarray(d), None
    )
    hit = np.asarray(idx) >= 0
    assert hit.mean() > 0.97
    np.testing.assert_allclose(np.asarray(uu)[hit], uv[hit, 0], atol=2e-3)
    np.testing.assert_allclose(np.asarray(vv)[hit], uv[hit, 1], atol=2e-3)
    p_hit = o[hit] + np.asarray(t)[hit][:, None] * d[hit]
    np.testing.assert_allclose(p_hit, pts[hit], atol=2e-3)


def test_parser_bilinearmesh_analytic(tmp_path):
    scene_file = tmp_path / "blp.pbrt"
    scene_file.write_text(
        """
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Shape "bilinearmesh" "integer indices" [0 1 2 3]
    "point3 P" [-1 -1 4  1 -1 4  -1 1 5  1 1 5]
"""
    )
    from pbrt_tpu.io.parser import load_pbrt

    scene, camera, settings = load_pbrt(str(scene_file))
    assert scene.geom.num_blps == 1
    assert scene.geom.num_triangles == 0
    it = accel_api.closest(
        scene, jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[0.0, 0.0, 1.0]])
    )
    assert bool(it.valid[0])
    assert 4.0 < float(it.t[0]) < 5.0
    # Occlusion agrees.
    occ = accel_api.any_hit(
        scene, jnp.asarray([[0.0, 0.0, 0.0]]),
        jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([10.0])
    )
    assert bool(occ[0])
