"""Object instancing through the scene parser: true instancing (unique
geometry + per-instance traversal), animated instances (ActiveTransform),
and emissive-object flattening fallback.

Reference: scene.cpp:1352-1557 (instance BVHs), cpu/primitive.h:86-119
(Transformed/AnimatedPrimitive), scene.cpp TransformSet/ActiveTransform.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.accel import api as accel_api
from pbrt_tpu.io.parser import load_pbrt_string as parse_pbrt_string


_PROTO = """
ObjectBegin "box"
  Shape "trianglemesh"
    "point3 P" [ -0.5 -0.5 -0.5   0.5 -0.5 -0.5   0.5 0.5 -0.5   -0.5 0.5 -0.5
                 -0.5 -0.5 0.5    0.5 -0.5 0.5    0.5 0.5 0.5    -0.5 0.5 0.5 ]
    "integer indices" [ 0 1 2  0 2 3   4 6 5  4 7 6   0 4 5  0 5 1
                        3 2 6  3 6 7   0 3 7  0 7 4   1 5 6  1 6 2 ]
ObjectEnd
"""

_SCENE_HEAD = """
Camera "perspective" "float fov" [40]
Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
WorldBegin
LightSource "point" "point3 from" [0 8 0] "rgb I" [50 50 50]
"""


def _instanced_text(n=5):
    body = _SCENE_HEAD + _PROTO
    for i in range(n):
        body += f"""
AttributeBegin
  Translate {i * 2 - 4} 0 3
  Rotate {i * 30} 0 1 0
  ObjectInstance "box"
AttributeEnd
"""
    return body


def _flattened_text(n=5):
    body = _SCENE_HEAD
    for i in range(n):
        body += f"""
AttributeBegin
  Translate {i * 2 - 4} 0 3
  Rotate {i * 30} 0 1 0
  Shape "trianglemesh"
    "point3 P" [ -0.5 -0.5 -0.5   0.5 -0.5 -0.5   0.5 0.5 -0.5   -0.5 0.5 -0.5
                 -0.5 -0.5 0.5    0.5 -0.5 0.5    0.5 0.5 0.5    -0.5 0.5 0.5 ]
    "integer indices" [ 0 1 2  0 2 3   4 6 5  4 7 6   0 4 5  0 5 1
                        3 2 6  3 6 7   0 3 7  0 7 4   1 5 6  1 6 2 ]
AttributeEnd
"""
    return body


def _rays(n=2048, seed=0):
    r = np.random.default_rng(seed)
    o = r.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 2] -= 4
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_parser_instancing_matches_flattened():
    sc_i, _, _ = parse_pbrt_string(_instanced_text())
    sc_f, _, _ = parse_pbrt_string(_flattened_text())
    # Memory O(unique geometry): 12 prototype triangles once, not 5x.
    assert sc_i.geom.num_triangles == 12
    assert sc_f.geom.num_triangles == 60
    assert sc_i.sweep is not None and sc_i.sweep.instanced

    o, d = _rays()
    a = accel_api.closest(sc_i, o, d)
    b = accel_api.closest(sc_f, o, d)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    hit = np.asarray(a.valid)
    np.testing.assert_allclose(
        np.asarray(a.p)[hit], np.asarray(b.p)[hit], rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(a.n)[hit], np.asarray(b.n)[hit], rtol=1e-3, atol=1e-3
    )
    tm = jnp.full((o.shape[0],), 8.0)
    occ_a = accel_api.any_hit(sc_i, o, d, tm)
    occ_b = accel_api.any_hit(sc_f, o, d, tm)
    np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))


def test_animated_instance_endpoints():
    """ActiveTransform keyframes: at time=0 the instance sits at the
    StartTime transform, at time=1 at the EndTime transform — each must
    match a static instance placed there."""
    anim_text = _SCENE_HEAD + _PROTO + """
AttributeBegin
  ActiveTransform StartTime
  Translate -2 0 3
  ActiveTransform EndTime
  Translate 2 0 3
  ActiveTransform All
  ObjectInstance "box"
AttributeEnd
"""
    static0 = _SCENE_HEAD + _PROTO + """
AttributeBegin
  Translate -2 0 3
  ObjectInstance "box"
AttributeEnd
"""
    static1 = _SCENE_HEAD + _PROTO + """
AttributeBegin
  Translate 2 0 3
  ObjectInstance "box"
AttributeEnd
"""
    sc_a, _, _ = parse_pbrt_string(anim_text)
    sc_0, _, _ = parse_pbrt_string(static0)
    sc_1, _, _ = parse_pbrt_string(static1)
    assert sc_a.anim is not None
    o, d = _rays(1024, seed=2)
    n = o.shape[0]
    for t_val, sc_ref in ((0.0, sc_0), (1.0, sc_1)):
        time = jnp.full((n,), t_val, jnp.float32)
        a = accel_api.closest(sc_a, o, d, time=time)
        b = accel_api.closest(sc_ref, o, d)
        np.testing.assert_array_equal(
            np.asarray(a.valid), np.asarray(b.valid)
        )
        hit = np.asarray(a.valid)
        np.testing.assert_allclose(
            np.asarray(a.p)[hit], np.asarray(b.p)[hit],
            rtol=1e-3, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(a.n)[hit], np.asarray(b.n)[hit],
            rtol=1e-3, atol=1e-3,
        )


def test_emissive_object_instances_flatten():
    """Objects containing area lights flatten (reference errors on them;
    we keep rendering) and a warning records the fallback."""
    text = _SCENE_HEAD + """
ObjectBegin "lamp"
  AreaLightSource "diffuse" "rgb L" [5 5 5]
  Shape "trianglemesh"
    "point3 P" [ -0.5 2 -0.5   0.5 2 -0.5   0.5 2 0.5   -0.5 2 0.5 ]
    "integer indices" [ 0 1 2  0 2 3 ]
ObjectEnd
AttributeBegin
  Translate 0 0 3
  ObjectInstance "lamp"
AttributeEnd
"""
    scene, _, settings = parse_pbrt_string(text)
    # Flattened: 2 world-space emissive triangles, no instance tables.
    assert scene.geom.num_triangles == 2
    assert int(np.asarray(scene.geom.tri_light).max()) >= 0


def test_instanced_scene_renders():
    """End-to-end path render of an instanced scene is finite and sees
    the instances (non-trivial image)."""
    from pbrt_tpu.films.rgb import spectrum_to_rgb
    from pbrt_tpu.models.path import PathIntegrator
    from pbrt_tpu.render import camera_rays

    scene, camera, _ = parse_pbrt_string(_instanced_text())
    integ = PathIntegrator(max_depth=3, rr_start_depth=3)
    nx, ny = camera.resolution
    pixel = jnp.arange(nx * ny, dtype=jnp.int32)
    sample = jnp.zeros_like(pixel)
    o, d, wl = camera_rays(camera, pixel, sample, jnp.int32(0))
    radiance = integ.trace(scene, o, d, wl, pixel, sample, jnp.int32(0))
    rgb = np.asarray(spectrum_to_rgb(radiance, wl))
    assert np.isfinite(rgb).all()
    assert rgb.max() > 0.0
