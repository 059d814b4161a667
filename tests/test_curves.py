"""Curve shape tests (ref model: shapes_test.cpp curve sections).

Covers: flattening accuracy vs the analytic Bézier, ray/segment round-curve
intersection (t, u, v=(h+1)/2, tangent frame), any-hit occlusion, parser
`Shape "curve"` wiring, and an end-to-end hair-fiber render.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.accel.dense import intersect_any, intersect_closest
from pbrt_tpu.shapes.curve import (
    bezier_eval,
    bspline_to_bezier,
    build_curve_segments,
    flatten_curve,
)
from pbrt_tpu.shapes.geometry import GeometryBuffers


def _straight_z_curve(width=0.2):
    """A straight 'curve' along +z from 0 to 3, constant width."""
    cp = np.array(
        [[0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 0, 3]], np.float32
    )
    crv, crv_u, crv_mat = build_curve_segments(
        [{"cp": cp, "width0": width, "width1": width, "mat": 5}]
    )
    return GeometryBuffers.build(crv=crv, crv_u=crv_u, crv_mat=crv_mat)


def test_flatten_accuracy():
    # A genuinely curved Bézier: flattened polyline must stay within a
    # fraction of the curve width of the true curve at dense parameters.
    cp = np.array(
        [[0, 0, 0], [1, 2, 0], [2, -2, 0], [3, 0, 0]], np.float32
    )
    f = flatten_curve(cp, 0.1, 0.1)
    ts = np.linspace(0, 1, 257)
    true = bezier_eval(cp[None], ts)
    # Nearest flattened-segment distance for each true point.
    p0, p1 = f["p0"], f["p1"]
    seg = p1 - p0
    w0 = true[:, None, :] - p0[None]
    tt = np.clip(
        np.sum(w0 * seg[None], -1) / np.maximum(np.sum(seg * seg, -1), 1e-12),
        0, 1,
    )
    closest = p0[None] + tt[..., None] * seg[None]
    dist = np.min(np.linalg.norm(true[:, None] - closest, axis=-1), axis=1)
    assert float(dist.max()) < 0.05  # half the width


def test_curve_intersection_geometry():
    g = _straight_z_curve(width=0.2)
    # Ray crossing the fiber perpendicular to its axis, offset from the
    # axis by b in the binormal direction => |h| = b / r, t pulled forward.
    r = 0.1
    o = jnp.asarray(
        [
            [2.0, 0.0, 1.5],   # through the axis: h = 0, t = 2 - r
            [2.0, 0.05, 1.5],  # offset: |h| = 0.5
            [2.0, 0.2, 1.5],   # outside the radius: miss
            [2.0, 0.0, 5.0],   # beyond the end: miss
        ]
    )
    d = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (4, 1))
    it = intersect_closest(g, o, d)
    np.testing.assert_array_equal(
        np.asarray(it.valid), [True, True, False, False]
    )
    np.testing.assert_allclose(float(it.t[0]), 2.0 - r, rtol=1e-4)
    assert int(it.mat[0]) == 5
    # u = fraction along the curve = 0.5 at z = 1.5.
    np.testing.assert_allclose(float(it.uv[0, 0]), 0.5, atol=1e-3)
    # v = (h+1)/2: on-axis hit => 0.5; |h| = 0.5 offset => 0.25 or 0.75.
    np.testing.assert_allclose(float(it.uv[0, 1]), 0.5, atol=1e-3)
    assert abs(float(it.uv[1, 1]) - 0.5) > 0.2
    # dpdu carries the fiber tangent (+-z); normal is perpendicular to it.
    np.testing.assert_allclose(
        abs(float(it.dpdu[0, 2])), 1.0, atol=1e-4
    )
    assert abs(float(jnp.sum(it.n[0] * it.dpdu[0]))) < 1e-4
    # Geometric normal faces the ray origin.
    assert float(it.n[0, 0]) > 0.9


def test_curve_vs_triangle_ordering():
    # Curve in front of a triangle: closest hit must pick the curve, and
    # tmax clipping must expose the triangle when the curve is excluded.
    cp = np.array([[0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 0, 3]], np.float32)
    crv, crv_u, crv_mat = build_curve_segments(
        [{"cp": cp, "width0": 0.2, "width1": 0.2, "mat": 1}]
    )
    tri = np.array(
        [[[5.0, -9, -9], [5.0, 9, -9], [5.0, 0, 9]]], np.float32
    )
    g = GeometryBuffers.build(
        tri_verts=tri, tri_mat=np.array([2], np.int32),
        crv=crv, crv_u=crv_u, crv_mat=crv_mat,
    )
    o = jnp.asarray([[-2.0, 0.0, 1.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    it = intersect_closest(g, o, d)
    assert bool(it.valid[0]) and int(it.mat[0]) == 1
    np.testing.assert_allclose(float(it.t[0]), 1.9, rtol=1e-4)
    # Occlusion: the fiber blocks, a ray above it does not.
    occ = intersect_any(
        g,
        jnp.asarray([[-2.0, 0.0, 1.5], [-2.0, 0.5, 1.5]]),
        jnp.tile(d, (2, 1)),
        jnp.asarray([8.0, 8.0]),
    )
    np.testing.assert_array_equal(np.asarray(occ), [True, True])
    occ2 = intersect_any(
        g,
        jnp.asarray([[-2.0, 0.0, 1.5]]),
        d,
        jnp.asarray([1.0]),  # tmax before the fiber
    )
    assert not bool(occ2[0])


def test_bspline_conversion_interpolates():
    # A uniform cubic B-spline's Bézier spans must join continuously and
    # stay inside the control hull.
    cp = np.array(
        [[0, 0, 0], [1, 1, 0], [2, -1, 0], [3, 1, 0], [4, 0, 0]], np.float32
    )
    spans = bspline_to_bezier(cp)
    assert len(spans) == 2
    np.testing.assert_allclose(spans[0][3], spans[1][0], atol=1e-6)
    for s in spans:
        assert s[:, 0].min() >= -1e-5 and s[:, 0].max() <= 4 + 1e-5


def test_parser_curve_directive(tmp_path):
    scene_file = tmp_path / "hair.pbrt"
    scene_file.write_text(
        """
Camera "perspective" "float fov" [45]
Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
WorldBegin
LightSource "distant" "vector3 from" [0 0 0] "vector3 to" [0 -1 0]
Material "hair" "float eumelanin" [1.3]
Shape "curve" "point3 P" [0 -1 4  0 -0.3 4  0 0.3 4  0 1 4]
    "float width" [0.4]
AttributeBegin
Material "diffuse" "rgb reflectance" [0.5 0.5 0.5]
Shape "trianglemesh" "integer indices" [0 1 2]
    "point3 P" [-9 -9 8  9 -9 8  0 9 8]
AttributeEnd
"""
    )
    from pbrt_tpu.io.parser import load_pbrt

    scene, camera, settings = load_pbrt(str(scene_file))
    assert scene.geom.num_curves > 0
    assert scene.geom.num_triangles == 1
    # Central camera ray hits the fiber with the hair material bound.
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    it = intersect_closest(scene.geom, o, d)
    assert bool(it.valid[0])
    np.testing.assert_allclose(float(it.t[0]), 4.0 - 0.2, atol=0.02)


def test_hair_fiber_render(tmp_path):
    # End-to-end: a lit hair fiber renders finite, non-zero radiance on the
    # fiber pixels and differs from the background.
    scene_file = tmp_path / "render.pbrt"
    scene_file.write_text(
        """
Integrator "path" "integer maxdepth" [3]
Sampler "independent" "integer pixelsamples" [8]
Camera "perspective" "float fov" [30]
Film "rgb" "integer xresolution" [24] "integer yresolution" [24]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
Material "hair" "float eumelanin" [0.3]
Shape "curve" "point3 P" [0 -2 4  0 -0.7 4  0 0.7 4  0 2 4]
    "float width" [0.8]
"""
    )
    from pbrt_tpu.io.parser import load_pbrt
    from pbrt_tpu.render import render

    scene, camera, settings = load_pbrt(str(scene_file))
    img = np.asarray(
        render(
            scene, camera, settings["integrator"], spp=8,
            samples_per_pass=4,
            sampler_kind=settings.get("sampler", "independent"),
        )
    )
    assert np.all(np.isfinite(img))
    center = img[12, 12].mean()
    corner = img[0, 0].mean()
    assert center > 0.0
    assert abs(center - corner) > 1e-3


def test_loop_subdivision():
    """Loop subdivision: 4x face growth, shrinking shape error toward the
    limit surface (octahedron -> sphere-ish), boundary preservation."""
    from pbrt_tpu.shapes.subdiv import loop_subdivide

    # Octahedron (closed mesh).
    v = np.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
         [0, 0, -1]], np.float32
    )
    f = np.asarray(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32
    )
    v1, f1 = loop_subdivide(v, f, 1)
    assert f1.shape[0] == 4 * f.shape[0]
    v3, f3 = loop_subdivide(v, f, 3)
    assert f3.shape[0] == 64 * f.shape[0]
    # The refined surface is smooth and nearly round (the Loop limit of an
    # octahedron is sphere-like but not exactly a sphere, so gate on the
    # relative radius spread rather than monotone shrinkage).
    r3 = np.linalg.norm(v3, axis=-1)
    assert r3.std() / r3.mean() < 0.03
    # Interior refinement shrinks the shape strictly inside the hull.
    assert r3.max() <= 1.0 + 1e-6
    # Open mesh: boundary stays on the boundary curve (here: the square
    # rim of a single quad fan stays in the z=0 plane).
    vq = np.asarray(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    fq = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    vs, fs = loop_subdivide(vq, fq, 2)
    assert np.abs(vs[:, 2]).max() < 1e-6


def test_parser_loopsubdiv(tmp_path):
    scene_file = tmp_path / "subdiv.pbrt"
    scene_file.write_text(
        """
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Shape "loopsubdiv" "integer levels" [2]
    "integer indices" [0 2 4  2 1 4  1 3 4  3 0 4  2 0 5  1 2 5  3 1 5  0 3 5]
    "point3 P" [1 0 4  -1 0 4  0 1 4  0 -1 4  0 0 5  0 0 3]
"""
    )
    from pbrt_tpu.io.parser import load_pbrt

    scene, camera, settings = load_pbrt(str(scene_file))
    assert scene.geom.num_triangles == 8 * 16
