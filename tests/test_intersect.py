"""Dense intersection unit tests (ref model: shapes_test.cpp)."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.accel.dense import intersect_any, intersect_closest
from pbrt_tpu.shapes.geometry import GeometryBuffers, make_box, make_quad


def _geom_single_tri():
    verts = np.array(
        [[[0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [0.0, 1.0, 1.0]]], np.float32
    )
    return GeometryBuffers.build(
        tri_verts=verts, tri_mat=np.array([3], np.int32)
    )


def test_triangle_hit_miss():
    g = _geom_single_tri()
    o = jnp.asarray([[0.2, 0.2, 0.0], [0.9, 0.9, 0.0], [0.2, 0.2, 2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    it = intersect_closest(g, o, d)
    np.testing.assert_array_equal(np.asarray(it.valid), [True, False, True])
    np.testing.assert_allclose(float(it.t[0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(it.p[0]), [0.2, 0.2, 1.0], atol=1e-5)
    assert int(it.mat[0]) == 3
    # Barycentric uv at (0.2, 0.2).
    np.testing.assert_allclose(np.asarray(it.uv[0]), [0.2, 0.2], atol=1e-5)
    # Normal along +/-z.
    np.testing.assert_allclose(abs(float(it.n[0, 2])), 1.0, atol=1e-5)


def test_sphere_hit():
    g = GeometryBuffers.build(
        spheres=np.array([[0.0, 0.0, 5.0, 1.0]], np.float32),
        sph_mat=np.array([7], np.int32),
    )
    o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    it = intersect_closest(g, o, d)
    np.testing.assert_array_equal(np.asarray(it.valid), [True, False])
    np.testing.assert_allclose(float(it.t[0]), 4.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(it.n[0]), [0.0, 0.0, -1.0], atol=1e-4)
    assert int(it.mat[0]) == 7
    # From inside the sphere: hits the far shell.
    o2 = jnp.asarray([[0.0, 0.0, 5.0]])
    it2 = intersect_closest(g, o2, jnp.asarray([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(float(it2.t[0]), 1.0, rtol=1e-5)


def test_closest_of_many():
    # A box around the origin: ray from outside must hit the near face.
    g = GeometryBuffers.build(tri_verts=make_box((-1, -1, -1), (1, 1, 1)))
    o = jnp.asarray([[0.3, 0.2, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    it = intersect_closest(g, o, d)
    assert bool(it.valid[0])
    np.testing.assert_allclose(float(it.t[0]), 4.0, rtol=1e-5)
    np.testing.assert_allclose(float(it.p[0, 2]), -1.0, atol=1e-5)


def test_block_scan_padding():
    # More triangles than one block (block=512) exercises the lax.scan path
    # and padding; closest among duplicates at increasing depth must win.
    quads = []
    for i in range(600):
        z = 1.0 + i * 0.01
        quads.append(
            make_quad((-1, -1, z), (1, -1, z), (1, 1, z), (-1, 1, z))
        )
    verts = np.concatenate(quads, axis=0)
    g = GeometryBuffers.build(tri_verts=verts)
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    it = intersect_closest(g, o, d)
    np.testing.assert_allclose(float(it.t[0]), 1.0, rtol=1e-5)
    assert int(it.prim[0]) in (0, 1)


def test_intersect_any_tmax():
    g = _geom_single_tri()
    o = jnp.asarray([[0.2, 0.2, 0.0], [0.2, 0.2, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    tmax = jnp.asarray([2.0, 0.5])  # second ray stops before the triangle
    occ = intersect_any(g, o, d, tmax)
    np.testing.assert_array_equal(np.asarray(occ), [True, False])


def test_smallscene_kernel_matches_dense():
    """The Pallas small-scene kernel (interpret mode on CPU) agrees with
    the dense XLA tester on hits, t, uv, and attributes."""
    import numpy as np

    from pbrt_tpu.accel import dense as dn
    from pbrt_tpu.ops.smallscene import build_smallscene, smallscene_intersect
    from pbrt_tpu.scenes.cornell import cornell_box

    scene, _ = cornell_box(resolution=(8, 8))
    g = scene.geom
    rng = np.random.default_rng(3)
    n = 256
    o = jnp.asarray(rng.uniform(0.05, 0.95, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full((n,), 1e30)

    acc = build_smallscene(
        np.asarray(g.tri_verts), np.asarray(g.tri_mat),
        np.asarray(g.tri_light),
    )
    res = smallscene_intersect(acc, o, d, tmax, interpret=True)
    ref = dn.intersect_closest(g, o, d)
    hit_k = np.asarray(res["prim"]) >= 0
    hit_d = np.asarray(ref.valid)
    np.testing.assert_array_equal(hit_k, hit_d)
    np.testing.assert_allclose(
        np.asarray(res["t"])[hit_k], np.asarray(ref.t)[hit_d], rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(res["mat"])[hit_k], np.asarray(ref.mat)[hit_d]
    )
    # any-hit agrees with occlusion.
    occ = smallscene_intersect(acc, o, d, tmax, any_hit=True,
                               interpret=True)["prim"] >= 0
    np.testing.assert_array_equal(np.asarray(occ), hit_d)


def test_analytic_disk_and_cylinder():
    """Analytic quadrics (Disk/Cylinder::Intersect): exact t, normals, uv
    windows, and merge ordering against triangles."""
    import numpy as np

    from pbrt_tpu.accel import api as accel_api
    from pbrt_tpu.lights.buffers import LightBuffers
    from pbrt_tpu.materials.buffers import MaterialBuffers
    from pbrt_tpu.scene import Scene
    from pbrt_tpu.shapes.geometry import GeometryBuffers

    # Disk at z=3, normal -z, radius 1, inner 0.3; cylinder along +y at
    # x=0,z=6 radius 0.5 half-length 1; backing triangle at z=9.
    geom = GeometryBuffers.build(
        tri_verts=np.asarray(
            [[[-9, -9, 9], [9, -9, 9], [0, 9, 9]]], np.float32
        ),
        tri_mat=np.asarray([3], np.int32),
        tri_light=np.asarray([-1], np.int32),
        disk=np.asarray([[0, 0, 3, 0, 0, -1, 1.0, 0.3]], np.float32),
        disk_mat=np.asarray([1], np.int32),
        cyl=np.asarray([[0, 0, 6, 0, 1, 0, 0.5, 1.0]], np.float32),
        cyl_mat=np.asarray([2], np.int32),
    )
    scene = Scene(
        geom=geom,
        materials=MaterialBuffers.build(
            [{"kind": 0, "albedo": (0.5,) * 3}] * 4
        ),
        lights=LightBuffers.build(),
    )
    o = jnp.asarray([
        [0.5, 0.0, 0.0],   # hits the disk annulus at t=3
        [0.1, 0.0, 0.0],   # inside the inner hole -> cylinder at t=5.5
        [3.0, 0.0, 0.0],   # misses both -> triangle at t=9
        [0.1, 5.0, 0.0],   # above the cylinder's axial span -> triangle
    ], jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
    it = accel_api.closest(scene, o, d)
    np.testing.assert_array_equal(np.asarray(it.valid), [True] * 4)
    np.testing.assert_array_equal(np.asarray(it.mat), [1, 2, 3, 3])
    np.testing.assert_allclose(float(it.t[0]), 3.0, rtol=1e-5)
    # Cylinder entry: z = 6 - sqrt(0.25 - 0.01).
    np.testing.assert_allclose(
        float(it.t[1]), 6.0 - np.sqrt(0.25 - 0.01), rtol=1e-4
    )
    # Normals: disk -z plane; cylinder radial (x, z) with zero y.
    np.testing.assert_allclose(
        np.abs(float(it.n[0, 2])), 1.0, atol=1e-5
    )
    assert abs(float(it.n[1, 1])) < 1e-5
    # Occlusion sees both quadrics.
    occ = accel_api.any_hit(
        scene, o, d, jnp.full((4,), 4.0)
    )
    np.testing.assert_array_equal(np.asarray(occ), [True, False, False, False])


def test_parser_analytic_quadrics(tmp_path):
    scene_file = tmp_path / "quadrics.pbrt"
    scene_file.write_text(
        """
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Material "diffuse" "rgb reflectance" [0.5 0.5 0.5]
AttributeBegin
Translate 0 0 4
Shape "disk" "float radius" [0.8]
AttributeEnd
AttributeBegin
Translate 2 0 4
Rotate 90 1 0 0
Shape "cylinder" "float radius" [0.4] "float zmin" [-0.5] "float zmax" [0.5]
AttributeEnd
"""
    )
    from pbrt_tpu.io.parser import load_pbrt

    scene, camera, settings = load_pbrt(str(scene_file))
    assert scene.geom.num_disks == 1
    assert scene.geom.num_cyls == 1
    it = accel_api_closest_probe(scene)
    assert bool(it.valid[0])


def accel_api_closest_probe(scene):
    from pbrt_tpu.accel import api as accel_api

    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    return accel_api.closest(scene, o, d)
