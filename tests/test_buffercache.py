"""BufferCache: mesh-buffer dedup at parse time (util/buffercache.h)."""

import numpy as np

from pbrt_tpu.io.buffercache import BufferCache


def test_canonical_dedups_identical_buffers():
    bc = BufferCache()
    a = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    b = a.copy()
    ca = bc.canonical(a)
    cb = bc.canonical(b)
    assert ca is cb  # one shared canonical buffer
    assert bc.hits == 1 and bc.lookups == 2
    assert bc.redundant_bytes == a.nbytes
    # Different content, same shape: distinct.
    c = bc.canonical(a * 2.0)
    assert c is not ca
    # Same bytes, different dtype: distinct (no false sharing).
    d = bc.canonical(a.view(np.uint32))
    assert d is not ca


def test_parser_dedups_repeated_meshes(tmp_path):
    tri = ('Shape "trianglemesh" "point3 P" [0 0 0  1 0 0  0 1 0] '
           '"integer indices" [0 1 2]\n')
    (tmp_path / "scene.pbrt").write_text(
        'Film "rgb" "integer xresolution" 8 "integer yresolution" 8\n'
        "Camera \"perspective\"\n"
        "WorldBegin\n"
        'Material "diffuse"\n'
        + tri
        + "Translate 2 0 0\n"
        + tri
        + "Translate 2 0 0\n"
        + tri
    )
    from pbrt_tpu.io.parser import PbrtParser, load_pbrt

    scene, _, _ = load_pbrt(str(tmp_path / "scene.pbrt"))
    assert scene.geom.num_triangles == 3  # instances all emitted


def test_ply_cache(tmp_path):
    from pbrt_tpu.io.ply import write_ply

    verts = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    faces = np.asarray([[0, 1, 2], [1, 3, 2]], np.int32)
    path = tmp_path / "quad.ply"
    write_ply(str(path), verts, faces)
    bc = BufferCache()
    v1, f1 = bc.read_ply(str(path))
    v2, f2 = bc.read_ply(str(path))
    assert v1 is v2 and f1 is f2
    assert bc.hits == 1
    np.testing.assert_allclose(np.asarray(v1), verts)
