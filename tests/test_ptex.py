"""Ptex container + per-face texture evaluation tests.

Reference analogue: the Ptex library the reference links for PtexTexture
(textures.h:1003-1044); container layout follows PtexIO.h.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.io.ptex import (
    DT_FLOAT, DT_HALF, DT_UINT8, DT_UINT16, MT_QUAD, read_ptex, write_ptex,
)


def _faces(rng, n=5, c=3):
    out = []
    for i in range(n):
        r = 1 << rng.integers(0, 4)
        out.append(rng.random((r, r, c)).astype(np.float32))
    return out


def test_ptex_roundtrip_float(tmp_path):
    rng = np.random.default_rng(0)
    faces = _faces(rng)
    p = str(tmp_path / "t.ptx")
    write_ptex(p, faces, datatype=DT_FLOAT)
    back, mt = read_ptex(p)
    assert mt == MT_QUAD
    assert len(back) == len(faces)
    for a, b in zip(faces, back):
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_ptex_roundtrip_uint8_uint16_half(tmp_path):
    rng = np.random.default_rng(1)
    faces = _faces(rng, n=3)
    for dt, atol in [(DT_UINT8, 1 / 255), (DT_UINT16, 1 / 65535),
                     (DT_HALF, 1e-3)]:
        p = str(tmp_path / f"t{dt}.ptx")
        write_ptex(p, faces, datatype=dt)
        back, _ = read_ptex(p)
        for a, b in zip(faces, back):
            np.testing.assert_allclose(a, b, atol=atol)


def test_ptex_constant_faces(tmp_path):
    faces = [np.full((4, 4, 3), 0.25, np.float32),
             np.full((1, 1, 3), 0.75, np.float32)]
    p = str(tmp_path / "c.ptx")
    write_ptex(p, faces, datatype=DT_FLOAT)
    back, _ = read_ptex(p)
    np.testing.assert_allclose(back[0], 0.25)
    np.testing.assert_allclose(back[1], 0.75)


def test_ptex_texture_family_per_face():
    """TEX_PTEX picks the texel stack of the hit face."""
    from pbrt_tpu.textures.buffers import TextureBuffers, evaluate_rgb

    cols = np.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = [np.broadcast_to(c, (4, 4, 3)).copy() for c in cols]
    tex = TextureBuffers.build([{"kind": "ptex", "ptex_faces": faces}])
    n = 3
    uv = jnp.full((n, 2), 0.5, jnp.float32)
    pw = jnp.zeros((n, 3), jnp.float32)
    tid = jnp.zeros((n,), jnp.int32)
    face = jnp.asarray([0, 1, 2], jnp.int32)
    rgb = np.asarray(evaluate_rgb(tex, tid, uv, pw, face=face))
    np.testing.assert_allclose(rgb, cols, atol=1e-5)


def test_ptex_render_binding(tmp_path):
    """Parse a scene with a ptex-textured two-triangle quad; each triangle
    (face) reflects its own color."""
    from pbrt_tpu.io.parser import load_pbrt_string
    from pbrt_tpu.materials import bxdf
    from pbrt_tpu.accel import api as accel_api

    cols = np.asarray([[0.9, 0.1, 0.1], [0.1, 0.9, 0.1]], np.float32)
    faces = [np.broadcast_to(c, (4, 4, 3)).copy() for c in cols]
    p = str(tmp_path / "two.ptx")
    write_ptex(p, faces, datatype=DT_FLOAT)
    scene, camera, _ = load_pbrt_string(f"""
    WorldBegin
    Texture "fc" "spectrum" "ptex" "string filename" ["{p}"]
    Material "diffuse" "texture reflectance" ["fc"]
    Shape "trianglemesh"
      "point3 P" [-1 0 -1  1 0 -1  1 0 1  -1 0 1]
      "integer indices" [0 1 2 0 2 3]
    """, base_dir=str(tmp_path))
    assert scene.textures is not None and scene.textures.has_ptex
    np.testing.assert_array_equal(
        np.asarray(scene.geom.tri_face), [0, 1]
    )
    # Hit each triangle from above and read the shaded albedo.
    o = jnp.asarray([[0.5, 1.0, -0.5], [-0.5, 1.0, 0.5]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
    isect = accel_api.closest(scene, o, d)
    assert bool(isect.valid.all())
    lam = jnp.full((2, 8), 560.0, jnp.float32)
    params = bxdf.surface_params(scene, isect, lam)
    from pbrt_tpu.core import rgb2spec

    alb = np.asarray(
        rgb2spec.eval_sigmoid(params["albedo_coeffs"], lam)
    )[:, 0]
    # face 0 is red-dominant, face 1 green-dominant at 560nm (green-ish):
    # the green face must reflect clearly more at 560nm than the red face.
    assert alb[1] > alb[0] + 0.2
