"""Scene parser + PLY tests (ref model: parser_test.cpp tokenizer/directive
round trips)."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.io.parser import load_pbrt_string, tokenize
from pbrt_tpu.io.ply import read_ply, write_ply


CORNELL_PBRT = """
# cornell-ish test scene
Integrator "volpath" "integer maxdepth" [ 4 ]
Sampler "sobol" "integer pixelsamples" [ 8 ]
Film "rgb" "integer xresolution" [ 32 ] "integer yresolution" [ 24 ]
LookAt 0.5 0.5 -1.4   0.5 0.5 0.5   0 1 0
Camera "perspective" "float fov" [ 40 ]
WorldBegin

MakeNamedMaterial "red" "string type" "diffuse"
    "rgb reflectance" [ 0.65 0.05 0.05 ]

AttributeBegin
  NamedMaterial "red"
  Shape "trianglemesh"
      "point3 P" [ 0 0 0   0 0 1   0 1 1   0 1 0 ]
      "integer indices" [ 0 1 2   0 2 3 ]
AttributeEnd

Material "diffuse" "rgb reflectance" [ 0.73 0.73 0.73 ]
Shape "trianglemesh"
    "point3 P" [ 0 0 0   1 0 0   1 0 1   0 0 1 ]
    "integer indices" [ 0 2 1   0 3 2 ]

AttributeBegin
  Material "dielectric" "float eta" [ 1.5 ]
  Translate 0.7 0.2 0.3
  Shape "sphere" "float radius" [ 0.18 ]
AttributeEnd

AttributeBegin
  AreaLightSource "diffuse" "rgb L" [ 1 0.9 0.7 ] "float scale" [ 15 ]
  Shape "trianglemesh"
      "point3 P" [ 0.35 0.99 0.35   0.65 0.99 0.35   0.65 0.99 0.65   0.35 0.99 0.65 ]
      "integer indices" [ 0 1 2  0 2 3 ]
AttributeEnd

LightSource "point" "rgb I" [ 1 1 1 ] "float scale" [ 0.5 ]
    "point3 from" [ 0.5 0.5 0.2 ]
WorldEnd
"""


def test_tokenizer():
    toks = tokenize('Shape "trianglemesh" "point3 P" [ 0 1 2 ] # comment\nX')
    assert toks == [
        "Shape", '"trianglemesh"', '"point3 P"', "[", "0", "1", "2", "]", "X"
    ]


def test_parse_cornell_string():
    scene, camera, settings = load_pbrt_string(CORNELL_PBRT)
    assert camera.resolution == (32, 24)
    assert abs(camera.fov_deg - 40.0) < 1e-6
    assert settings["spp"] == 8
    assert settings["sampler"] == "sobol"
    from pbrt_tpu.models.volpath import VolPathIntegrator

    assert isinstance(settings["integrator"], VolPathIntegrator)
    assert settings["integrator"].max_depth == 4
    # Geometry: 2 red wall + 2 floor + 2 light triangles, 1 sphere.
    assert scene.geom.num_triangles == 6
    assert scene.geom.num_spheres == 1
    assert scene.lights.n_area == 2
    assert scene.lights.n_point == 1
    # Red material bound to the wall triangles.
    mats = np.asarray(scene.geom.tri_mat[:2])
    # material index 1 is "red" (0 is the default).
    assert (mats == 1).all()
    # Sphere transformed by Translate.
    sph = np.asarray(scene.geom.sph[0])
    np.testing.assert_allclose(sph, [0.7, 0.2, 0.3, 0.18], atol=1e-6)
    # Camera world position ~ (0.5, 0.5, -1.4).
    o = np.asarray(
        camera.camera_to_world.apply_point(jnp.zeros((1, 3)))
    )[0]
    np.testing.assert_allclose(o, [0.5, 0.5, -1.4], atol=1e-5)


def test_parsed_scene_renders():
    from pbrt_tpu.render import render

    scene, camera, settings = load_pbrt_string(CORNELL_PBRT)
    img = np.asarray(
        render(scene, camera, settings["integrator"], spp=4,
               samples_per_pass=2, sampler_kind=settings["sampler"])
    )
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.005


def test_object_instancing():
    text = """
    WorldBegin
    ObjectBegin "leaf"
      Shape "trianglemesh" "point3 P" [ 0 0 0  1 0 0  0 1 0 ]
          "integer indices" [ 0 1 2 ]
    ObjectEnd
    AttributeBegin
      Translate 5 0 0
      ObjectInstance "leaf"
    AttributeEnd
    AttributeBegin
      Translate 0 7 0
      ObjectInstance "leaf"
    AttributeEnd
    """
    scene, _, _ = load_pbrt_string(text)
    # True instancing (round 5): ONE prototype triangle stored, two
    # instances in the sweep accel's tables (scene.cpp:1352-1557).
    assert scene.geom.num_triangles == 1
    assert scene.sweep is not None and scene.sweep.instanced
    assert scene.sweep.o2w.shape[0] == 2
    o2w = np.asarray(scene.sweep.o2w).reshape(2, 3, 4)
    np.testing.assert_allclose(o2w[0][:, 3], [5, 0, 0], atol=1e-5)
    np.testing.assert_allclose(o2w[1][:, 3], [0, 7, 0], atol=1e-5)


def test_ply_roundtrip(tmp_path):
    r = np.random.default_rng(0)
    verts = r.normal(size=(10, 3)).astype(np.float32)
    faces = np.asarray([[0, 1, 2], [2, 3, 4], [4, 5, 6]], np.int32)
    p = str(tmp_path / "m.ply")
    write_ply(p, verts, faces)
    v2, f2 = read_ply(p)
    np.testing.assert_array_equal(v2, verts)
    np.testing.assert_array_equal(f2, faces)


def test_ply_ascii_and_quads(tmp_path):
    ply = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
1 1 0
0 1 0
4 0 1 2 3
"""
    p = str(tmp_path / "q.ply")
    with open(p, "w") as f:
        f.write(ply)
    v, faces = read_ply(p)
    assert v.shape == (4, 3)
    # Quad fanned into 2 triangles.
    np.testing.assert_array_equal(faces, [[0, 1, 2], [0, 2, 3]])


def test_emissive_sphere_and_bilinear_patch():
    text = """
    WorldBegin
    AttributeBegin
      AreaLightSource "diffuse" "rgb L" [1 1 1] "float scale" [5]
      Translate 0 2 0
      Shape "sphere" "float radius" [0.3]
    AttributeEnd
    Shape "bilinearmesh"
        "point3 P" [ -1 0 -1   1 0 -1   -1 0 1   1 0.4 1 ]
    WorldEnd
    """
    scene, _, _ = load_pbrt_string(text)
    # Emissive spheres are ANALYTIC lights now (no icosphere tessellation),
    # and the (non-emissive) bilinear patch is analytic too.
    assert scene.lights.n_area == 0
    assert scene.lights.n_sphl == 1
    assert scene.geom.num_triangles == 0
    assert scene.geom.num_blps == 1
    np.testing.assert_allclose(
        np.asarray(scene.lights.sphl_c[0]), [0, 2, 0], atol=1e-6
    )
    np.testing.assert_allclose(float(scene.lights.sphl_r[0]), 0.3, atol=1e-6)
    # The analytic sphere carries its light id in the geometry.
    assert int(np.asarray(scene.geom.sph_light)[0]) == 0
    # It renders: light the floor patch from the sphere.
    from pbrt_tpu.models.path import PathIntegrator
    from pbrt_tpu.render import render
    from pbrt_tpu.cameras.perspective import PerspectiveCamera
    from pbrt_tpu.core.transform import Transform
    import pbrt_tpu.core.transform as tfm

    cam = PerspectiveCamera(
        camera_to_world=tfm.look_at((0, 1.5, -4), (0, 0.5, 0), (0, 1, 0)),
        resolution=(16, 16), fov_deg=50.0,
    )
    img = np.asarray(
        render(scene, cam, PathIntegrator(max_depth=3), spp=4,
               samples_per_pass=2)
    )
    assert np.isfinite(img).all()
    assert img.mean() > 1e-4


def test_texture_directive_binding(tmp_path):
    """Texture directives become TextureBuffers rows; materials bind by id;
    nested (scale -> imagemap) references resolve (scene.cpp NamedTextures
    + TextureParameterDictionary::GetSpectrumTexture)."""
    import numpy as np
    from pbrt_tpu.io.image import write_png

    img = np.zeros((4, 4, 3), np.float32)
    img[:, :2] = (1.0, 0.1, 0.1)
    img[:, 2:] = (0.1, 0.1, 1.0)
    write_png(str(tmp_path / "wall.png"), img)
    scene_file = tmp_path / "tex.pbrt"
    scene_file.write_text(
        """
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
Texture "wall" "spectrum" "imagemap" "string filename" ["wall.png"]
Texture "halfwall" "spectrum" "scale" "texture tex" ["wall"] "float scale" [0.5]
Texture "checks" "spectrum" "checkerboard" "float uscale" [4] "float vscale" [4]
    "rgb tex1" [1 0 0] "rgb tex2" [0 0 1]
Material "diffuse" "texture reflectance" ["halfwall"]
Shape "trianglemesh" "integer indices" [0 1 2]
    "point3 P" [-1 -1 4  1 -1 4  0 1 4]
AreaLightSource "diffuse" "rgb L" [5 5 5]
Shape "trianglemesh" "integer indices" [0 1 2]
    "point3 P" [-1 -1 6  1 -1 6  0 1 6]
"""
    )
    from pbrt_tpu.io.parser import load_pbrt

    scene, camera, settings = load_pbrt(str(scene_file))
    assert scene.textures is not None
    assert scene.textures.n_textures == 3
    # The bound material references texture id 1 (halfwall).
    mat_tex = np.asarray(scene.materials.albedo_tex)
    assert (mat_tex >= 0).any()
    # Evaluate the scaled image texture: red half at ~0.5 reflectance.
    import jax.numpy as jnp
    from pbrt_tpu.textures.buffers import evaluate_rgb

    uv = jnp.asarray([[0.2, 0.5], [0.8, 0.5]])
    tid = jnp.full((2,), 1, jnp.int32)
    v = np.asarray(evaluate_rgb(scene.textures, tid, uv, jnp.zeros((2, 3))))
    assert v[0, 0] > 0.3 and v[0, 2] < 0.2  # scaled red side
    assert v[1, 2] > 0.3 and v[1, 0] < 0.2  # scaled blue side
    np.testing.assert_allclose(v[0, 0], 0.5, atol=0.12)


def test_named_medium_binding(tmp_path):
    """MakeNamedMedium + MediumInterface bind the scene medium and upgrade
    the integrator to volpath (render.cpp media/integrator compat check)."""
    scene_file = tmp_path / "fog.pbrt"
    scene_file.write_text(
        """
Integrator "path" "integer maxdepth" [4]
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
MakeNamedMedium "fog" "string type" "homogeneous"
    "rgb sigma_a" [0.5 0.5 0.5] "rgb sigma_s" [0.1 0.1 0.1]
    "point3 p0" [-2 -2 0] "point3 p1" [2 2 8] "float g" [0.2]
MediumInterface "fog" ""
AreaLightSource "diffuse" "rgb L" [4 4 4]
Shape "trianglemesh" "integer indices" [0 1 2]
    "point3 P" [-2 -2 6  0 2 6  2 -2 6]
"""
    )
    from pbrt_tpu.io.parser import load_pbrt
    from pbrt_tpu.models.volpath import VolPathIntegrator

    scene, camera, settings = load_pbrt(str(scene_file))
    assert scene.medium is not None and scene.medium.kind == "homogeneous"
    assert float(scene.medium.g) == np.float32(0.2)
    assert isinstance(settings["integrator"], VolPathIntegrator)
    # The fog attenuates: render is finite and nonzero.
    from pbrt_tpu.render import render

    img = np.asarray(render(
        scene, camera, settings["integrator"], spp=4, samples_per_pass=2
    ))
    assert np.isfinite(img).all() and img.mean() > 0.0


def test_named_medium_rgbgrid_directive(tmp_path):
    scene_file = tmp_path / "rgb.pbrt"
    scene_file.write_text(
        """
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
MakeNamedMedium "tint" "string type" "rgbgrid"
    "integer nx" [1] "integer ny" [1] "integer nz" [1]
    "rgb sigma_a" [4 1 0.2] "rgb sigma_s" [0 0 0]
    "point3 p0" [0 0 0] "point3 p1" [1 1 1]
MediumInterface "tint" ""
AreaLightSource "diffuse" "rgb L" [4 4 4]
Shape "trianglemesh" "integer indices" [0 1 2]
    "point3 P" [-2 -2 6  2 -2 6  0 2 6]
"""
    )
    from pbrt_tpu.io.parser import load_pbrt

    scene, camera, settings = load_pbrt(str(scene_file))
    assert scene.medium is not None and scene.medium.kind == "rgbgrid"


def test_native_tokenizer_matches_python():
    """The C++ tokenizer must produce exactly the Python fallback's tokens
    (the fallback is the specification)."""
    from pbrt_tpu.native import tokenize_native

    text = """
# a comment with "quotes" and [brackets]
Integrator "path" "integer maxdepth" [ 7 ]
LookAt 0 1.5 -3   0 0.25e1 0  0 1 0
Texture "t" "spectrum" "checkerboard" "rgb tex1" [.5 0.25 1e-2]
Shape "trianglemesh" "integer indices" [0 1 2]
   "point3 P" [-1 -1 4  1 -1 4  0 1 4] # trailing
WorldBegin
"""
    native = tokenize_native(text)
    if native is None:
        import pytest

        pytest.skip("no native toolchain")
    # Reproduce the pure-Python path (the module-level tokenize dispatches
    # to native, so re-run its fallback body via a tiny local copy).
    def py_tokenize(text):
        toks = []
        i, n = 0, len(text)
        while i < n:
            c = text[i]
            if c in " \t\r\n":
                i += 1
            elif c == "#":
                while i < n and text[i] != "\n":
                    i += 1
            elif c == '"':
                j = text.index('"', i + 1)
                toks.append(text[i: j + 1])
                i = j + 1
            elif c in "[]":
                toks.append(c)
                i += 1
            else:
                j = i
                while j < n and text[j] not in ' \t\r\n"[]#':
                    j += 1
                toks.append(text[i:j])
                i = j
        return toks

    assert native == py_tokenize(text)


def test_native_morton_order_matches_numpy():
    """The C++ Morton radix-sort stage (native/accel_build.cpp) must produce
    the numpy fallback's permutation bit-for-bit (stable tie order included),
    so native and fallback builds yield identical accel tensors."""
    from pbrt_tpu.accel.bvh import _morton3
    from pbrt_tpu.native import morton_order_native

    native_probe = morton_order_native(np.zeros((1, 3), np.float32))
    if native_probe is None:
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    for n in (1, 3, 257, 40000):
        cent = (rng.standard_normal((n, 3)) * 5.0).astype(np.float32)
        lo, hi = cent.min(0), cent.max(0)
        norm = (cent - lo) / np.maximum(hi - lo, 1e-12)
        ref = np.argsort(_morton3(norm), kind="stable")
        assert np.array_equal(morton_order_native(cent), ref)
    # Degenerate: identical centroids keep input (stable) order.
    assert np.array_equal(
        morton_order_native(np.ones((17, 3), np.float32)), np.arange(17)
    )


def test_sampler_directive_fidelity():
    """zsobol / pmj02bn / paddedsobol must reach the sampler library as
    themselves, not silently degrade to plain sobol (the library implements
    all of them; ref base/sampler.h:39-46 variant list)."""
    for pbrt_name, ours in (
        ("zsobol", "zsobol"), ("pmj02bn", "pmj02bn"),
        ("paddedsobol", "padded"), ("sobol", "sobol"),
        ("halton", "halton"), ("stratified", "stratified"),
    ):
        src = CORNELL_PBRT.replace(
            'Sampler "sobol"', f'Sampler "{pbrt_name}"'
        )
        _, _, settings = load_pbrt_string(src)
        assert settings["sampler"] == ours, (pbrt_name, settings["sampler"])
