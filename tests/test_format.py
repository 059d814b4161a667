"""Scene reformatter / upgrader tests (FormattingParserTarget,
parser.h:202-272): --format round-trips, --upgrade maps pbrt-v3
directives, --toply externalizes large meshes.
"""

import io
import os

import numpy as np

from pbrt_tpu.io.parser import load_pbrt_string
from pbrt_tpu.tools.format_scene import SceneFormatter


_SCENE = """
Camera "perspective" "float fov" [40]
Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
Sampler "halton" "integer pixelsamples" [8]
Integrator "path" "integer maxdepth" [4]
WorldBegin
LightSource "point" "point3 from" [0 5 0] "rgb I" [10 10 10]
AttributeBegin
  Translate 0 0 3
  Rotate 45 0 1 0
  Material "conductor" "float roughness" [0.1]
  Shape "trianglemesh"
    "point3 P" [ -1 -1 0  1 -1 0  1 1 0  -1 1 0 ]
    "integer indices" [ 0 1 2  0 2 3 ]
AttributeEnd
"""


def _fmt(text, **kw):
    buf = io.StringIO()
    f = SceneFormatter(out=buf, **kw)
    f.format_string(text)
    return buf.getvalue()


def test_format_roundtrip():
    """Formatted output parses to the same scene (geometry + settings)."""
    out = _fmt(_SCENE)
    sc_a, cam_a, set_a = load_pbrt_string(_SCENE)
    sc_b, cam_b, set_b = load_pbrt_string(out)
    np.testing.assert_allclose(
        np.asarray(sc_a.geom.tri_verts), np.asarray(sc_b.geom.tri_verts),
        atol=1e-4,
    )
    assert set_a["spp"] == set_b["spp"]
    assert type(set_a["integrator"]) is type(set_b["integrator"])
    # Formatting is idempotent.
    assert _fmt(out) == out


def test_upgrade_v3_directives():
    v3 = """
Film "image" "integer xresolution" [16] "integer yresolution" [16]
  "float scale" [2]
Sampler "lowdiscrepancy" "integer pixelsamples" [4]
Integrator "directlighting"
WorldBegin
Material "matte" "rgb Kd" [0.6 0.5 0.4]
Shape "sphere" "float radius" [1]
Material "glass" "float index" [1.7]
Shape "sphere" "float radius" [0.5]
Material "mirror"
Shape "sphere" "float radius" [0.2]
"""
    out = _fmt(v3, upgrade=True)
    assert 'Film "rgb"' in out
    assert '"float iso" [ 200 ]' in out
    assert 'Sampler "paddedsobol"' in out
    assert 'Integrator "path"' in out
    assert '"integer maxdepth" [ 1 ]' in out
    assert 'Material "diffuse"' in out
    assert '"rgb reflectance"' in out
    assert 'Material "dielectric"' in out
    assert '"float eta" [ 1.7 ]' in out
    assert 'Material "conductor"' in out
    assert '"metal-Ag-eta"' in out
    # Upgraded output parses.
    scene, _, settings = load_pbrt_string(out)
    integ = settings["integrator"]
    assert type(integ).__name__ == "PathIntegrator"
    assert integ.max_depth == 1


def test_toply_externalizes_large_mesh(tmp_path):
    rng = np.random.default_rng(0)
    n = 300  # 300 tris -> 900 indices >= 500 threshold
    pts = rng.uniform(-1, 1, (n * 3, 3))
    idx = np.arange(n * 3).reshape(-1, 3)
    big = (
        "WorldBegin\n"
        + 'Shape "trianglemesh" "point3 P" ['
        + " ".join(f"{v:.5f}" for v in pts.reshape(-1))
        + '] "integer indices" ['
        + " ".join(str(i) for i in idx.reshape(-1))
        + "]\n"
    )
    buf = io.StringIO()
    f = SceneFormatter(out=buf, to_ply=True, base_dir=str(tmp_path))
    f.format_string(big)
    out = buf.getvalue()
    assert 'Shape "plymesh"' in out
    assert os.path.exists(tmp_path / "mesh_00001.ply")
    from pbrt_tpu.io.ply import read_ply

    verts, faces = read_ply(str(tmp_path / "mesh_00001.ply"))
    assert faces.shape == (n, 3)
    np.testing.assert_allclose(verts, pts, atol=1e-4)
