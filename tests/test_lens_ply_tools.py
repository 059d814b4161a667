"""lenstool + plytool CLI tests (ref: cmd/lenstool.cpp, cmd/plytool.cpp)."""

import json

import numpy as np

from pbrt_tpu.tools import lenstool, plytool
from pbrt_tpu.io.ply import read_ply, write_ply


_DAT = """# test biconvex
# a two-surface singlet
50.0 2.0 1.5 25.0
-50.0 48.0 1.0 25.0
"""


def test_lenstool_convert_roundtrip(tmp_path):
    dat = tmp_path / "lens.dat"
    dat.write_text(_DAT)
    out = tmp_path / "lens.json"
    lenstool.main(["convert", str(dat), str(out)])
    j = json.loads(out.read_text())
    assert j["name"].strip() == "test biconvex"
    assert len(j["surfaces"]) == 2
    s0 = j["surfaces"][0]
    assert s0["radius"] == 50.0
    assert s0["semi_aperture"] == 12.5
    assert s0["conic_constant"] == 0.0
    # spectral ior table: [wavelengths, iors]
    assert s0["ior"][1][0] == 1.5
    # round-trips through the omni json loader
    from pbrt_tpu.cameras.realistic import load_lens_json

    stack, micro = load_lens_json(str(out))
    assert micro is None
    assert stack.n_surfaces == 2


def test_lenstool_insertmicrolens(tmp_path):
    dat = tmp_path / "lens.dat"
    dat.write_text(_DAT)
    main_j = tmp_path / "main.json"
    lenstool.main(["convert", str(dat), str(main_j)])
    micro_j = tmp_path / "micro.json"
    micro_j.write_text(json.dumps({
        "name": "ml", "description": "",
        "surfaces": [
            {"radius": 0.5, "thickness": 0.1, "semi_aperture": 0.05,
             "ior": 1.5},
            {"radius": 0.0, "thickness": 0.0, "semi_aperture": 0.05,
             "ior": 1.0},
        ],
    }))
    out = tmp_path / "combined.json"
    lenstool.main([
        "insertmicrolens", str(main_j), str(micro_j), str(out),
        "--xdim", "4", "--ydim", "4",
    ])
    j = json.loads(out.read_text())
    assert j["microlens"]["dimensions"] == [4, 4]
    assert len(j["microlens"]["offsets"]) == 16
    from pbrt_tpu.cameras.realistic import load_lens_json

    stack, micro = load_lens_json(str(out))
    assert micro is not None
    assert micro.dims == (4, 4)


def test_lenstool_info(tmp_path, capsys):
    dat = tmp_path / "lens.dat"
    dat.write_text(_DAT)
    lenstool.main(["info", str(dat)])
    out = capsys.readouterr().out
    assert "2 surfaces" in out
    assert "focal length" in out
    # lensmaker: f = R / (2 (n-1)) = 50 for this symmetric biconvex
    f = float(out.split("focal length ~")[1].split("mm")[0])
    assert 40.0 < f < 60.0


def _mesh(tmp_path, nx=4):
    xs, ys = np.meshgrid(np.arange(nx), np.arange(nx))
    verts = np.stack(
        [xs.ravel(), ys.ravel(), np.zeros(nx * nx)], -1
    ).astype(np.float32)
    faces = []
    for y in range(nx - 1):
        for x in range(nx - 1):
            a = y * nx + x
            faces.append([a, a + 1, a + nx])
            faces.append([a + 1, a + nx + 1, a + nx])
    p = str(tmp_path / "m.ply")
    write_ply(p, verts, np.asarray(faces, np.int32))
    return p, verts, np.asarray(faces, np.int32)


def test_plytool_info_cat(tmp_path, capsys):
    p, verts, faces = _mesh(tmp_path)
    plytool.main(["info", p])
    out = capsys.readouterr().out
    assert f"{len(verts)} vertices" in out and f"{len(faces)} triangles" in out
    plytool.main(["cat", p])
    out = capsys.readouterr().out
    assert 'Shape "trianglemesh"' in out
    assert out.count("\n") > len(verts)


def test_plytool_split(tmp_path):
    p, verts, faces = _mesh(tmp_path)
    plytool.main(["split", p, "--maxfaces", "7"])
    import os

    chunks = sorted(
        str(tmp_path / f) for f in os.listdir(tmp_path) if "-00" in f
    )
    assert len(chunks) == (len(faces) + 6) // 7
    total = 0
    for cpath in chunks:
        v, fcs = read_ply(cpath)
        total += len(fcs)
        assert fcs.max() < len(v)
    assert total == len(faces)


def test_plytool_displace(tmp_path):
    from pbrt_tpu.io.image import write_exr

    p, verts, faces = _mesh(tmp_path)
    img = np.full((8, 8, 3), 0.5, np.float32)
    ip = str(tmp_path / "d.exr")
    write_exr(ip, img)
    out = str(tmp_path / "out.ply")
    plytool.main(["displace", p, out, "--image", ip, "--scale", "2.0"])
    v2, f2 = read_ply(out)
    assert np.array_equal(f2, faces)
    # flat grid has +z normals everywhere -> every vertex moves by 1.0
    dz = v2[:, 2] - verts[:, 2]
    np.testing.assert_allclose(np.abs(dz), 1.0, atol=1e-5)
