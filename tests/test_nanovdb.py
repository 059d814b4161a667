"""NanoVDB container I/O + nanovdb2pbrt converter + parser binding.

Gates: bit-exact dense roundtrip through the sparse 5/4/3 tree (both
codecs, negative origins, multi-leaf/multi-lower-node extents), sparse
leaves actually skipped on disk, converter output matching the reference
converter's trim/downsample semantics (cmd/nanovdb2pbrt.cpp), and the
parser building a grid medium from MakeNamedMedium "nanovdb".
"""

import os

import numpy as np
import pytest

from pbrt_tpu.io.nanovdb import (
    GRID_CLASS_FOG,
    NVDBGrid,
    read_nanovdb,
    write_nanovdb,
)
from pbrt_tpu.tools.nanovdb2pbrt import convert, main as nv2pbrt_main


def _mkgrid(shape=(9, 12, 20), ijk=(-5, 3, -2), vs=0.5, seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.uniform(0.0, 2.0, size=shape).astype(np.float32)
    return NVDBGrid(
        name="density",
        values=vals,
        ijk_min=np.array(ijk, np.int32),
        voxel_size=np.full(3, vs),
        grid_class=GRID_CLASS_FOG,
    )


@pytest.mark.parametrize("codec", ["none", "zip"])
def test_roundtrip_exact(tmp_path, codec):
    g = _mkgrid()
    path = os.path.join(tmp_path, "t.nvdb")
    write_nanovdb(path, g, codec=codec)
    r = read_nanovdb(path, "density")
    assert r.name == "density"
    np.testing.assert_array_equal(r.values, g.values)
    np.testing.assert_array_equal(r.ijk_min, g.ijk_min)
    np.testing.assert_allclose(r.voxel_size, g.voxel_size)
    np.testing.assert_allclose(r.world_min, g.world_min)
    np.testing.assert_allclose(r.world_max, g.world_max)
    assert r.grid_class == GRID_CLASS_FOG


def test_roundtrip_multi_node(tmp_path):
    # 140 voxels on x crosses a lower-node (128) boundary; negative z
    # crosses the upper/root tile boundary at 0.
    g = _mkgrid(shape=(6, 10, 140), ijk=(-70, 0, -3), seed=1)
    path = os.path.join(tmp_path, "big.nvdb")
    write_nanovdb(path, g)
    r = read_nanovdb(path, "density")
    np.testing.assert_array_equal(r.values, g.values)


def test_sparse_leaves_skipped(tmp_path):
    # All-zero with one hot block: file must be much smaller than dense,
    # and inactive voxels must come back as the background (0).
    vals = np.zeros((32, 32, 32), np.float32)
    vals[4:7, 9:14, 20:25] = 3.25
    g = NVDBGrid(name="density", values=vals, ijk_min=np.zeros(3, np.int32),
                 background=0.0)
    g2 = NVDBGrid(name="density", values=vals + 1.0,
                  ijk_min=np.zeros(3, np.int32))
    pa, pb = os.path.join(tmp_path, "a.nvdb"), os.path.join(tmp_path, "b.nvdb")
    write_nanovdb(pa, g)
    write_nanovdb(pb, g2)  # fully-active (no skippable leaf)
    # 32^3 = 64 leaf slots; the hot region touches 2. The other 62 must be
    # absent from the file (fixed-size internal nodes dominate the rest).
    from pbrt_tpu.io.nanovdb import _LEAF_SIZE

    assert os.path.getsize(pb) - os.path.getsize(pa) == 62 * _LEAF_SIZE
    np.testing.assert_array_equal(read_nanovdb(pa, "density").values, vals)


def test_multiple_grids(tmp_path):
    d = _mkgrid(seed=2)
    t = _mkgrid(seed=3)
    t.name = "temperature"
    path = os.path.join(tmp_path, "two.nvdb")
    write_nanovdb(path, [d, t], codec="zip")
    grids = read_nanovdb(path)
    assert set(grids) == {"density", "temperature"}
    np.testing.assert_array_equal(grids["temperature"].values, t.values)
    # Named lookup skips the other grid.
    r = read_nanovdb(path, "temperature")
    np.testing.assert_array_equal(r.values, t.values)


def test_converter_text(tmp_path):
    g = _mkgrid(shape=(4, 4, 4), ijk=(0, 0, 0), vs=1.0, seed=4)
    text = convert(g, downsample=0)
    assert '"integer nx" 4 "integer ny" 4  "integer nz" 4' in text
    vals = np.fromstring(
        text.split("[", 2)[2].rstrip("]"), sep=" "
    ) if False else np.array(
        [float(x) for x in text.split('"float density" [')[1]
         .replace("]", "").split()]
    )
    np.testing.assert_allclose(
        vals.reshape(4, 4, 4), g.values, atol=5e-7
    )


def test_converter_downsample(tmp_path):
    # 5x6x8 grid downsampled once: trims to 4x6x8 then mean-pools to 2x3x4.
    g = _mkgrid(shape=(5, 6, 8), ijk=(0, 0, 0), vs=1.0, seed=5)
    text = convert(g, downsample=1)
    assert '"integer nx" 4 "integer ny" 3  "integer nz" 2' in text
    vals = np.array(
        [float(x) for x in text.split('"float density" [')[1]
         .replace("]", "").split()]
    )
    trimmed = g.values[1:]  # z: 5 -> trim one from the low side
    pooled = trimmed.reshape(2, 2, 3, 2, 4, 2).mean(axis=(1, 3, 5))
    np.testing.assert_allclose(vals.reshape(2, 3, 4), pooled, atol=1e-5)


def test_converter_cli(tmp_path, capsys):
    g = _mkgrid(shape=(4, 4, 4), ijk=(0, 0, 0), seed=6)
    path = os.path.join(tmp_path, "cli.nvdb")
    write_nanovdb(path, g)
    assert nv2pbrt_main([path, "--grid", "density"]) == 0
    out = capsys.readouterr().out
    assert '"float density" [' in out
    assert nv2pbrt_main([os.path.join(tmp_path, "missing.nvdb")]) == 1


def test_parser_nanovdb_medium(tmp_path):
    from pbrt_tpu.io.parser import load_pbrt

    g = _mkgrid(shape=(8, 8, 8), ijk=(0, 0, 0), vs=0.25, seed=7)
    write_nanovdb(os.path.join(tmp_path, "smoke.nvdb"), g)
    scene_text = """
    Camera "perspective" "float fov" 45
    Film "rgb" "integer xresolution" 16 "integer yresolution" 16
    WorldBegin
    MakeNamedMedium "smoke" "string type" "nanovdb"
        "string filename" "smoke.nvdb"
        "rgb sigma_a" [0.5 0.5 0.5] "rgb sigma_s" [1 1 1]
    MediumInterface "smoke" ""
    AttributeBegin
    Material "diffuse"
    Shape "sphere" "float radius" 0.5
    AttributeEnd
    """
    pb = os.path.join(tmp_path, "scene.pbrt")
    with open(pb, "w") as f:
        f.write(scene_text)
    scene, camera, meta = load_pbrt(pb)
    med = scene.medium
    assert med is not None
    assert tuple(np.asarray(med.density).shape) == (8, 8, 8)
    np.testing.assert_allclose(
        np.asarray(med.bounds_lo), g.world_min, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(med.bounds_hi), g.world_max, atol=1e-6
    )
