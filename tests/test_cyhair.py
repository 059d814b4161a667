"""cyhair2pbrt converter: binary parse, CR->Bezier math, pbrt round-trip."""

import io
import struct

import numpy as np

from pbrt_tpu.tools.cyhair2pbrt import (
    catmullrom_to_beziers, convert, read_cyhair,
)


def _write_hair(path, strands, thickness=None, default_thickness=0.02):
    """strands: list of (n, 3) float arrays (all must share n when no
    per-strand segments array is written; we always write segments)."""
    pts = np.concatenate(strands, 0).astype("<f4")
    segs = np.asarray([s.shape[0] - 1 for s in strands], "<u2")
    flags = 0x1 | 0x2
    blobs = [segs.tobytes(), pts.tobytes()]
    if thickness is not None:
        flags |= 0x4
        blobs.append(np.asarray(thickness, "<f4").tobytes())
    header = struct.pack(
        "<4sIIIIff3f88s", b"HAIR", len(strands), pts.shape[0], flags, 0,
        default_thickness, 1.0, 0.5, 0.3, 0.2, b"",
    )
    with open(path, "wb") as f:
        f.write(header)
        for b in blobs:
            f.write(b)


def test_read_cyhair_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    strands = [rng.normal(size=(5, 3)), rng.normal(size=(3, 3))]
    th = rng.uniform(0.01, 0.05, 8)
    p = tmp_path / "h.hair"
    _write_hair(str(p), strands, thickness=th)
    ss, tt = read_cyhair(str(p))
    assert len(ss) == 2
    np.testing.assert_allclose(ss[0], strands[0], rtol=1e-6)
    np.testing.assert_allclose(ss[1], strands[1], rtol=1e-6)
    np.testing.assert_allclose(np.concatenate(tt), th, rtol=1e-6)


def test_catmullrom_bezier_interpolates():
    """Beziers must interpolate the CR control points and be C1 at interior
    joins (shared tangent (P_{i+1} - P_{i-1})/6)."""
    pts = np.asarray(
        [[0, 0, 0], [1, 0.5, 0], [2, 0, 1], [3, 1, 1]], np.float64
    )
    bez = catmullrom_to_beziers(pts)
    assert bez.shape == (3, 4, 3)
    np.testing.assert_allclose(bez[:, 0], pts[:-1], atol=1e-6)
    np.testing.assert_allclose(bez[:, 3], pts[1:], atol=1e-6)
    # Interior join tangents: out-tangent of span k == in-tangent of k+1.
    t_out = bez[0, 3] - bez[0, 2]
    t_in = bez[1, 1] - bez[1, 0]
    np.testing.assert_allclose(t_out, t_in, atol=1e-6)
    np.testing.assert_allclose(t_in, (pts[2] - pts[0]) / 6.0, atol=1e-6)


def test_convert_and_parse(tmp_path):
    rng = np.random.default_rng(1)
    strands = [np.cumsum(rng.normal(scale=0.1, size=(6, 3)), 0)
               for _ in range(3)]
    p = tmp_path / "h.hair"
    _write_hair(str(p), strands)
    buf = io.StringIO()
    n = convert(str(p), buf, thickness=0.01)
    assert n == 3 * 5  # 5 spans per 6-point strand
    text = buf.getvalue()
    assert text.count('Shape "curve"') == n
    scene_file = tmp_path / "hair.pbrt"
    scene_file.write_text(
        'Film "rgb" "integer xresolution" 8 "integer yresolution" 8\n'
        "Camera \"perspective\"\n"
        "WorldBegin\n"
        'Material "hair"\n'
        + text
    )
    from pbrt_tpu.io.parser import load_pbrt

    scene, _, _ = load_pbrt(str(scene_file))
    assert scene.geom.num_curves > 0
