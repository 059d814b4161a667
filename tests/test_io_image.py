"""Image I/O round-trip tests (ref model: image_test.cpp incl. EXR metadata)."""

import numpy as np

from pbrt_tpu.io.image import read_exr, read_pfm, write_exr, write_pfm, write_png


def _img(h=17, w=23, c=3, seed=0):
    r = np.random.default_rng(seed)
    return r.uniform(-2.0, 8.0, size=(h, w, c)).astype(np.float32)


def test_pfm_roundtrip(tmp_path):
    img = _img()
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    back = read_pfm(p)
    np.testing.assert_array_equal(back, img)


def test_exr_roundtrip_none(tmp_path):
    img = _img()
    p = str(tmp_path / "x.exr")
    write_exr(p, img, compression="none", metadata={"samplesPerPixel": "64"})
    back, chans, meta = read_exr(p)
    assert chans == ["B", "G", "R"]  # alphabetical EXR channel order
    # Map back: B<-img[...,2] etc.
    np.testing.assert_array_equal(back[..., chans.index("R")], img[..., 0])
    np.testing.assert_array_equal(back[..., chans.index("G")], img[..., 1])
    np.testing.assert_array_equal(back[..., chans.index("B")], img[..., 2])
    assert meta["samplesPerPixel"] == "64"


def test_exr_roundtrip_zip(tmp_path):
    img = _img(h=37, w=11)
    p = str(tmp_path / "z.exr")
    write_exr(p, img, compression="zip")
    back, chans, _ = read_exr(p)
    np.testing.assert_array_equal(back[..., chans.index("R")], img[..., 0])
    np.testing.assert_array_equal(back[..., chans.index("B")], img[..., 2])


def test_exr_half(tmp_path):
    img = _img(h=8, w=8)
    p = str(tmp_path / "h.exr")
    write_exr(p, img, compression="zip", half=True)
    back, chans, _ = read_exr(p)
    np.testing.assert_allclose(
        back[..., chans.index("R")], img[..., 0], rtol=1e-3, atol=1e-3
    )


def test_png_smoke(tmp_path):
    img = np.clip(_img(h=9, w=13) / 8.0, 0, 1)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    with open(p, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IEND" in data


def test_qoi_roundtrip():
    """QOI encode/decode bit-exactness across all op codes (runs, index
    hits, small/medium diffs, full RGB/RGBA literals)."""
    from pbrt_tpu.io.image import read_qoi, write_qoi

    rng = np.random.default_rng(3)
    img = (rng.random((23, 17, 3)) * 255).astype(np.uint8)
    img[5:9] = img[4]        # runs
    img[:, 3] = img[:, 2]    # index hits
    img[10, :] = np.clip(img[9, :].astype(int) + 1, 0, 255)  # small diffs
    write_qoi("/tmp/qoi_rt.qoi", img)
    back = read_qoi("/tmp/qoi_rt.qoi")
    np.testing.assert_array_equal(
        (back * 255).round().astype(np.uint8), img
    )
    img4 = (rng.random((9, 11, 4)) * 255).astype(np.uint8)
    write_qoi("/tmp/qoi_rt4.qoi", img4)
    np.testing.assert_array_equal(
        (read_qoi("/tmp/qoi_rt4.qoi") * 255).round().astype(np.uint8), img4
    )
