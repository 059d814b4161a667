"""Tool tests: imgtool subcommands, the pbrt CLI, AO integrator, stats."""

import json
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.io.image import read_exr, write_exr
from pbrt_tpu.tools import imgtool


def _img(seed=0, h=12, w=16):
    return np.random.default_rng(seed).uniform(0, 2, (h, w, 3)).astype(np.float32)


def test_imgtool_convert_and_diff(tmp_path):
    a = _img(0)
    pa = str(tmp_path / "a.exr")
    pb = str(tmp_path / "b.exr")
    write_exr(pa, a)
    write_exr(pb, a + 0.1)
    rc = imgtool.main(["convert", pa, str(tmp_path / "a.png"), "--tonemap"])
    assert rc == 0 and os.path.exists(tmp_path / "a.png")
    rc = imgtool.main(["diff", pa, pb])
    assert rc == 0
    rc = imgtool.main(["diff", pa, pb, "--metric-limit", "0.001"])
    assert rc == 1  # mse = 0.01 > limit


def test_imgtool_average_falsecolor(tmp_path):
    p1, p2 = str(tmp_path / "1.exr"), str(tmp_path / "2.exr")
    write_exr(p1, _img(1))
    write_exr(p2, _img(2))
    out = str(tmp_path / "avg.exr")
    assert imgtool.main(["average", p1, p2, "--output", out]) == 0
    img, chans, _ = read_exr(out)
    assert img.shape[:2] == (12, 16)
    fc = str(tmp_path / "fc.png")
    assert imgtool.main(["falsecolor", out, fc]) == 0
    assert os.path.getsize(fc) > 100


def test_pbrt_cli(tmp_path):
    scene = tmp_path / "s.pbrt"
    scene.write_text(
        """
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
Sampler "independent" "integer pixelsamples" [4]
LookAt 0.5 0.5 -1.4  0.5 0.5 0.5  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [1 1 1] "float scale" [10]
  Shape "trianglemesh" "point3 P" [0.3 0.99 0.3  0.7 0.99 0.3  0.7 0.99 0.7  0.3 0.99 0.7]
      "integer indices" [0 1 2  0 2 3]
AttributeEnd
Material "diffuse" "rgb reflectance" [0.7 0.7 0.7]
Shape "trianglemesh" "point3 P" [0 0 0  1 0 0  1 0 1  0 0 1]
    "integer indices" [0 2 1  0 3 2]
WorldEnd
"""
    )
    out = str(tmp_path / "out.exr")
    from pbrt_tpu.tools.pbrt_render import main

    rc = main([str(scene), "--outfile", out, "--spp", "4",
               "--samples-per-pass", "2", "--quiet"])
    assert rc == 0
    img, chans, meta = read_exr(out)
    assert img.shape[:2] == (16, 16)
    assert meta["samplesPerPixel"] == "4"
    assert np.isfinite(img).all()


def test_ao_integrator():
    from pbrt_tpu.models.ao import AOIntegrator
    from pbrt_tpu.render import render
    from pbrt_tpu.scenes.cornell import cornell_box

    scene, camera = cornell_box(resolution=(24, 24))
    img = np.asarray(
        render(scene, camera, AOIntegrator(), spp=8, samples_per_pass=4)
    )
    assert np.isfinite(img).all()
    # Open-field floor areas are brighter than box corners/creases.
    assert 0.1 < img.mean() < 1.0
    lum = img.mean(-1)
    assert lum.max() > lum.min() + 0.2


def test_stats_and_progress(capfd):
    from pbrt_tpu.utils.stats import STATS, ProgressReporter

    STATS.clear()
    STATS.add("rays traced", 100)
    STATS.add("rays traced", 50)
    STATS.observe("bounce depth", 3)
    STATS.report()
    # capfd (fd-level) instead of capsys: report() may hold a stderr
    # reference bound at import time, which per-test stream swapping
    # misses depending on worker import order.
    err = capfd.readouterr().err
    assert "rays traced" in err and "150" in err
    pr = ProgressReporter(10, quiet=True)
    for _ in range(10):
        pr.update()
    assert pr.done == 10


def test_tev_client_unreachable_ok():
    from pbrt_tpu.utils.display import send_to_tev

    ok = send_to_tev(np.zeros((4, 4, 3), np.float32), port=59999)
    assert ok is False  # no server: graceful False, no exception


def test_randomwalk_matches_path():
    """RandomWalk is the unbiased oracle: agrees with Path within MC noise."""
    import jax.numpy as jnp

    from pbrt_tpu.models.ao import RandomWalkIntegrator
    from pbrt_tpu.models.path import PathIntegrator
    from pbrt_tpu.render import camera_rays
    from pbrt_tpu.scenes.cornell import cornell_box

    scene, camera = cornell_box(resolution=(8, 8))
    pixel = jnp.tile(jnp.arange(64, dtype=jnp.int32), (128,))
    sample = jnp.repeat(jnp.arange(128, dtype=jnp.int32), 64)
    o, d, wl = camera_rays(camera, pixel, sample, jnp.int32(0))
    rw = RandomWalkIntegrator(max_depth=4)
    pt = PathIntegrator(max_depth=4, rr_start_depth=100)
    l_rw = float(jnp.mean(rw.trace(scene, o, d, wl, pixel, sample, jnp.int32(0))))
    l_pt = float(jnp.mean(pt.trace(scene, o, d, wl, pixel, sample, jnp.int32(0))))
    assert abs(l_rw - l_pt) < 0.25 * max(l_pt, 1e-3), (l_rw, l_pt)


def test_pbrt_cli_gbuffer(tmp_path):
    scene = tmp_path / "s.pbrt"
    scene.write_text(
        """
Film "rgb" "integer xresolution" [12] "integer yresolution" [12]
LookAt 0.5 0.5 -1.4  0.5 0.5 0.5  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [1 1 1] "float scale" [10]
  Shape "trianglemesh" "point3 P" [0.3 0.99 0.3  0.7 0.99 0.3  0.7 0.99 0.7  0.3 0.99 0.7]
      "integer indices" [0 1 2  0 2 3]
AttributeEnd
Shape "trianglemesh" "point3 P" [0 0 0  1 0 0  1 0 1  0 0 1]
    "integer indices" [0 2 1  0 3 2]
WorldEnd
"""
    )
    out = str(tmp_path / "o.exr")
    from pbrt_tpu.tools.pbrt_render import main

    rc = main([str(scene), "--outfile", out, "--spp", "4",
               "--samples-per-pass", "2", "--quiet", "--gbuffer",
               "--spectral-buckets", "6"])
    assert rc == 0
    aov, chans, _ = read_exr(str(tmp_path / "o_aov.exr"))
    assert "Depth" in chans and "MaterialId" in chans and "Nz" in chans
    spec, schans, _ = read_exr(str(tmp_path / "o_spectral.exr"))
    assert len(schans) == 6
    assert np.isfinite(spec).all()


def test_pspec_low_discrepancy_suppresses_low_frequencies():
    from pbrt_tpu.tools.pspec import power_spectrum

    res = 64
    # dim=0 measures the flagship (dim0, dim1) Sobol' pair, matching the
    # reference pspec.cpp's first-two-dimensions analysis; higher dim pairs
    # of the global sequence legitimately have weaker 2D projections.
    ps_ind = power_spectrum("independent", spp=128, n_sets=12, res=res, dim=0)
    ps_sob = power_spectrum("sobol", spp=128, n_sets=12, res=res, dim=0)
    yy, xx = np.mgrid[0:res, 0:res]
    rad = np.hypot(yy - res // 2, xx - res // 2)
    low_mask = (rad > 0) & (rad < res * 0.08)
    # White noise: flat spectrum ~1; Sobol': strong low-frequency suppression.
    assert 0.6 < ps_ind[low_mask].mean() < 1.5
    assert ps_sob[low_mask].mean() < 0.35 * ps_ind[low_mask].mean()


def test_flip_metric_properties():
    """FLIP: zero for identical images, monotone in perturbation size,
    larger for structured (edge) errors than equal-energy flat offsets."""
    from pbrt_tpu.utils.flip import flip_error_map, mean_flip

    rng = np.random.default_rng(5)
    img = rng.random((48, 48, 3)).astype(np.float32) * 0.5
    assert mean_flip(img, img) < 1e-6
    small = mean_flip(img, np.clip(img + 0.02, 0, 1))
    large = mean_flip(img, np.clip(img + 0.2, 0, 1))
    assert 0.0 < small < large <= 1.0
    m = flip_error_map(img, np.clip(img + 0.1, 0, 1))
    assert m.shape == (48, 48)
    assert np.isfinite(m).all() and (m >= 0).all() and (m <= 1).all()


def test_imgtool_error_convergence(tmp_path):
    """`error` reports per-image metrics and ~O(1/N) MSE convergence for
    averaged white-noise images."""
    import json
    import subprocess
    import sys

    from pbrt_tpu.io.image import write_exr

    rng = np.random.default_rng(0)
    ref = np.full((16, 16, 3), 0.5, np.float32)
    write_exr(str(tmp_path / "ref.exr"), ref)
    files = []
    acc = np.zeros_like(ref)
    for i in range(1, 5):
        acc += rng.random(ref.shape).astype(np.float32)
        img = acc / i  # MSE ~ 1/(12 i)
        f = str(tmp_path / f"r{i}.exr")
        write_exr(f, img)
        files.append(f)
    r = subprocess.run(
        [sys.executable, "-m", "pbrt_tpu.tools.imgtool", "error",
         *files, "--reference", str(tmp_path / "ref.exr")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert len(out["images"]) == 4
    mses = [row["mse"] for row in out["images"]]
    assert mses[0] > mses[-1]
    assert 0.5 < out["mse_convergence_order"] < 1.5


def test_imgtool_makesky(tmp_path):
    """makesky: horizon-to-zenith gradient, sun disk present, below-horizon
    black."""
    import subprocess
    import sys

    from pbrt_tpu.io.image import read_exr

    f = str(tmp_path / "sky.exr")
    r = subprocess.run(
        [sys.executable, "-m", "pbrt_tpu.tools.imgtool", "makesky", f,
         "--resolution", "32", "--elevation", "40",
         "--sun-half-angle", "4.0", "--model", "preetham"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    img, chans, _ = read_exr(f)
    rgb = np.stack([img[..., chans.index(c)] for c in "RGB"], -1)
    assert rgb.shape == (32, 64, 3)
    assert np.isfinite(rgb).all()
    upper = rgb[: 14].mean()
    below = rgb[18:].mean()
    assert upper > 0.01
    assert below < 0.01 * upper  # below horizon dark
    assert rgb.max() > 50.0  # the sun disk


def test_imgtool_cat_scalenormalmap_makeemitters(tmp_path, capsys):
    """New imgtool subcommands (imgtool cat/scalenormalmap/makeemitters,
    cmd/imgtool.cpp:57-248)."""
    import numpy as np

    from pbrt_tpu.io.image import read_pfm, write_pfm
    from pbrt_tpu.tools.imgtool import main as imgtool

    src = tmp_path / "in.pfm"
    img = np.arange(2 * 2 * 3, dtype=np.float32).reshape(2, 2, 3) / 12.0
    write_pfm(str(src), img)

    # cat prints every pixel
    assert imgtool(["cat", str(src)]) == 0
    out = capsys.readouterr().out
    assert "(1, 1):" in out and "2 x 2" in out
    assert imgtool(["cat", str(src), "--csv"]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 4

    # scalenormalmap: scale 1 keeps a valid normal map normalized
    nm = tmp_path / "nm.pfm"
    flat = np.tile(np.array([0.5, 0.5, 1.0], np.float32), (4, 4, 1))
    write_pfm(str(nm), flat)
    out_nm = tmp_path / "nm2.pfm"
    assert imgtool(["scalenormalmap", str(nm), str(out_nm),
                    "--scale", "0.5"]) == 0
    dec = read_pfm(str(out_nm)) * 2.0 - 1.0
    np.testing.assert_allclose(np.linalg.norm(dec, axis=-1), 1.0, atol=1e-5)
    # flat normal stays flat
    np.testing.assert_allclose(dec[..., 2], 1.0, atol=1e-5)

    # makeemitters: emits one quad per bright pixel, parseable by our parser
    scene_txt = tmp_path / "em.pbrt"
    assert imgtool(["makeemitters", str(src),
                    "--output", str(scene_txt)]) == 0
    text = scene_txt.read_text()
    assert text.count("AreaLightSource") == 4  # every pixel has energy
    assert "trianglemesh" in text


def test_pbrt_cli_debugstart(tmp_path, capsys):
    """--debugstart replays one pixel sample deterministically
    (cpu/integrators.cpp:69-88 analogue; stateless RNG makes it exact)."""
    import json as _json

    scene = tmp_path / "dbg.pbrt"
    scene.write_text(
        """
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
Sampler "independent" "integer pixelsamples" [4]
LookAt 0.5 0.5 -1.4  0.5 0.5 0.5  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [1 1 1] "float scale" [10]
  Shape "trianglemesh" "point3 P" [0.3 0.99 0.3  0.7 0.99 0.3  0.7 0.99 0.7  0.3 0.99 0.7]
      "integer indices" [0 1 2  0 2 3]
AttributeEnd
Material "diffuse" "rgb reflectance" [0.7 0.7 0.7]
Shape "trianglemesh" "point3 P" [0 0 0  1 0 0  1 0 1  0 0 1]
    "integer indices" [0 2 1  0 3 2]
WorldEnd
"""
    )
    from pbrt_tpu.tools.pbrt_render import main

    rc = main([str(scene), "--debugstart", "3,5,1", "--quiet"])
    assert rc == 0
    rec1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec1["pixel"] == [3, 5] and rec1["sample"] == 1
    assert len(rec1["L"]) == len(rec1["lambdas"])
    assert all(np.isfinite(v) for v in rec1["L"])
    # Exact replay: a second run reproduces the record bit-for-bit.
    rc = main([str(scene), "--debugstart", "3,5,1", "--quiet"])
    assert rc == 0
    rec2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec1 == rec2
