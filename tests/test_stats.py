"""CHECK_RARE + per-pixel statistics image gates (ref: util/check.h:101
CHECK_RARE and the --pixelstats EXR planes of util/stats.cpp)."""

import numpy as np


def test_check_rare_accumulates_and_warns(capsys):
    from pbrt_tpu.utils import stats as st

    st._RARE.clear()
    f = st.check_rare("unit_rare", np.zeros(5000, bool))
    assert f == 0.0
    f = st.check_rare("unit_rare", np.ones(100, bool))
    rep = st.rare_report()["unit_rare"]
    assert rep["hits"] == 100 and rep["total"] == 5100
    assert abs(f - 100 / 5100) < 1e-9
    err = capsys.readouterr().err
    assert "unit_rare" in err  # frequency above the 1e-3 default warns


def test_pixel_stats_images(tmp_path):
    from pbrt_tpu.io.image import read_exr
    from pbrt_tpu.utils.stats import PixelStats

    ps = PixelStats(4, 3)
    ps.add("shadow_rays", [0, 0, 5, 11])
    ps.add("bounces", [2, 2, 2], [1.5, 1.5, 2.0])
    out = str(tmp_path / "pixelstats.exr")
    names = ps.write(out)
    assert names == ["bounces", "shadow_rays"]
    img, chans, _ = read_exr(out)
    sr = img[..., chans.index("shadow_rays")].reshape(-1)
    assert sr[0] == 2.0 and sr[5] == 1.0 and sr[11] == 1.0
    assert img[..., chans.index("bounces")].reshape(-1)[2] == 5.0
