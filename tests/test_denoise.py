"""Denoiser gates: noise suppression on flat regions, edge preservation
with AOV guides (the role of gpu/denoiser.* + imgtool denoise)."""

import numpy as np

from pbrt_tpu.utils.denoise import denoise


def _noisy_edge(seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((48, 48, 3), np.float32)
    img[:, :24] = 0.2
    img[:, 24:] = 1.0
    noisy = img + rng.normal(0, 0.25, img.shape).astype(np.float32)
    albedo = img.copy()
    normal = np.zeros_like(img)
    normal[..., 2] = 1.0
    depth = np.full((48, 48), 3.0, np.float32)
    return img, np.clip(noisy, 0, None), albedo, normal, depth


def test_denoise_reduces_noise_keeps_edges():
    clean, noisy, albedo, normal, depth = _noisy_edge()
    out = denoise(noisy, albedo=albedo, normal=normal, depth=depth)
    mse_in = float(((noisy - clean) ** 2).mean())
    mse_out = float(((out - clean) ** 2).mean())
    assert mse_out < 0.25 * mse_in, (mse_in, mse_out)
    # The albedo-guided edge stays sharp: the step across column 24 is
    # preserved within a pixel.
    prof = out[:, :, 0].mean(0)
    assert prof[21] < 0.45 and prof[27] > 0.75, (prof[21], prof[27])


def test_denoise_without_guides_still_smooths():
    clean, noisy, *_ = _noisy_edge(1)
    out = denoise(noisy)
    mse_in = float(((noisy - clean) ** 2).mean())
    mse_out = float(((out - clean) ** 2).mean())
    assert mse_out < 0.6 * mse_in


def test_imgtool_denoise_cli(tmp_path):
    import subprocess
    import sys

    from pbrt_tpu.io.image import read_exr, write_exr

    clean, noisy, albedo, normal, depth = _noisy_edge(2)
    write_exr(str(tmp_path / "noisy.exr"), noisy)
    chans = np.concatenate(
        [albedo, normal, depth[..., None]], axis=-1
    )
    write_exr(
        str(tmp_path / "aux.exr"), chans,
        channel_names=["AlbedoR", "AlbedoG", "AlbedoB",
                       "Nx", "Ny", "Nz", "Depth"],
    )
    r = subprocess.run(
        [sys.executable, "-m", "pbrt_tpu.tools.imgtool", "denoise",
         str(tmp_path / "noisy.exr"), str(tmp_path / "out.exr"),
         "--aov", str(tmp_path / "aux.exr")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    img, ch, _ = read_exr(str(tmp_path / "out.exr"))
    out = np.stack([img[..., ch.index(c)] for c in "RGB"], -1)
    assert ((out - clean) ** 2).mean() < ((noisy - clean) ** 2).mean() * 0.3
