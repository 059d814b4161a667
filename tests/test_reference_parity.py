"""Forward-parity gate vs the actual reference renderer (BASELINE.md north
star: "forward allclose vs pbrt CPU").

The golden images in tests/goldens/*_ref.pfm were rendered by the reference
(scienstanford/pbrt-v4) built headless in this sandbox via
scripts/build_reference.sh, at 4096 spp with --seed 1 (regenerate with
scripts/make_goldens.sh). Each test parses the IDENTICAL .pbrt file through
our parser and renders with the matching integrator, then gates on relative
mean-brightness error and MSE against the golden.

These gates caught two real transport bugs when first enabled: shadow rays
self-occluding on the sampled light's plane at grazing angles, and
dielectric eta not inverting for rays exiting the medium — keep them tight.
"""

import os

import numpy as np
import pytest

from pbrt_tpu.io.image import read_pfm
from pbrt_tpu.io.parser import load_pbrt
from pbrt_tpu.render import render

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

# (scene, our spp, max relative mean error, max MSE)
CASES = [
    # box: indirect-dominated (one-sided light shining at the ceiling);
    # 512 spp leaves firefly variance, so the MSE bound is looser.
    ("box", 512, 0.04, 0.035),
    ("spheres", 384, 0.035, 1e-4),
    ("spot", 256, 0.035, 5e-4),
    # fog: homogeneous interior medium via per-shape MediumInterface
    # (VolPath + interface-aware shadow transmittance).
    ("fog", 192, 0.06, 5e-5),
]


@pytest.mark.parametrize("name,spp,rel_tol,mse_tol", CASES)
def test_matches_reference_render(name, spp, rel_tol, mse_tol):
    scene, camera, settings = load_pbrt(os.path.join(GOLDENS, f"{name}.pbrt"))
    img = np.asarray(
        render(
            scene, camera, settings["integrator"],
            spp=spp, samples_per_pass=8, sampler_kind="independent",
        )
    )
    ref = read_pfm(os.path.join(GOLDENS, f"{name}_ref.pfm"))
    assert img.shape == ref.shape
    assert np.isfinite(img).all()

    rel = abs(img.mean() - ref.mean()) / ref.mean()
    mse = float(np.mean((img - ref) ** 2))
    assert rel < rel_tol, f"{name}: mean {img.mean():.4f} vs ref {ref.mean():.4f} (rel {rel:.3f})"
    assert mse < mse_tol, f"{name}: MSE {mse:.6f} vs golden"
