"""SpectralPath (CA-band) integrator tests."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.cameras.humaneye import HumanEyeCamera, navarro_eye_stack, _disperse
from pbrt_tpu.core import transform
from pbrt_tpu.models.path import PathIntegrator
from pbrt_tpu.models.spectralpath import render_spectral
from pbrt_tpu.render import render
from pbrt_tpu.scenes.cornell import cornell_box


def test_dispersion_model():
    # Blue bends more: n(450) > n(589) > n(650).
    assert _disperse(1.42, 450) > 1.42 > _disperse(1.42, 650)
    # Magnitude sane (< 0.02 across the visible).
    assert abs(_disperse(1.336, 400) - 1.336) < 0.02


def test_band_render_consistent_with_full():
    """Non-dispersive camera: band-summed RGB ~= standard full render."""
    scene, camera = cornell_box(resolution=(16, 16))
    rgb_bands, bands = render_spectral(
        scene, camera, n_bands=4, spp_per_band=8, max_depth=3
    )
    full = np.asarray(
        render(scene, camera, PathIntegrator(max_depth=3), spp=32,
               samples_per_pass=8)
    )
    assert bands.shape == (16, 16, 4)
    assert np.isfinite(rgb_bands).all() and (bands >= -1e-4).all()
    # Means agree within MC noise.
    assert abs(rgb_bands.mean() - full.mean()) < 0.15 * full.mean(), (
        rgb_bands.mean(), full.mean()
    )


def test_ca_bands_shift_with_eye():
    """Dispersive Navarro eye: blue and red bands focus differently, so the
    per-band images differ more than MC noise alone."""
    scene, _ = cornell_box(resolution=(32, 32))
    c2w = transform.look_at(
        (0.5, 0.5, -1.45), (0.5, 0.5, 0.5), (0, 1, 0)
    ) @ transform.scale(0.001)

    def factory(lam_c):
        return HumanEyeCamera.navarro(
            c2w, resolution=(32, 32), pupil_diameter_mm=4.0,
            wavelength_nm=lam_c,
        )

    rgb, bands = render_spectral(
        scene, factory, n_bands=3, spp_per_band=4, max_depth=2, seed=3
    )
    assert np.isfinite(rgb).all()
    assert bands.sum() > 0
    # The dispersive stacks differ between bands.
    blue_stack = navarro_eye_stack(4.0, 420.0)
    red_stack = navarro_eye_stack(4.0, 680.0)
    assert float(blue_stack.eta_before[0]) > float(red_stack.eta_before[0])
