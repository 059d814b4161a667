"""FunctionIntegrator: converges to the exact integral; QMC beats MC.

Mirrors the reference FunctionIntegrator's purpose (sampler-quality
comparison renders, cpu/integrators.cpp).
"""

import numpy as np
import pytest

from pbrt_tpu.models.function import FunctionIntegrator, _FUNCTIONS


@pytest.mark.parametrize("func", sorted(_FUNCTIONS))
def test_converges_to_exact(func):
    integ = FunctionIntegrator(func=func)
    est, exact = integ.render((16, 16), spp=512, sampler_kind="independent",
                              seed=3)
    mean = float(np.mean(np.asarray(est)))
    assert abs(mean - exact) < 0.03 * max(exact, 0.05), (func, mean, exact)


def test_sampler_quality_ordering():
    """Per-pixel MSE: stratified and sobol beat independent on a smooth
    integrand — the comparison this integrator exists to make."""
    integ = FunctionIntegrator(func="gaussian")
    mses = {}
    for kind in ("independent", "stratified", "sobol"):
        est, exact = integ.render((8, 8), spp=256, sampler_kind=kind, seed=7)
        mses[kind] = float(np.mean((np.asarray(est) - exact) ** 2))
    assert mses["stratified"] < mses["independent"]
    assert mses["sobol"] < mses["independent"]


def test_parser_binding(tmp_path):
    scene_file = tmp_path / "fn.pbrt"
    scene_file.write_text(
        'Integrator "function" "string function" "linear"\n'
        'Sampler "halton" "integer pixelsamples" 16\n'
        'Film "rgb" "integer xresolution" 8 "integer yresolution" 8\n'
        "Camera \"perspective\"\n"
        "WorldBegin\n"
        'Material "diffuse"\n'
        "Shape \"sphere\" \"float radius\" 1\n"
    )
    from pbrt_tpu.io.parser import load_pbrt

    _, camera, settings = load_pbrt(str(scene_file))
    integ = settings["integrator"]
    assert isinstance(integ, FunctionIntegrator) and integ.func == "linear"
    est, exact = integ.render(camera.resolution, spp=settings["spp"],
                              sampler_kind=settings["sampler"])
    assert abs(float(np.mean(np.asarray(est))) - exact) < 0.05
