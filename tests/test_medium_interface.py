"""Per-shape nested MediumInterface: MediumStack + ray.medium threading.

Reference analogue: MediumInterface (media.h:55-80) + VolPathIntegrator's
ray.medium switching on transmission (cpu/integrators.cpp). The analytic
gates use eta=1 specular dielectrics so refraction is straight-through and
Beer-Lambert attenuation over sphere chords is exact.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.core import rgb2spec
from pbrt_tpu.media.medium import MED_VACUUM, MediumStack


def test_mediumstack_lookup():
    st = MediumStack.build([
        {"sigma_a": (1.0, 1.0, 1.0), "sigma_s": (0.0, 0.0, 0.0), "g": 0.3},
        {"sigma_a": (0.0, 0.0, 0.0), "sigma_s": (2.0, 2.0, 2.0), "g": -0.2,
         "scale": 2.0},
    ])
    lam = jnp.full((3, 4), 550.0)
    idx = jnp.asarray([0, 1, -1], jnp.int32)
    sa, ss = st.sigma_at_idx(idx, lam)
    assert abs(float(sa[0, 0]) - 1.0) < 0.05
    assert float(ss[0, 0]) < 1e-6
    assert abs(float(ss[1, 0]) - 4.0) < 0.2  # scale applied
    assert float(sa[2].max()) == 0.0 and float(ss[2].max()) == 0.0
    g = np.asarray(st.g_at(idx))
    assert abs(g[0] - 0.3) < 1e-6 and abs(g[1] + 0.2) < 1e-6 and g[2] == 0.0


_QUAD = ('Shape "trianglemesh" "point3 P" '
         "[-2 -2 2  2 -2 2  2 2 2  -2 2 2] "
         '"integer indices" [0 2 1 0 3 2]\n')  # normal toward -z (camera)


def _scene_text(spheres: str) -> str:
    return (
        'Integrator "volpath" "integer maxdepth" 10\n'
        'Sampler "independent" "integer pixelsamples" 64\n'
        'Film "rgb" "integer xresolution" 9 "integer yresolution" 9\n'
        "LookAt 0 0 -3  0 0 0  0 1 0\n"
        'Camera "perspective" "float fov" 20\n'
        "WorldBegin\n"
        'MakeNamedMedium "ink" "string type" "homogeneous" '
        '"rgb sigma_a" [2 2 2] "rgb sigma_s" [0 0 0]\n'
        'MakeNamedMedium "thin" "string type" "homogeneous" '
        '"rgb sigma_a" [1 1 1] "rgb sigma_s" [0 0 0]\n'
        + spheres
        + 'AttributeBegin\n'
        '  AreaLightSource "diffuse" "rgb L" [10 10 10]\n'
        + _QUAD
        + "AttributeEnd\n"
    )


def _center_radiance(text, tmp_path, name, spp=64):
    from pbrt_tpu.io.parser import load_pbrt
    from pbrt_tpu.render import render

    f = tmp_path / f"{name}.pbrt"
    f.write_text(text)
    scene, camera, settings = load_pbrt(str(f))
    img = np.asarray(render(
        scene, camera, settings["integrator"], spp=spp, samples_per_pass=8,
        seed=5,
    ))
    return float(img[4, 4].mean()), scene


_GLASS_SPHERE = (
    "AttributeBegin\n"
    '  MediumInterface "ink" ""\n'
    '  Material "dielectric" "float eta" 1.0\n'
    '  Shape "sphere" "float radius" 0.5\n'
    "AttributeEnd\n"
)

_NESTED_SPHERES = (
    "AttributeBegin\n"
    '  MediumInterface "thin" ""\n'
    '  Material "dielectric" "float eta" 1.0\n'
    '  Shape "sphere" "float radius" 0.5\n'
    '  MediumInterface "ink" "thin"\n'
    '  Shape "sphere" "float radius" 0.25\n'
    "AttributeEnd\n"
)


def test_parser_builds_media_stack(tmp_path):
    f = tmp_path / "s.pbrt"
    f.write_text(_scene_text(_GLASS_SPHERE))
    from pbrt_tpu.io.parser import load_pbrt
    from pbrt_tpu.models.volpath import VolPathIntegrator

    scene, _, settings = load_pbrt(str(f))
    assert scene.media_stack is not None
    assert scene.media_stack.n_media == 2
    assert isinstance(settings["integrator"], VolPathIntegrator)
    mi = np.asarray(scene.materials.med_inside)
    mo = np.asarray(scene.materials.med_outside)
    # The sphere's cloned material: inside = ink (idx 0), outside = vacuum.
    assert (mi == 0).any()
    assert (mo[mi == 0] == MED_VACUUM).all()


def test_absorbing_interior_beer_lambert(tmp_path):
    """Center ray crosses the r=0.5 ink sphere (sigma_a=2, chord=1):
    radiance ratio vs the empty scene must be exp(-2)."""
    l_med, _ = _center_radiance(
        _scene_text(_GLASS_SPHERE), tmp_path, "ink"
    )
    l_ref, _ = _center_radiance(_scene_text(""), tmp_path, "empty")
    ratio = l_med / l_ref
    assert abs(ratio - np.exp(-2.0)) < 0.03, (ratio, np.exp(-2.0))


def test_nested_media_switching(tmp_path):
    """Concentric spheres: thin (sigma=1) shell r in [0.25, 0.5] around an
    ink (sigma=2) core r=0.25. Center-chord optical depth:
    tau = 1 * (1.0 - 0.5) + 2 * 0.5 = 1.5."""
    l_med, _ = _center_radiance(
        _scene_text(_NESTED_SPHERES), tmp_path, "nested", spp=384
    )
    l_ref, _ = _center_radiance(_scene_text(""), tmp_path, "empty2")
    ratio = l_med / l_ref
    # Binary pass/absorb estimator: sigma(384 spp) ~ 0.021.
    assert abs(ratio - np.exp(-1.5)) < 0.05, (ratio, np.exp(-1.5))


_NONE_SPHERE = (
    "AttributeBegin\n"
    '  MediumInterface "ink" ""\n'
    '  Material "none"\n'
    '  Shape "sphere" "float radius" 0.5\n'
    "AttributeEnd\n"
)


def test_interface_material_passthrough(tmp_path):
    """Material "none" boundaries: rays pass straight through with unit
    throughput, only switching media — same Beer-Lambert gate as the
    eta=1 dielectric."""
    l_med, scene = _center_radiance(
        _scene_text(_NONE_SPHERE), tmp_path, "none_ink"
    )
    l_ref, _ = _center_radiance(_scene_text(""), tmp_path, "empty4")
    from pbrt_tpu.materials.buffers import MAT_INTERFACE

    assert (np.asarray(scene.materials.kind) == MAT_INTERFACE).any()
    ratio = l_med / l_ref
    assert abs(ratio - np.exp(-2.0)) < 0.03, (ratio, np.exp(-2.0))
    # A corner pixel missing the sphere is unattenuated.
    # (radius 0.5 sphere subtends ~9.5 deg < the 10 deg half-fov diagonal)


def test_scattering_interior_finite_and_dimmer(tmp_path):
    """A scattering interior (sigma_s > 0) stays finite/non-negative and
    extinguishes the direct view more than vacuum."""
    scatter_sphere = (
        "AttributeBegin\n"
        '  MediumInterface "fog" ""\n'
        '  Material "dielectric" "float eta" 1.0\n'
        '  Shape "sphere" "float radius" 0.5\n'
        "AttributeEnd\n"
    )
    text = _scene_text(scatter_sphere).replace(
        'MakeNamedMedium "ink"',
        'MakeNamedMedium "fog" "string type" "homogeneous" '
        '"rgb sigma_s" [3 3 3] "rgb sigma_a" [0 0 0] "float g" 0.4\n'
        'MakeNamedMedium "ink"',
    )
    from pbrt_tpu.io.parser import load_pbrt
    from pbrt_tpu.render import render

    f = tmp_path / "fog.pbrt"
    f.write_text(text)
    scene, camera, settings = load_pbrt(str(f))
    img = np.asarray(render(
        scene, camera, settings["integrator"], spp=32, samples_per_pass=8,
        seed=1,
    ))
    assert np.isfinite(img).all() and (img >= 0).all()
    l_ref, _ = _center_radiance(_scene_text(""), tmp_path, "empty3")
    assert img[4, 4].mean() < l_ref
