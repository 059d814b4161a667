"""Projection + goniometric light tests (ref: lights.h:482, :584 and the
lights_test.cpp sampling-consistency strategy)."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import spectrum
from pbrt_tpu.films.rgb import spectrum_to_rgb
from pbrt_tpu.lights.buffers import LightBuffers


def _li(lights, p_ref, u_sel=0.1):
    n = p_ref.shape[0]
    wl = spectrum.sample_visible(jnp.full((n,), 0.5))
    ls = lights.sample_li(
        p_ref, wl.lam, jnp.full((n,), u_sel),
        jnp.full((n, 2), 0.5), n_ref=jnp.zeros((n, 3)),
    )
    return ls, wl


def test_projection_light_frustum_and_falloff():
    lights = LightBuffers.build(
        projections=[{
            "p": (0, 0, 0), "to": (0, 0, 1), "fov": 90.0,
            "rgb": (4.0, 4.0, 4.0), "illuminant": False,
        }]
    )
    assert lights.n_proj == 1 and lights.n_lights == 1
    p_ref = jnp.asarray([
        [0.0, 0.0, 2.0],   # on-axis, inside frustum
        [0.0, 0.0, 4.0],   # farther: 1/d^2 falloff
        [10.0, 0.0, 1.0],  # far outside the 90-degree frustum
        [0.0, 0.0, -2.0],  # behind the light
    ])
    ls, wl = _li(lights, p_ref)
    L = np.asarray(ls.L)
    assert bool(np.asarray(ls.is_delta).all())
    assert L[0].mean() > 0.0
    # Inverse-square falloff between the two on-axis points.
    np.testing.assert_allclose(L[0].mean() / L[1].mean(), 4.0, rtol=0.01)
    assert L[2].mean() == 0.0
    assert L[3].mean() == 0.0
    # Spectrum ~ flat 4.0 / d^2 at d=2 => 1.0 per wavelength.
    np.testing.assert_allclose(L[0], 1.0, rtol=0.15)


def test_projection_light_image_pattern():
    img = np.zeros((8, 8, 3), np.float32)
    img[:, :4] = (5.0, 0.0, 0.0)  # left half red
    img[:, 4:] = (0.0, 0.0, 5.0)  # right half blue
    lights = LightBuffers.build(
        projections=[{
            "p": (0, 0, 0), "to": (0, 0, 1), "fov": 90.0,
            "rgb_image": img, "illuminant": False,
        }]
    )
    # Points left/right of the axis at z=1 (within the 90-deg frustum).
    p_ref = jnp.asarray([[-0.5, 0.0, 1.0], [0.5, 0.0, 1.0]])
    ls, wl = _li(lights, p_ref)
    rgb = np.asarray(spectrum_to_rgb(ls.L, wl))
    assert rgb[0].argmax() == 0, rgb  # left point lit red
    assert rgb[1].argmax() == 2, rgb  # right point lit blue


def test_goniometric_light_directional():
    # Equal-area octahedral layout: the CENTER of the square maps to +z.
    img = np.zeros((16, 16, 3), np.float32)
    img[6:10, 6:10] = (6.0, 6.0, 6.0)  # bright toward +z only
    lights = LightBuffers.build(
        gonios=[{"p": (0, 0, 0), "rgb_image": img, "illuminant": False}]
    )
    assert lights.n_gonio == 1
    p_ref = jnp.asarray([
        [0.0, 0.0, 1.0],    # toward +z: lit
        [0.0, 0.0, -1.0],   # toward -z: dark
    ])
    ls, _ = _li(lights, p_ref)
    L = np.asarray(ls.L)
    assert L[0].mean() > 0.5
    assert L[1].mean() < 1e-4


def test_proj_gonio_in_light_bvh():
    """BVH sampler builds with the new positional families and returns valid
    PMFs (index-order consistency gate)."""
    lights = LightBuffers.build(
        area_tris=[{
            "verts": np.asarray(
                [[0, 2, 0], [1, 2, 0], [0, 2, 1]], np.float32
            ),
            "rgb": (1, 1, 1), "scale": 2.0,
        }],
        points=[{"p": (3, 0, 0), "rgb": (1, 1, 1)}],
        projections=[{"p": (0, 0, 0), "to": (0, 0, 1), "fov": 60.0,
                      "rgb": (2, 2, 2)}],
        gonios=[{"p": (-2, 0, 0), "rgb": (1, 1, 1)}],
        sampler="bvh",
    )
    assert lights.bvh is not None
    assert lights.n_bvh == 4
    n = 64
    p_ref = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (n, 3)), jnp.float32
    )
    u = jnp.asarray(np.random.default_rng(1).random(n), jnp.float32)
    idx, pmf = lights.select(p_ref, jnp.zeros((n, 3)), u)
    idx = np.asarray(idx)
    pmf = np.asarray(pmf)
    assert (idx >= 0).all() and (idx < lights.n_lights).all()
    assert (pmf > 0).all() and np.isfinite(pmf).all()
    # All four lights reachable over many points.
    assert len(set(idx.tolist())) >= 3


def test_parser_projection_goniometric(tmp_path):
    scene_file = tmp_path / "proj.pbrt"
    scene_file.write_text(
        """
Film "rgb" "integer xresolution" [12] "integer yresolution" [12]
WorldBegin
LightSource "projection" "float fov" [60] "rgb I" [10 10 10]
LightSource "goniometric" "rgb I" [2 2 2]
Material "diffuse" "rgb reflectance" [0.6 0.6 0.6]
Shape "trianglemesh" "integer indices" [0 1 2]
    "point3 P" [-4 -4 6  0 4 6  4 -4 6]
"""
    )
    from pbrt_tpu.io.parser import load_pbrt
    from pbrt_tpu.render import render

    scene, camera, settings = load_pbrt(str(scene_file))
    assert scene.lights.n_proj == 1
    assert scene.lights.n_gonio == 1
    img = np.asarray(render(
        scene, camera, settings["integrator"], spp=4, samples_per_pass=2
    ))
    assert np.isfinite(img).all()
    assert img.mean() > 0.0
