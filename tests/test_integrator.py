"""End-to-end integrator correctness gates.

Modeled on the reference's analytic render tests
(/root/reference/src/pbrt/cpu/integrators_test.cpp:71-97 and
CheckSceneAverage :50-64): scenes with closed-form radiance, mean within a
small tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.core import rng, spectrum
from pbrt_tpu.models.path import PathIntegrator
from pbrt_tpu.render import camera_rays, render
from pbrt_tpu.scenes.analytic import furnace_sphere_scene
from pbrt_tpu.scenes.cornell import cornell_box


def _trace_mean_spectral(scene, camera, integrator, spp=8, seed=0):
    nx, ny = camera.resolution
    npix = nx * ny
    pixel = jnp.arange(npix, dtype=jnp.int32)
    vals = []
    for s in range(spp):
        o, d, wl = camera_rays(camera, pixel, jnp.int32(s), jnp.int32(seed))
        L = integrator.trace(scene, o, d, wl, pixel, jnp.int32(s), jnp.int32(seed))
        vals.append(np.asarray(L))
    return np.mean(np.stack(vals))


def test_furnace_sphere_equilibrium():
    """rho=0.5 diffuse sphere + point light I=pi at center => L == 1.0
    at every wavelength (integrators_test.cpp:71-97 construction)."""
    scene, camera = furnace_sphere_scene(
        albedo=0.5, intensity=np.pi, resolution=(8, 8)
    )
    integrator = PathIntegrator(max_depth=16, rr_start_depth=100)
    mean = _trace_mean_spectral(scene, camera, integrator, spp=4)
    # Truncation at depth 16: error ~ 0.5^16. Tolerance matches the
    # reference's +-0.025 gate; the albedo fit contributes ~1% spectral ripple.
    assert abs(mean - 1.0) < 0.025, mean


def test_furnace_sphere_albedo_07():
    scene, camera = furnace_sphere_scene(
        albedo=0.7, intensity=np.pi, resolution=(4, 4)
    )
    integrator = PathIntegrator(max_depth=40, rr_start_depth=100)
    mean = _trace_mean_spectral(scene, camera, integrator, spp=4)
    expected = 0.7 / 0.3  # rho/(1-rho)
    assert abs(mean - expected) / expected < 0.03, mean


def test_direct_lighting_strategies_agree():
    """NEE+MIS, NEE-only, BSDF-only must converge to the same direct light.

    Scene: diffuse floor under a downward-facing area-light quad.
    """
    from pbrt_tpu.lights.buffers import LightBuffers
    from pbrt_tpu.materials.buffers import MaterialBuffers, MAT_DIFFUSE
    from pbrt_tpu.scene import Scene
    from pbrt_tpu.shapes.geometry import GeometryBuffers, make_quad

    floor = make_quad((-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2))
    # Winding chosen so the light normal is (0, -1, 0): faces the floor.
    light_quad = make_quad((-1, 2, -1), (1, 2, -1), (1, 2, 1), (-1, 2, 1))
    tri_verts = np.concatenate([floor, light_quad], axis=0)
    tri_light = np.array([-1, -1, 0, 1], np.int32)
    geom = GeometryBuffers.build(tri_verts=tri_verts, tri_light=tri_light)
    mats = MaterialBuffers.build([{"kind": MAT_DIFFUSE, "albedo": (0.8, 0.8, 0.8)}])
    lights = LightBuffers.build(
        area_tris=[
            {"verts": light_quad[0], "rgb": (1, 1, 1), "scale": 5.0,
             "illuminant": False},
            {"verts": light_quad[1], "rgb": (1, 1, 1), "scale": 5.0,
             "illuminant": False},
        ]
    )
    scene = Scene(geom=geom, materials=mats, lights=lights)

    # Rays aimed at the floor center from above-side.
    n = 4096
    pixel = jnp.arange(n, dtype=jnp.int32)
    o = jnp.broadcast_to(jnp.asarray([0.0, 1.0, -1.5]), (n, 3))
    d = jnp.broadcast_to(
        jnp.asarray([0.0, -1.0, 1.5]) / np.linalg.norm([0.0, -1.0, 1.5]),
        (n, 3),
    )
    u = rng.uniform_1d(pixel, 0, 999, 7)
    wl = spectrum.sample_uniform_hero(u)

    def run(**kw):
        integ = PathIntegrator(max_depth=2, rr_start_depth=100, **kw)
        L = integ.trace(scene, o, d, wl, pixel, jnp.int32(0), jnp.int32(1))
        return float(jnp.mean(L))

    l_mis = run()
    l_nee = run(use_mis=False)
    l_bsdf = run(use_nee=False)
    assert l_mis > 0.01
    np.testing.assert_allclose(l_nee, l_mis, rtol=0.05)
    np.testing.assert_allclose(l_bsdf, l_mis, rtol=0.08)


def test_cornell_render_smoke():
    scene, camera = cornell_box(resolution=(32, 32))
    integrator = PathIntegrator(max_depth=4)
    img = np.asarray(
        render(scene, camera, integrator, spp=8, samples_per_pass=4)
    )
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01  # light reaches the camera
    # Left third reddish vs right third greenish (color bleeding walls).
    left = img[8:24, :8].mean(axis=(0, 1))
    right = img[8:24, -8:].mean(axis=(0, 1))
    assert left[0] > left[1], left
    assert right[1] > right[0], right
    # Ceiling light region is the brightest patch.
    assert img[:6].max() > img[16:].max()


def test_cornell_specular_smoke():
    """Glass sphere + copper box variant: conductor/dielectric paths render
    finite with plausible energy (between black and the light's radiance)."""
    scene, camera = cornell_box(resolution=(32, 32), variant="specular")
    integrator = PathIntegrator(max_depth=6)
    img = np.asarray(
        render(scene, camera, integrator, spp=16, samples_per_pass=4)
    )
    assert np.isfinite(img).all()
    assert 0.01 < img.mean() < 5.0
    # Copper box region (left-center rows) should be red-tinted (Cu tint).
    box = img[10:20, 7:14].mean(axis=(0, 1))
    assert box[0] > box[2], box
