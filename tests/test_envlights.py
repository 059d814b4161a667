"""Environment-map lights + power light sampler tests."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import rng, spectrum
from pbrt_tpu.core.vecmath import length
from pbrt_tpu.lights.buffers import LightBuffers
from pbrt_tpu.lights.envmap import EnvironmentMap
from pbrt_tpu.materials.buffers import MAT_DIFFUSE, MaterialBuffers
from pbrt_tpu.models.path import PathIntegrator
from pbrt_tpu.render import camera_rays
from pbrt_tpu.scene import Scene
from pbrt_tpu.shapes.geometry import GeometryBuffers, make_quad


def _u2(n, seed=0):
    i = jnp.arange(n, dtype=jnp.int32)
    a, b = rng.uniform_2d(i, 0, 0, seed)
    return jnp.stack([a, b], axis=-1)


def test_env_sample_pdf_consistency():
    r = np.random.default_rng(0)
    img = r.uniform(0.1, 1.0, (32, 32, 3)).astype(np.float32)
    img[5:9, 20:24] *= 40.0  # bright patch
    env = EnvironmentMap.build(img)
    n = 8192
    wi, L, pdf = env.sample(_u2(n), spectrum.sample_uniform_hero(jnp.zeros(n)).lam)
    np.testing.assert_allclose(np.asarray(length(wi)), 1.0, atol=1e-4)
    pdf2 = env.pdf_dir(wi)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=2e-2)
    # MC integral of pdf over the sphere == 1 (estimate with uniform dirs).
    d = np.asarray(_u2(n, 3))
    from pbrt_tpu.core.sampling import sample_uniform_sphere

    dirs = sample_uniform_sphere(jnp.asarray(d))
    est = float(jnp.mean(env.pdf_dir(dirs)) * 4.0 * jnp.pi)
    assert abs(est - 1.0) < 0.05, est


def test_env_importance_targets_bright_patch():
    img = np.full((16, 16, 3), 0.01, np.float32)
    img[2, 3] = 100.0
    env = EnvironmentMap.build(img)
    wi, L, pdf = env.sample(
        _u2(4096, 1), spectrum.sample_uniform_hero(jnp.zeros(4096)).lam
    )
    # Nearly all samples land on the bright texel (pdf >> uniform).
    frac_bright = float(jnp.mean((pdf > 10.0 / (4 * jnp.pi)).astype(jnp.float32)))
    assert frac_bright > 0.9, frac_bright


def test_white_furnace_with_env():
    """Furnace theorem: a diffuse floor under a constant unit environment
    reflects exactly albedo * 1 (+ direct env visibility) -> every pixel
    equals 1 when albedo == 1 (here 0.8 checks energy bookkeeping:
    L = direct_env_miss? no — camera ray hits floor: L = rho * 1)."""
    floor = make_quad((-50, 0, -50), (50, 0, -50), (50, 0, 50), (-50, 0, 50))
    geom = GeometryBuffers.build(tri_verts=floor)
    mats = MaterialBuffers.build([{"kind": MAT_DIFFUSE, "albedo": (0.8,) * 3}])
    img = np.ones((8, 8, 3), np.float32)
    lights = LightBuffers.build(envmap=EnvironmentMap.build(img))
    scene = Scene(geom=geom, materials=mats, lights=lights)

    n = 2048
    pixel = jnp.arange(n, dtype=jnp.int32)
    o = jnp.broadcast_to(jnp.asarray([0.0, 3.0, 0.0]), (n, 3))
    d = jnp.broadcast_to(
        jnp.asarray([0.2, -1.0, 0.1]) / np.linalg.norm([0.2, -1.0, 0.1]), (n, 3)
    )
    u = rng.uniform_1d(pixel, 0, 99, 1)
    wl = spectrum.sample_uniform_hero(u)
    integ = PathIntegrator(max_depth=6, rr_start_depth=100)
    L = integ.trace(scene, o, d, wl, pixel, jnp.int32(0), jnp.int32(0))
    mean = float(jnp.mean(L))
    # Multi-bounce on rho=0.8 floor under unit env: the exact answer for a
    # single infinite plane is rho (each bounce either escapes to the env or
    # re-hits the plane; geometric series sums to rho). Within MC noise:
    expected = 0.8
    assert abs(mean - expected) < 0.04, mean


def test_power_sampler_reduces_variance():
    """1 bright + 63 dim lights: power selection cuts direct-light variance."""
    quads = []
    specs_common = []
    r = np.random.default_rng(2)
    for i in range(64):
        x = (i % 8) * 2.0 - 7.0
        z = (i // 8) * 2.0 - 7.0
        q = make_quad(
            (x - 0.2, 4.0, z - 0.2), (x + 0.2, 4.0, z - 0.2),
            (x + 0.2, 4.0, z + 0.2), (x - 0.2, 4.0, z + 0.2),
        )
        scale = 200.0 if i == 27 else 0.05
        for k in range(2):
            quads.append(q[k])
            specs_common.append(
                {"verts": q[k], "rgb": (1, 1, 1), "scale": scale,
                 "illuminant": False}
            )
    tri_verts = np.stack(quads)
    tri_light = np.arange(len(quads), dtype=np.int32)
    geom = GeometryBuffers.build(tri_verts=tri_verts, tri_light=tri_light)
    mats = MaterialBuffers.build([{"kind": MAT_DIFFUSE, "albedo": (0.7,) * 3}])

    floor = make_quad((-9, 0, -9), (9, 0, -9), (9, 0, 9), (-9, 0, 9))
    tri_verts = np.concatenate([tri_verts, floor])
    tri_light = np.concatenate([tri_light, [-1, -1]]).astype(np.int32)
    geom = GeometryBuffers.build(tri_verts=tri_verts, tri_light=tri_light)

    def run(sampler):
        lights = LightBuffers.build(area_tris=specs_common, sampler=sampler)
        scene = Scene(geom=geom, materials=mats, lights=lights)
        n = 16384
        pixel = jnp.arange(n, dtype=jnp.int32)
        o = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
        d = jnp.broadcast_to(
            jnp.asarray([0.3, -1.0, 0.2]) / np.linalg.norm([0.3, -1.0, 0.2]),
            (n, 3),
        )
        wl = spectrum.sample_uniform_hero(jnp.full((n,), 0.4))
        integ = PathIntegrator(max_depth=2, rr_start_depth=100)
        L = integ.trace(scene, o, d, wl, pixel, jnp.int32(0), jnp.int32(0))
        vals = np.asarray(jnp.mean(L, axis=-1))
        return vals.mean(), vals.var()

    m_u, v_u = run("uniform")
    m_p, v_p = run("power")
    # Unbiased: means agree within MC noise of the high-variance uniform
    # estimator; power selection slashes per-sample variance.
    se = float(np.sqrt(v_u / 16384) * 4 + 0.02)
    assert abs(m_u - m_p) < se + 0.1 * max(m_u, m_p), (m_u, m_p, se)
    assert v_p < 0.25 * v_u, (v_p, v_u)


def test_spot_light_cone():
    """Spot falloff: full intensity inside falloffStart, zero outside cone."""
    from pbrt_tpu.core import rng as rngmod

    floor = make_quad((-10, 0, -10), (10, 0, -10), (10, 0, 10), (-10, 0, 10))
    geom = GeometryBuffers.build(tri_verts=floor)
    mats = MaterialBuffers.build([{"kind": MAT_DIFFUSE, "albedo": (1.0,) * 3}])
    lights = LightBuffers.build(
        spots=[{"p": (0, 4, 0), "to": (0, 0, 0), "rgb": (1, 1, 1),
                "scale": 10.0, "coneangle": 20.0, "conedelta": 5.0,
                "illuminant": False}]
    )
    scene = Scene(geom=geom, materials=mats, lights=lights)
    n = 512
    pixel = jnp.arange(n, dtype=jnp.int32)
    wl = spectrum.sample_uniform_hero(jnp.full((n,), 0.3))
    integ = PathIntegrator(max_depth=1, rr_start_depth=100)

    def probe(x):
        # Ray straight down onto the floor at (x, 0, 0).
        o = jnp.broadcast_to(jnp.asarray([x, 2.0, 0.0]), (n, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))
        L = integ.trace(scene, o, d, wl, pixel, jnp.int32(0), jnp.int32(0))
        return float(jnp.mean(L))

    inside = probe(0.0)  # on the axis -> full intensity
    outside = probe(3.0)  # tan(20 deg) * 4 = 1.46 -> x=3 is outside the cone
    assert inside > 0.1, inside
    assert outside < 1e-5, outside


def test_manylight_scene_renders():
    """BASELINE config 3 shape: 1024 area lights + power sampler."""
    from pbrt_tpu.render import render
    from pbrt_tpu.scenes.manylight import manylight_scene

    scene, camera = manylight_scene(resolution=(24, 24), n_lights=256)
    assert scene.lights.n_area == 512  # 2 triangles per panel
    assert scene.lights.sampler == "power"
    img = np.asarray(
        render(scene, camera, PathIntegrator(max_depth=3), spp=4,
               samples_per_pass=2)
    )
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
