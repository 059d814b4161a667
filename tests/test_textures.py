"""Texture + noise tests (ref model: textures.* and util/noise.*)."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import noise, rgb2spec
from pbrt_tpu.textures.buffers import (
    TextureBuffers,
    evaluate_albedo_coeffs,
)


def test_perlin_properties():
    r = np.random.default_rng(0)
    p = jnp.asarray(r.uniform(-10, 10, (4096, 3)), jnp.float32)
    v = np.asarray(noise.perlin(p))
    assert np.isfinite(v).all()
    assert abs(v.mean()) < 0.02  # zero mean
    assert 0.05 < v.std() < 0.6
    assert np.abs(v).max() <= 1.2
    # Zero at integer lattice points.
    lattice = jnp.asarray(r.integers(-5, 5, (64, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(noise.perlin(lattice)), 0.0, atol=1e-5)
    # fBm has larger amplitude than a single octave; turbulence nonnegative.
    f = np.asarray(noise.fbm(p, octaves=5))
    t = np.asarray(noise.turbulence(p, octaves=5))
    assert f.std() > v.std() * 0.9
    assert (t >= 0).all()


def _project(coeffs):
    rgb_from_s, lam = rgb2spec._projection("srgb")
    return np.asarray(rgb2spec.eval_sigmoid(coeffs, lam) @ rgb_from_s.T)


def test_checkerboard():
    tex = TextureBuffers.build(
        [{"kind": "checker", "rgb0": (0.9, 0.1, 0.1), "rgb1": (0.1, 0.1, 0.9),
          "uscale": 2.0, "vscale": 2.0}]
    )
    uv = jnp.asarray([[0.1, 0.1], [0.6, 0.1], [0.6, 0.6], [0.1, 0.6]])
    n = uv.shape[0]
    base = jnp.zeros((n, 3))
    tid = jnp.zeros((n,), jnp.int32)
    c = evaluate_albedo_coeffs(tex, tid, uv, jnp.zeros((n, 3)), base)
    rgb = _project(c)
    # With uscale=vscale=2, cells flip at 0.5: (0,0) red, (1,0) blue,
    # (1,1) red, (0,1) blue.
    assert rgb[0][0] > 0.5 and rgb[0][2] < 0.3
    assert rgb[1][2] > 0.5 and rgb[1][0] < 0.3
    assert rgb[2][0] > 0.5
    assert rgb[3][2] > 0.5
    # tex_id -1 keeps base coefficients.
    c2 = evaluate_albedo_coeffs(
        tex, jnp.full((n,), -1, jnp.int32), uv, jnp.zeros((n, 3)), base
    )
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(base))


def test_image_texture_bilinear():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = (0.9, 0.1, 0.1)
    img[0, 1] = (0.1, 0.9, 0.1)
    img[1, 0] = (0.1, 0.1, 0.9)
    img[1, 1] = (0.8, 0.8, 0.1)
    tex = TextureBuffers.build([{"kind": "image", "rgb_image": img}])
    uv = jnp.asarray([[0.0, 0.0], [1.0 - 1e-6, 0.0], [0.0, 1.0 - 1e-6]])
    tid = jnp.zeros((3,), jnp.int32)
    c = evaluate_albedo_coeffs(
        tex, tid, uv, jnp.zeros((3, 3)), jnp.zeros((3, 3))
    )
    vals = _project(c)
    # Corner texels recovered.
    assert vals[0].argmax() == 0  # red corner
    assert vals[1].argmax() == 1  # green corner
    assert vals[2].argmax() == 2  # blue corner
    np.testing.assert_allclose(vals[0], img[0, 0], atol=0.03)


def test_textured_scene_renders():
    from pbrt_tpu.lights.buffers import LightBuffers
    from pbrt_tpu.materials.buffers import MAT_DIFFUSE, MaterialBuffers
    from pbrt_tpu.models.path import PathIntegrator
    from pbrt_tpu.render import render
    from pbrt_tpu.scene import Scene
    from pbrt_tpu.scenes.cornell import cornell_box

    scene, camera = cornell_box(resolution=(24, 24))
    tex = TextureBuffers.build(
        [{"kind": "checker", "rgb0": (0.05, 0.05, 0.05),
          "rgb1": (0.9, 0.9, 0.9), "uscale": 4.0, "vscale": 4.0}]
    )
    mats = [
        {"kind": MAT_DIFFUSE, "albedo": (0.7, 0.7, 0.7), "albedo_texture": 0},
        {"kind": MAT_DIFFUSE, "albedo": (0.65, 0.05, 0.05)},
        {"kind": MAT_DIFFUSE, "albedo": (0.12, 0.45, 0.15)},
    ]
    scene = scene.replace(
        materials=MaterialBuffers.build(mats), textures=tex
    )
    img = np.asarray(
        render(scene, camera, PathIntegrator(max_depth=3), spp=8,
               samples_per_pass=4)
    )
    assert np.isfinite(img).all()
    # Checker creates strong local contrast on the white surfaces.
    lum = img.mean(axis=-1)
    center = lum[8:20, 8:20]
    assert center.max() > 2.5 * max(center.min(), 1e-3)
