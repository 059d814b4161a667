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
    # Texel CENTERS (half-texel convention, MIPMap::Bilerp: x = u*w - 0.5).
    uv = jnp.asarray([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75]])
    tid = jnp.zeros((3,), jnp.int32)
    c = evaluate_albedo_coeffs(
        tex, tid, uv, jnp.zeros((3, 3)), jnp.zeros((3, 3))
    )
    vals = _project(c)
    # Center texels recovered. Texture space is bottom-up: lookups flip t
    # (textures.cpp:367 ImageTextureBase), so uv (0.25, 0.25) reads image
    # row 1 (the bottom row of the top-down-stored array).
    assert vals[0].argmax() == 2  # img[1, 0] blue texel
    assert vals[1].argmin() == 2  # img[1, 1] yellow (low blue)
    assert vals[2].argmax() == 0  # img[0, 0] red texel
    np.testing.assert_allclose(vals[2], img[0, 0], atol=0.03)


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


def _rgb_of(tex, tid_val, uv, p=None, n_shade=None):
    from pbrt_tpu.textures.buffers import evaluate_rgb

    n = uv.shape[0]
    tid = jnp.full((n,), tid_val, jnp.int32)
    if p is None:
        p = jnp.zeros((n, 3))
    return np.asarray(evaluate_rgb(tex, tid, uv, p, n_shade=n_shade))


def test_scale_and_mix_variants():
    tex = TextureBuffers.build([
        {"kind": "constant", "rgb0": (0.8, 0.4, 0.2)},           # 0
        {"kind": "scale", "sub0": 0, "f0": 0.5},                 # 1
        {"kind": "mix", "rgb0": (1.0, 0.0, 0.0),
         "rgb1": (0.0, 0.0, 1.0), "f0": 0.25},                   # 2
        {"kind": "mix", "sub0": 0, "sub1": 1, "f0": 1.0},        # 3
    ])
    uv = jnp.asarray([[0.3, 0.3]])
    np.testing.assert_allclose(_rgb_of(tex, 0, uv)[0], (0.8, 0.4, 0.2), atol=1e-5)
    # scale halves the referenced constant
    np.testing.assert_allclose(_rgb_of(tex, 1, uv)[0], (0.4, 0.2, 0.1), atol=1e-5)
    # mix of two constants at amount 0.25: 0.75*red + 0.25*blue
    np.testing.assert_allclose(_rgb_of(tex, 2, uv)[0], (0.75, 0.0, 0.25), atol=1e-5)
    # mix amount=1 selects sub1 (the scaled texture) — one nesting level
    np.testing.assert_allclose(_rgb_of(tex, 3, uv)[0], (0.4, 0.2, 0.1), atol=1e-5)


def test_bilerp_and_dots_and_noise_kinds():
    tex = TextureBuffers.build([
        {"kind": "bilerp", "rgb0": (0, 0, 0), "rgb1": (1, 0, 0),
         "rgb2": (0, 1, 0), "rgb3": (1, 1, 1)},                  # 0
        {"kind": "dots", "rgb0": (1, 0, 0), "rgb1": (0, 0, 1),
         "uscale": 8.0, "vscale": 8.0},                          # 1
        {"kind": "fbm"}, {"kind": "windy"}, {"kind": "wrinkled"},  # 2,3,4
    ])
    # Bilerp corners interpolate
    v = _rgb_of(tex, 0, jnp.asarray([[0.0, 0.0], [1.0 - 1e-6, 0.0],
                                     [0.5, 0.5]]))
    np.testing.assert_allclose(v[0], (0, 0, 0), atol=1e-4)
    np.testing.assert_allclose(v[1], (1, 0, 0), atol=1e-4)
    np.testing.assert_allclose(v[2], (0.5, 0.5, 0.25), atol=1e-4)
    # Dots produce both colors over the plane
    r = np.random.default_rng(0)
    uv = jnp.asarray(r.random((512, 2)), jnp.float32)
    dv = _rgb_of(tex, 1, uv)
    assert (dv[:, 0] > 0.5).any() and (dv[:, 2] > 0.5).any()
    # Noise kinds: finite, in [0, ~1.2], spatially varying
    p = jnp.asarray(r.uniform(-5, 5, (256, 3)), jnp.float32)
    for t in (2, 3, 4):
        nv = _rgb_of(tex, t, uv[:256], p)
        assert np.isfinite(nv).all()
        assert nv.std() > 1e-3


def test_mappings_and_float_channel():
    from pbrt_tpu.textures.buffers import evaluate_float

    tex = TextureBuffers.build([
        {"kind": "checker", "rgb0": (0, 0, 0), "rgb1": (1, 1, 1),
         "mapping": "planar", "aux0": (1, 0, 0), "aux1": (0, 1, 0)},  # 0
        {"kind": "checker", "rgb0": (0, 0, 0), "rgb1": (1, 1, 1),
         "mapping": "spherical", "uscale": 4.0, "vscale": 4.0},       # 1
        {"kind": "constant", "rgb0": (0.3, 0.3, 0.3)},                # 2
    ])
    # Planar mapping uses world position, not uv.
    uv = jnp.zeros((2, 2))
    p = jnp.asarray([[0.5, 0.5, 0.0], [1.5, 0.5, 0.0]])
    v = _rgb_of(tex, 0, uv, p)
    assert abs(v[0, 0] - v[1, 0]) > 0.9  # adjacent planar cells differ
    # Spherical mapping varies with direction.
    p2 = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    v2 = _rgb_of(tex, 1, uv, p2)
    assert np.isfinite(v2).all()
    # Float channel: mean of rgb.
    f = evaluate_float(
        tex, jnp.asarray([2], jnp.int32), jnp.zeros((1, 2)),
        jnp.zeros((1, 3)), jnp.asarray([0.9])
    )
    np.testing.assert_allclose(float(f[0]), 0.3, atol=1e-5)
    f2 = evaluate_float(
        tex, jnp.asarray([-1], jnp.int32), jnp.zeros((1, 2)),
        jnp.zeros((1, 3)), jnp.asarray([0.9])
    )
    np.testing.assert_allclose(float(f2[0]), 0.9, atol=1e-6)
