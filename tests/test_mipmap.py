"""MIPMap tests (ref model: util/mipmap_test-style gates + image_test).

Checks: pyramid construction preserves energy, texel-center bilinear is
exact, trilinear LOD interpolates between levels and converges to the image
mean at the coarsest level, EWA reduces to bilinear for tiny isotropic
footprints and averages along the major axis for anisotropic ones.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core.mipmap import MIPMap, build_pyramid


def _checker(n=16):
    img = np.zeros((n, n, 3), np.float32)
    yy, xx = np.mgrid[0:n, 0:n]
    img[((yy // 2 + xx // 2) % 2) == 0] = 1.0
    return img


def test_pyramid_energy_and_shapes():
    img = np.asarray(np.random.default_rng(0).random((16, 8, 3)), np.float32)
    lv = build_pyramid(img)
    assert lv[0].shape == (16, 8, 3)
    assert lv[-1].shape == (1, 1, 3)
    # Box-filter chain preserves the mean exactly at every level.
    for l in lv[1:]:
        np.testing.assert_allclose(l.mean((0, 1)), img.mean((0, 1)), atol=1e-5)
    # Non-pow2 width pads then halves cleanly.
    lv2 = build_pyramid(np.ones((5, 3, 3), np.float32))
    assert lv2[0].shape == (8, 4, 3)


def test_bilinear_texel_centers_exact():
    img = np.asarray(np.random.default_rng(1).random((4, 4, 3)), np.float32)
    m = MIPMap.build(img)
    # Texel center (i+0.5)/n recovers the texel exactly at level 0.
    for (i, j) in [(0, 0), (1, 2), (3, 3)]:
        uv = jnp.asarray([[(j + 0.5) / 4.0, (i + 0.5) / 4.0]])
        out = np.asarray(m.lookup_trilinear(uv, jnp.asarray([1e-6])))
        np.testing.assert_allclose(out[0], img[i, j], atol=1e-5)


def test_trilinear_lod_blurs_to_mean():
    img = _checker(16)
    m = MIPMap.build(img)
    uv = jnp.asarray([[0.3, 0.7]])
    sharp = np.asarray(m.lookup_trilinear(uv, jnp.asarray([1.0 / 16])))
    # Width 1.0 => coarsest level => global mean (0.5 for the checker).
    blurred = np.asarray(m.lookup_trilinear(uv, jnp.asarray([1.0])))
    np.testing.assert_allclose(blurred[0], 0.5, atol=0.02)
    assert abs(sharp[0, 0] - 0.5) > 0.3  # level 0 still sees the pattern


def test_ewa_isotropic_matches_bilinear():
    img = np.asarray(np.random.default_rng(2).random((8, 8, 3)), np.float32)
    m = MIPMap.build(img)
    uv = jnp.asarray([[0.4375, 0.5625]])  # a texel center
    tiny = jnp.asarray([[1e-4, 0.0]])
    tiny2 = jnp.asarray([[0.0, 1e-4]])
    ewa = np.asarray(m.lookup_ewa(uv, tiny, tiny2))
    tri = np.asarray(m.lookup_trilinear(uv, jnp.asarray([1e-4])))
    np.testing.assert_allclose(ewa, tri, atol=0.02)


def test_ewa_anisotropic_averages_major_axis():
    # Vertical stripes; a footprint elongated along x must average them,
    # while one elongated along y must preserve the stripe value.
    img = np.zeros((16, 16, 3), np.float32)
    img[:, 0::2] = 1.0
    m = MIPMap.build(img)
    uv = jnp.asarray([[0.25 + 0.5 / 16, 0.5]])
    wide_x = np.asarray(
        m.lookup_ewa(uv, jnp.asarray([[0.25, 0.0]]), jnp.asarray([[0.0, 0.01]]))
    )
    wide_y = np.asarray(
        m.lookup_ewa(uv, jnp.asarray([[0.01, 0.0]]), jnp.asarray([[0.0, 0.25]]))
    )
    assert abs(wide_x[0, 0] - 0.5) < 0.2, wide_x
    # Elongated along the stripes: keeps contrast.
    assert abs(wide_y[0, 0] - 0.5) > 0.2, wide_y
