"""Alpha-masked geometry: cutouts in closest-hit and shadow paths.

Reference: GeometricPrimitive alpha (cpu/primitive.h:59-63,
cpu/primitive.cpp Intersect's alpha re-trace loop) and the GPU any-hit
alpha programs (gpu/optix.cu).
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.accel import api as accel_api
from pbrt_tpu.io.parser import load_pbrt_string


_HEAD = """
Camera "perspective" "float fov" [40]
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
LightSource "point" "point3 from" [0 0 -5] "rgb I" [50 50 50]
"""

_FRONT_QUAD = """
  Shape "trianglemesh" {alpha}
    "point3 P" [ -2 -2 1   2 -2 1   2 2 1   -2 2 1 ]
    "integer indices" [ 0 1 2  0 2 3 ]
"""

_BACK_QUAD = """
  Shape "trianglemesh"
    "point3 P" [ -2 -2 3   2 -2 3   2 2 3   -2 2 3 ]
    "integer indices" [ 0 1 2  0 2 3 ]
"""


def _frontal_rays(n=256):
    r = np.random.default_rng(0)
    xy = r.uniform(-1.5, 1.5, (n, 2)).astype(np.float32)
    o = np.concatenate(
        [xy, np.full((n, 1), -2.0, np.float32)], axis=1
    )
    d = np.tile(np.array([[0, 0, 1]], np.float32), (n, 1))
    return jnp.asarray(o), jnp.asarray(d)


def test_alpha_zero_is_invisible():
    """alpha 0 shapes are fully cut: rays see the back quad; shadow rays
    pass through."""
    text = (_HEAD
            + _FRONT_QUAD.format(alpha='"float alpha" [0]')
            + _BACK_QUAD)
    scene, _, _ = load_pbrt_string(text)
    assert scene.geom.has_alpha
    o, d = _frontal_rays()
    isect = accel_api.closest(scene, o, d)
    assert bool(np.asarray(isect.valid).all())
    np.testing.assert_allclose(np.asarray(isect.p)[:, 2], 3.0, atol=1e-3)
    # Shadow segment crossing only the alpha-0 quad: unoccluded.
    tm = jnp.full((o.shape[0],), 4.0)
    occ = accel_api.any_hit(scene, o, d, tm)
    # The opaque back quad at t=5 is beyond tmax=4... front quad at t=3
    # is alpha-0 -> no occlusion.
    assert not bool(np.asarray(occ).any())


def test_alpha_one_matches_opaque():
    text_a = (_HEAD
              + _FRONT_QUAD.format(alpha='"float alpha" [1]')
              + _BACK_QUAD)
    text_o = _HEAD + _FRONT_QUAD.format(alpha="") + _BACK_QUAD
    sc_a, _, _ = load_pbrt_string(text_a)
    sc_o, _, _ = load_pbrt_string(text_o)
    assert not sc_a.geom.has_alpha  # alpha==1 is opaque, no restart loop
    o, d = _frontal_rays()
    a = accel_api.closest(sc_a, o, d)
    b = accel_api.closest(sc_o, o, d)
    np.testing.assert_allclose(
        np.asarray(a.p), np.asarray(b.p), atol=1e-5
    )


def test_alpha_texture_cutout():
    """A 0/1 checker alpha texture cuts exactly the zero cells."""
    text = (_HEAD + """
Texture "holes" "float" "checkerboard"
  "rgb tex1" [0 0 0] "rgb tex2" [1 1 1]
  "float uscale" [2] "float vscale" [2]
""" + _FRONT_QUAD.format(alpha='"texture alpha" ["holes"]')
            + _BACK_QUAD)
    scene, _, _ = load_pbrt_string(text)
    assert scene.geom.has_alpha
    o, d = _frontal_rays(512)
    isect = accel_api.closest(scene, o, d)
    z = np.asarray(isect.p)[:, 2]
    hit_front = np.abs(z - 1.0) < 1e-3
    hit_back = np.abs(z - 3.0) < 1e-3
    # Both populations exist (some rays cut through, some blocked).
    assert hit_front.sum() > 50
    assert hit_back.sum() > 50
    assert bool((hit_front | hit_back).all())


def test_alpha_stochastic_fraction():
    """alpha 0.5 passes ~half the rays through (stochastic test)."""
    text = (_HEAD
            + _FRONT_QUAD.format(alpha='"float alpha" [0.5]')
            + _BACK_QUAD)
    scene, _, _ = load_pbrt_string(text)
    o, d = _frontal_rays(2048)
    isect = accel_api.closest(scene, o, d)
    z = np.asarray(isect.p)[:, 2]
    frac_through = float((np.abs(z - 3.0) < 1e-3).mean())
    assert 0.38 < frac_through < 0.62
