"""Differentiable-rendering gates: reverse-mode gradients vs finite
differences (the BASELINE.json correctness target — no reference analogue;
pbrt-v4 is not differentiable).

Continuous scene parameters (albedo coefficients, emission scale, medium
sigma) get exact reverse-mode gradients through shading, emission, and
transmittance; geometry/discrete events are detached by design.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.models.path import PathIntegrator
from pbrt_tpu.models.volpath import VolPathIntegrator
from pbrt_tpu.render import camera_rays
from pbrt_tpu.scenes.cornell import cornell_box
from pbrt_tpu.scenes.cloud import fog_box_scene


def _mean_image(scene, camera, integrator, spp=4, seed=0):
    nx, ny = camera.resolution
    npix = nx * ny
    pixel = jnp.tile(jnp.arange(npix, dtype=jnp.int32), (spp,))
    sample = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), npix)
    o, d, wl = camera_rays(camera, pixel, sample, jnp.int32(seed))
    L = integrator.trace(scene, o, d, wl, pixel, sample, jnp.int32(seed))
    return jnp.mean(L)


def _check_grad(loss_fn, theta0, eps, rtol, n_check=3):
    """Reverse-mode dloss/dtheta vs central finite differences."""
    g = np.asarray(jax.grad(loss_fn)(theta0))
    t0 = np.asarray(theta0)
    flat_idx = np.argsort(-np.abs(g.ravel()))[:n_check]
    for i in flat_idx:
        tp = t0.ravel().copy()
        tm = t0.ravel().copy()
        tp[i] += eps
        tm[i] -= eps
        lp = float(loss_fn(jnp.asarray(tp.reshape(t0.shape))))
        lm = float(loss_fn(jnp.asarray(tm.reshape(t0.shape))))
        fd = (lp - lm) / (2 * eps)
        ad = g.ravel()[i]
        assert abs(fd - ad) <= rtol * max(abs(fd), abs(ad), 1e-6), (
            i, fd, ad
        )


def test_albedo_gradient_matches_fd():
    scene, camera = cornell_box(resolution=(8, 8))
    integ = PathIntegrator(max_depth=3, rr_start_depth=100)

    def loss(coeffs):
        s = scene.replace(
            materials=scene.materials.replace(albedo_coeffs=coeffs)
        )
        return _mean_image(s, camera, integ)

    # Same RNG stream on every evaluation -> FD is exact up to fp error.
    _check_grad(loss, scene.materials.albedo_coeffs, eps=1e-2, rtol=0.05)


def test_emission_gradient_matches_fd():
    scene, camera = cornell_box(resolution=(8, 8))
    integ = PathIntegrator(max_depth=2, rr_start_depth=100)

    def loss(scale):
        s = scene.replace(lights=scene.lights.replace(area_scale=scale))
        return _mean_image(s, camera, integ)

    g = np.asarray(jax.grad(loss)(scene.lights.area_scale))
    # Emission is linear in scale: grad == loss(1)/scale numerically.
    base = float(loss(scene.lights.area_scale))
    eps = 0.1
    up = float(loss(scene.lights.area_scale + eps))
    fd = (up - base) / eps
    assert abs(g.sum() - fd) <= 0.03 * max(abs(fd), 1e-6), (g.sum(), fd)
    assert (g > 0).all()  # brighter light -> brighter image


def test_medium_sigma_gradient_matches_fd():
    scene, camera = fog_box_scene(sigma_a=0.8, sigma_s=0.0, le_scale=5.0)
    integ = VolPathIntegrator(
        max_depth=2, rr_start_depth=100, use_nee=False, max_null_steps=32,
        max_tr_steps=32, differentiable=True,
    )

    def loss(sa_scale):
        s = scene.replace(
            medium=scene.medium.replace(sigma_a_scale=sa_scale)
        )
        return _mean_image(s, camera, integ, spp=48)

    theta = scene.medium.sigma_a_scale
    g = float(jax.grad(loss)(theta))
    # Average central differences at two step sizes: the detached majorant
    # means FD re-samples collision counts, adding discretization noise that
    # the reverse-mode estimator does not see.
    fds = []
    for eps in (0.05, 0.1):
        lp = float(loss(theta + eps))
        lm = float(loss(theta - eps))
        fds.append((lp - lm) / (2 * eps))
    fd = float(np.mean(fds))
    # Denser absorbing fog -> darker image; gradients agree within MC noise.
    assert g < 0 and fd < 0, (g, fd)
    assert abs(fd - g) <= 0.35 * max(abs(fd), abs(g)), (g, fd)
