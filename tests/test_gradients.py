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


def test_roughness_gradient_matches_fd():
    """Conductor roughness: reverse-mode vs FD. Uses the attached estimator
    (replay_grad=False): the default detached path detaches sampled
    directions, which matches FD only in expectation, while the attached
    path is per-sample exact for fixed RNG."""
    from pbrt_tpu.materials.buffers import MAT_CONDUCTOR, MaterialBuffers
    from pbrt_tpu.scenes.cornell import cornell_box

    scene, camera = cornell_box(resolution=(8, 8))
    nmat = int(scene.materials.kind.shape[0])
    integ = PathIntegrator(max_depth=3, rr_start_depth=100,
                           replay_grad=False)

    base_rough = jnp.full((nmat,), 0.35, jnp.float32)
    kinds = np.asarray(scene.materials.kind)
    kinds2 = np.where(np.arange(nmat) == 0, MAT_CONDUCTOR, kinds)
    mats = scene.materials.replace(
        kind=jnp.asarray(kinds2), any_conductor=True
    )

    def loss(rough):
        s = scene.replace(materials=mats.replace(roughness=rough))
        return _mean_image(s, camera, integ)

    _check_grad(loss, base_rough, eps=5e-3, rtol=0.08, n_check=2)


def test_ior_gradient_matches_fd():
    """Dielectric IOR (eta) gradient vs FD (attached estimator)."""
    from pbrt_tpu.materials.buffers import MAT_DIELECTRIC

    scene, camera = cornell_box(resolution=(8, 8))
    nmat = int(scene.materials.kind.shape[0])
    integ = PathIntegrator(max_depth=3, rr_start_depth=100,
                           replay_grad=False)
    kinds = np.asarray(scene.materials.kind)
    kinds2 = np.where(np.arange(nmat) == 1, MAT_DIELECTRIC, kinds)
    mats = scene.materials.replace(
        kind=jnp.asarray(kinds2), any_dielectric=True,
        roughness=jnp.full((nmat,), 0.25, jnp.float32),
    )
    base_eta = jnp.full((nmat,), 1.5, jnp.float32)

    def loss(eta):
        s = scene.replace(materials=mats.replace(eta=eta))
        return _mean_image(s, camera, integ)

    _check_grad(loss, base_eta, eps=5e-3, rtol=0.08, n_check=1)


def test_detached_default_matches_attached_for_albedo():
    """The default detached (remat) estimator and the attached plain-AD
    estimator agree exactly for parameters that do not influence sampling
    (albedo) — the detachment only drops sampling-Jacobian terms."""
    scene, camera = cornell_box(resolution=(8, 8))
    i_det = PathIntegrator(max_depth=3, rr_start_depth=100)
    i_att = PathIntegrator(max_depth=3, rr_start_depth=100,
                           replay_grad=False)

    def loss(coeffs, integ):
        s = scene.replace(
            materials=scene.materials.replace(albedo_coeffs=coeffs)
        )
        return _mean_image(s, camera, integ)

    g1 = np.asarray(jax.grad(lambda c: loss(c, i_det))(
        scene.materials.albedo_coeffs))
    g2 = np.asarray(jax.grad(lambda c: loss(c, i_att))(
        scene.materials.albedo_coeffs))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-7)


def test_texture_texel_gradient_matches_fd():
    """Image-texture texel gradients: d(loss)/d(texel rgb coeffs) vs FD."""
    from pbrt_tpu.scenes.cornell import cornell_box
    from pbrt_tpu.textures.buffers import TextureBuffers

    scene, camera = cornell_box(resolution=(8, 8))
    rng = np.random.default_rng(3)
    tex_rgb = rng.uniform(0.2, 0.8, (4, 4, 3)).astype(np.float32)
    textures = TextureBuffers.build(
        [{"kind": "image", "rgb_image": tex_rgb}]
    )
    # Point material 0 (the floor/walls material in slot 0) at texture 0.
    nmat = int(scene.materials.kind.shape[0])
    atex = np.full((nmat,), -1, np.int32)
    atex[0] = 0
    mats = scene.materials.replace(albedo_tex=jnp.asarray(atex))
    scene = scene.replace(materials=mats, textures=textures)
    integ = PathIntegrator(max_depth=2, rr_start_depth=100)

    def loss(flat):
        s = scene.replace(
            textures=scene.textures.replace(img_flat=flat)
        )
        return _mean_image(s, camera, integ)

    theta = scene.textures.img_flat
    _check_grad(loss, theta, eps=1e-2, rtol=0.06, n_check=2)
