"""Omni-camera tier: aspherics, HURB diffraction, microlens arrays, .json
lens loading (OmniCamera, reference cameras.cpp:2471-3390)."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from pbrt_tpu.cameras.lens import (
    LensStack, trace_through_stack, _sag, _sag_prime,
)
from pbrt_tpu.cameras.realistic import (
    MicrolensArray, RealisticCamera, biconvex_singlet, load_lens_json,
    omni_camera,
)
from pbrt_tpu.core.transform import Transform


def test_aspheric_zero_matches_conic():
    """Newton-refined aspheric path with zero coefficients reproduces the
    closed-form conic intersection exactly."""
    lens = biconvex_singlet(50.0, 10.0)
    lens_asp = lens.replace(
        aspheric=jnp.zeros((lens.n_surfaces, 4)), has_aspheric=True
    )
    n = 256
    u = np.random.default_rng(0).uniform(-1, 1, (n, 2)) * 8.0
    o = jnp.asarray(np.concatenate(
        [u * 0.2, np.zeros((n, 1))], axis=1), jnp.float32)
    tgt = jnp.asarray(np.concatenate(
        [u, np.full((n, 1), 50.0)], axis=1), jnp.float32)
    d = (tgt - o) / jnp.linalg.norm(tgt - o, axis=-1, keepdims=True)
    o1, d1, v1 = trace_through_stack(lens, o, d)
    o2, d2, v2 = trace_through_stack(lens_asp, o, d)
    assert bool(jnp.all(v1 == v2))
    m = np.asarray(v1)
    assert np.allclose(np.asarray(o1)[m], np.asarray(o2)[m], atol=1e-4)
    assert np.allclose(np.asarray(d1)[m], np.asarray(d2)[m], atol=1e-4)


def test_sag_prime_is_derivative():
    r2 = jnp.linspace(0.01, 20.0, 50)
    for radius, conic in ((40.0, 0.0), (-30.0, -0.8), (25.0, 1.5)):
        asp = jnp.asarray([1e-5, -2e-7])
        import jax

        g = jax.vmap(jax.grad(lambda x: _sag(x, radius, conic, asp)))(r2)
        sp = _sag_prime(r2, radius, conic, asp)
        assert np.allclose(np.asarray(g), np.asarray(sp), rtol=1e-3)


def test_aspheric_changes_focus():
    """Nonzero aspheric coefficients must bend marginal rays differently."""
    lens = biconvex_singlet(50.0, 10.0)
    asp = jnp.zeros((lens.n_surfaces, 2)).at[1, 0].set(5e-5)
    lens_asp = lens.replace(aspheric=asp, has_aspheric=True)
    o = jnp.asarray([[0.0, 0.0, 0.0]] * 8, jnp.float32)
    xs = np.linspace(2.0, 8.0, 8)
    tgt = jnp.asarray(np.stack(
        [xs, np.zeros(8), np.full(8, 50.0)], axis=-1), jnp.float32)
    d = (tgt - o) / jnp.linalg.norm(tgt - o, axis=-1, keepdims=True)
    _, d1, v1 = trace_through_stack(lens, o, d)
    _, d2, v2 = trace_through_stack(lens_asp, o, d)
    m = np.asarray(v1 & v2)
    assert m.any()
    diff = np.abs(np.asarray(d1) - np.asarray(d2))[m].max()
    assert diff > 1e-4


def _psf_spread(diffraction, pupil_mm, n=4096, wl=550.0):
    """Angular spread of an axial bundle through a singlet with the given
    stop, with/without HURB."""
    # Symmetric singlet with an explicit stop plane inside the glass.
    stop_r = pupil_mm / 2.0
    stack = LensStack.build([
        {"z": 50.0, "radius": 2.0 * 0.5 * 50.0, "conic": 0.0,
         "aperture": 25.0, "eta_before": 1.0, "eta_after": 1.5},
        {"z": 51.0, "radius": 0.0, "conic": 0.0, "aperture": stop_r,
         "eta_before": 1.5, "eta_after": 1.5},
        {"z": 52.0, "radius": -2.0 * 0.5 * 50.0, "conic": 0.0,
         "aperture": 25.0, "eta_before": 1.5, "eta_after": 1.0},
    ])
    cam = RealisticCamera(
        camera_to_world=Transform.identity(), lens=stack,
        resolution=(64, 64), diffraction=diffraction,
        # Concentrate the sampled rear window near the tiny stop so a
        # useful fraction of the bundle survives.
        rear_radius_scale=float(stop_r * 1.3 / 25.0),
    )
    rng = np.random.default_rng(1)
    p_film = jnp.asarray(np.full((n, 2), 32.0), jnp.float32)
    u = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    _, d, w = cam.generate_rays(p_film, u, wavelength_nm=wl)
    d = np.asarray(d)[np.asarray(w) > 0]
    # Spread = std of direction about the bundle mean.
    mu = d.mean(0)
    mu /= np.linalg.norm(mu)
    return float(np.degrees(np.arccos(np.clip(d @ mu, -1, 1)).std()))


def test_hurb_broadens_small_apertures_more():
    base_small = _psf_spread(False, 0.05)
    hurb_small = _psf_spread(True, 0.05)
    base_large = _psf_spread(False, 2.0)
    hurb_large = _psf_spread(True, 2.0)
    # Diffraction adds spread, and adds much more at the tiny stop.
    assert hurb_small > base_small + 0.05
    added_small = hurb_small - base_small
    added_large = max(hurb_large - base_large, 1e-4)
    assert added_small > 5.0 * added_large


def test_hurb_wavelength_scaling():
    """Longer wavelengths diffract more (sigma ~ lambda)."""
    red = _psf_spread(True, 0.05, wl=700.0)
    blue = _psf_spread(True, 0.05, wl=420.0)
    assert red > blue


def _micro_stack(offset=2.0, pitch_mm=0.45, r=1.0):
    # One plano-convex bump per cell: curved surface then planar exit.
    # f = R/(n-1) = 2 mm at the 2 mm sensor offset, so film-point bundles
    # leave roughly collimated into the main lens' acceptance cone (the
    # f-number-matching rule of plenoptic designs).
    return LensStack.build([
        {"z": offset, "radius": r, "conic": 0.0, "aperture": pitch_mm,
         "eta_before": 1.0, "eta_after": 1.5},
        {"z": offset + 0.2, "radius": 0.0, "conic": 0.0,
         "aperture": pitch_mm, "eta_before": 1.5, "eta_after": 1.0},
    ])


def test_microlens_rays_trace_and_decenters_shift():
    main = biconvex_singlet(50.0, 12.5)
    ml = MicrolensArray(
        stack=_micro_stack(), dims=(32, 32), offset_from_sensor=2.0,
    )
    cam = omni_camera(Transform.identity(), (64, 64), main, microlens=ml)
    rng = np.random.default_rng(2)
    # Central film region: the 35mm film square is wider than the 12.5mm
    # lens aperture, so extreme corners vignette as they physically should.
    p_film = jnp.asarray(rng.uniform(16, 48, (512, 2)), jnp.float32)
    u = jnp.asarray(rng.uniform(0, 1, (512, 2)), jnp.float32)
    o, d, w = cam.generate_rays(p_film, u)
    w = np.asarray(w)
    assert (w > 0).mean() > 0.2  # a solid fraction survives both stacks
    assert np.isfinite(np.asarray(o)).all() and np.isfinite(np.asarray(d)).all()
    # Decentring every microlens must change the surviving directions.
    ml_off = ml.replace(
        offsets=jnp.full((32 * 32, 2), 0.1, jnp.float32)
    )
    cam2 = cam.replace(microlens=ml_off)
    _, d2, w2 = cam2.generate_rays(p_film, u)
    m = (w > 0) & (np.asarray(w2) > 0)
    assert m.any()
    assert np.abs(np.asarray(d2)[m] - np.asarray(d)[m]).max() > 1e-4


def test_lens_json_roundtrip(tmp_path):
    spec = {
        "description": "test doublet with microlens",
        "surfaces": [
            {"radius": 48.0, "thickness": 2.0,
             "ior": [[400.0, 700.0], [1.52, 1.50]],
             "semi_aperture": 10.0, "conic_constant": -0.5,
             "aspheric_coefficients": [1e-6]},
            {"radius": 0.0, "thickness": 1.0, "ior": 0,
             "semi_aperture": 4.0},
            {"radius": -48.0, "thickness": 47.0, "ior": 0,
             "semi_aperture": 10.0},
        ],
        "microlens": {
            "dimensions": [8, 8],
            "offsets": [[0.0, 0.0]] * 64,
            "surfaces": [
                {"radius": 2.0, "thickness": 0.2, "ior": 1.5,
                 "semi_aperture": 1.0},
                {"radius": 0.0, "thickness": 0.8, "ior": 0,
                 "semi_aperture": 1.0},
            ],
        },
    }
    path = tmp_path / "lens.json"
    path.write_text(json.dumps(spec))
    lens, micro = load_lens_json(str(path), microlens_sensor_offset_mm=1.0)
    assert lens.n_surfaces == 3
    assert lens.has_aspheric
    # Spectral IOR interpolated at 550nm: 1.52 + (1.50-1.52)*150/300 = 1.51.
    etas = np.asarray(lens.eta_before).tolist() + \
        np.asarray(lens.eta_after).tolist()
    assert any(abs(e - 1.51) < 1e-3 for e in etas)
    assert micro is not None and micro.dims == (8, 8)
    assert micro.stack.n_surfaces == 2
    # Rear microlens vertex rebased onto the sensor-offset plane.
    assert abs(float(micro.stack.vertex_z.min()) - 1.0) < 1e-5
    cam = omni_camera(Transform.identity(), (32, 32), lens, microlens=micro)
    rng = np.random.default_rng(3)
    p_film = jnp.asarray(rng.uniform(0, 32, (256, 2)), jnp.float32)
    u = jnp.asarray(rng.uniform(0, 1, (256, 2)), jnp.float32)
    _, d, w = cam.generate_rays(p_film, u)
    assert (np.asarray(w) > 0).any()
    assert np.isfinite(np.asarray(d)).all()


def test_parser_omni_binding(tmp_path):
    spec = {
        "surfaces": [
            {"radius": 48.0, "thickness": 2.0, "ior": 1.5,
             "semi_aperture": 10.0},
            {"radius": -48.0, "thickness": 47.0, "ior": 0,
             "semi_aperture": 10.0},
        ],
    }
    (tmp_path / "omni.json").write_text(json.dumps(spec))
    (tmp_path / "scene.pbrt").write_text(
        'Camera "omni" "string lensfile" "omni.json" '
        '"bool diffractionEnabled" true\n'
        'Film "rgb" "integer xresolution" 16 "integer yresolution" 16\n'
        "WorldBegin\n"
        'AttributeBegin\n'
        '  AreaLightSource "diffuse" "rgb L" [5 5 5]\n'
        '  Shape "sphere" "float radius" 0.5\n'
        'AttributeEnd\n'
    )
    from pbrt_tpu.io.parser import load_pbrt

    _, camera, settings = load_pbrt(str(tmp_path / "scene.pbrt"))
    assert isinstance(camera, RealisticCamera)
    assert camera.diffraction
    assert camera.lens.n_surfaces == 2
    for wtext in settings["warnings"]:
        assert "falling back" not in wtext, wtext


def test_humaneye_hurb_runs():
    from pbrt_tpu.cameras.humaneye import HumanEyeCamera

    cam = HumanEyeCamera.navarro(
        Transform.identity(), (32, 32), pupil_diameter_mm=0.5
    ).replace(diffraction=True)
    rng = np.random.default_rng(5)
    p_film = jnp.asarray(rng.uniform(0, 32, (256, 2)), jnp.float32)
    u = jnp.asarray(rng.uniform(0, 1, (256, 2)), jnp.float32)
    o, d, w = cam.generate_rays(p_film, u, wavelength_nm=550.0)
    assert (np.asarray(w) > 0).any()
    assert np.isfinite(np.asarray(d)).all()
