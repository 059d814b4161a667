"""Camera model tests: lens-stack optics, Navarro eye, RTF fitting.

Validation is physical: collimation at focal distance, Snell consistency,
RTF polynomial agreement with the lens camera it was fitted to.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.cameras.humaneye import HumanEyeCamera
from pbrt_tpu.cameras.lens import trace_through_stack
from pbrt_tpu.cameras.realistic import RealisticCamera, biconvex_singlet
from pbrt_tpu.cameras.rtf import fit_from_camera
from pbrt_tpu.cameras.simple import OrthographicCamera, SphericalCamera
from pbrt_tpu.core.transform import Transform


def _rng_u2(n, seed=0):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.uniform(0.05, 0.95, (n, 2)), jnp.float32)


def test_singlet_collimates_from_focal_point():
    """A film point at the focal distance emits a collimated beam."""
    f = 50.0
    lens = biconvex_singlet(focal_mm=f, aperture_mm=10.0, film_distance_mm=f)
    n = 512
    o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0]), (n, 3))
    # Aim at random points on the rear aperture.
    r = np.random.default_rng(1)
    px = r.uniform(-4, 4, n)
    py = r.uniform(-4, 4, n)
    target = jnp.asarray(np.stack([px, py, np.full(n, f)], -1), jnp.float32)
    d = (target - o) / jnp.linalg.norm(target - o, axis=-1, keepdims=True)
    o2, d2, valid = trace_through_stack(lens, o, d)
    v = np.asarray(valid)
    assert v.mean() > 0.8
    dirs = np.asarray(d2)[v]
    # Collimated: all directions near +z with small angular spread (thick
    # lens + spherical aberration allow a few degrees).
    assert dirs[:, 2].min() > 0.99
    spread = dirs[:, :2].std(axis=0)
    assert (spread < 0.02).all(), spread


def test_singlet_images_point_source():
    """Thin-lens conjugates: film at distance s' images the plane at s with
    1/s + 1/s' = 1/f: rays from an off-axis film point converge there."""
    f = 50.0
    sp = 75.0  # film distance
    s = 1.0 / (1.0 / f - 1.0 / sp)  # = 150 mm object distance
    lens = biconvex_singlet(focal_mm=f, aperture_mm=8.0, film_distance_mm=sp)
    n = 512
    o = jnp.broadcast_to(jnp.asarray([1.5, 0.0, 0.0]), (n, 3))
    r = np.random.default_rng(2)
    target = jnp.asarray(
        np.stack([r.uniform(-3, 3, n), r.uniform(-3, 3, n), np.full(n, sp)], -1),
        jnp.float32,
    )
    d = (target - o) / jnp.linalg.norm(target - o, axis=-1, keepdims=True)
    o2, d2, valid = trace_through_stack(lens, o, d)
    v = np.asarray(valid)
    o2, d2 = np.asarray(o2)[v], np.asarray(d2)[v]
    # Propagate to the conjugate plane z = sp + 2 + s (lens thickness 2).
    z_img = sp + 2.0 + s
    t = (z_img - o2[:, 2]) / d2[:, 2]
    pts = o2 + t[:, None] * d2
    # Magnification m = -s/s' = -2: image of x=+1.5 at x=-3.
    assert abs(np.median(pts[:, 0]) - (-3.0)) < 0.25, np.median(pts[:, 0])
    # Converged: small spot (aberrations allowed).
    assert pts[:, 0].std() < 0.6 and pts[:, 1].std() < 0.6


def test_realistic_camera_generates_weighted_rays():
    cam = RealisticCamera(
        camera_to_world=Transform.identity(),
        lens=biconvex_singlet(50.0, 10.0),
        resolution=(32, 32),
        film_diag_mm=20.0,
    )
    n = 1024
    r = np.random.default_rng(0)
    p_film = jnp.asarray(
        np.stack([r.uniform(0, 32, n), r.uniform(0, 32, n)], -1), jnp.float32
    )
    o, d, w = cam.generate_rays(p_film, _rng_u2(n))
    w = np.asarray(w)
    assert 0.3 < w.mean() <= 1.0  # some vignetting, mostly valid
    dz = np.asarray(d)[w > 0.5][:, 2]
    assert (dz > 0.5).all()  # rays leave toward the scene


def test_navarro_eye_focuses_at_infinity():
    cam = HumanEyeCamera.navarro(
        Transform.identity(), resolution=(16, 16), pupil_diameter_mm=3.0
    )
    n = 1024
    # Central retina point -> relaxed eye -> collimated output.
    p_film = jnp.broadcast_to(jnp.asarray([8.0, 8.0]), (n, 2))
    o, d, w = cam.generate_rays(p_film, _rng_u2(n, 3))
    ok = np.asarray(w) > 0.5
    assert ok.mean() > 0.5
    dirs = np.asarray(d)[ok]
    assert dirs[:, 2].min() > 0.98
    assert (dirs[:, :2].std(axis=0) < 0.03).all()


def test_rtf_fit_matches_lens_camera():
    cam = RealisticCamera(
        camera_to_world=Transform.identity(),
        lens=biconvex_singlet(50.0, 10.0),
        resolution=(64, 64),
        film_diag_mm=16.0,
    )
    rtf = fit_from_camera(cam, degree=3, n_train=8192)
    n = 1024
    r = np.random.default_rng(9)
    p_film = jnp.asarray(
        np.stack([r.uniform(4, 60, n), r.uniform(4, 60, n)], -1), jnp.float32
    )
    u = _rng_u2(n, 4)
    o1, d1, w1 = cam.generate_rays(p_film, u)
    o2, d2, w2 = rtf.generate_rays(p_film, u)
    both = (np.asarray(w1) > 0.5) & (np.asarray(w2) > 0.5)
    assert both.mean() > 0.5
    derr = np.linalg.norm(np.asarray(d1)[both] - np.asarray(d2)[both], axis=1)
    assert np.median(derr) < 0.01, np.median(derr)


def test_ortho_and_spherical():
    ortho = OrthographicCamera(
        camera_to_world=Transform.identity(), resolution=(8, 8)
    )
    p = jnp.asarray([[4.0, 4.0], [0.0, 0.0]])
    o, d = ortho.generate_rays(p)
    np.testing.assert_allclose(np.asarray(d), [[0, 0, 1], [0, 0, 1]], atol=1e-6)
    assert abs(float(o[0, 0])) < 1e-6  # center pixel at origin
    sph = SphericalCamera(
        camera_to_world=Transform.identity(), resolution=(16, 16)
    )
    r = np.random.default_rng(5)
    p = jnp.asarray(r.uniform(0, 16, (256, 2)), jnp.float32)
    o, d = sph.generate_rays(p)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-4
    )
    # Directions cover all octants.
    signs = set(map(tuple, np.sign(np.asarray(d)).astype(int)))
    assert len(signs) >= 6


def test_lens_file_and_exit_pupil():
    """.dat lens loading (cameras.cpp RealisticCamera::Create format) and
    exit-pupil-bounded sampling (ComputeExitPupilBounds): the pupil window
    shrinks to ~the stop image, and the weighted estimator matches
    full-disk sampling in expectation."""
    import numpy as np
    import jax.numpy as jnp

    from pbrt_tpu.cameras.lens import load_lens_file
    from pbrt_tpu.cameras.realistic import RealisticCamera
    from pbrt_tpu.core.transform import Transform

    lens = load_lens_file("examples/lenses/doublet.dat")
    assert lens.n_surfaces == 5
    # Aperture stop row: planar with 5mm radius.
    r2 = np.asarray(lens.aperture2)
    assert (np.abs(np.sqrt(r2) - 5.0) < 1e-4).any()

    c2w = Transform.identity()
    cam_ep = RealisticCamera.create(
        c2w, lens, resolution=(32, 32), exit_pupil=True
    )
    cam_full = RealisticCamera(
        camera_to_world=c2w, lens=lens, resolution=(32, 32)
    )
    assert cam_ep.pupil_bounds is not None
    b = np.asarray(cam_ep.pupil_bounds)
    rear_r = float(np.sqrt(np.asarray(lens.aperture2)[0]))
    areas = np.maximum((b[:, 1] - b[:, 0]) * (b[:, 3] - b[:, 2]), 0.0)
    disk = np.pi * rear_r * rear_r
    # The 10mm stop vignettes most of the 25mm rear element:
    assert areas.max() < 0.6 * disk, (areas.max(), disk)

    # Expectation preservation: E[w_exit_pupil] == E[valid_full_disk].
    n = 20000
    rng = np.random.default_rng(0)
    pf = jnp.asarray(
        np.tile(np.asarray([[16.0, 16.0]]), (n, 1)), jnp.float32
    )
    u = jnp.asarray(rng.random((n, 2)), jnp.float32)
    _, _, w_ep = cam_ep.generate_rays(pf, u)
    _, _, w_fd = cam_full.generate_rays(pf, u)
    m_ep = float(jnp.mean(w_ep))
    m_fd = float(jnp.mean(w_fd))
    assert m_fd > 0.0
    assert abs(m_ep - m_fd) < 0.15 * m_fd, (m_ep, m_fd)
    # Efficiency: nearly all pupil-window samples survive vs a minority of
    # full-disk samples.
    frac_ep_valid = float(jnp.mean((w_ep > 0).astype(jnp.float32)))
    frac_fd_valid = float(jnp.mean((w_fd > 0).astype(jnp.float32)))
    assert frac_ep_valid > 2.0 * frac_fd_valid, (frac_ep_valid, frac_fd_valid)


def test_parser_realistic_camera(tmp_path):
    import shutil

    import numpy as np

    shutil.copy("examples/lenses/doublet.dat", tmp_path / "lens.dat")
    scene_file = tmp_path / "cam.pbrt"
    scene_file.write_text(
        """
Camera "realistic" "string lensfile" ["lens.dat"]
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
AreaLightSource "diffuse" "rgb L" [5 5 5]
Shape "trianglemesh" "integer indices" [0 1 2]
    "point3 P" [-500 -500 2000  0 500 2000  500 -500 2000]
"""
    )
    from pbrt_tpu.io.parser import load_pbrt
    from pbrt_tpu.cameras.realistic import RealisticCamera
    from pbrt_tpu.render import render

    scene, camera, settings = load_pbrt(str(scene_file))
    assert isinstance(camera, RealisticCamera)
    img = np.asarray(render(
        scene, camera, settings["integrator"], spp=4, samples_per_pass=2
    ))
    assert np.isfinite(img).all()


def test_animated_transform_and_motion_blur():
    """AnimatedTransform interpolation endpoints/midpoint + camera motion
    blur: a moving camera smears a bright quad along the motion axis."""
    import numpy as np
    import jax.numpy as jnp

    from pbrt_tpu.core import transform as tfm
    from pbrt_tpu.core.transform import AnimatedTransform

    a = tfm.translate((0.0, 0.0, 0.0))
    b = tfm.translate((2.0, 0.0, 0.0)) @ tfm.rotate_z(90.0)
    at = AnimatedTransform.build(a, b)
    p = jnp.asarray([[1.0, 0.0, 0.0]])
    # Endpoints match the keyframes.
    np.testing.assert_allclose(
        np.asarray(at.apply_point(p, jnp.asarray([0.0]))),
        np.asarray(a.apply_point(p)), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(at.apply_point(p, jnp.asarray([1.0]))),
        np.asarray(b.apply_point(p)), atol=1e-5,
    )
    # Midpoint: rotation half way (45 deg), translation half way.
    mid = np.asarray(at.apply_point(p, jnp.asarray([0.5])))[0]
    want = np.asarray([1.0 + np.cos(np.pi / 4), np.sin(np.pi / 4), 0.0])
    np.testing.assert_allclose(mid, want, atol=1e-4)

    # Motion blur render: camera translating sideways during the shutter.
    from pbrt_tpu.lights.buffers import LightBuffers
    from pbrt_tpu.materials.buffers import MaterialBuffers
    from pbrt_tpu.models.path import PathIntegrator
    from pbrt_tpu.render import render
    from pbrt_tpu.scene import Scene
    from pbrt_tpu.shapes.geometry import GeometryBuffers
    from pbrt_tpu.cameras.perspective import PerspectiveCamera

    quad = np.asarray(
        [[[-0.2, -0.2, 4.0], [0.2, 0.2, 4.0], [0.2, -0.2, 4.0]],
         [[-0.2, -0.2, 4.0], [-0.2, 0.2, 4.0], [0.2, 0.2, 4.0]]],
        np.float32,
    )
    lights_list = [
        {"verts": quad[0][::-1].copy(), "rgb": (8, 8, 8)},
        {"verts": quad[1][::-1].copy(), "rgb": (8, 8, 8)},
    ]
    scene = Scene(
        geom=GeometryBuffers.build(
            tri_verts=quad, tri_mat=np.zeros(2, np.int32),
            tri_light=np.asarray([0, 1], np.int32),
        ),
        materials=MaterialBuffers.build([{"kind": 0, "albedo": (0.5,) * 3}]),
        lights=LightBuffers.build(area_tris=lights_list),
    )
    motion = AnimatedTransform.build(
        tfm.translate((0.0, 0.0, 0.0)), tfm.translate((1.2, 0.0, 0.0))
    )
    cam_static = PerspectiveCamera(
        camera_to_world=tfm.Transform.identity(), resolution=(32, 32),
        fov_deg=40.0,
    )
    cam_moving = cam_static.replace(motion=motion)
    img_s = np.asarray(render(
        scene, cam_static, PathIntegrator(max_depth=1), spp=16,
        samples_per_pass=4, seed=3,
    ))
    img_m = np.asarray(render(
        scene, cam_moving, PathIntegrator(max_depth=1), spp=16,
        samples_per_pass=4, seed=3,
    ))
    # The moving camera spreads the emitter across more columns.
    cols_s = (img_s.mean(axis=(0, 2)) > 0.05).sum()
    cols_m = (img_m.mean(axis=(0, 2)) > 0.05).sum()
    assert cols_m > cols_s * 1.5, (cols_s, cols_m)
    # Energy roughly conserved (smeared, not lost).
    assert abs(img_m.sum() - img_s.sum()) < 0.5 * img_s.sum()
