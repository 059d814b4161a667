"""Measured-BRDF gates: bake an analytic GGX conductor into the table and
require the tabulated material to reproduce it (ref model: MeasuredBxDF,
bxdfs.h:1155 — validated here against its own source data since no .bsdf
assets ship with the reference checkout)."""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import spectrum
from pbrt_tpu.materials.bxdf import conductor_f
from pbrt_tpu.materials.measured import MeasuredBRDF, bake_measured


def _ggx_rgb(alpha):
    eta = (0.2, 0.92, 1.1)
    k = (3.9, 2.45, 2.14)

    def f(wo, wi):
        n = wo.shape[0]
        out = []
        for c in range(3):
            e = jnp.full((n, 1), eta[c])
            kk = jnp.full((n, 1), k[c])
            out.append(
                conductor_f(e, kk, jnp.full((n,), alpha), wo, wi)[:, 0]
            )
        return jnp.stack(out, -1)

    return f


def _dirs(n, seed):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d[:, 2] = np.abs(d[:, 2]) + 0.1
    return jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                       jnp.float32)


def test_measured_reproduces_baked_brdf():
    f_rgb = _ggx_rgb(0.3)
    m = MeasuredBRDF.from_table(bake_measured(f_rgb))
    wo, wi = _dirs(2048, 0), _dirs(2048, 1)
    wl = spectrum.sample_visible(jnp.full((2048,), 0.5))
    fm = np.asarray(m.f(wo, wi, wl.lam)).mean(-1)
    fa = np.asarray(f_rgb(wo, wi)).mean(-1)
    ok = fa > 1e-3
    rel = np.abs(fm[ok] - fa[ok]) / np.maximum(fa[ok], 1e-3)
    assert np.median(rel) < 0.10, np.median(rel)
    cw = np.asarray(wi[:, 2])
    ratio = (fm * cw).mean() / (fa * cw).mean()
    assert 0.9 < ratio < 1.15, ratio
    # Opposite hemispheres: zero.
    assert float(m.f(wo, -wi, wl.lam).max()) == 0.0
    # Reciprocity (table is stored in reciprocal coordinates).
    f_ab = np.asarray(m.f(wo[:64], wi[:64], wl.lam[:64]))
    f_ba = np.asarray(m.f(wi[:64], wo[:64], wl.lam[:64]))
    np.testing.assert_allclose(f_ab, f_ba, rtol=1e-4, atol=1e-5)


def test_measured_material_dispatch_and_render(tmp_path):
    """Full pipeline: .npy table -> parser -> bxdf dispatch -> render; the
    measured copy of a conductor renders close to the analytic original."""
    from pbrt_tpu.io.parser import load_pbrt
    from pbrt_tpu.render import render

    tab = bake_measured(_ggx_rgb(0.4))
    np.save(tmp_path / "copper.npy", tab)
    base = """
Integrator "path" "integer maxdepth" [3]
Film "rgb" "integer xresolution" [12] "integer yresolution" [12]
WorldBegin
AreaLightSource "diffuse" "rgb L" [4 4 4]
Shape "trianglemesh" "integer indices" [0 1 2]
    "point3 P" [-2 2 4  2 2 4  0 2 8]
Material {MAT}
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point3 P" [-6 -1 1  6 -1 1  6 -1 12  -6 -1 12]
"""
    imgs = {}
    for name, mat in [
        ("measured", '"measured" "string filename" ["copper.npy"]'),
        ("analytic",
         '"conductor" "string conductor" ["Cu"] "float roughness" [0.16]'),
    ]:
        f = tmp_path / f"{name}.pbrt"
        f.write_text(base.replace("{MAT}", mat))
        scene, camera, settings = load_pbrt(str(f))
        imgs[name] = np.asarray(render(
            scene, camera, settings["integrator"], spp=16, samples_per_pass=4
        ))
        assert np.isfinite(imgs[name]).all()
    mm, ma = imgs["measured"].mean(), imgs["analytic"].mean()
    assert mm > 0.0
    # Same material family baked both ways: means within 35% (different
    # eta/k RGB projections + table quantization).
    assert abs(mm - ma) < 0.35 * max(mm, ma), (mm, ma)


def test_mix_material(tmp_path):
    """MixMaterial: stochastic blend of two named materials — the rendered
    mean sits between the two constituents, ordered by amount."""
    from pbrt_tpu.io.parser import load_pbrt
    from pbrt_tpu.render import render

    base = """
Integrator "path" "integer maxdepth" [2]
Film "rgb" "integer xresolution" [12] "integer yresolution" [12]
WorldBegin
AreaLightSource "diffuse" "rgb L" [4 4 4]
Shape "trianglemesh" "integer indices" [0 1 2]
    "point3 P" [-2 2 4  2 2 4  0 2 8]
MakeNamedMaterial "bright" "string type" "diffuse"
    "rgb reflectance" [0.9 0.9 0.9]
MakeNamedMaterial "dark" "string type" "diffuse"
    "rgb reflectance" [0.05 0.05 0.05]
Material "mix" "string materials" ["bright" "dark"] "float amount" [{A}]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
    "point3 P" [-6 -1 1  6 -1 1  6 -1 12  -6 -1 12]
"""
    means = {}
    for a in (0.1, 0.9):
        f = tmp_path / f"mix{a}.pbrt"
        f.write_text(base.replace("{A}", str(a)))
        scene, camera, settings = load_pbrt(str(f))
        img = np.asarray(render(
            scene, camera, settings["integrator"], spp=16, samples_per_pass=4
        ))
        assert np.isfinite(img).all()
        means[a] = img.mean()
    # amount = P(first = bright): 0.9 must render clearly brighter.
    assert means[0.9] > means[0.1] * 1.3, means


def test_mix_resolution_fraction():
    """surface_params resolves MAT_MIX to sub-material m0 with probability
    `amount` (the MixMaterial ChooseMaterial draw)."""
    from pbrt_tpu.accel import api as accel_api
    from pbrt_tpu.lights.buffers import LightBuffers
    from pbrt_tpu.materials import bxdf
    from pbrt_tpu.materials.buffers import MAT_MIX, MaterialBuffers
    from pbrt_tpu.scene import Scene
    from pbrt_tpu.shapes.geometry import GeometryBuffers

    tri = np.asarray([[[-50, 0, -50], [50, 0, -50], [0, 0, 80]]], np.float32)
    mats = [
        {"kind": 0, "albedo": (0.9, 0.1, 0.1)},
        {"kind": 0, "albedo": (0.1, 0.1, 0.9)},
        {"kind": MAT_MIX, "mix_m0": 0, "mix_m1": 1, "mix_amount": 0.3},
    ]
    scene = Scene(
        geom=GeometryBuffers.build(
            tri_verts=tri, tri_mat=np.asarray([2], np.int32),
            tri_light=np.asarray([-1], np.int32),
        ),
        materials=MaterialBuffers.build(mats),
        lights=LightBuffers.build(),
    )
    n = 8192
    rng = np.random.default_rng(0)
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = rng.uniform(-20, 20, n)
    o[:, 2] = rng.uniform(-20, 20, n)
    o[:, 1] = 5.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 1] = -np.abs(d[:, 1]) - 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    isect = accel_api.closest(scene, jnp.asarray(o), jnp.asarray(d))
    from pbrt_tpu.core import spectrum as spec

    wl = spec.sample_visible(jnp.full((n,), 0.5))
    params = bxdf.surface_params(scene, isect, wl.lam)
    hit = np.asarray(isect.valid)
    from pbrt_tpu.core import rgb2spec

    # m0 fraction via spectral classification: the red sub-material is
    # brighter at 640 nm than 460 nm; the blue one is the reverse.
    lam_red = jnp.full((n, 1), 640.0)
    lam_blue = jnp.full((n, 1), 460.0)
    a_r = np.asarray(rgb2spec.eval_sigmoid(params["albedo_coeffs"], lam_red))[:, 0]
    a_b = np.asarray(rgb2spec.eval_sigmoid(params["albedo_coeffs"], lam_blue))[:, 0]
    frac_m0 = (a_r > a_b)[hit].mean()
    assert abs(frac_m0 - 0.3) < 0.03, frac_m0
