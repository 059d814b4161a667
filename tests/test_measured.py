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
