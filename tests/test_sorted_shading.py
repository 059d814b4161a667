"""Tag-sorted shading dispatch (materials/sorted.py) equivalence gates.

The sorted tier is the wavefront per-material kernel-specialization
analogue (surfscatter.cpp:39-58): results must match the lockstep masked
path bit-for-bit-per-ray (all BxDF math is per-lane; the layered walk's RNG
is keyed on direction bits, not lane index), so the gate is a tight
allclose on full renders of a multi-family scene.
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.models.path import PathIntegrator
from pbrt_tpu.render import render
from pbrt_tpu.scenes.cornell import cornell_box


def test_sorted_shading_matches_lockstep_render():
    scene, camera = cornell_box(resolution=(24, 24), variant="specular")
    scene = scene.with_accel()
    kwargs = dict(max_depth=4, rr_start_depth=4)
    img0 = np.asarray(
        render(scene, camera, PathIntegrator(**kwargs), spp=4,
               samples_per_pass=4)
    )
    # Small sort_tile so 24x24x4 rays span many tiles (uniform AND mixed).
    img1 = np.asarray(
        render(scene, camera,
               PathIntegrator(sorted_shading=True, sort_tile=256, **kwargs),
               spp=4, samples_per_pass=4)
    )
    assert np.isfinite(img1).all()
    np.testing.assert_allclose(img1, img0, rtol=2e-5, atol=2e-6)


def test_shade_sorted_all_families_match_masked():
    """Every specialized lax.switch branch must reproduce the masked
    evaluate-all path bit-for-bit through the REAL bxdf sample/evaluate/pdf
    functions — including interface (delta pass-through) and the coated
    walks. This is the gate that would have caught the MAT_INTERFACE flag
    regression (a uniform interface tile silently falling back to diffuse
    hemisphere sampling)."""
    import jax
    import jax.numpy as jnp

    from pbrt_tpu.core.spectrum import N_SPECTRUM
    from pbrt_tpu.materials import bxdf
    from pbrt_tpu.materials.buffers import (
        MAT_COATEDCONDUCTOR,
        MAT_COATEDDIFFUSE,
        MAT_CONDUCTOR,
        MAT_DIELECTRIC,
        MAT_DIFFUSE,
        MAT_DIFFUSETRANS,
        MAT_HAIR,
        MAT_INTERFACE,
        MAT_RETRO,
        MAT_THINDIELECTRIC,
        MaterialBuffers,
    )
    from pbrt_tpu.materials.sorted import possible_families, shade_sorted

    kinds = [
        MAT_DIFFUSE, MAT_CONDUCTOR, MAT_DIELECTRIC, MAT_THINDIELECTRIC,
        MAT_COATEDDIFFUSE, MAT_COATEDCONDUCTOR, MAT_DIFFUSETRANS,
        MAT_HAIR, MAT_RETRO, MAT_INTERFACE,
    ]
    mb = MaterialBuffers.build(
        [dict(kind=k, albedo=(0.6, 0.4, 0.3), roughness=0.2) for k in kinds]
    )
    # The scene flags must make every family reachable by the sorter.
    fams = set(possible_families(mb.gather(jnp.zeros((1,), jnp.int32))))
    assert set(kinds) <= fams

    n = 1536
    rng = np.random.default_rng(11)
    # Sort so several tiles are uniform over a single family (tile=128),
    # with mixed tiles at the family boundaries.
    mat_idx = jnp.asarray(np.sort(rng.integers(0, len(kinds), n)), jnp.int32)
    params = mb.gather(mat_idx)
    params["lam"] = jnp.asarray(
        rng.uniform(400.0, 700.0, (n, N_SPECTRUM)), jnp.float32
    )
    params["hair_h"] = jnp.asarray(
        rng.uniform(-0.9, 0.9, (n,)), jnp.float32
    )

    def unit(shape):
        v = rng.standard_normal(shape)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        v[np.abs(v[..., 2]) < 0.05, 2] = 0.3
        return jnp.asarray(v, jnp.float32)

    ops = {
        "wo": unit((n, 3)),
        "wi": unit((n, 3)),
        "u2": jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32),
        "uc": jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32),
    }

    def fn(pp, oo):
        return {
            "bs": bxdf.sample(pp, oo["wo"], pp["lam"], oo["u2"], oo["uc"]),
            "f": bxdf.evaluate(pp, oo["wo"], oo["wi"], pp["lam"]),
            "pdf": bxdf.pdf(pp, oo["wo"], oo["wi"]),
        }

    ref = fn(params, ops)
    out = shade_sorted(params, ops, fn, tile=128)

    # Deterministic leaves: identical math per lane, so only ULP-level
    # fusion differences between the specialized and evaluate-all traces
    # are tolerable. evaluate()'s layered walk is keyed on the GIVEN wi
    # bits (identical in both paths), so coated f/pdf are deterministic
    # here too; only bs.f of the walk families is a fresh MC estimate
    # (the sampled wi's ULP difference re-keys the walk RNG).
    for name in ("f", "pdf"):
        np.testing.assert_allclose(
            np.asarray(out[name]), np.asarray(ref[name]),
            rtol=5e-3, atol=5e-3, err_msg=name,
        )
    for name in ("wi", "pdf"):
        np.testing.assert_allclose(
            np.asarray(out["bs"][name]), np.asarray(ref["bs"][name]),
            rtol=5e-3, atol=5e-3, err_msg="bs." + name,
        )
    np.testing.assert_array_equal(
        np.asarray(out["bs"]["specular"]), np.asarray(ref["bs"]["specular"])
    )
    kindv = np.asarray(params["kind"])
    walk = np.isin(kindv, [MAT_COATEDDIFFUSE, MAT_COATEDCONDUCTOR])
    r_f = np.asarray(ref["bs"]["f"])
    o_f = np.asarray(out["bs"]["f"])
    np.testing.assert_allclose(
        o_f[~walk], r_f[~walk], rtol=1e-3, atol=1e-2, err_msg="bs.f"
    )
    # Stochastic-walk families: gate MC equivalence (finite, unbiased mean).
    assert np.isfinite(o_f[walk]).all()
    for fam in (MAT_COATEDDIFFUSE, MAT_COATEDCONDUCTOR):
        m = kindv == fam
        mr, mo = r_f[m].mean(), o_f[m].mean()
        assert abs(mr - mo) / max(mr, 1e-9) < 0.1, (fam, mr, mo)

    # The interface family specifically must keep delta pass-through
    # semantics (wi = -wo, unit throughput) through the sorted path.
    m = np.asarray(params["kind"]) == MAT_INTERFACE
    np.testing.assert_array_equal(
        np.asarray(out["bs"]["wi"])[m], -np.asarray(ops["wo"])[m]
    )
    assert np.asarray(out["bs"]["specular"])[m].all()


def test_shade_sorted_unit_roundtrip():
    """shade_sorted must return fn's outputs in original ray order for an
    arbitrary per-ray function, padding and mixed tiles included."""
    from pbrt_tpu.materials.sorted import shade_sorted

    n = 1000
    rng = np.random.default_rng(3)
    kind = jnp.asarray(
        rng.choice([0, 1, 2], size=n, p=[0.6, 0.3, 0.1]), jnp.int32
    )
    x = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    params = {
        "kind": kind,
        "any_conductor": True,
        "any_dielectric": True,
        "any_thin": False,
        "any_coated": False,
        "any_diffusetrans": False,
        "any_hair": False,
        "any_subsurface": False,
        "any_measured": False,
        "any_mix": False,
        "any_retro": False,
        "any_interface_mat": False,
    }

    def fn(pp, oo):
        k = pp["kind"].astype(jnp.float32)
        return {"y": oo["x"] * (k[:, None] + 1.0), "z": k * 2.0}

    out = shade_sorted(params, {"x": x}, fn, tile=128)
    ref = fn(params, {"x": x})
    np.testing.assert_array_equal(np.asarray(out["y"]), np.asarray(ref["y"]))
    np.testing.assert_array_equal(np.asarray(out["z"]), np.asarray(ref["z"]))
