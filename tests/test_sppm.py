"""SPPM correctness gates.

Modeled on the reference's integrator-consistency strategy
(/root/reference/src/pbrt/cpu/integrators_test.cpp): the sorted-hash-grid
range query is checked exactly against brute force, and the full integrator
must converge toward the Path integrator's image (up to the density-
estimation bias of a finite starting radius).
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.models.path import PathIntegrator
from pbrt_tpu.models.sppm import SPPMIntegrator
from pbrt_tpu.render import render
from pbrt_tpu.scenes.cornell import cornell_box


def test_grid_range_query_matches_brute_force():
    """Every (photon, visible point) pair within the radius must be reachable
    through the sorted-hash-grid: entry ranges + K-candidate scan."""
    rng = np.random.default_rng(7)
    nvp, nph = 64, 128
    vp_p = jnp.asarray(rng.uniform(0, 4, (nvp, 3)), jnp.float32)
    radius = jnp.asarray(rng.uniform(0.1, 0.4, (nvp,)), jnp.float32)
    vp_set = jnp.asarray(rng.random(nvp) < 0.9)
    ph_p = jnp.asarray(rng.uniform(0, 4, (nph, 3)), jnp.float32)

    integ = SPPMIntegrator()
    hash_size = 256
    grid = integ._build_grid(vp_p, radius, vp_set, hash_size)

    from pbrt_tpu.models.sppm import _cell_hash

    c = jnp.floor((ph_p - grid["lo"][None]) / grid["cell"]).astype(jnp.int32)
    h = _cell_hash(c[:, 0], c[:, 1], c[:, 2], hash_size)
    start = jnp.searchsorted(grid["hash"], h, side="left")
    end = jnp.searchsorted(grid["hash"], h, side="right")

    found = np.zeros((nph, nvp), bool)
    for j in range(nph):
        for k in range(int(start[j]), int(end[j])):
            vp = int(grid["pix"][k])
            d2 = float(jnp.sum((vp_p[vp] - ph_p[j]) ** 2))
            if d2 <= float(radius[vp]) ** 2 and bool(vp_set[vp]):
                found[j, vp] = True

    d2 = np.sum(
        (np.asarray(ph_p)[:, None] - np.asarray(vp_p)[None]) ** 2, -1
    )
    want = (d2 <= np.asarray(radius)[None] ** 2) & np.asarray(vp_set)[None]
    # The grid may propose extra candidates (hash collisions) — those are
    # rejected by the distance test above; it must never MISS a true pair.
    assert (found == want).all(), (found.sum(), want.sum())


def test_sppm_converges_to_path_cornell():
    """SPPM total (Ld + photon tau) vs Path on the Cornell box. The starting
    radius induces blur, so gate on mean energy + spatial correlation rather
    than the tight +-0.025 pointwise gate."""
    scene, camera = cornell_box(resolution=(16, 16))
    img_p = np.asarray(
        render(scene, camera, PathIntegrator(max_depth=4), spp=64, seed=1)
    )
    integ = SPPMIntegrator(max_depth=4, photons_per_iteration=4096)
    img_s, stats = integ.render(
        scene, camera, n_iterations=24, seed=2, return_stats=True
    )
    img_s = np.asarray(img_s)
    assert np.all(np.isfinite(img_s))
    mp, ms = img_p.mean(), img_s.mean()
    assert abs(mp - ms) < 0.15 * mp, (mp, ms)
    corr = np.corrcoef(img_p.mean(-1).ravel(), img_s.mean(-1).ravel())[0, 1]
    assert corr > 0.85, corr
    # Radii must have contracted from the start value.
    assert float(np.asarray(stats["radius"]).mean()) < integ_initial_radius(
        scene, camera
    )


def integ_initial_radius(scene, camera):
    nx, ny = camera.resolution
    tv = np.asarray(scene.geom.tri_verts).reshape(-1, 3)
    diag = float(np.linalg.norm(tv.max(0) - tv.min(0)))
    return 2.0 * diag / max(nx, ny)


def test_sppm_specular_caustic_smoke():
    """Specular Cornell variant: photons through the glass sphere must
    deposit energy (a caustic Path with NEE cannot efficiently find)."""
    scene, camera = cornell_box(resolution=(12, 12), variant="specular")
    integ = SPPMIntegrator(max_depth=4, photons_per_iteration=2048)
    img = np.asarray(integ.render(scene, camera, n_iterations=6, seed=3))
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.01
