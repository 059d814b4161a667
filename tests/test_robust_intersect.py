"""Robust-intersection gates: watertight shared edges + interval-bounded
sphere quadrics (reference shapes.h:110-180 Sphere::BasicIntersect and
shapes.h:820-930 watertight TriangleIntersect).
"""

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.accel import dense


def _rot(seed):
    rng = np.random.default_rng(seed)
    a, b = rng.uniform(0, 2 * np.pi, 2)
    ca, sa, cb, sb = np.cos(a), np.sin(a), np.cos(b), np.sin(b)
    r1 = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]], np.float32)
    r2 = np.array([[1, 0, 0], [0, cb, -sb], [0, sb, cb]], np.float32)
    return (r1 @ r2).astype(np.float32)


def test_watertight_shared_edge_no_cracks():
    """Rays through the shared diagonal of a rotated quad always hit one
    of the two triangles (shapes.h watertight guarantee). The edge points
    are float32 lerps of the exact shared vertices."""
    misses = 0
    for seed in range(8):
        r = _rot(seed)
        off = np.asarray([0.123, -4.567, 2.891], np.float32)
        quad = np.asarray(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        ) @ r.T + off
        # Shared diagonal: quad[0] -- quad[2].
        tris = np.stack(
            [np.stack([quad[0], quad[1], quad[2]]),
             np.stack([quad[0], quad[2], quad[3]])]
        )
        soa, tp = dense._tri_soa(jnp.asarray(tris))
        blk = {k: v for k, v in soa.items()}
        n = 256
        s = np.linspace(0.001, 0.999, n, dtype=np.float32)[:, None]
        # Points exactly on the shared edge (float32 arithmetic).
        pts = quad[0] * (1 - s) + quad[2] * s
        normal = r[:, 2]
        o = jnp.asarray(pts + normal * 3.0)
        d = jnp.asarray(np.tile(-normal, (n, 1)))
        tmax = jnp.full((n,), jnp.inf, jnp.float32)
        t, u, v = dense._intersect_tri_block_wt(o, d, tmax, blk)
        hit_any = np.isfinite(np.asarray(t)).any(axis=1)
        misses += int((~hit_any).sum())
    assert misses == 0


def test_watertight_matches_mt_off_edges():
    """Away from edges the watertight tester agrees with Moller-Trumbore."""
    rng = np.random.default_rng(3)
    tris = rng.uniform(-1, 1, (64, 3, 3)).astype(np.float32)
    soa, tp = dense._tri_soa(jnp.asarray(tris))
    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    dr = rng.normal(size=(n, 3)).astype(np.float32)
    dr /= np.linalg.norm(dr, axis=1, keepdims=True)
    d = jnp.asarray(dr)
    tmax = jnp.full((n,), jnp.inf, jnp.float32)
    t_wt, u_wt, v_wt = dense._intersect_tri_block_wt(o, d, tmax, soa)
    t_mt, u_mt, v_mt = dense._intersect_tri_block(o, d, tmax, soa)
    hw = np.isfinite(np.asarray(t_wt))
    hm = np.isfinite(np.asarray(t_mt))
    # Random rays are (a.s.) never exactly on an edge: decisions agree.
    assert (hw == hm).mean() > 0.9999
    both = hw & hm
    np.testing.assert_allclose(
        np.asarray(t_wt)[both], np.asarray(t_mt)[both], rtol=2e-3,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(u_wt)[both], np.asarray(u_mt)[both], atol=2e-3
    )


def test_interval_sphere_grazing_far():
    """Distant large sphere: the float32 naive quadratic suffers
    catastrophic cancellation; the interval version must classify
    clear hits / clear misses correctly and place accepted hits on the
    surface (float64 oracle)."""
    r_s = 1000.0
    sph = jnp.asarray([[0.0, 0.0, 0.0, r_s]], jnp.float32)
    blk, _ = dense._sph_soa(sph)
    n = 1024
    rng = np.random.default_rng(5)
    # Impact parameters: clearly inside, clearly outside, and grazing.
    b_par = np.concatenate([
        rng.uniform(0, 990, n // 2),
        rng.uniform(1010, 2000, n // 4),
        rng.uniform(999.9, 1000.1, n // 4),
    ]).astype(np.float32)
    o_np = np.stack(
        [np.full_like(b_par, 50000.0), b_par, np.zeros_like(b_par)], -1
    )
    d_np = np.tile(np.asarray([[-1.0, 0, 0]], np.float32), (len(b_par), 1))
    o, d = jnp.asarray(o_np), jnp.asarray(d_np)
    tmax = jnp.full((len(b_par),), jnp.inf, jnp.float32)
    t = np.asarray(dense._intersect_sph_block(o, d, tmax, blk))[:, 0]
    hit = np.isfinite(t)

    # float64 oracle
    oc = o_np.astype(np.float64)
    bq = np.sum(oc * d_np, axis=1)
    cq = np.sum(oc * oc, axis=1) - r_s * r_s
    disc = bq * bq - cq
    clear_hit = disc > 1e-1 * r_s  # comfortably inside
    clear_miss = disc < -1e-1 * r_s
    assert hit[clear_hit].all(), "clear hits must not be dropped"
    assert not hit[clear_miss].any(), "clear misses must not hit"
    # Accepted hits land on the surface.
    p = o_np[hit] + t[hit, None] * d_np[hit]
    dist = np.linalg.norm(p.astype(np.float64), axis=1)
    np.testing.assert_allclose(dist, r_s, rtol=1e-3)


def test_interval_sphere_regular_scene_unchanged():
    """Ordinary spheres: interval version matches the float64 oracle."""
    rng = np.random.default_rng(7)
    sph = np.concatenate(
        [rng.uniform(-3, 3, (16, 3)), rng.uniform(0.2, 1.0, (16, 1))], 1
    ).astype(np.float32)
    blk, _ = dense._sph_soa(jnp.asarray(sph))
    n = 2048
    o_np = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    tmax = jnp.full((n,), jnp.inf, jnp.float32)
    t = np.asarray(
        dense._intersect_sph_block(
            jnp.asarray(o_np), jnp.asarray(d_np), tmax, blk
        )
    )[:, :16]

    oc = o_np[:, None, :].astype(np.float64) - sph[None, :, :3]
    bq = np.sum(oc * d_np[:, None, :], axis=-1)
    cq = np.sum(oc * oc, axis=-1) - sph[None, :, 3] ** 2
    disc = bq * bq - cq
    sq = np.sqrt(np.maximum(disc, 0))
    t0, t1 = -bq - sq, -bq + sq
    t_ref = np.where(t0 > 0, t0, t1)
    hit_ref = (disc > 0) & (t_ref > 0)
    hit = np.isfinite(t)
    # Agreement away from measure-zero grazing boundaries.
    assert (hit == hit_ref).mean() > 0.9999
    both = hit & hit_ref
    np.testing.assert_allclose(t[both], t_ref[both], rtol=1e-3, atol=1e-3)


def test_watertight_jit_matches_eager_on_degenerate_pads():
    """Regression (round 5): the FMA-contraction DifferenceOfProducts
    idiom produced jit-only false hits on all-zero pad triangles (XLA CSE
    killed one contraction of the pair). Dekker splitting must keep jit
    and eager bitwise-consistent, and zero triangles must never hit."""
    import jax

    rng = np.random.default_rng(11)
    tris = np.zeros((8, 3, 3), np.float32)  # all degenerate
    tris[:4] = rng.uniform(-1, 1, (4, 3, 3)).astype(np.float32)
    soa, _ = dense._tri_soa(jnp.asarray(tris))
    n = 512
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    d = jnp.asarray(d_np)
    tmax = jnp.full((n,), jnp.inf, jnp.float32)
    t_e, _, _ = dense._intersect_tri_block_wt(o, d, tmax, soa)
    t_j, _, _ = jax.jit(dense._intersect_tri_block_wt)(o, d, tmax, soa)
    np.testing.assert_array_equal(
        np.isfinite(np.asarray(t_e)), np.isfinite(np.asarray(t_j))
    )
    # Degenerate (zero) triangles never hit, under jit or eager.
    assert not np.isfinite(np.asarray(t_j)[:, 4:8]).any()
