"""Lens-stack ray tracing: conic interfaces traced with a lax.scan.

Reference analogue: RealisticCamera's element-by-element lens tracing
(/root/reference/src/pbrt/cameras.h:485-604, TraceLensesFromFilm) and the
conic/aspheric surfaces of OmniCamera/HumanEyeCamera (:607-1086). TPU
design: the element list is a small SOA of per-surface parameters; a batched
scan advances ALL rays through one surface at a time (closed-form conicoid
intersection + Snell refraction), with a validity mask instead of early
returns.

Conventions (pbrt lens files): the stack is listed front-to-back; tracing
from the film moves toward the front. We store surfaces back-to-front with
z positions precomputed; rays start at the film plane z = 0 pointing -z
... here +z toward the scene with surfaces at increasing z.

Surface model: conicoid with curvature radius R and conic constant Q:
    r^2 - 2 R z + (1 + Q) z^2 = 0    (z measured from the surface vertex)
R == 0 denotes a planar surface (aperture stop).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.pytree import pytree
from ..core.vecmath import normalize, refract

_EPS = 1e-9


@pytree
class LensStack:
    """Per-surface arrays, ordered along +z (film at z=0, scene beyond)."""

    vertex_z: jnp.ndarray  # (E,) z of each surface vertex
    radius: jnp.ndarray  # (E,) curvature radius (0 = planar)
    conic: jnp.ndarray  # (E,) conic constant Q
    aperture2: jnp.ndarray  # (E,) squared aperture radius
    eta_after: jnp.ndarray  # (E,) IOR of the medium after (z >) the surface
    eta_before: jnp.ndarray  # (E,) IOR before the surface

    @staticmethod
    def from_pbrt_elements(rows, eta_scene: float = 1.0) -> "LensStack":
        """rows: pbrt lens-file rows [curvature_radius, thickness, eta,
        aperture_diameter], listed FRONT (scene side) to BACK (film side),
        thickness = distance to the next surface toward the film
        (pbrt .dat convention, cameras.h RealisticCamera::Create).

        Returns a stack ordered film -> scene with z positions accumulated.
        """
        rows = np.asarray(rows, np.float64)
        n = rows.shape[0]
        # Walk front->back accumulating z, then flip so film is at z=0.
        z = 0.0
        zs = []
        for i in range(n):
            zs.append(z)
            z += rows[i, 1]
        total = z
        vertex_z = total - np.asarray(zs)  # distance from film plane
        # eta listed per row = IOR of the medium BEHIND the surface (toward
        # film). After flipping to film->scene order:
        order = np.argsort(vertex_z)
        vz = vertex_z[order]
        radius = rows[order, 0]
        # Build per-surface before/after IORs walking film->scene.
        eta_rows = rows[:, 2].copy()
        eta_rows[eta_rows == 0] = 1.0
        eta_behind = eta_rows[order]  # medium between this surface and next
        eta_before = eta_behind  # medium on the film side of the surface
        eta_after = np.append(eta_behind[1:], eta_scene)
        ap = rows[order, 3] / 2.0
        return LensStack(
            vertex_z=jnp.asarray(vz, jnp.float32),
            radius=jnp.asarray(radius, jnp.float32),
            conic=jnp.zeros((n,), jnp.float32),
            aperture2=jnp.asarray(ap * ap, jnp.float32),
            eta_after=jnp.asarray(eta_after, jnp.float32),
            eta_before=jnp.asarray(eta_before, jnp.float32),
        )

    @staticmethod
    def build(surfaces) -> "LensStack":
        """surfaces: list of dicts (ordered film -> scene) with keys
        z, radius, conic, aperture, eta_before, eta_after."""
        g = lambda k, d=0.0: jnp.asarray(
            [s.get(k, d) for s in surfaces], jnp.float32
        )
        ap = g("aperture", 1e3)
        return LensStack(
            vertex_z=g("z"),
            radius=g("radius"),
            conic=g("conic"),
            aperture2=ap * ap,
            eta_after=g("eta_after", 1.0),
            eta_before=g("eta_before", 1.0),
        )

    @property
    def n_surfaces(self) -> int:
        return self.vertex_z.shape[0]


def _intersect_conicoid(o, d, vz, radius, conic):
    """Ray vs conicoid surface with vertex at z = vz on the z axis.

    Returns (t, valid). Handles planar (radius == 0) surfaces.
    """
    oz = o[..., 2] - vz
    # Planar case.
    t_plane = jnp.where(jnp.abs(d[..., 2]) > _EPS, -oz / d[..., 2], -1.0)
    planar = radius == 0.0
    # Conicoid: r^2 - 2 R z + (1+Q) z^2 = 0 with r^2 = x^2 + y^2.
    k = 1.0 + conic
    ox, oy = o[..., 0], o[..., 1]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    a = dx * dx + dy * dy + k * dz * dz
    b = 2.0 * (ox * dx + oy * dy + k * oz * dz - radius * dz)
    c = ox * ox + oy * oy + k * oz * oz - 2.0 * radius * oz
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b < 0, -0.5 * (b - sq), -0.5 * (b + sq))
    t0 = jnp.where(jnp.abs(a) > _EPS, q / jnp.where(jnp.abs(a) > _EPS, a, 1.0), -1.0)
    t1 = jnp.where(jnp.abs(q) > _EPS, c / jnp.where(jnp.abs(q) > _EPS, q, 1.0), -1.0)
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)

    # Accept the nearest forward root that lies on the vertex-side cap
    # (|z_local| <= |R|); the far branch of the conicoid is not lens glass.
    def root_ok(t):
        zl = oz + t * dz
        return (t > 1e-5) & (jnp.abs(zl) <= jnp.abs(radius) * 1.0001)

    ok_lo = root_ok(tlo)
    ok_hi = root_ok(thi)
    t_conic = jnp.where(ok_lo, tlo, jnp.where(ok_hi, thi, -1.0))
    t = jnp.where(planar, t_plane, t_conic)
    valid = (t > _EPS) & jnp.where(planar, True, disc >= 0.0)
    return t, valid


def _conicoid_normal(p, vz, radius, conic):
    """Gradient of the conicoid implicit function, oriented toward -z side."""
    z = p[..., 2] - vz
    k = 1.0 + conic
    n = jnp.stack(
        [2.0 * p[..., 0], 2.0 * p[..., 1], 2.0 * k * z - 2.0 * radius],
        axis=-1,
    )
    n = normalize(n)
    # Orient consistently toward the film side (-z) so refract() receives
    # eta_after/eta_before with the normal on the incident side regardless of
    # the surface's curvature sign.
    return jnp.where((n[..., 2] > 0.0)[..., None], -n, n)


def trace_through_stack(stack: LensStack, o, d, eta_start=1.0):
    """Trace rays (film side, traveling +z) through all surfaces.

    o, d: (N, 3). Returns (o_out, d_out, valid). Uses a scan over surfaces;
    invalid rays (aperture clip, TIR, miss) carry valid=False.
    """
    n_s = stack.n_surfaces

    def body(carry, i):
        o, d, valid = carry
        vz = stack.vertex_z[i]
        radius = stack.radius[i]
        conic = stack.conic[i]
        t, ok = _intersect_conicoid(o, d, vz, radius, conic)
        p = o + t[..., None] * d
        r2 = p[..., 0] ** 2 + p[..., 1] ** 2
        ok = ok & (r2 <= stack.aperture2[i])
        is_stop = (radius == 0.0) & (stack.eta_before[i] == stack.eta_after[i])
        nrm = _conicoid_normal(p, vz, radius, conic)
        eta_rel = stack.eta_after[i] / stack.eta_before[i]
        # refract() flips the normal as needed; wi points backward from p.
        wi = -d
        v_ok, wt, _ = refract(wi, nrm, eta_rel)
        new_d = jnp.where(is_stop, d, wt)
        refr_ok = jnp.where(is_stop, True, v_ok)
        new_valid = valid & ok & refr_ok
        o_new = jnp.where(new_valid[..., None], p, o)
        d_new = jnp.where(new_valid[..., None], normalize(new_d), d)
        return (o_new, d_new, new_valid), None

    valid0 = jnp.ones(o.shape[:-1], bool)
    (o_out, d_out, valid), _ = jax.lax.scan(
        body, (o, d, valid0), jnp.arange(n_s)
    )
    return o_out, d_out, valid


def load_lens_file(path: str, eta_scene: float = 1.0) -> LensStack:
    """Parse a pbrt .dat lens description file.

    Format (cameras.cpp RealisticCamera::Create): whitespace-separated rows
    `curvature_radius thickness eta aperture_diameter`, front (scene side)
    first, '#' comments. Distances in mm; eta 0 means air; radius 0 marks
    the aperture stop plane.
    """
    rows = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            vals = [float(v) for v in line.split()]
            if len(vals) != 4:
                raise ValueError(f"bad lens row: {line!r}")
            rows.append(vals)
    if not rows:
        raise ValueError(f"empty lens file: {path}")
    return LensStack.from_pbrt_elements(np.asarray(rows, np.float64),
                                        eta_scene=eta_scene)
