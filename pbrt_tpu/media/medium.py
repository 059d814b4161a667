"""Medium representation: homogeneous or density-grid, with majorant grid.

Reference analogue: HomogeneousMedium (/root/reference/src/pbrt/media.h:217),
GridMedium (:265), MajorantGrid (:105-133), DDAMajorantIterator (:136-214).

TPU design: ONE scene-level medium occupying a world AABB (vacuum outside);
`kind` is static so the integrator compiles the right sampling loop. The
density grid is a dense (nz, ny, nx) tensor sampled trilinearly (a fused
gather-free-ish lookup on the VPU); the majorant grid is a coarse max-pool of
sigma_t * density used by the DDA walk. Nested/per-shape media arrive with
the medium-interface tier.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import rgb2spec
from ..core.pytree import pytree, static_field

MEDIUM_NONE = "none"
MEDIUM_HOMOGENEOUS = "homogeneous"
MEDIUM_GRID = "grid"


@pytree
class MediumBuffers:
    # Spectral scattering parameters (sigmoid fits x scale).
    sigma_a_coeffs: jnp.ndarray  # (3,)
    sigma_a_scale: jnp.ndarray  # ()
    sigma_s_coeffs: jnp.ndarray  # (3,)
    sigma_s_scale: jnp.ndarray  # ()
    g: jnp.ndarray  # () HG asymmetry
    # Emission (grid media): L_e = Le_scale * blackbody-ish fit x density>0.
    le_coeffs: jnp.ndarray  # (3,)
    le_scale: jnp.ndarray  # ()
    # Bounds of the medium in world space.
    bounds_lo: jnp.ndarray  # (3,)
    bounds_hi: jnp.ndarray  # (3,)
    # Density grid (kind == grid); (nz, ny, nx), unit-scaled.
    density: jnp.ndarray
    # Coarse majorant grid of density maxima, (mz, my, mx).
    maj_grid: jnp.ndarray
    # Global density maximum (scalar) — the wavelength-independent majorant
    # is sigma_t_max * max_density.
    max_density: jnp.ndarray
    kind: str = static_field(default=MEDIUM_NONE)

    @staticmethod
    def none() -> "MediumBuffers":
        z3 = jnp.zeros((3,), jnp.float32)
        z = jnp.zeros((), jnp.float32)
        one = jnp.ones((1, 1, 1), jnp.float32)
        return MediumBuffers(
            sigma_a_coeffs=z3, sigma_a_scale=z, sigma_s_coeffs=z3,
            sigma_s_scale=z, g=z, le_coeffs=z3, le_scale=z,
            bounds_lo=z3, bounds_hi=z3, density=one, maj_grid=one,
            max_density=jnp.ones((), jnp.float32),
            kind=MEDIUM_NONE,
        )

    @staticmethod
    def homogeneous(
        sigma_a_rgb, sigma_s_rgb, bounds_lo, bounds_hi, g=0.0, scale=1.0
    ) -> "MediumBuffers":
        sa_c, sa_s = rgb2spec.fit_unbounded(
            jnp.asarray(sigma_a_rgb, jnp.float32) * scale
        )
        ss_c, ss_s = rgb2spec.fit_unbounded(
            jnp.asarray(sigma_s_rgb, jnp.float32) * scale
        )
        z3 = jnp.zeros((3,), jnp.float32)
        one = jnp.ones((1, 1, 1), jnp.float32)
        return MediumBuffers(
            sigma_a_coeffs=sa_c, sigma_a_scale=sa_s,
            sigma_s_coeffs=ss_c, sigma_s_scale=ss_s,
            g=jnp.asarray(g, jnp.float32),
            le_coeffs=z3, le_scale=jnp.zeros((), jnp.float32),
            bounds_lo=jnp.asarray(bounds_lo, jnp.float32),
            bounds_hi=jnp.asarray(bounds_hi, jnp.float32),
            density=one, maj_grid=one,
            max_density=jnp.ones((), jnp.float32),
            kind=MEDIUM_HOMOGENEOUS,
        )

    @staticmethod
    def grid(
        density, sigma_a_rgb, sigma_s_rgb, bounds_lo, bounds_hi,
        g=0.0, scale=1.0, le_rgb=None, le_scale=0.0, maj_res=16,
    ) -> "MediumBuffers":
        """density: (nz, ny, nx) array; sigma_{a,s} scaled by local density."""
        density = np.asarray(density, np.float32)
        sa_c, sa_s = rgb2spec.fit_unbounded(
            jnp.asarray(sigma_a_rgb, jnp.float32) * scale
        )
        ss_c, ss_s = rgb2spec.fit_unbounded(
            jnp.asarray(sigma_s_rgb, jnp.float32) * scale
        )
        if le_rgb is None:
            le_c = jnp.zeros((3,), jnp.float32)
            le_s = jnp.zeros((), jnp.float32)
        else:
            le_c, le_s = rgb2spec.fit_unbounded(
                jnp.asarray(le_rgb, jnp.float32) * le_scale
            )
        # Majorant grid: max-pool of density onto maj_res^3 cells, then a
        # one-cell dilation so trilinear lookups near cell borders never
        # exceed the local majorant (MajorantGrid semantics, media.h:105).
        m = maj_res

        def _ceil_pad(d):
            nz, ny, nx = d.shape
            pads = [(-s) % m for s in (nz, ny, nx)]
            return np.pad(d, [(0, p) for p in pads], mode="edge")

        dp = _ceil_pad(density)
        z, y, x = dp.shape
        maj = dp.reshape(m, z // m, m, y // m, m, x // m).max(axis=(1, 3, 5))
        padded = np.pad(maj, 1, mode="edge")
        maj = np.maximum.reduce(
            [
                padded[dz : dz + m, dy : dy + m, dx : dx + m]
                for dz in (0, 1, 2)
                for dy in (0, 1, 2)
                for dx in (0, 1, 2)
            ]
        )
        return MediumBuffers(
            sigma_a_coeffs=sa_c, sigma_a_scale=sa_s,
            sigma_s_coeffs=ss_c, sigma_s_scale=ss_s,
            g=jnp.asarray(g, jnp.float32),
            le_coeffs=le_c, le_scale=le_s,
            bounds_lo=jnp.asarray(bounds_lo, jnp.float32),
            bounds_hi=jnp.asarray(bounds_hi, jnp.float32),
            density=jnp.asarray(density),
            maj_grid=jnp.asarray(maj),
            max_density=jnp.asarray(float(density.max()), jnp.float32),
            kind=MEDIUM_GRID,
        )

    # -- device-side queries (batched over rays) ----------------------------

    @property
    def is_none(self) -> bool:
        return self.kind == MEDIUM_NONE

    @property
    def emissive(self) -> bool:
        return self.kind == MEDIUM_GRID

    def bounds_segment(self, o, d, t_max):
        """Clip rays to the medium AABB: returns (t0, t1) with t1 <= t_max
        and t1 <= t0 where the ray misses the bounds."""
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        ta = (self.bounds_lo[None] - o) * inv
        tb = (self.bounds_hi[None] - o) * inv
        tlo = jnp.minimum(ta, tb)
        thi = jnp.maximum(ta, tb)
        t0 = jnp.maximum(jnp.max(tlo, axis=-1), 0.0)
        t1 = jnp.minimum(jnp.min(thi, axis=-1), t_max)
        return t0, t1

    def density_at(self, p):
        """Trilinear density lookup at world points p: (N,) in [0, max]."""
        if self.kind != MEDIUM_GRID:
            return jnp.ones(p.shape[:-1], p.dtype)
        nz, ny, nx = self.density.shape
        res = jnp.asarray([nx, ny, nz], jnp.float32)
        g = (p - self.bounds_lo[None]) / jnp.maximum(
            self.bounds_hi[None] - self.bounds_lo[None], 1e-12
        )
        # Voxel-centered samples (pbrt GridMedium convention).
        gc = g * res - 0.5
        gi = jnp.floor(gc)
        f = gc - gi
        gi = gi.astype(jnp.int32)

        def tap(dx, dy, dz):
            xi = jnp.clip(gi[..., 0] + dx, 0, nx - 1)
            yi = jnp.clip(gi[..., 1] + dy, 0, ny - 1)
            zi = jnp.clip(gi[..., 2] + dz, 0, nz - 1)
            return self.density[zi, yi, xi]

        fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
        d00 = tap(0, 0, 0) * (1 - fx) + tap(1, 0, 0) * fx
        d10 = tap(0, 1, 0) * (1 - fx) + tap(1, 1, 0) * fx
        d01 = tap(0, 0, 1) * (1 - fx) + tap(1, 0, 1) * fx
        d11 = tap(0, 1, 1) * (1 - fx) + tap(1, 1, 1) * fx
        d0 = d00 * (1 - fy) + d10 * fy
        d1 = d01 * (1 - fy) + d11 * fy
        inside = jnp.all((g >= 0.0) & (g <= 1.0), axis=-1)
        return jnp.where(inside, d0 * (1 - fz) + d1 * fz, 0.0)

    def sigma_base(self, lam):
        """Unit-density (sigma_a, sigma_s) spectra at sampled wavelengths."""
        sa = rgb2spec.eval_unbounded(
            self.sigma_a_coeffs[None], self.sigma_a_scale[None], lam
        )
        ss = rgb2spec.eval_unbounded(
            self.sigma_s_coeffs[None], self.sigma_s_scale[None], lam
        )
        return sa, ss

    def sigma_majorant(self, lam):
        """Wavelength-independent majorant (N,) >= sigma_t(lambda, p) for all
        lambda and p: max over the sampled-lambda axis x max density."""
        sa, ss = self.sigma_base(lam)
        return jnp.max(sa + ss, axis=-1) * self.max_density

    def le_at(self, p, lam):
        """Volumetric emission radiance (GridMedium Le, media.h:265)."""
        le = rgb2spec.eval_unbounded(
            self.le_coeffs[None], self.le_scale[None], lam
        )
        dens = self.density_at(p)
        return jnp.where((dens > 0.0)[..., None], le, 0.0)
