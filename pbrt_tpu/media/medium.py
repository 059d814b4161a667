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
MEDIUM_RGBGRID = "rgbgrid"
MEDIUM_CLOUD = "cloud"

# med_inside/med_outside sentinel values (per-material interface fields).
MED_KEEP = -2  # no interface on this surface: crossing keeps the ray medium
MED_VACUUM = -1


@pytree
class MediumStack:
    """Named homogeneous interior media addressed by a per-ray index.

    Reference analogue: per-primitive MediumInterface (media.h:55-80 +
    cpu/integrators.cpp VolPathIntegrator ray.medium threading): each
    dielectric-bounded shape can carry an interior medium; rays switch
    medium on transmission. TPU design: all interior media live in one
    (M, ...) SOA; the integrator carries an (N,) medium index and gathers
    spectral coefficients per ray — homogeneous media then admit
    closed-form free-flight sampling (no majorant walk). Shape-bounded (not
    AABB-bounded): a ray's segment inside the medium always ends at the
    next surface hit.
    """

    sigma_a_coeffs: jnp.ndarray  # (M, 3)
    sigma_a_scale: jnp.ndarray  # (M,)
    sigma_s_coeffs: jnp.ndarray  # (M, 3)
    sigma_s_scale: jnp.ndarray  # (M,)
    g: jnp.ndarray  # (M,) HG asymmetry

    @staticmethod
    def build(specs) -> "MediumStack":
        """specs: list of dicts {sigma_a, sigma_s (rgb), g, scale}."""
        sa = jnp.asarray(
            [np.asarray(s.get("sigma_a", (1, 1, 1)), np.float32)
             * s.get("scale", 1.0) for s in specs], jnp.float32
        )
        ss = jnp.asarray(
            [np.asarray(s.get("sigma_s", (1, 1, 1)), np.float32)
             * s.get("scale", 1.0) for s in specs], jnp.float32
        )
        sa_c, sa_s = rgb2spec.fit_unbounded(sa)
        ss_c, ss_s = rgb2spec.fit_unbounded(ss)
        return MediumStack(
            sigma_a_coeffs=sa_c, sigma_a_scale=sa_s,
            sigma_s_coeffs=ss_c, sigma_s_scale=ss_s,
            g=jnp.asarray([s.get("g", 0.0) for s in specs], jnp.float32),
        )

    @property
    def n_media(self) -> int:
        return self.g.shape[0]

    def sigma_at_idx(self, idx, lam):
        """(sigma_a, sigma_s) spectra (N, S) for per-ray medium index idx;
        zero where idx < 0 (vacuum / no medium)."""
        from ..core.gather import gather_rows

        safe = jnp.clip(idx, 0, self.n_media - 1)
        sa_c = gather_rows(self.sigma_a_coeffs, safe)
        sa_s = gather_rows(self.sigma_a_scale, safe)
        ss_c = gather_rows(self.sigma_s_coeffs, safe)
        ss_s = gather_rows(self.sigma_s_scale, safe)
        inside = (idx >= 0)[..., None]
        sa = jnp.where(inside, rgb2spec.eval_unbounded(sa_c, sa_s, lam), 0.0)
        ss = jnp.where(inside, rgb2spec.eval_unbounded(ss_c, ss_s, lam), 0.0)
        return sa, ss

    def g_at(self, idx):
        from ..core.gather import gather_rows

        safe = jnp.clip(idx, 0, self.n_media - 1)
        return jnp.where(idx >= 0, gather_rows(self.g, safe), 0.0)


def _pool_dilate_max(vox, m):
    """Max-pool a (nz, ny, nx) voxel field onto m^3 cells + 1-cell dilation
    (conservative for trilinear lookups near borders; MajorantGrid,
    media.h:105)."""
    vox = np.asarray(vox, np.float32)

    def _ceil_pad(d):
        pads = [(-s) % m for s in d.shape]
        return np.pad(d, [(0, p) for p in pads], mode="edge")

    dp = _ceil_pad(vox)
    z, y, x = dp.shape
    maj = dp.reshape(m, z // m, m, y // m, m, x // m).max(axis=(1, 3, 5))
    padded = np.pad(maj, 1, mode="edge")
    return np.maximum.reduce(
        [
            padded[dz : dz + m, dy : dy + m, dx : dx + m]
            for dz in (0, 1, 2)
            for dy in (0, 1, 2)
            for dx in (0, 1, 2)
        ]
    )


def _rgbgrid_placeholder():
    return dict(
        sa_grid_coeffs=jnp.zeros((1, 1, 1, 3), jnp.float32),
        sa_grid_scale=jnp.zeros((1, 1, 1), jnp.float32),
        ss_grid_coeffs=jnp.zeros((1, 1, 1, 3), jnp.float32),
        ss_grid_scale=jnp.zeros((1, 1, 1), jnp.float32),
    )


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
    # Coarse majorant grid of density maxima, (mz, my, mx). For rgbgrid
    # media the entries are in SIGMA units (wavelength-max sigma_t).
    maj_grid: jnp.ndarray
    # RGBGrid media (kind == rgbgrid): per-voxel RGBUnboundedSpectrum fits
    # (media.h:599 RGBGridMedium; spectrum.h:569).
    sa_grid_coeffs: jnp.ndarray  # (gz, gy, gx, 3)
    sa_grid_scale: jnp.ndarray  # (gz, gy, gx)
    ss_grid_coeffs: jnp.ndarray
    ss_grid_scale: jnp.ndarray
    # Global density maximum (scalar) — the wavelength-independent majorant
    # is sigma_t_max * max_density.
    max_density: jnp.ndarray
    # Procedural cloud parameters [density, wispiness, frequency]
    # (CloudMedium, media.h:430; kind == cloud).
    cloud_params: object = None
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
            **_rgbgrid_placeholder(),
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
            **_rgbgrid_placeholder(),
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
        maj = _pool_dilate_max(density, maj_res)
        return MediumBuffers(
            sigma_a_coeffs=sa_c, sigma_a_scale=sa_s,
            sigma_s_coeffs=ss_c, sigma_s_scale=ss_s,
            g=jnp.asarray(g, jnp.float32),
            le_coeffs=le_c, le_scale=le_s,
            bounds_lo=jnp.asarray(bounds_lo, jnp.float32),
            bounds_hi=jnp.asarray(bounds_hi, jnp.float32),
            density=jnp.asarray(density),
            maj_grid=jnp.asarray(maj),
            **_rgbgrid_placeholder(),
            max_density=jnp.asarray(float(density.max()), jnp.float32),
            kind=MEDIUM_GRID,
        )

    @staticmethod
    def rgbgrid(
        sigma_a_grid, sigma_s_grid, bounds_lo, bounds_hi, g=0.0,
        scale=1.0, maj_res=16,
    ) -> "MediumBuffers":
        """Per-voxel RGB extinction (RGBGridMedium, media.h:599).

        sigma_{a,s}_grid: (nz, ny, nx, 3) RGB coefficients. Each voxel's RGB
        is lifted to an RGBUnboundedSpectrum fit at build time (the
        reference converts per voxel at creation too, media.cpp); lookups
        interpolate the (coeffs, scale) fields trilinearly — exact at voxel
        centers, smooth between (interpolating fits rather than spectra is
        the one approximation; sigmoid fits are near-linear in rgb locally).
        The majorant grid stores the per-voxel wavelength-max sigma_t
        computed exactly on a 32-sample lambda grid.
        """
        from ..core import cie  # noqa: F401  (lambda range constants live here)

        sa = np.asarray(sigma_a_grid, np.float32) * scale
        ss = np.asarray(sigma_s_grid, np.float32) * scale
        sa_c, sa_s = rgb2spec.fit_unbounded(jnp.asarray(sa))
        ss_c, ss_s = rgb2spec.fit_unbounded(jnp.asarray(ss))
        lam_grid = jnp.linspace(360.0, 830.0, 32)
        sig_t = rgb2spec.eval_unbounded(
            sa_c.reshape(-1, 3), sa_s.reshape(-1), lam_grid[None, :]
        ) + rgb2spec.eval_unbounded(
            ss_c.reshape(-1, 3), ss_s.reshape(-1), lam_grid[None, :]
        )
        vox_max = np.asarray(jnp.max(sig_t, axis=-1)).reshape(sa.shape[:3])
        maj = _pool_dilate_max(vox_max * 1.001, maj_res)
        z3 = jnp.zeros((3,), jnp.float32)
        z = jnp.zeros((), jnp.float32)
        return MediumBuffers(
            sigma_a_coeffs=z3, sigma_a_scale=z, sigma_s_coeffs=z3,
            sigma_s_scale=z,
            g=jnp.asarray(g, jnp.float32),
            le_coeffs=z3, le_scale=z,
            bounds_lo=jnp.asarray(bounds_lo, jnp.float32),
            bounds_hi=jnp.asarray(bounds_hi, jnp.float32),
            density=jnp.ones((1, 1, 1), jnp.float32),
            maj_grid=jnp.asarray(maj),
            sa_grid_coeffs=sa_c, sa_grid_scale=sa_s,
            ss_grid_coeffs=ss_c, ss_grid_scale=ss_s,
            max_density=jnp.asarray(float(vox_max.max()) * 1.001, jnp.float32),
            kind=MEDIUM_RGBGRID,
        )

    @staticmethod
    def cloud(
        sigma_a_rgb, sigma_s_rgb, bounds_lo, bounds_hi, g=0.0, scale=1.0,
        density: float = 1.0, wispiness: float = 1.0, frequency: float = 5.0,
    ) -> "MediumBuffers":
        """Procedural cloud (CloudMedium, media.h:430): multi-octave Perlin
        density with noise-perturbed ("wispy") lookup points, decreasing
        with altitude. Density is clamped to [0, 1], so the homogeneous
        majorant (max sigma_t) is exact."""
        base = MediumBuffers.homogeneous(
            sigma_a_rgb, sigma_s_rgb, bounds_lo, bounds_hi, g=g, scale=scale
        )
        return base.replace(
            cloud_params=jnp.asarray(
                [density, wispiness, frequency], jnp.float32
            ),
            kind=MEDIUM_CLOUD,
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

    def _trilinear(self, field, p):
        """Voxel-centered trilinear lookup over the medium bounds.

        field: (nz, ny, nx) or (nz, ny, nx, C); returns (N,) or (N, C),
        zero outside the bounds (pbrt GridMedium convention)."""
        chan = field.ndim == 4
        nz, ny, nx = field.shape[:3]
        res = jnp.asarray([nx, ny, nz], jnp.float32)
        g = (p - self.bounds_lo[None]) / jnp.maximum(
            self.bounds_hi[None] - self.bounds_lo[None], 1e-12
        )
        gc = g * res - 0.5
        gi = jnp.floor(gc)
        f = gc - gi
        gi = gi.astype(jnp.int32)

        # Flat 1-D gathers: measurably cheaper than 3-D advanced indexing
        # on the TPU backend (XLA lowers multi-axis index math into the
        # gather; precomputing the flat offset keeps it out).
        flat = field.reshape((nz * ny * nx,) + field.shape[3:])

        def tap(dx, dy, dz):
            xi = jnp.clip(gi[..., 0] + dx, 0, nx - 1)
            yi = jnp.clip(gi[..., 1] + dy, 0, ny - 1)
            zi = jnp.clip(gi[..., 2] + dz, 0, nz - 1)
            return flat[(zi * ny + yi) * nx + xi]

        fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
        if chan:
            fx, fy, fz = fx[..., None], fy[..., None], fz[..., None]
        d00 = tap(0, 0, 0) * (1 - fx) + tap(1, 0, 0) * fx
        d10 = tap(0, 1, 0) * (1 - fx) + tap(1, 1, 0) * fx
        d01 = tap(0, 0, 1) * (1 - fx) + tap(1, 0, 1) * fx
        d11 = tap(0, 1, 1) * (1 - fx) + tap(1, 1, 1) * fx
        d0 = d00 * (1 - fy) + d10 * fy
        d1 = d01 * (1 - fy) + d11 * fy
        out = d0 * (1 - fz) + d1 * fz
        inside = jnp.all((g >= 0.0) & (g <= 1.0), axis=-1)
        if chan:
            inside = inside[..., None]
        return jnp.where(inside, out, 0.0)

    def _cloud_density(self, p):
        """Procedural cloud density in [0, 1] (CloudMedium::Density,
        media.h:478-510): 5-octave Perlin stack at noise-perturbed lookup
        points, modulated to fall off with altitude (y in medium space).
        DNoise's vector perturbation is emulated with three decorrelated
        scalar-noise taps."""
        from ..core.noise import perlin

        dens = self.cloud_params[0]
        wisp = self.cloud_params[1]
        freq = self.cloud_params[2]
        q = (p - self.bounds_lo[None]) / jnp.maximum(
            self.bounds_hi[None] - self.bounds_lo[None], 1e-12
        )
        inside = jnp.all((q >= 0.0) & (q <= 1.0), axis=-1)
        pp = freq[..., None] * q
        vomega, vlambda = 0.05 * wisp, 10.0
        offs = jnp.asarray(
            [[31.416, 0.0, 0.0], [0.0, 27.183, 0.0], [0.0, 0.0, 14.142]],
            jnp.float32,
        )
        for _ in range(2):
            dn = jnp.stack(
                [perlin(vlambda * pp + offs[k][None]) for k in range(3)],
                axis=-1,
            )
            pp = pp + vomega * dn
            vomega = vomega * 0.5
            vlambda = vlambda * 1.99
        d = jnp.zeros(p.shape[:-1], p.dtype)
        omega, lam_s = 0.5, 1.0
        for _ in range(5):
            d = d + omega * perlin(lam_s * pp)
            omega *= 0.5
            lam_s *= 1.99
        y = q[..., 1]
        d = jnp.clip((1.0 - y) * 4.5 * dens * d, 0.0, 1.0)
        d = d + 2.0 * jnp.maximum(0.0, 0.5 - y)
        return jnp.where(inside, jnp.clip(d, 0.0, 1.0), 0.0)

    def density_at(self, p):
        """Density lookup at world points p: (N,) in [0, max] — trilinear
        for grids, procedural for clouds, 1 inside homogeneous bounds."""
        if self.kind == MEDIUM_CLOUD:
            return self._cloud_density(p)
        if self.kind != MEDIUM_GRID:
            return jnp.ones(p.shape[:-1], p.dtype)
        return self._trilinear(self.density, p)

    def corner_table(self):
        """Flattened (V, 8) table of the 8 trilinear corner taps per base
        cell, edge-clamped. One 8-wide row gather then replaces the 8
        separate XLA gathers of _trilinear — the majorant-walk loops call
        the density lookup every iteration, and gathers are the dominant
        cost of the volumetric path on this backend (measured ~11 ms per
        8-tap trilinear at 131k rays vs ~2 ms for one row gather). Built on
        the fly (3 ms-scale elementwise work); callers hoist it outside
        their walk loops."""
        f = self.density
        nz, ny, nx = f.shape
        fp = jnp.pad(f, 1, mode="edge")
        corners = jnp.stack(
            [
                fp[dz:dz + nz + 1, dy:dy + ny + 1, dx:dx + nx + 1]
                for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
            ],
            axis=-1,
        )
        return corners.reshape(-1, 8)

    def density_at_fast(self, p, ctab):
        """Trilinear density via the corner table (bit-equal taps to
        _trilinear; the 8-term weighted sum reassociates the nested
        lerps)."""
        nz, ny, nx = self.density.shape
        res = jnp.asarray([nx, ny, nz], jnp.float32)
        g = (p - self.bounds_lo[None]) / jnp.maximum(
            self.bounds_hi[None] - self.bounds_lo[None], 1e-12
        )
        gc = g * res - 0.5
        gi = jnp.floor(gc)
        fr = gc - gi
        bi = jnp.clip(gi.astype(jnp.int32), -1, res.astype(jnp.int32) - 1) + 1
        base = (bi[..., 2] * (ny + 1) + bi[..., 1]) * (nx + 1) + bi[..., 0]
        rows = ctab[base]  # (N, 8)
        fx, fy, fz = fr[..., 0], fr[..., 1], fr[..., 2]
        wx = jnp.stack([1.0 - fx, fx], -1)  # (N, 2)
        wy = jnp.stack([1.0 - fy, fy], -1)
        wz = jnp.stack([1.0 - fz, fz], -1)
        # Corner order: index = dz*4 + dy*2 + dx.
        w = (
            wz[..., :, None, None] * wy[..., None, :, None]
            * wx[..., None, None, :]
        ).reshape(p.shape[:-1] + (8,))
        out = jnp.sum(rows * w, axis=-1)
        inside = jnp.all((g >= 0.0) & (g <= 1.0), axis=-1)
        return jnp.where(inside, out, 0.0)

    def sigma_at(self, p, lam):
        """(sigma_a, sigma_s) spectra at world points: each (N, S).

        Grid media scale the unit-density spectra by local density; RGBGrid
        media evaluate trilinearly-interpolated per-voxel spectrum fits
        (RGBGridMedium::SamplePoint, media.h:599)."""
        if self.kind == MEDIUM_RGBGRID:
            sac = self._trilinear(self.sa_grid_coeffs, p)
            sas = self._trilinear(self.sa_grid_scale, p)
            ssc = self._trilinear(self.ss_grid_coeffs, p)
            sss = self._trilinear(self.ss_grid_scale, p)
            sa = rgb2spec.eval_unbounded(sac, sas, lam)
            ss = rgb2spec.eval_unbounded(ssc, sss, lam)
            return sa, ss
        sa_u, ss_u = self.sigma_base(lam)
        dens = self.density_at(p)
        return sa_u * dens[..., None], ss_u * dens[..., None]

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
        if self.kind == MEDIUM_RGBGRID:
            # max_density already holds the global wavelength-max sigma_t.
            return jnp.broadcast_to(self.max_density, lam.shape[:-1])
        sa, ss = self.sigma_base(lam)
        return jnp.max(sa + ss, axis=-1) * self.max_density

    # -- DDA majorant queries (DDAMajorantIterator, media.h:136-214) --------

    def majorant_local(self, p, lam_maj_base):
        """Local majorant sigma for the coarse cell containing p.

        lam_maj_base: (N,) wavelength-collapsed unit-density majorant
        (max over lambda of sigma_a + sigma_s). Outside the grid returns 0
        (vacuum). The reference walks DDA segments and yields (t0, t1,
        sigma_maj) per cell; here the walk lives in the integrator loop and
        this is the per-cell majorant lookup — one flat native gather
        (a one-hot matmul at 4096 cells costs ~2x more; measured)."""
        mz, my, mx = self.maj_grid.shape
        rel = (p - self.bounds_lo[None]) / jnp.maximum(
            self.bounds_hi[None] - self.bounds_lo[None], 1e-12
        )
        inside = jnp.all((rel >= 0.0) & (rel < 1.0), axis=-1)
        ix = jnp.clip((rel[..., 0] * mx).astype(jnp.int32), 0, mx - 1)
        iy = jnp.clip((rel[..., 1] * my).astype(jnp.int32), 0, my - 1)
        iz = jnp.clip((rel[..., 2] * mz).astype(jnp.int32), 0, mz - 1)
        flat = self.maj_grid.reshape(-1)
        dmax = flat[(iz * my + iy) * mx + ix]
        return jnp.where(inside, dmax * lam_maj_base, 0.0)

    def cell_exit_t(self, o, d, t):
        """Ray parameter of the exit from the majorant cell containing
        p(t) — the DDA step distance (media.h:183-206 next-crossing math)."""
        mz, my, mx = self.maj_grid.shape
        res = jnp.asarray([mx, my, mz], jnp.float32)
        ext = jnp.maximum(self.bounds_hi - self.bounds_lo, 1e-12)
        cs = ext[None] / res[None]  # cell size per axis
        p = o + t[..., None] * d
        rel = (p - self.bounds_lo[None]) / cs
        idx = jnp.floor(rel)
        step_up = d > 0.0
        bound = self.bounds_lo[None] + (idx + step_up) * cs
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        t_ax = (bound - o) * inv
        t_ax = jnp.where(jnp.abs(d) < 1e-12, 1e30, t_ax)
        t_exit = jnp.min(t_ax, axis=-1)
        # Nudge past the boundary so the next lookup lands in the new cell.
        return jnp.maximum(t_exit, t) + 1e-4 * jnp.max(cs)

    def le_at(self, p, lam):
        """Volumetric emission radiance (GridMedium Le, media.h:265)."""
        le = rgb2spec.eval_unbounded(
            self.le_coeffs[None], self.le_scale[None], lam
        )
        dens = self.density_at(p)
        return jnp.where((dens > 0.0)[..., None], le, 0.0)
