"""Human eye camera: Navarro schematic eye with a curved retina.

Reference analogue: the ISET fork's HumanEyeCamera
(/root/reference/src/pbrt/cameras.h:607-852): biconic ocular surfaces,
wavelength-dependent IORs, curved retina with mapToSphere (:700-726), and
optional HURB diffraction. This build: the Navarro (1985) schematic eye as
conic surfaces on the shared LensStack tracer, a spherical retina mapping,
and hero-wavelength IORs (per-band chromatic aberration pairs with the
SpectralPath integrator tier).

Navarro relaxed-eye parameters (public data): surfaces film(retina)->pupil
->scene are traced the other way: we trace retina -> cornea like pbrt.
  cornea anterior:  R = 7.72 mm,  Q = -0.26
  cornea posterior: R = 6.50 mm,  Q = 0
  lens anterior:    R = 10.2 mm,  Q = -3.1316
  lens posterior:   R = -6.0 mm,  Q = -1.0
  axial distances: cornea 0.55, aqueous 3.05, lens 4.0, vitreous 16.3203 mm
  IORs (~589 nm): cornea 1.367, aqueous 1.3374, lens 1.42, vitreous 1.336
  retina: sphere of radius 12 mm.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.pytree import pytree, static_field
from ..core.sampling import sample_uniform_disk_concentric
from ..core.transform import Transform
from ..core.vecmath import normalize
from .lens import LensStack, trace_through_stack

_VITREOUS_LEN = 16.3203
_LENS_T = 4.0
_AQUEOUS_T = 3.05
_CORNEA_T = 0.55


def _disperse(n589: float, wavelength_nm: float) -> float:
    """Cauchy-model ocular dispersion: refractivity-scaled water-like
    coefficient reproducing ~2 diopters of LCA across the visible range
    (the role of the reference's wavelength-dependent IOR spectra,
    cameras.h:607-726)."""
    b_water = 3000.0  # nm^2, fitted to water's n(400)-n(700)
    scale = (n589 - 1.0) / 0.333
    return n589 + b_water * scale * (
        1.0 / wavelength_nm**2 - 1.0 / 589.0**2
    )


def navarro_eye_stack(pupil_diameter_mm: float = 4.0,
                      wavelength_nm: float = 589.0) -> LensStack:
    """The Navarro relaxed eye as a film(retina)->scene LensStack (mm)."""
    z_lens_back = _VITREOUS_LEN
    z_lens_front = z_lens_back + _LENS_T
    z_cornea_back = z_lens_front + _AQUEOUS_T
    z_cornea_front = z_cornea_back + _CORNEA_T
    n_vit = _disperse(1.336, wavelength_nm)
    n_lens = _disperse(1.42, wavelength_nm)
    n_aq = _disperse(1.3374, wavelength_nm)
    n_cor = _disperse(1.367, wavelength_nm)
    # Sign flip vs the ophthalmic quotes: our conicoid has R > 0 convex
    # toward the film/retina (lens.py), ophthalmic tables use R > 0 convex
    # toward the incoming light (scene).
    return LensStack.build(
        [
            # retina -> scene: lens posterior first (convex toward retina).
            {"z": z_lens_back, "radius": 6.0, "conic": -1.0,
             "aperture": 5.0, "eta_before": n_vit, "eta_after": n_lens},
            # pupil (iris stop) just behind the lens front vertex (offset so
            # the stop plane and the lens surface don't alias at t ~ 0).
            {"z": z_lens_front - 0.05, "radius": 0.0, "conic": 0.0,
             "aperture": pupil_diameter_mm / 2.0,
             "eta_before": n_lens, "eta_after": n_lens},
            {"z": z_lens_front, "radius": -10.2, "conic": -3.1316,
             "aperture": 5.0, "eta_before": n_lens, "eta_after": n_aq},
            {"z": z_cornea_back, "radius": -6.5, "conic": 0.0,
             "aperture": 5.5, "eta_before": n_aq, "eta_after": n_cor},
            {"z": z_cornea_front, "radius": -7.72, "conic": -0.26,
             "aperture": 5.75, "eta_before": n_cor, "eta_after": 1.0},
        ]
    )


@pytree
class HumanEyeCamera:
    camera_to_world: Transform
    lens: LensStack
    resolution: tuple = static_field()
    retina_radius_mm: float = static_field(default=12.0)
    retina_semi_diam_mm: float = static_field(default=6.0)
    # HURB diffraction at the iris stop (HumanEyeCamera diffractHURB,
    # cameras.cpp:2092; pupil diffraction dominates at small pupils).
    diffraction: bool = static_field(default=False)

    @staticmethod
    def navarro(camera_to_world, resolution, pupil_diameter_mm=4.0,
                retina_semi_diam_mm=6.0,
                wavelength_nm: float = 589.0) -> "HumanEyeCamera":
        return HumanEyeCamera(
            camera_to_world=camera_to_world,
            lens=navarro_eye_stack(pupil_diameter_mm, wavelength_nm),
            resolution=resolution,
            retina_semi_diam_mm=retina_semi_diam_mm,
        )

    def _retina_point(self, p_film):
        """Raster -> point on the spherical retina (mapToSphere,
        cameras.h:700-726): the film square maps to a spherical cap of
        radius retina_radius centered on the optical axis."""
        nx, ny = self.resolution
        sx = (0.5 - p_film[..., 0] / nx) * 2.0 * self.retina_semi_diam_mm
        sy = (p_film[..., 1] / ny - 0.5) * 2.0 * self.retina_semi_diam_mm
        r = self.retina_radius_mm
        rho2 = sx * sx + sy * sy
        inside = rho2 < (r * r)
        zcap = r - jnp.sqrt(jnp.maximum(r * r - rho2, 1e-6))
        # Retina cap curves toward the scene (+z from the retina pole at 0).
        return (
            jnp.stack([sx, sy, zcap], axis=-1),
            inside,
        )

    def generate_rays(self, p_film, u_lens, wavelength_nm=None):
        """Returns (o_world, d_world, weight)."""
        o, inside = self._retina_point(p_film)
        # Aim at the iris stop (surface index 1) disk.
        pupil_z = self.lens.vertex_z[1]
        pupil_r = jnp.sqrt(self.lens.aperture2[1])
        p_disk = sample_uniform_disk_concentric(u_lens) * pupil_r
        target = jnp.stack(
            [
                p_disk[..., 0],
                p_disk[..., 1],
                jnp.broadcast_to(pupil_z, p_film[..., 0].shape),
            ],
            axis=-1,
        )
        d = normalize(target - o)
        hurb = None
        if self.diffraction:
            from .realistic import RealisticCamera

            hurb = RealisticCamera._hurb_noise(self, p_film, u_lens)
        o_out, d_out, valid = trace_through_stack(
            self.lens, o, d, hurb_noise=hurb,
            wavelength_nm=550.0 if wavelength_nm is None else wavelength_nm,
        )
        o_w = self.camera_to_world.apply_point(o_out)
        d_w = normalize(self.camera_to_world.apply_vector(d_out))
        w = (valid & inside).astype(jnp.float32)
        return o_w, d_w, w
