"""Analytic scenes with closed-form radiance for correctness gates.

Modeled on the reference's integrator test scenes
(/root/reference/src/pbrt/cpu/integrators_test.cpp:71-97): a unit-radius
diffuse sphere enclosing the camera with a point light at the center. With
albedo rho and point-light intensity I = pi, the multiple-scattering
equilibrium radiance seen from inside is

    L = (I / (4 pi^2)) * sum_k rho^(k+1) ... = rho / (4 pi) * 1/(1 - rho) * I_eff

Concretely (integrators_test.cpp:85-97): with I = pi * 4 pi ... the reference
chooses I such that the expected image value is exactly 1. We reproduce the
same construction: point light with unit "power-normalized" intensity at the
center of a diffuse sphere of radius 1 and albedo 0.5 gives equilibrium
radiance L = I/(4 pi) * rho/(1-rho) with the first-bounce irradiance I/d^2 = I.
"""

from __future__ import annotations

import numpy as np

from ..cameras.perspective import PerspectiveCamera
from ..core import transform
from ..lights.buffers import LightBuffers
from ..materials.buffers import MaterialBuffers, MAT_DIFFUSE
from ..scene import Scene
from ..shapes.geometry import GeometryBuffers


def furnace_sphere_scene(albedo=0.5, intensity=np.pi, resolution=(10, 10)):
    """Camera at the center of a diffuse unit sphere with a point light also
    at the center (offset slightly to avoid the degenerate 0-distance case).

    Expected radiance for scalar albedo rho (all wavelengths equal):
        direct irradiance at the wall E = I / r^2 = I  (r = 1)
        L = (rho/pi) * E * (1 + rho + rho^2 + ...) = rho E / (pi (1 - rho))
    With I = pi and rho = 0.5: L = 0.5 * pi / (pi * 0.5) = 1.0.
    """
    geom = GeometryBuffers.build(
        spheres=np.array([[0.0, 0.0, 0.0, 1.0]], np.float32),
        sph_mat=np.array([0], np.int32),
    )
    gray = (albedo, albedo, albedo)
    materials = MaterialBuffers.build([{"kind": MAT_DIFFUSE, "albedo": gray}])
    # Spectrally flat intensity (illuminant=False): RGB (1,1,1) with
    # illuminant disabled evaluates to exactly `intensity` at every lambda.
    lights = LightBuffers.build(
        points=[
            {
                "p": (0.0, 0.0, 0.0),
                "rgb": (1.0, 1.0, 1.0),
                "scale": intensity,
                "illuminant": False,
            }
        ]
    )
    scene = Scene(geom=geom, materials=materials, lights=lights)
    camera = PerspectiveCamera(
        camera_to_world=transform.Transform.identity(),
        resolution=resolution,
        fov_deg=45.0,
    )
    return scene, camera
