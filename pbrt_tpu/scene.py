"""Scene container: the device-resident, fully-traceable scene description.

Reference analogue: BasicScene after CreateMaterials/CreateLights/
CreateAggregate (/root/reference/src/pbrt/scene.h:260-380) — but as one jax
pytree of flat arrays, so an entire scene is an argument to a jitted render
function and every continuous parameter (albedo, emission, vertex positions)
is differentiable.
"""

from __future__ import annotations

from typing import Optional

from .core.pytree import pytree
from .lights.buffers import LightBuffers
from .materials.buffers import MaterialBuffers
from .media.medium import MediumBuffers
from .shapes.geometry import GeometryBuffers


@pytree
class Scene:
    geom: GeometryBuffers
    materials: MaterialBuffers
    lights: LightBuffers
    # Scene-level participating medium (None == vacuum everywhere).
    medium: Optional[MediumBuffers] = None
