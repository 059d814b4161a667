"""Lights and light sampling.

Reference analogue: /root/reference/src/pbrt/lights.h/.cpp (9 variants,
base/light.h:41-56) and lightsamplers.h (uniform/power/BVH). Round-1 variants:
per-primitive diffuse area lights (each emissive triangle is its own light,
matching pbrt's light list semantics), point lights, distant lights, and a
uniform-spectrum infinite light. Selection is uniform; power and BVH samplers
follow.
"""

from .buffers import LightBuffers, LightLiSample  # noqa: F401
