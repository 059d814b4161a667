"""Participating media.

Reference analogue: /root/reference/src/pbrt/media.h/.cpp (HomogeneousMedium
:217, GridMedium :265, MajorantGrid :105, DDAMajorantIterator :136) and the
null-scattering volumetric transport machinery of base/medium.h.
"""

from .medium import MediumBuffers  # noqa: F401
from .phase import hg_p, hg_pdf, hg_sample  # noqa: F401
