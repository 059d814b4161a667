"""Built-in test/benchmark scenes (analytic and classic)."""

from .cornell import cornell_box  # noqa: F401
from .analytic import furnace_sphere_scene  # noqa: F401
