"""Scene and image I/O.

Reference analogue: src/pbrt/util/image.* (EXR/PFM/PNG/QOI via vendored
libraries, image.h:407-410) and the .pbrt parser (parser.*). Here: pure-Python
writers/readers with numpy — no external image libraries in the environment.
"""

from .image import read_exr, read_pfm, write_exr, write_pfm, write_png  # noqa: F401
