"""Film and pixel sensor.

Reference analogue: /root/reference/src/pbrt/film.h/.cpp (RGBFilm :234,
PixelSensor :36-117, SpectralFilm :436, GBufferFilm :325).
"""

from .rgb import RGBFilm, spectrum_to_rgb  # noqa: F401
