"""Camera models.

Reference analogue: /root/reference/src/pbrt/cameras.h/.cpp (6,338 LoC;
CameraBase at cameras.h:39, the base interface at base/camera.h:37-78).
"""

from .perspective import PerspectiveCamera  # noqa: F401
