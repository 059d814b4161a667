"""Camera models.

Reference analogue: /root/reference/src/pbrt/cameras.h/.cpp (6,338 LoC;
CameraBase at cameras.h:39, the base interface at base/camera.h:37-78).
"""

from .humaneye import HumanEyeCamera  # noqa: F401
from .perspective import PerspectiveCamera  # noqa: F401
from .realistic import RealisticCamera, biconvex_singlet, omni_camera  # noqa: F401
from .rtf import RTFCamera, fit_from_camera  # noqa: F401
from .simple import OrthographicCamera, SphericalCamera  # noqa: F401
