"""Reconstruction filters.

Reference analogue: /root/reference/src/pbrt/filters.h/.cpp (Box, Triangle,
Gaussian, Mitchell, LanczosSinc + the tabulated FilterSampler used for
importance-sampled GetCameraSample, filters.h:26).
"""

from .filters import Filter, FilterSample  # noqa: F401
