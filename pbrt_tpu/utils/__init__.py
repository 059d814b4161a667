"""Runtime utilities: logging, stats, progress, display streaming.

Reference analogue: src/pbrt/util/{log,stats,progressreporter,display}.*.
"""

from .stats import STATS, ProgressReporter, stat_counter  # noqa: F401
