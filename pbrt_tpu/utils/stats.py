"""Stats registry + progress reporting.

Reference analogue: the declarative STAT_* macro framework
(/root/reference/src/pbrt/util/stats.h:88-170) and ProgressReporter
(util/progressreporter.h:44). In a functional renderer the per-thread
accumulator merge disappears: device-side counts come back as pytree scalars
(e.g. the integrators' 'rays' stat) and host-side counters are plain Python.
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict


class _Stats:
    def __init__(self):
        self.counters = defaultdict(float)
        self.distributions = defaultdict(list)

    def add(self, name: str, value: float = 1.0):
        self.counters[name] += value

    def observe(self, name: str, value: float):
        self.distributions[name].append(value)

    def report(self, file=sys.stderr):
        print("Statistics:", file=file)
        for k in sorted(self.counters):
            print(f"    {k:<46} {self.counters[k]:,.0f}", file=file)
        for k in sorted(self.distributions):
            v = self.distributions[k]
            if v:
                print(
                    f"    {k:<46} avg {sum(v)/len(v):.4g} "
                    f"(min {min(v):.4g}, max {max(v):.4g}, n {len(v)})",
                    file=file,
                )

    def clear(self):
        self.counters.clear()
        self.distributions.clear()


STATS = _Stats()


def stat_counter(name: str, value: float = 1.0):
    STATS.add(name, value)


class ProgressReporter:
    """ETA progress bar (progressreporter.h semantics, stderr-friendly)."""

    def __init__(self, total: int, title: str = "Rendering", quiet=False):
        self.total = max(total, 1)
        self.title = title
        self.done = 0
        self.t0 = time.perf_counter()
        self.quiet = quiet

    def update(self, n: int = 1):
        self.done += n
        if self.quiet:
            return
        frac = min(self.done / self.total, 1.0)
        elapsed = time.perf_counter() - self.t0
        eta = elapsed / max(frac, 1e-6) * (1 - frac)
        bar = "+" * int(40 * frac) + " " * (40 - int(40 * frac))
        print(
            f"\r{self.title}: [{bar}] {100*frac:5.1f}% "
            f"({elapsed:.1f}s|~{eta:.1f}s)",
            end="",
            file=sys.stderr,
            flush=True,
        )
        if frac >= 1.0:
            print(file=sys.stderr)

    def finish(self):
        if self.done < self.total:
            self.update(self.total - self.done)
