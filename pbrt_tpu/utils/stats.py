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

    def report(self, file=None):
        # Resolve stderr at CALL time (a sys.stderr default argument binds
        # the stream at import, breaking per-test capture swapping).
        file = file if file is not None else sys.stderr
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


# --- CHECK_RARE + per-pixel statistics images -------------------------------
# Reference analogues: CHECK_RARE (util/check.h:101 — assert a condition is
# rare, reporting the observed frequency) and the --pixelstats per-pixel
# statistics images (util/stats.cpp StatsWritePixelImages).

_RARE = {}


def check_rare(name: str, condition_mask, max_freq: float = 1e-3):
    """Record how often `condition_mask` (bool array) is true; warn to
    stderr when the observed frequency exceeds max_freq. Host-side (call on
    materialized arrays or under io_callback); returns the frequency."""
    import numpy as np

    m = np.asarray(condition_mask)
    hits, total = int(m.sum()), int(m.size)
    h0, t0, mf = _RARE.get(name, (0, 0, max_freq))
    _RARE[name] = (h0 + hits, t0 + total, max_freq)
    freq = (h0 + hits) / max(t0 + total, 1)
    if freq > max_freq and (t0 + total) > 1000:
        print(
            f"CHECK_RARE '{name}': frequency {freq:.2e} exceeds "
            f"{max_freq:.1e} ({h0 + hits}/{t0 + total})",
            file=sys.stderr,
        )
    return freq


def rare_report() -> dict:
    """All CHECK_RARE frequencies observed so far."""
    return {
        k: {"hits": h, "total": t, "freq": h / max(t, 1), "max_freq": mf}
        for k, (h, t, mf) in _RARE.items()
    }


class PixelStats:
    """Accumulate named per-pixel statistic images (the reference's
    --pixelstats: one EXR channel per STAT_PIXEL counter)."""

    def __init__(self, nx: int, ny: int):
        import numpy as np

        self.nx, self.ny = nx, ny
        self.images = {}
        self._np = np

    def add(self, name: str, pixel_ids, values=None):
        """Scatter-accumulate values (default 1) at flat pixel ids."""
        np = self._np
        img = self.images.setdefault(
            name, np.zeros((self.ny * self.nx,), np.float64)
        )
        pid = np.asarray(pixel_ids).reshape(-1)
        v = (
            np.ones_like(pid, np.float64)
            if values is None else np.asarray(values, np.float64).reshape(-1)
        )
        np.add.at(img, np.clip(pid, 0, img.size - 1), v)

    def write(self, path: str):
        """Write all stat planes to one EXR (channel per statistic)."""
        from ..io.image import write_exr

        np = self._np
        names = sorted(self.images)
        chans = np.stack(
            [self.images[n].reshape(self.ny, self.nx) for n in names], -1
        ).astype(np.float32)
        write_exr(path, chans, channel_names=names)
        return names
