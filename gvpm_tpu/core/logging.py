"""Logging, statistics counters, timers.

Re-creation of the reference's observability layer — Logger/Appender
(logger.h:117), StatsCounter/Statistics::printStats (statistics.h:94,339),
Timer (timer.h:37) and the per-pass `<dest>_time.csv` the equal-time
comparison scripts consume (gvpm.cpp:243-248,353-359).

Counters are host-side (Python) — device code returns metric arrays that
integrators feed into counters between passes (shift success percentages
etc., the reference's behavioral regression signals,
shift_volume_photon.cpp:40-47).
"""

from __future__ import annotations

import logging
import time

log = logging.getLogger("gvpm_tpu")
if not log.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter(
        "%(asctime)s %(levelname).1s [%(name)s] %(message)s", "%H:%M:%S"))
    log.addHandler(_h)
    log.setLevel(logging.INFO)


class StatsCounter:
    """Named counter; kinds: value, percentage, average
    (statistics.h:55 ENumberValue/EPercentage/EAverage)."""

    REGISTRY = {}

    def __init__(self, name, kind="value"):
        self.name = name
        self.kind = kind
        self.num = 0.0
        self.den = 0.0
        StatsCounter.REGISTRY[name] = self

    def add(self, n, d=1.0):
        self.num += float(n)
        self.den += float(d)

    def value(self):
        if self.kind == "value":
            return self.num
        if self.den == 0:
            return 0.0
        if self.kind == "percentage":
            return 100.0 * self.num / self.den
        return self.num / self.den  # average

    @classmethod
    def print_stats(cls, logger=log):
        """Statistics::printStats analog."""
        for name, c in sorted(cls.REGISTRY.items()):
            suffix = {"percentage": "%", "average": " avg", "value": ""}
            logger.info("  %-40s %12.4g%s", name, c.value(),
                        suffix[c.kind])

    @classmethod
    def reset_all(cls):
        for c in cls.REGISTRY.values():
            c.num = c.den = 0.0


class Timer:
    """Phase timer (timer.h:37); also records per-pass rows for the
    `<dest>_time.csv` equal-time protocol."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.rows = []

    def reset(self):
        self.t0 = time.perf_counter()

    def elapsed(self):
        return time.perf_counter() - self.t0

    def lap(self, label=""):
        dt = self.elapsed()
        self.rows.append((label, dt))
        self.reset()
        return dt

    def write_csv(self, path):
        with open(path, "w") as f:
            for label, dt in self.rows:
                f.write(f"{label},{dt:.6f}\n")
