"""Global statistics counters and leveled logging.

Equivalent of the reference's StatsCounter / Logger infrastructure
(reference: mitsuba/include/mitsuba/core/statistics.h:58-94 — EAverage /
EPercentage counters like avgPathLength, printed at shutdown; core/logger.h).
Counters are host-side accumulators fed by summaries pulled off device at
iteration boundaries (per-sample increments would defeat jit)."""

from __future__ import annotations

import atexit
import logging
import time
from collections import defaultdict

log = logging.getLogger("sdmm_tpu")
if not log.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s"))
    log.addHandler(_h)
    log.setLevel(logging.INFO)


class StatsCounter:
    """Named counter; kind: 'count' | 'average' | 'percentage'."""

    _registry: dict[str, "StatsCounter"] = {}

    def __init__(self, name: str, kind: str = "count"):
        self.name = name
        self.kind = kind
        self.value = 0.0
        self.base = 0.0
        StatsCounter._registry[name] = self

    def add(self, v: float, base: float = 0.0):
        self.value += float(v)
        self.base += float(base)

    def __iadd__(self, v):
        self.add(v)
        return self

    def result(self) -> float:
        if self.kind == "count":
            return self.value
        denom = max(self.base, 1e-12)
        r = self.value / denom
        return r * 100.0 if self.kind == "percentage" else r

    @classmethod
    def report(cls) -> dict:
        return {n: c.result() for n, c in sorted(cls._registry.items())}

    @classmethod
    def print_report(cls):
        rep = cls.report()
        if not rep:
            return
        log.info("statistics:")
        for n, v in rep.items():
            log.info("  %-40s %.4g", n, v)


# Standard counters mirroring the reference's SDMM set (sdmm_proc.cpp:40-45).
avg_path_length = StatsCounter("integrator.avg_path_length", "average")
avg_invalid_samples = StatsCounter("integrator.pct_invalid_samples", "percentage")
avg_found_conditional = StatsCounter("guiding.pct_valid_conditionals", "percentage")


class Timer:
    """Reference core/timer.h equivalent."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()

    def seconds(self) -> float:
        return time.perf_counter() - self.t0


_printed = False


def _at_exit():
    # Print via the real stderr: logging handlers may already be torn down
    # (pytest capture) at interpreter exit.
    global _printed
    try:
        import sys

        if not _printed and StatsCounter._registry:
            rep = StatsCounter.report()
            if any(v != 0 for v in rep.values()):
                err = getattr(sys, "__stderr__", None)
                if err is not None and not err.closed:
                    err.write("sdmm_tpu statistics:\n")
                    for n, v in rep.items():
                        err.write(f"  {n:<40} {v:.4g}\n")
            _printed = True
    except Exception:
        pass


atexit.register(_at_exit)
