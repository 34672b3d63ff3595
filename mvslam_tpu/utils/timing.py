"""Monotonic timing + stage timers (reference ``source/os/time.{hpp,cpp}``) and
throughput counters (frames/s/chip — a first-class metric here, see SURVEY §5)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

_START = time.monotonic()


def get_time_ms() -> int:
    """Milliseconds since process start (reference ``os/time.cpp:10-33``)."""
    return int((time.monotonic() - _START) * 1e3)


def get_time_us() -> int:
    """Microseconds since process start."""
    return int((time.monotonic() - _START) * 1e6)


def sleep_ms(ms: float) -> None:
    time.sleep(ms / 1e3)


class StageTimers:
    """Accumulating per-stage wall-clock timers for pipeline observability."""

    def __init__(self) -> None:
        self.total_s: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total_s[name] += dt
            self.count[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.total_s[name],
                "count": self.count[name],
                "mean_ms": 1e3 * self.total_s[name] / max(1, self.count[name]),
            }
            for name in self.total_s
        }
