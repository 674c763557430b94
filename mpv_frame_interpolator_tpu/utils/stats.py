"""Lightweight timer/value registry.

Replaces the reference's stats_ctx (common/stats.h:14-34) plus the OpenCL
event timing that HopperRender feeds into its auto-quality controller
(opticalFlowCalc.c:111-122,192-201): we time device work with wall clocks
around block_until_ready at the measurement edges and keep rolling windows
for percentile reporting."""

from __future__ import annotations

import collections
import time
from typing import Dict


class _Series:
    __slots__ = ("window", "total", "count")

    def __init__(self, maxlen: int):
        self.window = collections.deque(maxlen=maxlen)
        self.total = 0.0
        self.count = 0

    def add(self, v: float):
        self.window.append(v)
        self.total += v
        self.count += 1

    @property
    def last(self) -> float:
        return self.window[-1] if self.window else 0.0

    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0

    def percentile(self, p: float) -> float:
        if not self.window:
            return 0.0
        vals = sorted(self.window)
        idx = min(int(len(vals) * p / 100.0), len(vals) - 1)
        return vals[idx]


class StatsRegistry:
    """Named value series + context-manager timers (seconds)."""

    def __init__(self, window: int = 256):
        self._series: Dict[str, _Series] = {}
        self._window = window

    def series(self, name: str) -> _Series:
        if name not in self._series:
            self._series[name] = _Series(self._window)
        return self._series[name]

    def add(self, name: str, value: float):
        self.series(name).add(value)

    def last(self, name: str) -> float:
        return self.series(name).last

    def time(self, name: str):
        return _Timer(self, name)

    def reset(self):
        """Drop all series (geometry/source changes in long sessions)."""
        self._series.clear()

    def summary(self) -> Dict[str, dict]:
        return {
            k: {"last": s.last, "mean": s.mean(),
                "p50": s.percentile(50), "p99": s.percentile(99),
                "count": s.count}
            for k, s in self._series.items()
        }


class _Timer:
    __slots__ = ("reg", "name", "t0")

    def __init__(self, reg: StatsRegistry, name: str):
        self.reg, self.name = reg, name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.reg.add(self.name, time.perf_counter() - self.t0)
        return False
