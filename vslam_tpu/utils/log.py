"""Logging, chronometers and profiler hooks.

Parity with the reference's observability kit (SURVEY §5):
  * leveled, timestamped stderr logging — the LOG_DEBUG/INFO/WARNING/ERROR
    macros (src/types/definitions.h:163-192); level picked at runtime from
    $VSLAM_LOG_LEVEL instead of compile-time.
  * chronometers — CREATE_CHRONOMETER/CHRONOMETER_START/STOP accumulation
    (definitions.h:144-148) as a context manager + global registry, feeding
    the end-of-run report's relative/absolute time table
    (slam_assembly.cpp:705-742).
  * device tracing — jax.profiler wrapper producing xprof traces (the
    easy_profiler dump's role, app.cpp:8,118).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from collections import defaultdict

_LEVELS = {"DEBUG": 10, "INFO": 20, "WARNING": 30, "ERROR": 40}
_level = _LEVELS.get(os.environ.get("VSLAM_LOG_LEVEL", "INFO").upper(), 20)


def _emit(level: str, msg: str):
    if _LEVELS[level] >= _level:
        ts = time.strftime("%H:%M:%S")
        print(f"[{ts}|{level}] {msg}", file=sys.stderr)


def debug(msg: str):
    _emit("DEBUG", msg)


def info(msg: str):
    _emit("INFO", msg)


def warning(msg: str):
    _emit("WARNING", msg)


def error(msg: str):
    _emit("ERROR", msg)


class ChronometerRegistry:
    """Accumulates wall seconds per named stage (reference chronometers)."""

    def __init__(self):
        self.seconds: dict[str, float] = defaultdict(float)
        self.calls: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def measure(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[stage] += time.perf_counter() - t0
            self.calls[stage] += 1

    def add(self, stage: str, dt: float):
        self.seconds[stage] += dt
        self.calls[stage] += 1

    def report(self) -> dict:
        """Relative/absolute table (slam_assembly.cpp:705-742)."""
        total = sum(self.seconds.values()) or 1.0
        return {
            stage: {
                "seconds": round(s, 4),
                "relative": round(s / total, 3),
                "calls": self.calls[stage],
            }
            for stage, s in sorted(
                self.seconds.items(), key=lambda kv: -kv[1]
            )
        }

    def clear(self):
        self.seconds.clear()
        self.calls.clear()


# Global registry (one process = one SLAM run, as in the reference).
chronometers = ChronometerRegistry()
measure = chronometers.measure


@contextlib.contextmanager
def device_trace(out_dir: str | None):
    """xprof device trace around a region (easy_profiler dump parity).
    No-op when out_dir is falsy."""
    if not out_dir:
        yield
        return
    import jax

    with jax.profiler.trace(out_dir):
        yield
    info(f"device trace written to {out_dir} (open with xprof/tensorboard)")
