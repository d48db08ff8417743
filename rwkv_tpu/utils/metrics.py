"""Lightweight observability: counters, timers, and a profiler hook.

The reference has no observability at all (SURVEY.md §5: std::cout only).
Here: process-local metrics registry the engine/pool feed, a `timed` context
manager, and `trace()` wrapping jax.profiler for on-demand TPU traces.
"""

from __future__ import annotations

import collections
import contextlib
import json
import threading
import time
from typing import Iterator


class Metrics:
    """Thread-safe counters + duration histograms (coarse)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict[str, float] = collections.defaultdict(float)
        self._timings: dict[str, list[float]] = collections.defaultdict(list)

    def inc(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counters[name] += value

    def observe(self, name: str, seconds: float) -> None:
        with self._lock:
            buf = self._timings[name]
            buf.append(seconds)
            if len(buf) > 4096:
                del buf[: len(buf) // 2]

    @contextlib.contextmanager
    def timed(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.observe(name, time.perf_counter() - t0)

    def snapshot(self) -> dict:
        with self._lock:
            out = {"counters": dict(self._counters), "timings": {}}
            for name, buf in self._timings.items():
                if not buf:
                    continue
                s = sorted(buf)
                out["timings"][name] = {
                    "count": len(s),
                    "p50": s[len(s) // 2],
                    "p90": s[int(len(s) * 0.9)],
                    "max": s[-1],
                    "total": sum(s),
                }
            return out

    def dump(self) -> str:
        return json.dumps(self.snapshot(), indent=2, sort_keys=True)

    def reset(self) -> None:
        with self._lock:
            self._counters.clear()
            self._timings.clear()


# process-global default registry
metrics = Metrics()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rwkv_tpu_trace") -> Iterator[str]:
    """Capture a jax profiler trace (open with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
