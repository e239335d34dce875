"""Lightweight tracing/profiling utilities.

The reference has only ad-hoc wall-clock prints (``examples/bench.rs:34``,
``web/worker.mjs:166``); here the equivalent surface is:

- ``stage_timer``: named wall-clock stages collected into a dict (used by the
  CLI ``--stats`` and the corpus pipeline),
- ``device_trace``: a context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of the device kernels when ``SEA_PROFILE`` (or
  an explicit path) names an output directory.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict


class StageTimes(defaultdict):
    def __init__(self):
        super().__init__(float)
        self._lock = threading.Lock()

    def add(self, name: str, seconds: float) -> None:
        """Thread-safe accumulate (the corpus pipeline's fetcher threads
        record into the same StageTimes as the main thread)."""
        with self._lock:
            self[name] += seconds

    def report(self) -> str:
        # keys ending in _bytes are transfer-byte counters, not seconds
        times = {k: v for k, v in self.items() if not k.endswith("_bytes")}
        total = sum(times.values())
        lines = [f"{k:>20}: {v * 1e3:9.2f} ms ({v / total * 100:5.1f}%)" for k, v in times.items()]
        lines.append(f"{'total':>20}: {total * 1e3:9.2f} ms")
        lines += [
            f"{k:>20}: {v / 1e6:9.1f} MB"
            for k, v in self.items()
            if k.endswith("_bytes")
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def stage_timer(times: StageTimes, name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        times.add(name, time.perf_counter() - t0)


@contextlib.contextmanager
def device_trace(log_dir: str | None = None):
    """Capture a jax.profiler trace if a directory is configured."""
    log_dir = log_dir or os.environ.get("SEA_PROFILE")
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
