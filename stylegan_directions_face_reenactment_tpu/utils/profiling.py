"""Profiling & step-timing utilities.

The reference has no tracing/profiling at all (SURVEY.md §5 — only tqdm
bars). This module provides:

  * :func:`trace` — context manager around `jax.profiler` writing a
    TensorBoard-loadable trace (use with `xprof`/TensorBoard);
  * :class:`StepTimer` — cheap wall-clock step timing with percentile
    summaries, for training-loop observability without a profiler.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List


@contextlib.contextmanager
def trace(logdir: str = "/tmp/reenact_trace"):
    """Capture a device trace: ``with trace('/tmp/t'): step()``."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with summary stats.

    Usage::

        timer = StepTimer()
        for batch in loader:
            with timer.step():
                out = step_fn(...)
                jax.block_until_ready(out)
        print(timer.summary())
    """

    def __init__(self, warmup: int = 1):
        self.times: List[float] = []
        self.warmup = warmup
        self._seen = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_ms": sum(ts) / n * 1e3,
            "p50_ms": ts[n // 2] * 1e3,
            "p90_ms": ts[int(n * 0.9)] * 1e3,
            "min_ms": ts[0] * 1e3,
            "max_ms": ts[-1] * 1e3,
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
