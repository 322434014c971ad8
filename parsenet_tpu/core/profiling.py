"""Tracing and profiling.

The reference has only ad-hoc time.time() prints (train_parsenet_e2e.py:
187,415). TPU-native observability:
* `trace` — jax.profiler TraceAnnotation context for named regions that show
  up in TensorBoard/Perfetto traces.
* `StepTimer` — wall-clock per-step statistics with device sync.
* `capture_trace` — programmatic profiler capture around a code region.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(name: str) -> Iterator[None]:
    """Named region annotation visible in profiler timelines."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str) -> Iterator[None]:
    """Capture a full device profile for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step timing with percentile summary. `sync` blocks on a pytree so
    asynchronous dispatch does not hide device time."""

    def __init__(self, skip_first: int = 2):
        self.times = []
        self.skip_first = skip_first
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_tree=None) -> float:
        if sync_tree is not None:
            jax.block_until_ready(sync_tree)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self, sync_tree_fn=None):
        self.start()
        out = {}
        yield out
        self.stop(out.get("sync"))

    def summary(self) -> Dict[str, float]:
        ts = np.array(self.times[self.skip_first:] or self.times)
        return {
            "mean_s": float(ts.mean()),
            "p50_s": float(np.percentile(ts, 50)),
            "p90_s": float(np.percentile(ts, 90)),
            "steps_per_s": float(1.0 / ts.mean()) if ts.mean() > 0 else 0.0,
            "n": int(len(ts)),
        }
