"""Tracing / profiling utilities.

The reference has no profiler at all (SURVEY.md §5.1 — its only perf artifacts
are tqdm postfixes and a wall-clock total, src/train.py:47,206).  Here:
- ``trace`` wraps a region in a jax.profiler trace (view in TensorBoard /
  xprof),
- ``timeit`` is a remote-dispatch-safe timer: it forces a concrete VALUE fetch
  from the result, because ``block_until_ready`` can return at enqueue time
  through remote-dispatch tunnels (measured on the axon TPU path: it reported
  physically impossible FLOP rates),
- ``ThroughputMeter`` tracks rays/sec — the north-star metric
  (BASELINE.json:2).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/danerf-trace"):
    """Capture a jax.profiler trace around the with-block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _force(x):
    """Force execution by fetching a scalar-ish value to the host."""
    leaves = jax.tree_util.tree_leaves(x)
    if not leaves:
        return
    np.asarray(jax.device_get(leaves[0])).ravel()[:1]


def timeit(fn: Callable, *args, iters: int = 20, warmup: int = 5, **kw) -> float:
    """Mean seconds per call of ``fn(*args, **kw)``, execution-forced."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    _force(out)
    return (time.perf_counter() - t0) / iters


class ThroughputMeter:
    """Sliding-window rays/sec counter for training loops."""

    def __init__(self, window: int = 100):
        self.window = window
        self._events: list[tuple[float, int]] = []

    def update(self, n_rays: int):
        self._events.append((time.perf_counter(), n_rays))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def rays_per_sec(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        rays = sum(n for _, n in self._events[1:])
        return rays / max(dt, 1e-9)
