"""Profiling / tracing hooks.

The reference's only observability is epoch wall-clock prints
(``basemodel.py:235,288``, SURVEY.md §5).  TPU-native equivalents:

* :class:`ProfilerCallback` — captures a ``jax.profiler`` device trace for
  selected epochs (viewable in TensorBoard / Perfetto),
* :func:`trace` — context manager for ad-hoc traces,
* :class:`StepTimer` — per-step wall-clock histogram without device syncs.
"""

from __future__ import annotations

import contextlib
import time

import jax

from .callbacks import Callback


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ProfilerCallback(Callback):
    """Trace selected epochs (default: epoch 1, skipping epoch-0 compiles)."""

    def __init__(self, log_dir: str, epochs=(1,)):
        super().__init__()
        self.log_dir = log_dir
        self.epochs = set(epochs)
        self._active = False

    def on_epoch_begin(self, epoch, logs=None):
        if epoch in self.epochs:
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def on_epoch_end(self, epoch, logs=None):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False

    def on_train_end(self, logs=None):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class StepTimer:
    """Host-side step timer: records dispatch-to-dispatch deltas (no syncs)."""

    def __init__(self):
        self.times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    def summary(self):
        import numpy as np

        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {
            "steps": len(a),
            "mean_ms": float(a.mean() * 1e3),
            "p50_ms": float(np.percentile(a, 50) * 1e3),
            "p99_ms": float(np.percentile(a, 99) * 1e3),
        }
