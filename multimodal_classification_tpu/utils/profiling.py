"""Profiling / tracing hooks.

The reference has no profiling at all (SURVEY.md §5 — wall-clock anecdotes
only). Here: jax.profiler trace capture around training steps (viewable with
TensorBoard / Perfetto) plus a lightweight step timer whose stats feed the
tracker's ``train_examples_per_sec`` metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step timing with warmup exclusion and percentile stats."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self._all: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._all.append(time.perf_counter() - self._t0)
        return False

    @property
    def times(self) -> List[float]:
        return self._all[self.warmup :] if len(self._all) > self.warmup else self._all

    def stats(self) -> Dict[str, float]:
        import numpy as np

        t = np.asarray(self.times or [0.0])
        return {
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "steps": len(t),
        }


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
