"""Tracing / profiling utilities.

The reference has NO profiling surface (SURVEY.md §5: only tqdm bars).
Here: jax.profiler traces viewable in Perfetto/TensorBoard, a throughput
meter for the clips/sec/chip headline metric (BASELINE.md), and a simple
scoped wall-clock timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "./runs/profile"):
    """Capture a device+host profiler trace: open with TensorBoard's
    profile plugin or ui.perfetto.dev."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class ThroughputMeter:
    """clips/sec (and clips/sec/chip) over a sliding window."""

    def __init__(self, n_chips: Optional[int] = None):
        self.n_chips = n_chips if n_chips is not None else jax.device_count()
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._clips = 0

    def update(self, clips: int) -> None:
        self._clips += clips

    @property
    def clips_per_sec(self) -> float:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return self._clips / dt

    @property
    def clips_per_sec_per_chip(self) -> float:
        return self.clips_per_sec / max(self.n_chips, 1)

    def summary(self) -> Dict[str, float]:
        cps = self.clips_per_sec  # one snapshot; per-chip derives from it
        return {"clips_per_sec": cps,
                "clips_per_sec_per_chip": cps / max(self.n_chips, 1),
                "clips": float(self._clips)}


class Timer:
    """Scoped wall-clock timer: ``with Timer() as t: ...; t.seconds``."""

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        return False
