"""Tracing / profiling (SURVEY.md §5).

The reference's only instrumentation is ad-hoc `time.time()` prints
(`deep_learning_with_opencv.py:22-25`) and an FPS counter
(`real_time_object_detection.py:31,67-71`). Here: per-stage wall timers
with device sync, a frames/sec/chip meter (the north-star metric), and a
`jax.profiler` trace context for XLA-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates per-stage wall time with device synchronization."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total * 1e3:.1f} ms total, "
                         f"{total / n * 1e3:.2f} ms/call ({n} calls)")
        return "\n".join(lines)


class ThroughputMeter:
    """frames/sec/chip meter — `imutils.FPS` equivalent
    (`real_time_object_detection.py:31,67-71`) for batched pipelines."""

    def __init__(self):
        self._start = None
        self._frames = 0

    def start(self):
        self._start = time.perf_counter()
        self._frames = 0
        return self

    def update(self, n_frames: int = 1):
        self._frames += n_frames

    def elapsed(self) -> float:
        return time.perf_counter() - self._start

    def fps(self) -> float:
        e = self.elapsed()
        return self._frames / e if e > 0 else 0.0

    def fps_per_chip(self) -> float:
        return self.fps() / max(jax.local_device_count(), 1)


@contextlib.contextmanager
def trace_to(logdir: str):
    """jax.profiler trace context: `with trace_to('/tmp/trace'): run()` →
    open in XProf/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
