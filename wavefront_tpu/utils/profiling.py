"""Tracing / profiling / metrics.

The reference's only observability is a once-per-second fps print
(reference main.rs:872-879) and dbg! traces on slow paths (SURVEY.md
section 5).  Here: a frame timer with fps + Mrays/sec counters, optional
per-stage wall timing, and a `jax.profiler` trace context for TPU timeline
capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class FrameStats:
    frame_ms: float
    fps: float
    mrays_per_sec: float


class FrameTimer:
    """Rolling frame timing + throughput metrics."""

    def __init__(self, rays_per_frame: int, window: int = 60):
        self.rays_per_frame = rays_per_frame
        self._times = deque(maxlen=window)
        self._last_report = time.perf_counter()
        self._frames_since_report = 0

    @contextlib.contextmanager
    def frame(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._times.append(dt)
        self._frames_since_report += 1

    @property
    def stats(self) -> Optional[FrameStats]:
        if not self._times:
            return None
        mean = sum(self._times) / len(self._times)
        return FrameStats(
            frame_ms=mean * 1000.0,
            fps=1.0 / mean if mean > 0 else float("inf"),
            mrays_per_sec=self.rays_per_frame / mean / 1e6 if mean > 0 else 0.0,
        )

    def maybe_report(self, interval: float = 1.0) -> Optional[FrameStats]:
        """Once-per-`interval` stats, the reference's fps-print cadence
        (main.rs:872-879)."""
        now = time.perf_counter()
        if now - self._last_report >= interval and self._times:
            self._last_report = now
            self._frames_since_report = 0
            return self.stats
        return None


class StageTimer:
    """Named wall-clock stage accumulator for host-side phases (worldgen,
    light-BVH build, upload)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in self.totals
        }


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/wavefront_tpu_trace"):
    """Capture an XLA/TPU profiler timeline around a code region; view with
    tensorboard or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
