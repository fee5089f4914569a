"""Profiling and input-pipeline timing.

Parity: the reference's opt-in hand timers (SURVEY §5.1: per-__getitem__
extraction/augmentation/total times, datasets.py:449-526; AverageMeter
batch/data time + throughput rate, train.py:1012-1111). TPU-native additions:
``jax.profiler`` trace capture and a stage-timer that matches the reference's
'Time dict' keys so dashboards carry over.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Host-side stage timing with reference-compatible keys."""

    KEYS = ("Average time to extract a tile", "Augmentation time", "Total time")

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = {k: 0.0 for k in self.KEYS}
        self.counts: Dict[str, int] = {k: 0 for k in self.KEYS}

    @contextlib.contextmanager
    def stage(self, key: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[key] = self.totals.get(key, 0.0) + time.perf_counter() - t0
            self.counts[key] = self.counts.get(key, 0) + 1

    def time_dict(self) -> Dict[str, float]:
        """'Time dict' parity (datasets.py:517-526)."""
        return {
            k: (self.totals.get(k, 0.0) / max(self.counts.get(k, 0), 1))
            for k in self.KEYS
        }


class ThroughputMeter:
    """rate = batch × world / time (train.py:1099-1111 definition)."""

    def __init__(self, world_size: int = 1):
        self.world = world_size
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._samples = 0

    def update(self, batch_size: int):
        self._samples += batch_size

    @property
    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._samples * self.world / max(dt, 1e-9)
