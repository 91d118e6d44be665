"""Tracing / profiling helpers.

The reference has no profiling at all — only tqdm bars
(reference: CLIPLPIPS_REG_training_sweep_example.py:62; SURVEY.md §5).
TPU-native equivalent: ``jax.profiler`` trace annotations around the
scoring/training loops and optional TensorBoard trace dumps, plus a tiny
step timer for throughput lines in the metric writers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace (shows up in TensorBoard/XProf)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` for TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock throughput meter.

    On the axon TPU platform ``block_until_ready`` returns early (see
    bench.py), so callers should time around a ``jax.device_get`` of a
    step output for truthful numbers.
    """

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._items = []

    def tick(self, n_items: int = 1) -> None:
        self._times.append(time.perf_counter())
        self._items.append(n_items)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._items.pop(0)

    @property
    def items_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        return sum(self._items[1:]) / dt if dt > 0 else None

    def metrics(self, prefix: str = "") -> Dict[str, float]:
        rate = self.items_per_sec
        return {f"{prefix}items_per_sec": rate} if rate else {}
