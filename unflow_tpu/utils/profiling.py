"""Profiling hooks (SURVEY.md §5 tracing row).

The reference has no profiler integration beyond TF summaries; here we
expose jax.profiler traces (viewable in Perfetto/TensorBoard) and a
simple synced step timer.

Caveat for this environment: on the axon-tunneled TPU,
``block_until_ready`` does not actually block — ``StepTimer`` therefore
syncs on a host fetch of a scalar you pass in (e.g. the loss).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a jax.profiler trace for the enclosed block."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput meter synced by host-fetching a scalar."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = None
        self._items = 0

    def start(self, sync_scalar=None):
        if sync_scalar is not None:
            float(sync_scalar)
        self._t0 = time.perf_counter()
        self._items = 0

    def tick(self, items: int):
        self._items += items

    def rate(self, sync_scalar=None) -> float:
        """items/sec since start(); sync_scalar forces device completion."""
        if sync_scalar is not None:
            float(sync_scalar)
        dt = time.perf_counter() - self._t0
        return self._items / max(dt, 1e-9)
