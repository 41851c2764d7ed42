"""Tracing / profiling helpers.

The reference has no profiling at all (SURVEY.md §5 — tqdm bars only). Here:
- Timer / ThroughputMeter: wall-clock counters that force a host sync first
  (on the tunneled TPU backend `block_until_ready` is asynchronous, so
  honest timing requires a transfer — see bench.py).
- trace_context: jax.profiler trace wrapper (writes a TensorBoard trace dir)
  that degrades to a no-op where the profiler is unsupported.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


def force_sync(tree) -> None:
    """Force device->host transfer of one tiny leaf to serialize timing."""
    import jax
    leaves = jax.tree.leaves(tree)
    if leaves:
        leaf = leaves[0]
        if hasattr(leaf, "shape"):
            np.asarray(leaf).ravel()[:1]


class Timer:
    def __init__(self, sync_tree=None):
        self._sync = sync_tree

    def __enter__(self):
        if self._sync is not None:
            force_sync(self._sync)
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


class ThroughputMeter:
    """scenes/sec (or items/sec) counter with a warmup discard."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.count = 0
        self.items = 0
        self.t0: Optional[float] = None

    def tick(self, n_items: int = 1):
        self.count += 1
        if self.count == self.warmup:
            self.t0 = time.perf_counter()
            self.items = 0
        elif self.count > self.warmup:
            self.items += n_items

    @property
    def per_sec(self) -> float:
        if self.t0 is None or self.items == 0:
            return 0.0
        return self.items / (time.perf_counter() - self.t0)


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]):
    """jax.profiler trace when log_dir is set and supported; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:                                       # pragma: no cover
        yield
