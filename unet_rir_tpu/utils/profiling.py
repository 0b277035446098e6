"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference profiles with bare time.time() spans (main_training.py:
335-339, rir_generation.py:164-168). TPU-native equivalents:

* `PhaseTimer` — named wall-clock spans that force device completion via
  a scalar readback (the axon tunnel makes `block_until_ready`
  unreliable; see bench.py's method note), reproducing the three-phase
  inference CSV schema.
* `trace` — context manager around jax.profiler for real XLA traces
  (view with TensorBoard / xprof).
* `device_memory_stats` — HBM usage snapshot per device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import numpy as np


class PhaseTimer:
    """Accumulate named wall-clock spans; mean excludes warm-up like the
    reference (rir_generation.py:359-361)."""

    def __init__(self):
        self.spans: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans.setdefault(name, []).append(time.perf_counter() - t0)

    def mean(self, name: str, drop_warmup: bool = True) -> float:
        values = self.spans.get(name, [])
        if not values:
            return float("nan")
        if drop_warmup and len(values) > 1:
            values = values[1:]
        return float(np.mean(values))

    def summary(self) -> dict[str, float]:
        return {k: self.mean(k) for k in self.spans}


def sync(x) -> None:
    """Force completion of a device value (tunnel-safe scalar readback)."""
    leaf = jax.tree_util.tree_leaves(x)
    if leaf:
        np.asarray(jax.device_get(leaf[0].ravel()[0] if hasattr(leaf[0], "ravel") else leaf[0]))


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """XLA profiler trace context (open with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> list[dict]:
    """Per-device memory stats where the backend exposes them."""
    stats = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        stats.append({"device": str(d), **{k: s[k] for k in sorted(s)}})
    return stats


__all__ = ["PhaseTimer", "sync", "trace", "device_memory_stats"]
