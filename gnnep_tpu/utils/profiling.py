"""Observability: throughput counters and jax.profiler tracing.

The reference's only instrumentation is wall-clock prints (SURVEY.md §5);
the TPU framework's first-class metric is edges/s/chip, tracked per epoch,
plus optional XLA profiler traces for kernel-level analysis.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


class ThroughputMeter:
    """Accumulates (atom + line-graph) edges and graphs per wall-second."""

    def __init__(self):
        self.edges = 0.0
        self.graphs = 0.0
        self._t0 = time.perf_counter()

    def count_batch(self, batch) -> None:
        self.edges += float(np.asarray(batch.edge_mask).sum()
                            + np.asarray(batch.lg_mask).sum())
        self.graphs += float(np.asarray(batch.graph_mask).sum())

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def summary(self) -> str:
        dt = max(self.elapsed, 1e-9)
        return (f"{self.edges / dt:,.0f} edges/s, "
                f"{self.graphs / dt:,.1f} graphs/s over {dt:.1f}s")


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """XLA profiler trace context; no-op when trace_dir is falsy."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
