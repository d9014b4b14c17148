"""Profiling helpers (SURVEY.md §5.1 rebuild: jax.profiler traces +
steady-state timing that is robust to the axon tunnel's unreliable
block_until_ready)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/bnn_trace", enabled: bool = True):
    """Wrap a region in a jax.profiler trace viewable in TensorBoard/xprof."""
    if not enabled:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def steady_state_time(launch: Callable[[], object], iters: int = 20,
                      warmup: int = 2) -> float:
    """Seconds per launch: chains `iters` async launches and forces ONE
    device→host fetch at the end (np.asarray), so per-call dispatch
    overlaps and the tunnel round-trip amortizes."""
    for _ in range(warmup):
        out = launch()
    np.asarray(out)  # noqa: F841 — force completion of warmup
    t0 = time.perf_counter()
    outs = [launch() for _ in range(iters)]
    np.asarray(outs[-1])
    return (time.perf_counter() - t0) / iters


def steady_state_stats(launch: Callable[[], object], iters: int = 20,
                       repeats: int = 4, warmup: int = 2):
    """(median, half_range) seconds/launch over `repeats` chained windows.
    The half-range is the uncertainty a differencing consumer must
    propagate (VERDICT r3 next #8: committed profiler tables need a
    per-row noise field)."""
    out = None
    for _ in range(warmup):
        out = launch()
    if out is not None:
        np.asarray(out)  # force completion of warmup
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [launch() for _ in range(iters)]
        np.asarray(outs[-1])
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    return ts[len(ts) // 2], (ts[-1] - ts[0]) / 2
