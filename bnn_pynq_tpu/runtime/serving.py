"""Continuous-batching classification server (BASELINE.json north star:
"continuous batching of classification requests across hosts").

Single-host building block: requests enqueue individually; a dispatcher
thread drains the queue into device-sized batches (up to `max_batch`,
waiting at most `max_wait_ms` for stragglers), runs the engine once per
batch, and resolves per-request futures. This is the TPU-side analogue of
the reference's `numReps` batch streaming (SURVEY.md §2), made dynamic.

Multi-host: each host runs one BatchingServer over its own engine
(weights replicated or tensor-sharded via parallel/tp.py); a front-end
fans requests out over DCN — see parallel/ for the sharded engine.
Latency percentiles are tracked per request for the p50 metric in
BASELINE.md.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Deque, List, Optional

import numpy as np

# Latency samples kept for percentile estimation. Bounded: a long-lived
# server must not grow its stats without limit; the newest window is what
# the p50/p99 metrics mean operationally anyway.
STATS_WINDOW = 65536


@dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    latencies_ms: Deque[float] = field(
        default_factory=lambda: deque(maxlen=STATS_WINDOW))

    def percentile(self, p: float) -> float:
        if not self.latencies_ms:
            return float("nan")
        return float(np.percentile(np.fromiter(self.latencies_ms, float), p))

    def summary(self) -> dict:
        return {
            "requests": self.requests,
            "batches": self.batches,
            "mean_batch": self.requests / max(1, self.batches),
            "p50_ms": self.percentile(50),
            "p99_ms": self.percentile(99),
        }


class _Request:
    __slots__ = ("x", "future", "t_enqueue")

    def __init__(self, x):
        self.x = x
        self.future: Future = Future()
        self.t_enqueue = time.perf_counter()


class BatchingServer:
    """Continuous batching over an InferenceEngine (or any object with
    `classify(x, prepared=True)` / `logits`)."""

    def __init__(self, engine, max_batch: int = 256,
                 max_wait_ms: float = 2.0, return_logits: bool = False):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.return_logits = return_logits
        self.stats = ServerStats()
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- client API -------------------------------------------------------
    def submit(self, x_prepared: np.ndarray) -> Future:
        """Enqueue ONE prepared input (no batch dim); resolves to the class
        index (or logits). After stop(), resolves immediately with an
        error — a stopped server must fail fast, not strand requests
        (clients behind keep-alive connections would otherwise hang on a
        queue nobody drains; the Frontend failover path depends on the
        fast error to re-dispatch)."""
        req = _Request(np.asarray(x_prepared))
        if self._stop.is_set():
            req.future.set_exception(RuntimeError("server stopped"))
            return req.future
        self._q.put(req)
        return req.future

    def classify(self, x_prepared: np.ndarray, timeout: float = 60.0):
        return self.submit(x_prepared).result(timeout)

    @property
    def stopped(self) -> bool:
        return self._stop.is_set()

    def stop(self):
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=10)
        # fail anything still queued so no future is stranded
        try:
            while True:
                r = self._q.get_nowait()
                if r is not None and not r.future.done():
                    r.future.set_exception(RuntimeError("server stopped"))
        except queue.Empty:
            pass

    # -- dispatcher -------------------------------------------------------
    def _collect(self) -> List[_Request]:
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        if first is None:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                try:
                    while len(batch) < self.max_batch:
                        r = self._q.get_nowait()
                        if r is None:
                            return batch
                        batch.append(r)
                except queue.Empty:
                    pass
                break
            try:
                r = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if r is None:
                break
            batch.append(r)
        return batch

    def _loop(self):
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            xs = np.stack([r.x for r in batch])
            try:
                if self.return_logits:
                    outs = self.engine.logits(xs, prepared=True)
                else:
                    outs = self.engine.classify(xs, prepared=True)
            except Exception as e:  # resolve futures with the error
                for r in batch:
                    r.future.set_exception(e)
                continue
            now = time.perf_counter()
            for r, out in zip(batch, outs):
                r.future.set_result(out)
                self.stats.latencies_ms.append((now - r.t_enqueue) * 1e3)
            self.stats.requests += len(batch)
            self.stats.batches += 1
