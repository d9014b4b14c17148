"""Multi-host serving front-end: request fan-out + failure re-dispatch
(SURVEY.md §5.3 rebuild — the reference is a single board with none of
this; the north star's continuous-batching serving needs it).

A `Frontend` owns several backends (one per host — locally these are
BatchingServer instances; across real hosts they would wrap RPC stubs
whose transport rides DCN). Requests round-robin over healthy backends;
a heartbeat probe marks backends unhealthy, and requests in flight on a
failed backend are transparently re-dispatched to the survivors.
"""

from __future__ import annotations

import itertools
import threading
import time
from concurrent.futures import Future
from typing import Callable, List, Optional, Sequence

import numpy as np


class BackendHandle:
    """A serving backend with liveness state."""

    def __init__(self, name: str, server, probe: Optional[Callable] = None):
        self.name = name
        self.server = server
        self.probe = probe
        self.healthy = True

    def check(self) -> bool:
        try:
            if self.probe is not None:
                self.probe()
            self.healthy = True
        except Exception:
            self.healthy = False
        return self.healthy


class HttpBackend:
    """Adapter: a remote `http_server` endpoint as a Frontend backend.

    `submit(x)` POSTs one raw uint8 image to /classify from a worker
    thread (preparation happens server-side, matching the reference's
    on-board preprocessing) and resolves the Future with the class
    index; `probe()` GETs
    /healthz (wire this as the BackendHandle probe). This is the DCN
    transport leg the reference never had (single board) — SURVEY.md
    §5.3's multi-host path, stdlib-only on the client side.
    """

    def __init__(self, base_url: str, timeout_s: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s

    def probe(self):
        import urllib.request
        r = urllib.request.urlopen(self.base_url + "/healthz",
                                   timeout=min(self.timeout_s, 5.0))
        if r.status != 200:
            raise RuntimeError(f"unhealthy: HTTP {r.status}")

    def submit(self, x: np.ndarray) -> Future:
        import io
        import json
        import urllib.request

        f: Future = Future()
        buf = io.BytesIO()
        np.savez(buf, x=np.asarray(x)[None])
        req = urllib.request.Request(
            self.base_url + "/classify", data=buf.getvalue(), method="POST")

        def run():
            try:
                resp = json.loads(urllib.request.urlopen(
                    req, timeout=self.timeout_s).read())
                if "error" in resp:
                    raise RuntimeError(resp["error"])
                f.set_result(int(resp["classes"][0]))
            except Exception as e:  # noqa: BLE001 — Future carries it
                f.set_exception(e)

        threading.Thread(target=run, daemon=True).start()
        return f


class Frontend:
    def __init__(self, backends: Sequence[BackendHandle],
                 heartbeat_s: float = 1.0, max_retries: int = 3):
        if not backends:
            raise ValueError("need at least one backend")
        self.backends = list(backends)
        self.max_retries = max_retries
        self._rr = itertools.count()
        self._stop = threading.Event()
        self._hb = threading.Thread(
            target=self._heartbeat_loop, args=(heartbeat_s,), daemon=True)
        self._hb.start()

    # -- dispatch ---------------------------------------------------------
    def _pick(self) -> BackendHandle:
        healthy = [b for b in self.backends if b.healthy]
        if not healthy:
            raise RuntimeError("no healthy backends")
        return healthy[next(self._rr) % len(healthy)]

    def submit(self, x: np.ndarray) -> Future:
        outer: Future = Future()
        self._dispatch(x, outer, tries=0)
        return outer

    def _dispatch(self, x, outer: Future, tries: int):
        try:
            backend = self._pick()
        except RuntimeError as e:
            outer.set_exception(e)
            return
        inner = backend.server.submit(x)

        def done(f: Future):
            err = f.exception()
            if err is None:
                if not outer.cancelled():
                    outer.set_result(f.result())
                return
            # backend failed mid-request: mark unhealthy, re-dispatch
            backend.healthy = False
            if tries + 1 >= self.max_retries:
                outer.set_exception(err)
            else:
                self._dispatch(x, outer, tries + 1)

        inner.add_done_callback(done)

    def classify(self, x: np.ndarray, timeout: float = 60.0):
        return self.submit(x).result(timeout)

    # -- liveness ---------------------------------------------------------
    def _heartbeat_loop(self, interval: float):
        while not self._stop.wait(interval):
            for b in self.backends:
                b.check()

    def healthy_backends(self) -> List[str]:
        return [b.name for b in self.backends if b.healthy]

    def stop(self):
        self._stop.set()
        self._hb.join(timeout=5)
