"""Multi-host front-end: fan-out, heartbeat, failure re-dispatch
(SURVEY.md §5.3)."""

import threading
import time
from concurrent.futures import Future

import numpy as np
import pytest

from bnn_pynq_tpu.runtime.frontend import BackendHandle, Frontend


class FakeServer:
    """Mimics BatchingServer.submit for one request at a time."""

    def __init__(self, name, fail=False, delay=0.0):
        self.name = name
        self.fail = fail
        self.delay = delay
        self.handled = 0

    def submit(self, x):
        f = Future()

        def run():
            if self.delay:
                time.sleep(self.delay)
            if self.fail:
                f.set_exception(RuntimeError(f"{self.name} down"))
            else:
                self.handled += 1
                f.set_result(int(np.sum(x)) % 10)

        threading.Thread(target=run, daemon=True).start()
        return f


def test_round_robin_fanout():
    servers = [FakeServer(f"h{i}") for i in range(3)]
    fe = Frontend([BackendHandle(s.name, s) for s in servers],
                  heartbeat_s=10.0)
    try:
        xs = [np.full((4,), i) for i in range(12)]
        results = [fe.classify(x, 10) for x in xs]
        assert all(isinstance(r, int) for r in results)
        assert all(s.handled == 4 for s in servers)  # even spread
    finally:
        fe.stop()


def test_failed_backend_redispatch():
    good = FakeServer("good")
    bad = FakeServer("bad", fail=True)
    fe = Frontend([BackendHandle("good", good), BackendHandle("bad", bad)],
                  heartbeat_s=10.0)
    try:
        results = [fe.classify(np.full((4,), i), 10) for i in range(8)]
        assert len(results) == 8
        assert good.handled == 8          # everything landed on the survivor
        assert not fe.backends[1].healthy  # bad marked down
    finally:
        fe.stop()


def test_heartbeat_recovers_backend():
    flaky = FakeServer("flaky")
    state = {"ok": False}

    def probe():
        if not state["ok"]:
            raise RuntimeError("not yet")

    h = BackendHandle("flaky", flaky, probe=probe)
    h.healthy = False
    fe = Frontend([BackendHandle("good", FakeServer("good")), h],
                  heartbeat_s=0.05)
    try:
        assert fe.healthy_backends() == ["good"]
        state["ok"] = True
        time.sleep(0.2)
        assert set(fe.healthy_backends()) == {"good", "flaky"}
    finally:
        fe.stop()


def test_all_backends_down_raises():
    bad = FakeServer("bad", fail=True)
    h = BackendHandle("bad", bad)
    h.healthy = False
    fe = Frontend([h], heartbeat_s=10.0)
    try:
        with pytest.raises(RuntimeError):
            fe.classify(np.zeros(4), 5)
    finally:
        fe.stop()
