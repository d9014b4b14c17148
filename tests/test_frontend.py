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

    def submit_many(self, x):
        f = Future()

        def run():
            if self.delay:
                time.sleep(self.delay)
            if self.fail:
                f.set_exception(RuntimeError(f"{self.name} down"))
            else:
                self.handled += 1
                f.set_result(np.asarray(
                    [int(np.sum(r)) % 10 for r in x], np.int32))

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


def test_submit_many_fanout_and_failover():
    """Batch requests go through the same pick/failover machinery and
    resolve to per-image class arrays."""
    good = FakeServer("good")
    bad = FakeServer("bad", fail=True)
    fe = Frontend([BackendHandle("good", good), BackendHandle("bad", bad)],
                  heartbeat_s=10.0)
    try:
        xs = np.stack([np.full((4,), i) for i in range(6)])
        out = fe.submit_many(xs).result(10)
        np.testing.assert_array_equal(
            out, [int(np.sum(r)) % 10 for r in xs])
        assert good.handled >= 1
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


def test_http_failover_mid_stream(tmp_path):
    """End-to-end §5.3 drill through REAL HTTP: two http_server backends
    behind a Frontend; one is shut down mid-stream; every request must
    still complete on the survivor and the dead backend must be marked
    unhealthy by the heartbeat."""
    from bnn_pynq_tpu.compiler import compile_network, save_artifact
    from bnn_pynq_tpu.runtime.engine import InferenceEngine
    from bnn_pynq_tpu.runtime.frontend import HttpBackend
    from bnn_pynq_tpu.runtime.http_server import serve
    from tests.test_finnthesizer import init_perturbed, mini_cnv

    cfg = mini_cnv(1, 1)
    _, params, stats = init_perturbed(cfg, seed=33)
    compiled = compile_network(cfg, params, stats)
    path = str(tmp_path / "mini.npz")
    save_artifact(path, compiled)

    httpd_a, batcher_a = serve(path, port=0, runtime="ref", block=False)
    httpd_b, batcher_b = serve(path, port=0, runtime="ref", block=False)
    backends = []
    for name, httpd in (("a", httpd_a), ("b", httpd_b)):
        hb = HttpBackend(f"http://127.0.0.1:{httpd.server_address[1]}")
        backends.append(BackendHandle(name, hb, probe=hb.probe))
    fe = Frontend(backends, heartbeat_s=0.1, max_retries=3)

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, size=(24, 10, 10, 3)).astype(np.uint8)
    expected = InferenceEngine(compiled, runtime="ref").classify(imgs)
    try:
        futures = [fe.submit(imgs[i]) for i in range(8)]
        got = [f.result(30) for f in futures]

        # kill backend b mid-stream, keep submitting immediately
        # (server_close releases the listening socket so new connections
        # fail fast instead of queueing on the dead listener)
        httpd_b.shutdown()
        httpd_b.server_close()
        batcher_b.stop()
        futures = [fe.submit(imgs[i]) for i in range(8, 24)]
        got += [f.result(30) for f in futures]

        np.testing.assert_array_equal(np.asarray(got), expected)
        time.sleep(0.5)  # let the heartbeat observe the corpse
        assert not fe.backends[1].healthy
        assert fe.healthy_backends() == ["a"]
    finally:
        fe.stop()
        httpd_a.shutdown()
        batcher_a.stop()


def test_frontend_reload_all(tmp_path):
    """Fleet-wide zero-downtime parameter rollout: Frontend.reload_all
    swaps weights on every healthy HTTP backend; traffic before/after
    sees old/new weights respectively (r5, SURVEY §3.2 over DCN)."""
    import numpy as np
    from bnn_pynq_tpu.compiler import compile_network, save_artifact
    from bnn_pynq_tpu.runtime.engine import InferenceEngine
    from bnn_pynq_tpu.runtime.frontend import (BackendHandle, Frontend,
                                               HttpBackend)
    from bnn_pynq_tpu.runtime.http_server import serve
    from tests.test_finnthesizer import init_perturbed, mini_cnv

    cfg = mini_cnv(1, 1)
    _, p1, s1 = init_perturbed(cfg, seed=60)
    _, p2, s2 = init_perturbed(cfg, seed=61)
    c1, c2 = compile_network(cfg, p1, s1), compile_network(cfg, p2, s2)
    a1, a2 = str(tmp_path / "a1.npz"), str(tmp_path / "a2.npz")
    save_artifact(a1, c1)
    save_artifact(a2, c2)

    servers = [serve(a1, port=0, runtime="ref", block=False)
               for _ in range(2)]
    backends = []
    try:
        for i, (httpd, _) in enumerate(servers):
            hb = HttpBackend(f"http://127.0.0.1:{httpd.server_address[1]}")
            backends.append(hb)
        fe = Frontend([BackendHandle(f"b{i}", hb, probe=hb.probe)
                       for i, hb in enumerate(backends)], heartbeat_s=5.0)
        rng = np.random.default_rng(62)
        imgs = rng.integers(0, 256, size=(4, 10, 10, 3)).astype(np.uint8)
        want1 = InferenceEngine(c1, runtime="ref").classify(imgs)
        want2 = InferenceEngine(c2, runtime="ref").classify(imgs)
        np.testing.assert_array_equal(fe.submit_many(imgs).result(60), want1)
        out = fe.reload_all(open(a2, "rb").read())
        assert all(r.get("reloaded") == cfg.name for r in out.values()), out
        # every backend now serves the new weights
        for hb in backends:
            np.testing.assert_array_equal(
                hb.submit_many(imgs).result(60), want2)
        fe.stop()
    finally:
        for hb in backends:
            hb.close()
        for httpd, batcher in servers:
            httpd.shutdown()
            batcher.stop()
